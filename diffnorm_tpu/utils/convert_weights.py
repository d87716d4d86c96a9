"""PyTorch-checkpoint -> flax-params conversion.

Needed for parity evaluation with released assets (SURVEY.md "weight
conversion" hard part): mHuBERT (fairseq HubertModel state dict),
code-HiFi-GAN (fairseq CodeGenerator "generator" state dict), and k-means
(handled in models/kmeans.py via joblib).

Layout rules:
* torch Linear weight [out, in]      -> flax Dense kernel [in, out] (T)
* torch Conv1d weight [out, in, k]   -> flax Conv kernel [k, in, out]
* torch grouped Conv1d [out, in/g, k]-> flax kernel [k, in/g, out]
* torch ConvTranspose1d [in, out, k] -> flax ConvTranspose(transpose_kernel=
  True) kernel [k, out, in]
* torch Embedding [V, D]             -> flax Embed embedding [V, D]
* weight-norm (weight_g/weight_v) is folded: w = g * v / ||v|| with the
  norm over every dim except `dim` (torch semantics; HiFi-GAN uses dim=0,
  wav2vec2 pos_conv uses dim=2)
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(x) -> np.ndarray:
    import torch

    if isinstance(x, torch.Tensor):
        return x.detach().cpu().float().numpy()
    return np.asarray(x, np.float32)


def fold_weight_norm(g, v, dim: int = 0) -> np.ndarray:
    g, v = _t(g), _t(v)
    axes = tuple(i for i in range(v.ndim) if i != dim)
    norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def conv_w(w) -> np.ndarray:
    """[out, in, k] -> [k, in, out]"""
    return _t(w).transpose(2, 1, 0)


def convT_w(w) -> np.ndarray:
    """[in, out, k] -> [k, out, in] (flax transpose_kernel=True layout)"""
    return _t(w).transpose(2, 1, 0)


def dense_w(w) -> np.ndarray:
    return _t(w).T


def _get_conv(sd: Dict, prefix: str, wn_dim: int = 0):
    """Conv weight with optional weight-norm folding."""
    if f"{prefix}.weight_g" in sd:
        return fold_weight_norm(
            sd[f"{prefix}.weight_g"], sd[f"{prefix}.weight_v"], dim=wn_dim
        )
    return _t(sd[f"{prefix}.weight"])


# ---------------------------------------------------------------- HiFi-GAN

def convert_hifigan_checkpoint(path: str, cfg: Dict) -> Dict:
    """fairseq code-HiFi-GAN checkpoint -> CodeGenerator variables."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("generator", ckpt.get("model", ckpt))

    gen: Dict = {}
    gen["conv_pre"] = {
        "kernel": _get_conv(sd, "conv_pre").transpose(2, 1, 0),
        "bias": _t(sd["conv_pre.bias"]),
    }
    n_up = len(cfg["upsample_rates"])
    n_k = len(cfg["resblock_kernel_sizes"])
    for i in range(n_up):
        gen[f"up_{i}"] = {
            "kernel": _get_conv(sd, f"ups.{i}").transpose(2, 1, 0),
            "bias": _t(sd[f"ups.{i}.bias"]),
        }
        for j in range(n_k):
            ridx = i * n_k + j
            block: Dict = {}
            for c in range(len(cfg["resblock_dilation_sizes"][j])):
                block[f"conv1_{c}"] = {
                    "kernel": _get_conv(sd, f"resblocks.{ridx}.convs1.{c}").transpose(2, 1, 0),
                    "bias": _t(sd[f"resblocks.{ridx}.convs1.{c}.bias"]),
                }
                block[f"conv2_{c}"] = {
                    "kernel": _get_conv(sd, f"resblocks.{ridx}.convs2.{c}").transpose(2, 1, 0),
                    "bias": _t(sd[f"resblocks.{ridx}.convs2.{c}.bias"]),
                }
            gen[f"resblock_{i}_{j}"] = block
    gen["conv_post"] = {
        "kernel": _get_conv(sd, "conv_post").transpose(2, 1, 0),
        "bias": _t(sd["conv_post.bias"]),
    }

    params: Dict = {"generator": gen, "dict": {"embedding": _t(sd["dict.weight"])}}
    if any(k.startswith("spkr.") for k in sd):
        params["spkr"] = {"embedding": _t(sd["spkr.weight"])}
    if any(k.startswith("dur_predictor.") for k in sd):
        params["dur_predictor"] = {
            "conv1": {
                "kernel": conv_w(sd["dur_predictor.conv1.0.weight"]),
                "bias": _t(sd["dur_predictor.conv1.0.bias"]),
            },
            "ln1": {
                "scale": _t(sd["dur_predictor.ln1.weight"]),
                "bias": _t(sd["dur_predictor.ln1.bias"]),
            },
            "conv2": {
                "kernel": conv_w(sd["dur_predictor.conv2.0.weight"]),
                "bias": _t(sd["dur_predictor.conv2.0.bias"]),
            },
            "ln2": {
                "scale": _t(sd["dur_predictor.ln2.weight"]),
                "bias": _t(sd["dur_predictor.ln2.bias"]),
            },
            "proj": {
                "kernel": dense_w(sd["dur_predictor.proj.weight"]),
                "bias": _t(sd["dur_predictor.proj.bias"]),
            },
        }
    return {"params": params}


# ---------------------------------------------------------------- HuBERT

def convert_hubert_checkpoint(path: str, layers: int = 12) -> Dict:
    """fairseq (m)HuBERT checkpoint -> HubertEncoder variables."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    sd = {k.removeprefix("encoder."): v for k, v in sd.items()} if all(
        k.startswith("encoder.") for k in sd
    ) else sd

    fe: Dict = {}
    i = 0
    while f"feature_extractor.conv_layers.{i}.0.weight" in sd:
        fe[f"conv_{i}"] = {
            "kernel": conv_w(sd[f"feature_extractor.conv_layers.{i}.0.weight"])
        }
        i += 1
    # first layer's group norm (index .2 in the torch sequential)
    fe["group_norm"] = {
        "scale": _t(sd["feature_extractor.conv_layers.0.2.weight"]),
        "bias": _t(sd["feature_extractor.conv_layers.0.2.bias"]),
    }

    params: Dict = {
        "feature_extractor": fe,
        "layer_norm": {
            "scale": _t(sd["layer_norm.weight"]),
            "bias": _t(sd["layer_norm.bias"]),
        },
        "post_extract_proj": {
            "kernel": dense_w(sd["post_extract_proj.weight"]),
            "bias": _t(sd["post_extract_proj.bias"]),
        },
        "pos_conv": {
            "conv": {
                "kernel": _get_conv(sd, "encoder.pos_conv.0", wn_dim=2)
                .transpose(2, 1, 0),
                "bias": _t(sd["encoder.pos_conv.0.bias"]),
            }
        },
        "encoder_layer_norm": {
            "scale": _t(sd["encoder.layer_norm.weight"]),
            "bias": _t(sd["encoder.layer_norm.bias"]),
        },
    }
    for n in range(layers):
        p = f"encoder.layers.{n}"
        params[f"layer_{n}"] = {
            "q_proj": {"kernel": dense_w(sd[f"{p}.self_attn.q_proj.weight"]),
                       "bias": _t(sd[f"{p}.self_attn.q_proj.bias"])},
            "k_proj": {"kernel": dense_w(sd[f"{p}.self_attn.k_proj.weight"]),
                       "bias": _t(sd[f"{p}.self_attn.k_proj.bias"])},
            "v_proj": {"kernel": dense_w(sd[f"{p}.self_attn.v_proj.weight"]),
                       "bias": _t(sd[f"{p}.self_attn.v_proj.bias"])},
            "out_proj": {"kernel": dense_w(sd[f"{p}.self_attn.out_proj.weight"]),
                         "bias": _t(sd[f"{p}.self_attn.out_proj.bias"])},
            "self_attn_layer_norm": {
                "scale": _t(sd[f"{p}.self_attn_layer_norm.weight"]),
                "bias": _t(sd[f"{p}.self_attn_layer_norm.bias"]),
            },
            "fc1": {"kernel": dense_w(sd[f"{p}.fc1.weight"]),
                    "bias": _t(sd[f"{p}.fc1.bias"])},
            "fc2": {"kernel": dense_w(sd[f"{p}.fc2.weight"]),
                    "bias": _t(sd[f"{p}.fc2.bias"])},
            "final_layer_norm": {
                "scale": _t(sd[f"{p}.final_layer_norm.weight"]),
                "bias": _t(sd[f"{p}.final_layer_norm.bias"]),
            },
        }
    return {"params": params}
