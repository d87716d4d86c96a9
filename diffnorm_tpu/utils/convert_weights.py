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


def _load_sd(path: str) -> "Dict":
    """torch checkpoint -> model state dict (the `model` entry when the
    file is a full fairseq checkpoint, else the raw dict)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt.get("model", ckpt)


# ---------------------------------------------------------------- HiFi-GAN

def convert_hifigan_checkpoint(path: str, cfg: Dict) -> Dict:
    """fairseq code-HiFi-GAN checkpoint -> CodeGenerator variables."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("generator", ckpt.get("model", ckpt))
    return convert_hifigan_state(sd, cfg)


def convert_hifigan_state(sd: Dict, cfg: Dict) -> Dict:
    """Loaded code-HiFi-GAN generator state dict -> CodeGenerator variables."""
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
    return convert_hubert_state(_load_sd(path), layers=layers)


def convert_hubert_ctc_checkpoint(path: str, layers: int = 12) -> Dict:
    """fairseq CTC-fine-tuned checkpoint (hubert_asr.py HubertCtc layout:
    `w2v_encoder.w2v_model.*` backbone + `w2v_encoder.proj`) ->
    HubertCTCModule variables (models/hubert.py)."""
    sd = {k.removeprefix("w2v_encoder."): v
          for k, v in _load_sd(path).items()}
    inner = {k.removeprefix("w2v_model."): v
             for k, v in sd.items() if k.startswith("w2v_model.")}
    enc = convert_hubert_state(inner, layers=layers)
    params = {
        "w2v_model": enc["params"],
        "proj": {"kernel": dense_w(sd["proj.weight"]),
                 "bias": _t(sd["proj.bias"])},
    }
    if "w2v_model.mask_emb" in sd:
        # present when fine-tuning resumes with apply_mask=True
        params["mask_emb"] = _t(sd["w2v_model.mask_emb"])
    return {"params": params}


def convert_hubert_pretrain_state(sd: Dict, layers: int = 12) -> Dict:
    """Full HubertModel pretraining state dict (hubert.py: the encoder
    backbone + mask_emb / final_proj / label_embs_concat) ->
    HubertPretrainModule variables (models/hubert.py)."""
    backbone = {k: v for k, v in sd.items()
                if k not in ("mask_emb", "label_embs_concat")
                and not k.startswith("final_proj.")}
    enc = convert_hubert_state(backbone, layers=layers)
    return {"params": {
        "encoder": enc["params"],
        "mask_emb": _t(sd["mask_emb"]),
        "final_proj": {"kernel": dense_w(sd["final_proj.weight"]),
                       "bias": _t(sd["final_proj.bias"])},
        "label_embs_concat": _t(sd["label_embs_concat"]),
    }}


def convert_wav2vec2_pretrain_state(sd: Dict, layers: int = 12) -> Dict:
    """Full Wav2Vec2Model pretraining state dict (wav2vec2.py: backbone +
    mask_emb / quantizer / project_q / final_proj) ->
    Wav2Vec2PretrainModule variables (models/wav2vec2.py)."""
    heads = ("mask_emb", "quantizer.vars", "quantizer.weight_proj.weight",
             "quantizer.weight_proj.bias", "project_q.weight",
             "project_q.bias", "final_proj.weight", "final_proj.bias")
    backbone = {k: v for k, v in sd.items() if k not in heads}
    enc = convert_hubert_state(backbone, layers=layers)
    return {"params": {
        "encoder": enc["params"],
        "mask_emb": _t(sd["mask_emb"]),
        "quantizer": {
            "vars": _t(sd["quantizer.vars"]),
            "weight_proj": {
                "kernel": dense_w(sd["quantizer.weight_proj.weight"]),
                "bias": _t(sd["quantizer.weight_proj.bias"]),
            },
        },
        "project_q": {"kernel": dense_w(sd["project_q.weight"]),
                      "bias": _t(sd["project_q.bias"])},
        "final_proj": {"kernel": dense_w(sd["final_proj.weight"]),
                       "bias": _t(sd["final_proj.bias"])},
    }}


def convert_wav2vec2_pretrain_checkpoint(path: str, layers: int = 12) -> Dict:
    return convert_wav2vec2_pretrain_state(_load_sd(path), layers=layers)


def convert_hubert_pretrain_checkpoint(path: str, layers: int = 12) -> Dict:
    return convert_hubert_pretrain_state(_load_sd(path), layers=layers)


def _torch_layer_count(sd: Dict) -> int:
    import re

    n = -1
    for k in sd:
        m = re.search(r"encoder\.layers\.(\d+)\.", k)
        if m:
            n = max(n, int(m.group(1)))
    return n + 1


def load_pretrained_encoder(path: str, layers: int = 12):
    """fairseq `--w2v-path` (hubert_asr.py:334-368 HubertEncoder.__init__):
    pull the encoder backbone params (and the learned `mask_emb`, which the
    reference fine-tune reuses for its SpecAugment substitution) out of a
    pretraining checkpoint for fine-tune warm starts. Accepts a torch .pt
    (fairseq HubertModel / Wav2Vec2Model state dict, converted) or an orbax
    checkpoint directory saved by OUR hubert_pretraining /
    audio_pretraining trainer. Returns (encoder_params, mask_emb_or_None).
    """
    import os

    if os.path.isdir(path):
        from diffnorm_tpu.train.checkpoint import (
            load_checkpoint_params,
            restored_to_variables,
        )

        restored = load_checkpoint_params(path)
        variables = restored_to_variables(restored) or restored
        params = variables.get("params", variables)
        if "encoder" not in params:
            raise ValueError(
                f"no 'encoder' subtree in pretraining checkpoint {path}; "
                f"top-level keys: {sorted(params)}")
        return params["encoder"], params.get("mask_emb")

    sd = _load_sd(path)
    ckpt_layers = _torch_layer_count(sd)
    if ckpt_layers and ckpt_layers != layers:
        raise ValueError(
            f"{path} has {ckpt_layers} transformer layers but the "
            f"fine-tune model is configured with encoder_layers={layers}")
    mask_emb = _t(sd["mask_emb"]) if "mask_emb" in sd else None
    if any(k.startswith("quantizer.") for k in sd):
        enc = convert_wav2vec2_pretrain_state(
            sd, layers=layers)["params"]["encoder"]
    elif "label_embs_concat" in sd:
        enc = convert_hubert_pretrain_state(
            sd, layers=layers)["params"]["encoder"]
    else:
        # a bare backbone (extract_features-style) state dict
        enc = convert_hubert_state(sd, layers=layers)["params"]
    return enc, mask_emb


def graft_encoder_params(variables: Dict, encoder_params: Dict,
                         name: str = "w2v_model", mask_emb=None) -> Dict:
    """Replace `variables['params'][name]` with pretrained encoder params,
    asserting the tree shapes line up (loud failure on config mismatch).
    When the model has a top-level `mask_emb` (apply_mask fine-tuning) and
    the checkpoint provides one, it is grafted too (reference semantics:
    hubert_asr reuses the pretrained mask embedding)."""
    import jax

    target = variables["params"].get(name)
    if target is None:
        raise ValueError(
            f"model has no '{name}' subtree; keys: "
            f"{sorted(variables['params'])}")
    t_shapes = jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), target)
    s_shapes = jax.tree_util.tree_map(
        lambda x: tuple(np.shape(x)), encoder_params)
    if t_shapes != s_shapes:
        raise ValueError(
            "pretrained encoder does not match the fine-tune model "
            "(check encoder dims/conv spec/layers/--extractor-mode/"
            f"--conv-bias):\nmodel:  {t_shapes}\nckpt:   {s_shapes}")
    params = dict(variables["params"])
    params[name] = encoder_params
    if mask_emb is not None and "mask_emb" in params:
        if np.shape(params["mask_emb"]) != np.shape(mask_emb):
            raise ValueError(
                f"mask_emb shape mismatch: model "
                f"{np.shape(params['mask_emb'])} vs ckpt {np.shape(mask_emb)}")
        params["mask_emb"] = mask_emb
    return {**variables, "params": params}


def convert_hubert_state(sd: Dict, layers: int = 12) -> Dict:
    sd = {k.removeprefix("encoder."): v for k, v in sd.items()} if all(
        k.startswith("encoder.") for k in sd
    ) else sd

    fe: Dict = {}
    # layer_norm extractor mode (wav2vec2-large/XLSR) stores a LayerNorm
    # inside a TransposeLast sandwich at sequential index .2.1 per layer;
    # default (group-norm) mode has the Fp32GroupNorm at .2 on layer 0 only
    ln_mode = "feature_extractor.conv_layers.0.2.1.weight" in sd
    i = 0
    while f"feature_extractor.conv_layers.{i}.0.weight" in sd:
        conv = {
            "kernel": conv_w(sd[f"feature_extractor.conv_layers.{i}.0.weight"])
        }
        if f"feature_extractor.conv_layers.{i}.0.bias" in sd:
            conv["bias"] = _t(sd[f"feature_extractor.conv_layers.{i}.0.bias"])
        fe[f"conv_{i}"] = conv
        if ln_mode:
            fe[f"ln_{i}"] = {
                "scale": _t(sd[f"feature_extractor.conv_layers.{i}.2.1.weight"]),
                "bias": _t(sd[f"feature_extractor.conv_layers.{i}.2.1.bias"]),
            }
        i += 1
    if not ln_mode:
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


# ------------------------------------------- DiffNorm VAE / latent diffusion

def _conv_tree(sd: Dict, prefix: str) -> Dict:
    out = {"kernel": conv_w(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _linear_tree(sd: Dict, prefix: str) -> Dict:
    out = {"kernel": dense_w(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _wavenet_tree(sd: Dict, prefix: str) -> Dict:
    """torch Wavenet/WavenetEncoder (latent_module.py:585-617/1003-1032)
    under `prefix` -> models/wavenet.py Wavenet param tree."""
    tree: Dict = {
        "init_conv": _conv_tree(sd, f"{prefix}.init_conv"),
        "final_conv": _conv_tree(sd, f"{prefix}.final_conv"),
    }
    s = 0
    while f"{prefix}.stacks.{s}.blocks.0.conv.weight" in sd:
        blocks: Dict = {}
        j = 0
        while f"{prefix}.stacks.{s}.blocks.{j}.conv.weight" in sd:
            bp = f"{prefix}.stacks.{s}.blocks.{j}"
            block = {
                "conv": _conv_tree(sd, f"{bp}.conv"),
                "res_conv": _conv_tree(sd, f"{bp}.res_conv"),
            }
            if f"{bp}.skip_conv.weight" in sd:
                block["skip_conv"] = _conv_tree(sd, f"{bp}.skip_conv")
            if f"{bp}.to_time_cond.weight" in sd:
                block["to_time_cond"] = _linear_tree(sd, f"{bp}.to_time_cond")
            blocks[f"block_{j}"] = block
            j += 1
        tree[f"stack_{s}"] = blocks
        s += 1
    return tree


def _rmsnorm_tree(sd: Dict, prefix: str, cond: bool) -> Dict:
    if cond:
        return {"to_gamma_beta": _linear_tree(sd, f"{prefix}.to_gamma_beta")}
    return {"gamma": _t(sd[f"{prefix}.gamma"])}


def _attention_tree(sd: Dict, prefix: str) -> Dict:
    return {
        "to_q": _linear_tree(sd, f"{prefix}.to_q"),
        "to_kv": _linear_tree(sd, f"{prefix}.to_kv"),
        "to_out": _linear_tree(sd, f"{prefix}.to_out"),
    }


def _ff_tree(sd: Dict, prefix: str) -> Dict:
    """FeedForward (latent_module.py:887-903) is a None-filtered Sequential:
    0 = in-proj Linear, 1 = GEGLU; with the causal conv present it sits at
    2.1 (inside a Rearrange sandwich) and the out proj at 3, else out proj
    is at 2."""
    tree = {"proj_in": _linear_tree(sd, f"{prefix}.0")}
    if f"{prefix}.2.1.weight" in sd:
        tree["conv"] = _conv_tree(sd, f"{prefix}.2.1")
        tree["proj_out"] = _linear_tree(sd, f"{prefix}.3")
    else:
        tree["proj_out"] = _linear_tree(sd, f"{prefix}.2")
    return tree


def _cond_transformer_tree(sd: Dict, prefix: str, cond: bool) -> Dict:
    """ConditionableTransformer (latent_module.py:642-706): per layer the
    torch ModuleList holds [attn-norm, attn, cross-norm|None,
    cross-attn|None, ff-norm, ff] at fixed indices 0..5."""
    tree: Dict = {}
    layer = 0
    while f"{prefix}.layers.{layer}.1.to_q.weight" in sd:
        lp = f"{prefix}.layers.{layer}"
        tree[f"attn_norm_{layer}"] = _rmsnorm_tree(sd, f"{lp}.0", cond)
        tree[f"attn_{layer}"] = _attention_tree(sd, f"{lp}.1")
        if f"{lp}.3.to_q.weight" in sd:
            tree[f"cross_norm_{layer}"] = _rmsnorm_tree(sd, f"{lp}.2", cond)
            tree[f"cross_attn_{layer}"] = _attention_tree(sd, f"{lp}.3")
        tree[f"ff_norm_{layer}"] = _rmsnorm_tree(sd, f"{lp}.4", cond)
        tree[f"ff_{layer}"] = _ff_tree(sd, f"{lp}.5")
        layer += 1
    tree["final_norm"] = {"gamma": _t(sd[f"{prefix}.to_pred.0.gamma"])}
    tree["to_pred"] = {"kernel": dense_w(sd[f"{prefix}.to_pred.1.weight"])}
    return tree


def convert_vae_state(sd: Dict) -> Dict:
    """fairseq `speech_vae_decoder` state dict -> SpeechVAEModule params
    (reference SpeechVAEEncoderDecoder, latent_module.py:1035-1142; the
    model wrapper nests it under `encoder.`)."""
    if any(k.startswith("encoder.encoder_wave.") for k in sd):
        sd = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.")}
    params: Dict = {}
    b = 0
    while f"encoder_wave.{b}.init_conv.weight" in sd:
        params[f"enc_wave_{b}"] = _wavenet_tree(sd, f"encoder_wave.{b}")
        b += 1
    b = 0
    while f"decoder_wave.{b}.init_conv.weight" in sd:
        params[f"dec_wave_{b}"] = _wavenet_tree(sd, f"decoder_wave.{b}")
        b += 1
    params["decoder_tf"] = _cond_transformer_tree(sd, "decoder_tf",
                                                  cond=False)
    params["decoder_lm"] = _linear_tree(sd, "decoder_lm")
    return params


def _perceiver_tree(sd: Dict, prefix: str) -> Dict:
    """PerceiverResampler (latent_module.py:416-471) -> models/diffusion.py
    PerceiverResampler params."""
    tree: Dict = {
        "latents": _t(sd[f"{prefix}.latents"]),
        "proj_context": _linear_tree(sd, f"{prefix}.proj_context"),
        "norm": {"gamma": _t(sd[f"{prefix}.norm.gamma"])},
    }
    layer = 0
    while f"{prefix}.layers.{layer}.0.to_q.weight" in sd:
        tree[f"attn_{layer}"] = _attention_tree(sd, f"{prefix}.layers.{layer}.0")
        tree[f"ff_{layer}"] = _ff_tree(sd, f"{prefix}.layers.{layer}.1")
        layer += 1
    return tree


def convert_denoiser_state(sd: Dict, prefix: str = "model") -> Dict:
    """Denoiser `Model` (latent_module.py:709-876) -> models/diffusion.py
    Denoiser params. `to_time_cond` is a None-filtered Sequential
    (LearnedSinusoidalPosEmb, Linear, SiLU); `init_conv` is a k=1 Conv1d
    which maps to our Dense."""
    params: Dict = {
        "time_emb": {"weights": _t(sd[f"{prefix}.to_time_cond.0.weights"])},
        "time_proj": _linear_tree(sd, f"{prefix}.to_time_cond.1"),
        "init_conv": {
            "kernel": _t(sd[f"{prefix}.init_conv.weight"])[:, :, 0].T,
            "bias": _t(sd[f"{prefix}.init_conv.bias"]),
        },
        "wavenet": _wavenet_tree(sd, f"{prefix}.wavenet"),
        "transformer": _cond_transformer_tree(
            sd, f"{prefix}.transformer", cond=True
        ),
        "final_proj": _linear_tree(sd, f"{prefix}.final_proj"),
    }
    if f"{prefix}.null_prompt_cond" in sd:  # condition_on_prompt=True
        params["null_prompt_cond"] = _t(sd[f"{prefix}.null_prompt_cond"])
        params["null_prompt_tokens"] = _t(sd[f"{prefix}.null_prompt_tokens"])
        params["to_prompt_cond"] = _linear_tree(sd,
                                                f"{prefix}.to_prompt_cond.1")
        params["perceiver_resampler"] = _perceiver_tree(
            sd, f"{prefix}.perceiver_resampler"
        )
    return params


def convert_diffusion_state(sd: Dict) -> Dict:
    """fairseq `diff_discrete` state dict (LatentDiscreteModel under
    `encoder.`: frozen VAE at `speech_decoder.`, denoiser at `model.`,
    diff_discrete.py:71-85) -> LatentDiffusionModule params."""
    if any(k.startswith("encoder.model.") for k in sd):
        sd = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.")}
    vae_sd = {k[len("speech_decoder."):]: v for k, v in sd.items()
              if k.startswith("speech_decoder.")}
    return {
        "denoiser": convert_denoiser_state(sd, "model"),
        "vae": convert_vae_state(vae_sd),
    }


def _load_torch_state(path: str) -> Dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt


def convert_vae_checkpoint(path: str) -> Dict:
    return {"params": convert_vae_state(_load_torch_state(path))}


def convert_diffusion_checkpoint(path: str) -> Dict:
    return {"params": convert_diffusion_state(_load_torch_state(path))}


# ---------------------------------------------------------- NAR S2UT model

def _layernorm_tree(sd: Dict, prefix: str) -> Dict:
    return {"scale": _t(sd[f"{prefix}.weight"]),
            "bias": _t(sd[f"{prefix}.bias"])}


def _mha_tree(sd: Dict, prefix: str) -> Dict:
    """fairseq MultiheadAttention (q/k/v/out_proj with biases)."""
    return {p: _linear_tree(sd, f"{prefix}.{p}")
            for p in ("q_proj", "k_proj", "v_proj", "out_proj")}


def _conformer_layer_trees(sd: Dict, prefix: str):
    """fairseq ConformerEncoderLayer (modules/conformer_layer.py:133-286)
    -> (params, batch_stats) for models/conformer.py ConformerLayer.
    Conv-module convolutions carry no bias (conformer_layer.py:29 default);
    the rel-pos ESPNET attention adds linear_pos (no bias) and the
    pos_bias_u/v head biases."""
    def ffn(p):
        return {
            "layer_norm": _layernorm_tree(sd, f"{p}.layer_norm"),
            "w_1": _linear_tree(sd, f"{p}.w_1"),
            "w_2": _linear_tree(sd, f"{p}.w_2"),
        }

    attn = {
        "linear_q": _linear_tree(sd, f"{prefix}.self_attn.linear_q"),
        "linear_k": _linear_tree(sd, f"{prefix}.self_attn.linear_k"),
        "linear_v": _linear_tree(sd, f"{prefix}.self_attn.linear_v"),
        "linear_out": _linear_tree(sd, f"{prefix}.self_attn.linear_out"),
        "linear_pos": _linear_tree(sd, f"{prefix}.self_attn.linear_pos"),
        "pos_bias_u": _t(sd[f"{prefix}.self_attn.pos_bias_u"]),
        "pos_bias_v": _t(sd[f"{prefix}.self_attn.pos_bias_v"]),
    }
    conv = {
        "layer_norm": _layernorm_tree(sd, f"{prefix}.conv_module.layer_norm"),
        "pointwise_conv1": {
            "kernel": conv_w(sd[f"{prefix}.conv_module.pointwise_conv1.weight"])
        },
        "depthwise_conv": {
            "kernel": conv_w(sd[f"{prefix}.conv_module.depthwise_conv.weight"])
        },
        "batch_norm": {
            "scale": _t(sd[f"{prefix}.conv_module.batch_norm.weight"]),
            "bias": _t(sd[f"{prefix}.conv_module.batch_norm.bias"]),
        },
        "pointwise_conv2": {
            "kernel": conv_w(sd[f"{prefix}.conv_module.pointwise_conv2.weight"])
        },
    }
    params = {
        "ffn1": ffn(f"{prefix}.ffn1"),
        "self_attn_layer_norm": _layernorm_tree(
            sd, f"{prefix}.self_attn_layer_norm"),
        "self_attn": attn,
        "conv_module": conv,
        "ffn2": ffn(f"{prefix}.ffn2"),
        "final_layer_norm": _layernorm_tree(sd, f"{prefix}.final_layer_norm"),
    }
    stats = {
        "conv_module": {
            "batch_norm": {
                "mean": _t(sd[f"{prefix}.conv_module.batch_norm.running_mean"]),
                "var": _t(sd[f"{prefix}.conv_module.batch_norm.running_var"]),
            }
        }
    }
    return params, stats


def convert_nar_state(sd: Dict) -> Dict:
    """fairseq `nar_s2ut_conformer` state dict (research/TranSpeech/
    nar_conformer.py S2SConformerEncoder + nar_transformer.py
    TransformerUnitDecoder) -> NARS2UTModule variables
    ({"params", "batch_stats"})."""
    enc: Dict = {"subsample": {}}
    i = 0
    while f"encoder.subsample.conv_layers.{i}.weight" in sd:
        enc["subsample"][f"conv_{i}"] = {
            "kernel": conv_w(sd[f"encoder.subsample.conv_layers.{i}.weight"]),
            "bias": _t(sd[f"encoder.subsample.conv_layers.{i}.bias"]),
        }
        i += 1
    enc["linear"] = _linear_tree(sd, "encoder.linear")
    stats: Dict = {}
    i = 0
    while f"encoder.conformer_layers.{i}.ffn1.w_1.weight" in sd:
        p, s = _conformer_layer_trees(sd, f"encoder.conformer_layers.{i}")
        enc[f"layer_{i}"] = p
        stats[f"layer_{i}"] = s
        i += 1

    dec: Dict = {}
    if "decoder.embed_tokens.project_in_dim.weight" in sd:  # stacked units
        dec["embed_tokens"] = {
            "embed": {"embedding": _t(sd["decoder.embed_tokens.weight"])},
            "project_in_dim": _linear_tree(
                sd, "decoder.embed_tokens.project_in_dim"),
        }
    else:
        dec["embed_tokens"] = {
            "embedding": _t(sd["decoder.embed_tokens.weight"])
        }
    dec["embed_length"] = {"embedding": _t(sd["decoder.embed_length.weight"])}
    i = 0
    while f"decoder.layers.{i}.self_attn.q_proj.weight" in sd:
        p = f"decoder.layers.{i}"
        dec[f"layer_{i}"] = {
            "self_attn": _mha_tree(sd, f"{p}.self_attn"),
            "self_attn_layer_norm": _layernorm_tree(
                sd, f"{p}.self_attn_layer_norm"),
            "encoder_attn": _mha_tree(sd, f"{p}.encoder_attn"),
            "encoder_attn_layer_norm": _layernorm_tree(
                sd, f"{p}.encoder_attn_layer_norm"),
            "fc1": _linear_tree(sd, f"{p}.fc1"),
            "fc2": _linear_tree(sd, f"{p}.fc2"),
            "final_layer_norm": _layernorm_tree(sd, f"{p}.final_layer_norm"),
        }
        i += 1
    if "decoder.layer_norm.weight" in sd:
        dec["layer_norm"] = _layernorm_tree(sd, "decoder.layer_norm")
    # with --share-decoder-input-output-embed (the released recipe,
    # scripts/s2ut/train.sh) output_projection.weight is an alias of
    # embed_tokens.weight and our module reuses the embedding directly
    out_w = _t(sd["decoder.output_projection.weight"])
    if not np.array_equal(out_w, _t(sd["decoder.embed_tokens.weight"])):
        dec["output_proj"] = {"kernel": out_w.T}
    if "decoder.out_proj_n_frames.weight" in sd:
        dec["out_proj_n_frames"] = {
            "kernel": dense_w(sd["decoder.out_proj_n_frames.weight"])
        }
        # the reference applies output_projection per sub-frame after the
        # n-frames expansion (nar_transformer.py:171-172,218-219); our
        # separate subframe head shares those weights
        dec["subframe_out"] = {
            "kernel": dense_w(sd["decoder.output_projection.weight"])
        }

    return {"params": {"encoder": enc, "decoder": dec},
            "batch_stats": {"encoder": stats}}


def convert_nar_checkpoint(path: str) -> Dict:
    return convert_nar_state(_load_torch_state(path))


# -------------------------------------------- GAN discriminators (MPD/MSD)

def _fold_spectral_norm(orig, u, v) -> np.ndarray:
    """Effective eval-mode weight of torch spectral_norm: W / sigma with
    sigma = u^T W_mat v (stored power-iteration vectors; torch
    SpectralNorm.compute_weight with do_power_iteration=False)."""
    orig, u, v = _t(orig), _t(u), _t(v)
    w_mat = orig.reshape(orig.shape[0], -1)
    sigma = float(u @ (w_mat @ v))
    return orig / sigma


def _disc_conv(sd: Dict, prefix: str) -> np.ndarray:
    if f"{prefix}.weight_g" in sd:
        return fold_weight_norm(sd[f"{prefix}.weight_g"],
                                sd[f"{prefix}.weight_v"])
    if f"{prefix}.weight_orig" in sd:
        return _fold_spectral_norm(sd[f"{prefix}.weight_orig"],
                                   sd[f"{prefix}.weight_u"],
                                   sd[f"{prefix}.weight_v"])
    return _t(sd[f"{prefix}.weight"])


def convert_gan_discriminators(mpd_sd: Dict, msd_sd: Dict,
                               periods=(2, 3, 5, 7, 11),
                               scales: int = 3) -> Dict:
    """TranSpeech hifigan MultiPeriod/MultiScale discriminator state dicts
    (research/TranSpeech/hifigan/models.py:128-249; weight_norm folded,
    spectral_norm on the first MSD scale folded at eval semantics) ->
    {"mpd": ..., "msd": ...} variables for models/hifigan_disc.py.
    Enables resuming a vocoder fine-tune from a torch `do_*` checkpoint."""
    mpd: Dict = {}
    for i, p in enumerate(periods):
        d: Dict = {}
        for j in range(5):
            pre = f"discriminators.{i}.convs.{j}"
            d[f"conv_{j}"] = {
                # Conv2d [out, in, kh, kw] -> flax [kh, kw, in, out]
                "kernel": _disc_conv(mpd_sd, pre).transpose(2, 3, 1, 0),
                "bias": _t(mpd_sd[f"{pre}.bias"]),
            }
        pre = f"discriminators.{i}.conv_post"
        d["conv_post"] = {
            "kernel": _disc_conv(mpd_sd, pre).transpose(2, 3, 1, 0),
            "bias": _t(mpd_sd[f"{pre}.bias"]),
        }
        mpd[f"period_{p}"] = d

    msd: Dict = {}
    for s in range(scales):
        d = {}
        for j in range(7):
            pre = f"discriminators.{s}.convs.{j}"
            d[f"conv_{j}"] = {
                # Conv1d [out, in, k] -> flax [k, in, out]
                "kernel": _disc_conv(msd_sd, pre).transpose(2, 1, 0),
                "bias": _t(msd_sd[f"{pre}.bias"]),
            }
        pre = f"discriminators.{s}.conv_post"
        d["conv_post"] = {
            "kernel": _disc_conv(msd_sd, pre).transpose(2, 1, 0),
            "bias": _t(msd_sd[f"{pre}.bias"]),
        }
        msd[f"scale_{s}"] = d
    return {"mpd": {"params": mpd}, "msd": {"params": msd}}


def convert_s2t_encoder_state(sd: Dict, layers: int) -> Dict:
    """fairseq S2TTransformerEncoder state dict (s2t_transformer.py:295-376,
    keys under `encoder.` or bare) -> models/s2t_transformer.py
    S2TTransformerEncoder param tree."""
    if any(k.startswith("encoder.") for k in sd):
        sd = {k.removeprefix("encoder."): v for k, v in sd.items()
              if k.startswith("encoder.")}
    params: Dict = {"subsample": {}}
    i = 0
    while f"subsample.conv_layers.{i}.weight" in sd:
        params["subsample"][f"conv_{i}"] = {
            "kernel": conv_w(sd[f"subsample.conv_layers.{i}.weight"]),
            "bias": _t(sd[f"subsample.conv_layers.{i}.bias"]),
        }
        i += 1
    for n in range(layers):
        p = f"transformer_layers.{n}"
        params[f"layer_{n}"] = {
            "self_attn": {
                "q_proj": _linear_tree(sd, f"{p}.self_attn.q_proj"),
                "k_proj": _linear_tree(sd, f"{p}.self_attn.k_proj"),
                "v_proj": _linear_tree(sd, f"{p}.self_attn.v_proj"),
                "out_proj": _linear_tree(sd, f"{p}.self_attn.out_proj"),
            },
            "self_attn_layer_norm": {
                "scale": _t(sd[f"{p}.self_attn_layer_norm.weight"]),
                "bias": _t(sd[f"{p}.self_attn_layer_norm.bias"]),
            },
            "fc1": _linear_tree(sd, f"{p}.fc1"),
            "fc2": _linear_tree(sd, f"{p}.fc2"),
            "final_layer_norm": {
                "scale": _t(sd[f"{p}.final_layer_norm.weight"]),
                "bias": _t(sd[f"{p}.final_layer_norm.bias"]),
            },
        }
    params["layer_norm"] = {
        "scale": _t(sd["layer_norm.weight"]),
        "bias": _t(sd["layer_norm.bias"]),
    }
    return {"params": params}


# ------------------------------------------------------- key inventory -----

#: torch buffers carrying no learned weights (fairseq save paths emit them)
_BUFFER_SUFFIXES = (
    ".version", "._float_tensor", ".num_batches_tracked",
)


def _numel(x) -> int:
    return int(np.prod(np.asarray(x).shape)) if np.asarray(x).shape else 1


def conversion_inventory(sd: Dict, converted, expected_unconsumed=()):
    """Audit a conversion against the source state dict's key inventory.

    Released fairseq checkpoints carry key quirks the synthetic-state-dict
    tests never see; this makes `convert_checkpoint` trustworthy without
    the assets: every learned element of `sd` must land in the converted
    tree. Accounting rules:

      * buffers (`.version`, sinusoidal `._float_tensor`, batch-norm
        `num_batches_tracked`) carry no weights — ignored
      * weight-norm pairs fold `weight_g` into the kernel — `weight_g`
        auxiliary, `weight_v` counts as the kernel
      * spectral-norm triplets (`weight_orig`/`weight_u`/`weight_v`) fold
        to one kernel — `_u`/`_v` auxiliary
      * a `*.output_projection.weight` bit-equal to the embedding table is
        the shared in/out embedding — one tree leaf covers both keys
      * `expected_unconsumed`: the family's documented pretrain-only heads
        (e.g. hubert `label_embs_concat`/`final_proj` for the inference
        encoder converter)

    Raises ValueError naming the unaccounted keys when the element counts
    do not balance — the loud failure released-checkpoint quirks need.
    Returns (consumed_elements, tree_elements).
    """
    import jax

    bn_stats = (".running_mean", ".running_var")
    embed_tables = {k: np.asarray(v) for k, v in sd.items()
                    if k.endswith("embed_tokens.weight")}
    consumed = 0
    counted_keys = []
    for k, v in sd.items():
        if k.endswith(_BUFFER_SUFFIXES):
            continue
        if any(k == e or k.startswith(e) for e in expected_unconsumed):
            continue
        base = k.rsplit(".", 1)[0]
        if k.endswith(".weight_g") and f"{base}.weight_v" in sd:
            continue  # weight-norm magnitude, folded
        if (k.endswith((".weight_u", ".weight_v"))
                and f"{base}.weight_orig" in sd):
            continue  # spectral-norm power-iteration vectors, folded
        if k.endswith("output_projection.weight"):
            shared = any(v.shape == t.shape and np.array_equal(
                np.asarray(v), t) for t in embed_tables.values())
            if shared:
                continue
        consumed += _numel(v)
        counted_keys.append(k)
    tree_elems = sum(
        _numel(leaf) for leaf in jax.tree_util.tree_leaves(converted))
    if consumed != tree_elems:
        diff = consumed - tree_elems
        sizes = [(k, _numel(sd[k])) for k in counted_keys]
        exact = [f"{k} ({n})" for k, n in sizes if n == abs(diff)]
        close = [f"{k} ({n})" for k, n in sorted(sizes, key=lambda kv: -kv[1])
                 if n < abs(diff)]
        suspects = (exact + close)[:20]
        raise ValueError(
            f"conversion inventory mismatch: source carries {consumed} "
            f"learned elements but the converted tree has {tree_elems} "
            f"(difference {diff}). Unaccounted checkpoint keys are likely "
            f"among: {suspects or '(none <= diff — shape mismatch?)'} — "
            "either the converter must consume them or they belong in "
            "expected_unconsumed with a documented reason."
        )
    return consumed, tree_elems


#: per-family pretrain-only / aux heads the inference converters
#: deliberately leave behind (cli/convert_checkpoint audits with these)
EXPECTED_UNCONSUMED = {
    # inference encoder drops the masked-prediction head + target embs
    "hubert": ("label_embs_concat", "final_proj.", "mask_emb"),
    # ctc fine-tune keeps the backbone; the pretrain heads inside it stay
    # behind (mask_emb IS consumed when present — apply_mask resumes)
    "hubert_ctc": ("w2v_encoder.w2v_model.label_embs_concat",
                   "w2v_encoder.w2v_model.final_proj."),
    "vae": (),
    "diffusion": (),
    "nar": (),
    "hifigan": (),
    "gan_discriminators": (),
}
