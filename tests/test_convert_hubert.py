"""mHuBERT weight-conversion parity: a randomly-initialized torch state
dict in the fairseq HubertModel layout is converted with
utils/convert_weights.convert_hubert_checkpoint and the flax forward must
match a from-scratch torch implementation of the same architecture
(wav2vec2-base conv extractor + post-norm transformer) to float32 noise.
"""

import math

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from diffnorm_tpu.models.hubert import HubertEncoder
from diffnorm_tpu.utils.convert_weights import convert_hubert_checkpoint

CONV_LAYERS = ((512, 10, 5),) + ((512, 3, 2),) * 4 + ((512, 2, 2),) * 2
DIM, HEADS, FFN, LAYERS = 768, 12, 3072, 2


def _make_state_dict(gen):
    def t(*shape, scale=0.05):
        return torch.from_numpy(
            gen.normal(scale=scale, size=shape).astype(np.float32)
        )

    sd = {}
    cin = 1
    for i, (c, k, _) in enumerate(CONV_LAYERS):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = t(c, cin, k)
        cin = c
    sd["feature_extractor.conv_layers.0.2.weight"] = t(512) + 1.0
    sd["feature_extractor.conv_layers.0.2.bias"] = t(512)
    sd["layer_norm.weight"] = t(512) + 1.0
    sd["layer_norm.bias"] = t(512)
    sd["post_extract_proj.weight"] = t(DIM, 512)
    sd["post_extract_proj.bias"] = t(DIM)
    # weight-normalized grouped positional conv (dim=2 norm, torch semantics)
    sd["encoder.pos_conv.0.weight_g"] = t(DIM, 1, 1) + 1.0
    sd["encoder.pos_conv.0.weight_v"] = t(DIM, 48, 128)
    sd["encoder.pos_conv.0.bias"] = t(DIM)
    sd["encoder.layer_norm.weight"] = t(DIM) + 1.0
    sd["encoder.layer_norm.bias"] = t(DIM)
    for n in range(LAYERS):
        p = f"encoder.layers.{n}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{p}.self_attn.{proj}.weight"] = t(DIM, DIM)
            sd[f"{p}.self_attn.{proj}.bias"] = t(DIM)
        sd[f"{p}.self_attn_layer_norm.weight"] = t(DIM) + 1.0
        sd[f"{p}.self_attn_layer_norm.bias"] = t(DIM)
        sd[f"{p}.fc1.weight"] = t(FFN, DIM)
        sd[f"{p}.fc1.bias"] = t(FFN)
        sd[f"{p}.fc2.weight"] = t(DIM, FFN)
        sd[f"{p}.fc2.bias"] = t(DIM)
        sd[f"{p}.final_layer_norm.weight"] = t(DIM) + 1.0
        sd[f"{p}.final_layer_norm.bias"] = t(DIM)
    return sd


def _torch_forward(sd, wav):
    """HubertModel.extract_features math in raw torch ops (fairseq
    hubert.py behavioral reference; no fairseq code involved)."""
    import torch.nn.functional as F

    x = torch.from_numpy(wav).unsqueeze(1)  # [B, 1, T]
    for i, (_, k, s) in enumerate(CONV_LAYERS):
        x = F.conv1d(x, sd[f"feature_extractor.conv_layers.{i}.0.weight"],
                     stride=s)
        if i == 0:
            x = F.group_norm(
                x, 512, sd["feature_extractor.conv_layers.0.2.weight"],
                sd["feature_extractor.conv_layers.0.2.bias"], eps=1e-5,
            )
        x = F.gelu(x)
    x = x.transpose(1, 2)  # [B, T', 512]
    x = F.layer_norm(x, (512,), sd["layer_norm.weight"],
                     sd["layer_norm.bias"])
    x = F.linear(x, sd["post_extract_proj.weight"],
                 sd["post_extract_proj.bias"])

    g, v = sd["encoder.pos_conv.0.weight_g"], sd["encoder.pos_conv.0.weight_v"]
    w = g * v / v.norm(dim=(0, 1), keepdim=True).clamp_min(1e-12)
    pos = F.conv1d(x.transpose(1, 2), w, sd["encoder.pos_conv.0.bias"],
                   padding=64, groups=16)
    pos = F.gelu(pos[:, :, :-1]).transpose(1, 2)  # even kernel: drop last
    x = x + pos
    x = F.layer_norm(x, (DIM,), sd["encoder.layer_norm.weight"],
                     sd["encoder.layer_norm.bias"])

    b, t, _ = x.shape
    d = DIM // HEADS
    for n in range(LAYERS):
        p = f"encoder.layers.{n}"
        q = F.linear(x, sd[f"{p}.self_attn.q_proj.weight"],
                     sd[f"{p}.self_attn.q_proj.bias"])
        k = F.linear(x, sd[f"{p}.self_attn.k_proj.weight"],
                     sd[f"{p}.self_attn.k_proj.bias"])
        val = F.linear(x, sd[f"{p}.self_attn.v_proj.weight"],
                       sd[f"{p}.self_attn.v_proj.bias"])

        def heads_of(z):
            return z.reshape(b, t, HEADS, d).permute(0, 2, 1, 3)

        attn = torch.softmax(
            heads_of(q) @ heads_of(k).transpose(-1, -2) / math.sqrt(d), -1
        ) @ heads_of(val)
        attn = attn.permute(0, 2, 1, 3).reshape(b, t, DIM)
        attn = F.linear(attn, sd[f"{p}.self_attn.out_proj.weight"],
                        sd[f"{p}.self_attn.out_proj.bias"])
        x = F.layer_norm(x + attn, (DIM,), sd[f"{p}.self_attn_layer_norm.weight"],
                         sd[f"{p}.self_attn_layer_norm.bias"])
        h = F.gelu(F.linear(x, sd[f"{p}.fc1.weight"], sd[f"{p}.fc1.bias"]))
        h = F.linear(h, sd[f"{p}.fc2.weight"], sd[f"{p}.fc2.bias"])
        x = F.layer_norm(x + h, (DIM,), sd[f"{p}.final_layer_norm.weight"],
                         sd[f"{p}.final_layer_norm.bias"])
    return x.numpy()


def test_hubert_conversion_matches_torch(tmp_path):
    gen = np.random.default_rng(0)
    sd = _make_state_dict(gen)
    path = tmp_path / "hubert.pt"
    torch.save({"model": sd}, path)

    wav = gen.normal(scale=0.1, size=(2, 3200)).astype(np.float32)
    with torch.no_grad():
        ref = _torch_forward(sd, wav)

    variables = convert_hubert_checkpoint(str(path), layers=LAYERS)
    model = HubertEncoder(layers=LAYERS)
    out = np.asarray(model.apply(
        jax.tree_util.tree_map(np.asarray, variables), wav
    ))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_hubert_ctc_conversion_matches_torch(tmp_path):
    """hubert_asr-layout CTC checkpoint (w2v_encoder.w2v_model.* backbone +
    w2v_encoder.proj) -> HubertCTCModule: frame logits must match the torch
    forward + linear head."""
    from diffnorm_tpu.models.hubert import HubertCTCModule
    from diffnorm_tpu.utils.convert_weights import (
        convert_hubert_ctc_checkpoint,
    )

    gen = np.random.default_rng(1)
    sd = _make_state_dict(gen)
    vocab = 7
    proj_w = gen.normal(scale=0.05, size=(vocab, 768)).astype(np.float32)
    proj_b = gen.normal(scale=0.05, size=(vocab,)).astype(np.float32)
    ctc_sd = {f"w2v_encoder.w2v_model.{k}": v for k, v in sd.items()}
    ctc_sd["w2v_encoder.proj.weight"] = torch.from_numpy(proj_w)
    ctc_sd["w2v_encoder.proj.bias"] = torch.from_numpy(proj_b)
    path = tmp_path / "hubert_ctc.pt"
    torch.save({"model": ctc_sd}, path)

    wav = gen.normal(scale=0.1, size=(2, 3200)).astype(np.float32)
    with torch.no_grad():
        feats = _torch_forward(sd, wav)
        ref = feats @ proj_w.T + proj_b

    variables = convert_hubert_ctc_checkpoint(str(path), layers=LAYERS)
    model = HubertCTCModule(vocab_size=vocab, layers=LAYERS)
    out = model.apply(
        jax.tree_util.tree_map(np.asarray, variables), wav,
        np.asarray([3200, 3200], np.int32), deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(out["logits"]), ref,
                               atol=2e-4, rtol=2e-4)
