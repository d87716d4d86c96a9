"""NAR S2UT checkpoint conversion: a synthetic fairseq-style state dict
(authentic key layout of S2SConformerEncoder + TransformerUnitDecoder) is
converted and checked structurally against a fresh module init, the
conformer ConvolutionModule is forward-parity tested against a from-scratch
torch implementation, and the converted variables drive a real encode."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffnorm_tpu.config import Config  # noqa: E402
from diffnorm_tpu.models.conformer import ConvModule  # noqa: E402
from diffnorm_tpu.registry import TASKS  # noqa: E402
from diffnorm_tpu.utils.convert_weights import convert_nar_state  # noqa: E402

DIM, FFN, HEADS, VOCAB, FEAT, K = 32, 64, 2, 24, 80, 7
LAYERS = 2


class _SD(dict):
    """State-dict builder with deterministic distinct values."""

    def __init__(self):
        super().__init__()
        self.rng = np.random.default_rng(0)

    def add(self, key, *shape):
        self[key] = torch.from_numpy(
            self.rng.normal(scale=0.05, size=shape).astype(np.float32)
        )

    def ln(self, prefix, dim=DIM):
        self.add(f"{prefix}.weight", dim)
        self.add(f"{prefix}.bias", dim)

    def lin(self, prefix, out, inp, bias=True):
        self.add(f"{prefix}.weight", out, inp)
        if bias:
            self.add(f"{prefix}.bias", out)


def make_fairseq_sd():
    sd = _SD()
    # --- encoder (S2TConformerEncoder) ---
    sd.add("encoder.subsample.conv_layers.0.weight", DIM, FEAT, 5)
    sd.add("encoder.subsample.conv_layers.0.bias", DIM)
    sd.add("encoder.subsample.conv_layers.1.weight", 2 * DIM, DIM // 2, 5)
    sd.add("encoder.subsample.conv_layers.1.bias", 2 * DIM)
    sd.lin("encoder.linear", DIM, DIM)
    for i in range(LAYERS):
        p = f"encoder.conformer_layers.{i}"
        for ffn in ("ffn1", "ffn2"):
            sd.ln(f"{p}.{ffn}.layer_norm")
            sd.lin(f"{p}.{ffn}.w_1", FFN, DIM)
            sd.lin(f"{p}.{ffn}.w_2", DIM, FFN)
        sd.ln(f"{p}.self_attn_layer_norm")
        for q in ("linear_q", "linear_k", "linear_v", "linear_out"):
            sd.lin(f"{p}.self_attn.{q}", DIM, DIM)
        sd.lin(f"{p}.self_attn.linear_pos", DIM, DIM, bias=False)
        sd.add(f"{p}.self_attn.pos_bias_u", HEADS, DIM // HEADS)
        sd.add(f"{p}.self_attn.pos_bias_v", HEADS, DIM // HEADS)
        sd.ln(f"{p}.conv_module.layer_norm")
        sd.add(f"{p}.conv_module.pointwise_conv1.weight", 2 * DIM, DIM, 1)
        sd.add(f"{p}.conv_module.depthwise_conv.weight", DIM, 1, K)
        sd.ln(f"{p}.conv_module.batch_norm")
        sd.add(f"{p}.conv_module.batch_norm.running_mean", DIM)
        self_var = np.abs(
            sd.rng.normal(scale=0.05, size=(DIM,)).astype(np.float32)) + 1.0
        sd[f"{p}.conv_module.batch_norm.running_var"] = torch.from_numpy(
            self_var)
        sd.add(f"{p}.conv_module.pointwise_conv2.weight", DIM, DIM, 1)
        sd.ln(f"{p}.final_layer_norm")
    # --- decoder (TransformerUnitDecoder) ---
    sd.add("decoder.embed_tokens.weight", VOCAB, DIM)
    sd.add("decoder.embed_length.weight", 256, DIM)
    for i in range(LAYERS):
        p = f"decoder.layers.{i}"
        for attn in ("self_attn", "encoder_attn"):
            for q in ("q_proj", "k_proj", "v_proj", "out_proj"):
                sd.lin(f"{p}.{attn}.{q}", DIM, DIM)
            sd.ln(f"{p}.{attn}_layer_norm")
        sd.lin(f"{p}.fc1", FFN, DIM)
        sd.lin(f"{p}.fc2", DIM, FFN)
        sd.ln(f"{p}.final_layer_norm")
    sd.ln("decoder.layer_norm")
    # --share-decoder-input-output-embed (scripts/s2ut/train.sh): the output
    # projection is an alias of the embedding table
    sd["decoder.output_projection.weight"] = sd["decoder.embed_tokens.weight"]
    return sd


def tiny_cfg():
    return Config(
        arch="nar_s2ut_conformer", criterion="nar_speech_to_unit",
        encoder_layers=LAYERS, decoder_layers=LAYERS,
        encoder_embed_dim=DIM, encoder_ffn_embed_dim=FFN,
        encoder_attention_heads=HEADS, decoder_attention_heads=HEADS,
        decoder_embed_dim=DIM, decoder_ffn_embed_dim=FFN,
        conv_channels=DIM, depthwise_conv_kernel_size=K,
        target_code_size=VOCAB - 4, label_smoothing=0.2, lr=5e-4,
    )


def tree_shapes(t):
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a).shape, t)


def test_nar_conversion_structure_and_encode():
    sd = make_fairseq_sd()
    variables = convert_nar_state(sd)

    task = TASKS.get("dummy_nar").setup_task(tiny_cfg())
    model = task.build_model()
    batch = task.dummy_batch(2, 48)
    ref_vars = task.init_variables(model, jax.random.PRNGKey(0), batch)
    ref_vars = {k: v for k, v in ref_vars.items()}  # unfreeze view

    assert tree_shapes(ref_vars["params"]) == tree_shapes(variables["params"])
    if "batch_stats" in ref_vars:
        assert tree_shapes(ref_vars["batch_stats"]) == tree_shapes(
            variables["batch_stats"])

    # transpose spot checks
    np.testing.assert_array_equal(
        variables["params"]["decoder"]["layer_0"]["fc1"]["kernel"],
        sd["decoder.layers.0.fc1.weight"].numpy().T,
    )
    assert variables["params"]["encoder"]["layer_0"]["conv_module"][
        "depthwise_conv"]["kernel"].shape == (K, 1, DIM)
    # shared output projection: no separate output_proj tree, but a
    # non-aliased checkpoint must produce one
    assert "output_proj" not in variables["params"]["decoder"]
    sd2 = make_fairseq_sd()
    sd2.add("decoder.output_projection.weight", VOCAB, DIM)
    v2 = convert_nar_state(sd2)
    np.testing.assert_array_equal(
        v2["params"]["decoder"]["output_proj"]["kernel"],
        sd2["decoder.output_projection.weight"].numpy().T,
    )

    # the converted variables must drive a real encode + length prediction
    enc, enc_mask = model.module.apply(
        variables, jnp.asarray(batch["src_tokens"]),
        jnp.asarray(batch["src_lengths"]), method="encode",
    )
    assert enc.shape[-1] == DIM and enc_mask.dtype == bool
    assert np.all(np.isfinite(np.asarray(enc)))


def test_conv_module_forward_matches_torch():
    """ConvolutionModule (conformer_layer.py:19-106) numerics through the
    converted layout, eval mode (running batch-norm stats)."""
    sd = make_fairseq_sd()
    variables = convert_nar_state(sd)
    p = "encoder.conformer_layers.0.conv_module"

    class TConvModule(tnn.Module):
        def __init__(self):
            super().__init__()
            self.layer_norm = tnn.LayerNorm(DIM)
            self.pointwise_conv1 = tnn.Conv1d(DIM, 2 * DIM, 1, bias=False)
            self.depthwise_conv = tnn.Conv1d(
                DIM, DIM, K, padding=(K - 1) // 2, groups=DIM, bias=False)
            self.batch_norm = tnn.BatchNorm1d(DIM)
            self.pointwise_conv2 = tnn.Conv1d(DIM, DIM, 1, bias=False)

        def forward(self, x):  # x: [B, T, C]
            x = self.layer_norm(x).transpose(1, 2)
            x = F.glu(self.pointwise_conv1(x), dim=1)
            x = self.batch_norm(self.depthwise_conv(x))
            x = F.silu(x)
            return self.pointwise_conv2(x).transpose(1, 2)

    tmod = TConvModule()
    tsd = {k[len(p) + 1:]: v for k, v in sd.items() if k.startswith(p)}
    tmod.load_state_dict(tsd, strict=False)
    tmod.batch_norm.running_mean.copy_(sd[f"{p}.batch_norm.running_mean"])
    tmod.batch_norm.running_var.copy_(sd[f"{p}.batch_norm.running_var"])
    tmod.eval()

    x = np.random.default_rng(3).normal(size=(2, 9, DIM)).astype(np.float32)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x)).numpy()

    enc = variables["params"]["encoder"]["layer_0"]["conv_module"]
    stats = variables["batch_stats"]["encoder"]["layer_0"]["conv_module"]
    module = ConvModule(dim=DIM, kernel_size=K, dropout=0.0)
    out = module.apply(
        {"params": enc, "batch_stats": stats}, jnp.asarray(x),
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
