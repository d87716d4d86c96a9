"""AR S2UT: teacher-forced training, KV-cache consistency, beam search with
ngram blocking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnorm_tpu.config import Config
from diffnorm_tpu.generate.beam_search import (
    ar_generate,
    beam_search,
    ngram_blocking_mask,
)
from diffnorm_tpu.models.ar_transformer import ARS2UTModule
from diffnorm_tpu.registry import TASKS
from diffnorm_tpu.tasks.ar_s2ut_task import shift_right

PAD, BOS, EOS, UNK = 1, 0, 2, 3


def tiny_cfg(**kw):
    cfg = Config(
        arch="s2ut_conformer", criterion="label_smoothed_cross_entropy",
        encoder_layers=1, decoder_layers=2, encoder_embed_dim=32,
        encoder_ffn_embed_dim=64, encoder_attention_heads=2,
        decoder_attention_heads=2, decoder_embed_dim=32,
        decoder_ffn_embed_dim=64, conv_channels=32,
        depthwise_conv_kernel_size=7, target_code_size=20,
        label_smoothing=0.1, lr=5e-4,
    )
    cfg.update(**kw)
    return cfg


@pytest.fixture(scope="module")
def built():
    cfg = tiny_cfg()
    task = TASKS.get("dummy_ar").setup_task(cfg)
    model = task.build_model()
    crit = task.build_criterion()
    batch = task.dummy_batch(2, 48)
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    return task, model, crit, batch, variables


def test_shift_right():
    tgt = np.array([[10, 11, EOS, PAD]], np.int32)
    prev = shift_right(tgt)
    np.testing.assert_array_equal(prev, [[EOS, 10, 11, PAD]])


def test_ar_training_forward(built):
    task, model, crit, batch, variables = built
    loss, mets, mutated = crit(model, variables, batch, jax.random.PRNGKey(1),
                               train=True)
    assert np.isfinite(float(loss))


def test_causal_decoder_is_causal(built):
    """Changing a future target token must not affect earlier logits."""
    task, model, crit, batch, variables = built
    out1 = model.apply(
        variables, batch["src_tokens"], batch["src_lengths"],
        batch["prev_output_tokens"], deterministic=True,
    )["logits"]
    prev2 = batch["prev_output_tokens"].copy()
    prev2[:, -1] = 7
    out2 = model.apply(
        variables, batch["src_tokens"], batch["src_lengths"], prev2,
        deterministic=True,
    )["logits"]
    np.testing.assert_allclose(
        np.asarray(out1[:, :-1]), np.asarray(out2[:, :-1]), rtol=1e-4, atol=1e-5
    )


def test_kv_cache_matches_full_forward(built):
    """Step-by-step cached decoding must reproduce the full forward logits."""
    task, model, crit, batch, variables = built
    module = model.module
    prev = batch["prev_output_tokens"][:, :6]
    enc, enc_mask = module.apply(
        variables, batch["src_tokens"], batch["src_lengths"],
        method=ARS2UTModule.encode,
    )
    full = module.apply(
        variables, batch["src_tokens"], batch["src_lengths"], prev,
        deterministic=True,
    )["logits"]

    cache = None
    step_logits = []
    for t in range(prev.shape[1]):
        vars_in = dict(variables)
        if cache is not None:
            vars_in["cache"] = cache
        logits, mutated = module.apply(
            vars_in, jnp.asarray(prev[:, t:t + 1]), enc, enc_mask,
            jnp.full((prev.shape[0],), t), 16,
            method=ARS2UTModule.decode_step, mutable=["cache"],
        )
        cache = mutated["cache"]
        step_logits.append(np.asarray(logits))
    stepped = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(stepped, np.asarray(full), rtol=2e-3, atol=2e-4)


def test_ngram_blocking():
    # sequence 5 6 5 -> suffix (5,) with ngram=2 bans 6
    seqs = jnp.asarray([[5, 6, 5, 0, 0, 0]], jnp.int32)
    mask = ngram_blocking_mask(seqs, jnp.asarray(3), vocab_size=10, ngram=2)
    assert float(mask[0, 6]) < -1e6
    assert float(mask[0, 5]) == 0.0


def test_ar_generate_runs(built):
    task, model, crit, batch, variables = built
    seqs, scores = ar_generate(
        model, variables, batch["src_tokens"], batch["src_lengths"],
        beam_size=2, max_len=12, no_repeat_ngram=3,
    )
    seqs = np.asarray(seqs)
    assert seqs.shape == (2, 2, 12)
    assert np.asarray(scores).shape == (2, 2)
    # best-first ordering
    assert (np.asarray(scores)[:, 0] >= np.asarray(scores)[:, 1]).all()


def test_s2ut_transformer_encoder_variant():
    """--arch s2ut_transformer swaps the conformer encoder for the plain
    S2T transformer encoder (reference s2s_transformer.py:237-300,644-682)
    behind the same AR decode surface."""
    from diffnorm_tpu.registry import ARCHITECTURES

    cfg = tiny_cfg(arch="s2ut_transformer")
    _, stamp = ARCHITECTURES.get("s2ut_transformer")
    stamp(cfg)
    assert cfg["encoder_type"] == "transformer"
    task = TASKS.get("dummy_ar").setup_task(cfg)
    model = task.build_model()
    crit = task.build_criterion()
    batch = task.dummy_batch(2, 48)
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    # no depthwise conv module params anywhere in the encoder
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    names = ["/".join(str(k) for k in path) for path, _ in flat]
    assert not any("conv_module" in n for n in names)
    loss, mets, _ = crit(model, variables, batch, jax.random.PRNGKey(1),
                         train=True)
    assert np.isfinite(float(loss))
    seqs, scores = ar_generate(
        model, variables, batch["src_tokens"], batch["src_lengths"],
        beam_size=2, max_len=8,
    )
    assert np.asarray(seqs).shape == (2, 2, 8)


def test_s2ut_transformer_fisher_arch_defaults():
    from diffnorm_tpu.registry import ARCHITECTURES

    cfg = Config(arch="s2ut_transformer_fisher")
    _, stamp = ARCHITECTURES.get("s2ut_transformer_fisher")
    stamp(cfg)
    # reference s2ut_architecture_fisher: encoder 256/4 heads, decoder dims
    # inherit the encoder's (s2s_transformer.py:650-653,676-682)
    assert cfg["encoder_embed_dim"] == 256
    assert cfg["encoder_attention_heads"] == 4
    assert cfg["decoder_embed_dim"] == 256
    assert cfg["decoder_ffn_embed_dim"] == 2048


def test_s2ut_transformer_multitask_encoder_taps():
    """The transformer-encoder AR variant must expose per-layer encoder
    states for --multitask-config-yaml aux heads (return_all_layers on
    S2TTransformerEncoder, reference return_all_hiddens)."""
    from diffnorm_tpu.models.nar_transformer import AuxTaskSpec

    spec = AuxTaskSpec(name="src_ctc", decoder_type="ctc", vocab_size=11,
                       input_from="encoder", input_layer=0,
                       decoder_dim=16, decoder_heads=2, decoder_ffn_dim=32)
    module = ARS2UTModule(
        vocab_size=16, encoder_dim=32, encoder_ffn_dim=64, encoder_layers=2,
        encoder_heads=2, decoder_dim=32, decoder_ffn_dim=64,
        decoder_layers=1, decoder_heads=2, encoder_type="transformer",
        conv_channels=32, multitask=(spec,),
    )
    src = jnp.zeros((2, 40, 80), jnp.float32)
    src_lengths = jnp.asarray([40, 24], jnp.int32)
    prev = jnp.full((2, 6), 5, jnp.int32)
    tgt = jnp.full((2, 6), 5, jnp.int32)
    variables = module.init(jax.random.PRNGKey(0), src, src_lengths, prev,
                            tgt_tokens=tgt)
    out = module.apply(variables, src, src_lengths, prev, tgt_tokens=tgt,
                       deterministic=True)
    assert "multitask" in out
    aux = out["multitask"]["src_ctc"]
    assert aux["logits"].shape[-1] == 11
    # tapped encoder states ride the subsampled (4x) time axis
    assert aux["logits"].shape[1] == aux["mask"].shape[1]
    assert np.isfinite(np.asarray(aux["logits"])).all()
