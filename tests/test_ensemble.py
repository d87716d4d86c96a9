"""Decode-time model ensembles (fairseq parity: sequence_generator
EnsembleModel, nat/nonautoregressive_ensembles.py EnsembleLevT, and
checkpoint_utils.load_model_ensemble's colon-separated --path).

Per-step probabilities are averaged across same-architecture parameter
trees via logsumexp(log_probs) - log M inside the jitted decode loops.
A [v, v] ensemble must reproduce the single-model decode exactly; a
[v1, v2] ensemble must differ from either member (on random weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnorm_tpu.config import Config
from diffnorm_tpu.registry import TASKS

PAD, BOS, EOS, UNK = 1, 0, 2, 3


def _build(task_name, **cfg_kw):
    cfg = Config(**cfg_kw)
    task = TASKS.get(task_name).setup_task(cfg)
    model = task.build_model()
    batch = task.dummy_batch(2, cfg_kw.get("_seq", 24))
    v1 = task.init_variables(model, jax.random.PRNGKey(0), batch)
    v2 = task.init_variables(model, jax.random.PRNGKey(1), batch)
    return task, model, batch, v1, v2


NAR_CFG = dict(
    arch="nar_s2ut_conformer", criterion="nar_speech_to_unit",
    encoder_layers=1, decoder_layers=1, encoder_embed_dim=32,
    encoder_ffn_embed_dim=64, encoder_attention_heads=2,
    decoder_attention_heads=2, decoder_embed_dim=32,
    decoder_ffn_embed_dim=64, conv_channels=32,
    depthwise_conv_kernel_size=7, target_code_size=20,
    label_smoothing=0.2, lr=5e-4,
)


def test_mask_predict_ensemble():
    from diffnorm_tpu.generate.mask_predict import mask_predict_decode

    task, model, batch, v1, v2 = _build("dummy_nar", **NAR_CFG)
    src, lens = batch["src_tokens"], batch["src_lengths"]
    kw = dict(max_iter=3, max_len=24)
    t_single, s_single, _ = mask_predict_decode(model, v1, src, lens, **kw)
    t_dup, s_dup, _ = mask_predict_decode(model, [v1, v1], src, lens, **kw)
    np.testing.assert_array_equal(np.asarray(t_single), np.asarray(t_dup))
    np.testing.assert_allclose(np.asarray(s_single), np.asarray(s_dup),
                               atol=1e-5)
    t_mix, _, _ = mask_predict_decode(model, [v1, v2], src, lens, **kw)
    assert t_mix.shape == t_single.shape
    t_other, _, _ = mask_predict_decode(model, v2, src, lens, **kw)
    # the mixed ensemble is a different decoder than either member
    assert (np.any(np.asarray(t_mix) != np.asarray(t_single))
            or np.any(np.asarray(t_mix) != np.asarray(t_other)))


def test_ar_beam_ensemble():
    from diffnorm_tpu.generate.beam_search import ar_generate

    task, model, batch, v1, v2 = _build(
        "dummy_ar",
        arch="s2ut_conformer", criterion="label_smoothed_cross_entropy",
        encoder_layers=1, decoder_layers=1, encoder_embed_dim=32,
        encoder_ffn_embed_dim=64, encoder_attention_heads=2,
        decoder_attention_heads=2, decoder_embed_dim=32,
        decoder_ffn_embed_dim=64, conv_channels=32,
        depthwise_conv_kernel_size=7, target_code_size=20,
        label_smoothing=0.1, lr=5e-4,
    )
    src, lens = batch["src_tokens"], batch["src_lengths"]
    kw = dict(beam_size=2, max_len=12)
    seq_single, sc_single = ar_generate(model, v1, src, lens, **kw)
    seq_dup, sc_dup = ar_generate(model, [v1, v1], src, lens, **kw)
    np.testing.assert_array_equal(np.asarray(seq_single), np.asarray(seq_dup))
    np.testing.assert_allclose(np.asarray(sc_single), np.asarray(sc_dup),
                               rtol=1e-4, atol=1e-5)
    seq_mix, _ = ar_generate(model, [v1, v2], src, lens, **kw)
    assert seq_mix.shape == seq_single.shape


def test_levenshtein_ensemble():
    from diffnorm_tpu.models.levenshtein import levenshtein_decode_jit

    task, model, batch, v1, v2 = _build(
        "dummy_lev",
        arch="levenshtein_transformer", criterion="levenshtein_loss",
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=1,
        decoder_layers=1, encoder_attention_heads=2, target_code_size=20,
        src_vocab_size=24, label_smoothing=0.1, _seq=10,
    )
    src, lens = batch["src_tokens"], batch["src_lengths"]
    kw = dict(max_iter=2, max_len=16)
    out_single = levenshtein_decode_jit(model, v1, src, lens, **kw)
    out_dup = levenshtein_decode_jit(model, [v1, v1], src, lens, **kw)
    np.testing.assert_array_equal(np.asarray(out_single), np.asarray(out_dup))
    out_mix = levenshtein_decode_jit(model, [v1, v2], src, lens, **kw)
    assert out_mix.shape == out_single.shape
    assert (out_mix[:, 0] == BOS).all()
    assert not (out_mix == UNK).any()


def test_mask_predict_ensemble_with_cg():
    """Classifier-free guidance composes with ensembles: CG is applied per
    member before prob averaging, and a [v, v] ensemble under CG still
    reproduces the single-model CG decode."""
    from diffnorm_tpu.generate.mask_predict import mask_predict_decode

    task, model, batch, v1, v2 = _build("dummy_nar", **NAR_CFG)
    src, lens = batch["src_tokens"], batch["src_lengths"]
    kw = dict(max_iter=2, max_len=24, cond_scale=1.5)
    t1, s1, _ = mask_predict_decode(model, v1, src, lens, **kw)
    t_dup, s_dup, _ = mask_predict_decode(model, [v1, v1], src, lens, **kw)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t_dup))
    t_mix, _, _ = mask_predict_decode(model, [v1, v2], src, lens, **kw)
    assert t_mix.shape == t1.shape
