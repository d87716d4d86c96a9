"""AR TTS transformer: teacher-forced forward, Tacotron2 loss, and the
jitted AR spectrogram generation loop (reference
fairseq/models/text_to_speech/tts_transformer.py +
fairseq/speech_generator.py AutoRegressiveSpeechGenerator)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnorm_tpu.config import Config
from diffnorm_tpu.generate.speech_ar import ARSpeechGenerator, ar_speech_generate
from diffnorm_tpu.models.tts_transformer import (
    TTSTransformerModel,
    tts_loss,
)

PAD = 1


def tiny_model(**kw):
    cfg = Config(
        arch="tts_transformer_base", vocab_size=30, encoder_embed_dim=16,
        encoder_ffn_embed_dim=32, encoder_transformer_layers=2,
        decoder_transformer_layers=2, encoder_attention_heads=2,
        output_frame_dim=8, prenet_dim=12, postnet_conv_dim=16,
        postnet_layers=2, encoder_conv_layers=1,
    )
    cfg.update(**kw)
    return TTSTransformerModel.build_model(cfg), cfg


@pytest.fixture(scope="module")
def built():
    model, cfg = tiny_model()
    rng = np.random.default_rng(0)
    b, s, t, d = 2, 7, 11, 8
    src = rng.integers(4, 30, size=(b, s)).astype(np.int32)
    src[1, 5:] = PAD
    feat_tgt = rng.normal(size=(b, t, d)).astype(np.float32)
    tgt_lengths = np.array([11, 6], np.int32)
    tgt_mask = np.arange(t)[None, :] < tgt_lengths[:, None]
    prev = np.concatenate([np.zeros((b, 1, d), np.float32),
                           feat_tgt[:, :-1]], axis=1)
    variables = model.module.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(src), jnp.asarray(tgt_lengths), jnp.asarray(prev),
        jnp.asarray(tgt_mask),
    )
    return model, variables, src, feat_tgt, tgt_lengths, tgt_mask, prev


def test_teacher_forced_forward_and_loss(built):
    model, variables, src, feat_tgt, tgt_lengths, tgt_mask, prev = built
    out = model.module.apply(
        variables, jnp.asarray(src), jnp.asarray(tgt_lengths),
        jnp.asarray(prev), jnp.asarray(tgt_mask), deterministic=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert out["post_feat"].shape == feat_tgt.shape
    assert out["feat"].shape == feat_tgt.shape
    assert out["eos_logits"].shape == feat_tgt.shape[:2]
    loss, mets = tts_loss(out, jnp.asarray(feat_tgt),
                          jnp.asarray(tgt_lengths), bce_pos_weight=5.0)
    assert np.isfinite(float(loss))
    for k in ("l1_loss", "mse_loss", "eos_loss"):
        assert np.isfinite(float(mets[k]))


def test_causality(built):
    """Changing a future target frame must not change earlier predictions
    (the decoder is causal)."""
    model, variables, src, feat_tgt, tgt_lengths, tgt_mask, prev = built
    rngs = {"dropout": jax.random.PRNGKey(3)}

    def fwd(p):
        return model.module.apply(
            variables, jnp.asarray(src), jnp.asarray(tgt_lengths),
            jnp.asarray(p), jnp.asarray(tgt_mask), deterministic=True,
            rngs=rngs,
        )["feat"]

    a = np.asarray(fwd(prev))
    prev2 = prev.copy()
    prev2[:, 6:] += 10.0
    b = np.asarray(fwd(prev2))
    np.testing.assert_allclose(a[:, :6], b[:, :6], atol=2e-5)
    assert not np.allclose(a[:, 6:], b[:, 6:])


def test_incremental_matches_teacher_forced(built):
    """The KV-cached decode_step path must reproduce the full-sequence
    causal forward on the same (teacher-forced) inputs. The prenet's
    always-on dropout is the one nondeterminism — neutralized here by
    prenet_dropout=0."""
    model, cfg = tiny_model(prenet_dropout=0.0)
    rng = np.random.default_rng(1)
    b, s, t, d = 2, 5, 6, 8
    src = rng.integers(4, 30, size=(b, s)).astype(np.int32)
    feat = rng.normal(size=(b, t, d)).astype(np.float32)
    prev = np.concatenate([np.zeros((b, 1, d), np.float32), feat[:, :-1]], 1)
    mask = np.ones((b, t), bool)
    variables = model.module.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(src), jnp.ones((b,), jnp.int32) * t, jnp.asarray(prev),
        jnp.asarray(mask),
    )
    rngs = {"dropout": jax.random.PRNGKey(9)}
    module = model.module
    enc, enc_mask = module.apply(variables, jnp.asarray(src),
                                 method="encode", rngs=rngs)
    post, full_feat, full_eos = module.apply(
        variables, jnp.asarray(prev), jnp.asarray(mask), enc, enc_mask,
        method="decode_full", rngs=rngs,
    )

    _, cache_vars = module.apply(
        variables, jnp.zeros((b, 1, d)), enc, enc_mask, 0, t,
        method="decode_step", mutable=["cache"], rngs=rngs,
    )
    cache = jax.tree_util.tree_map(jnp.zeros_like, cache_vars["cache"])
    step_feats = []
    for i in range(t):
        (f, e), mut = module.apply(
            {**variables, "cache": cache},
            jnp.asarray(prev[:, i:i + 1]), enc, enc_mask, i, t,
            method="decode_step", mutable=["cache"], rngs=rngs,
        )
        cache = mut["cache"]
        step_feats.append(np.asarray(f))
    np.testing.assert_allclose(
        np.stack(step_feats, axis=1), np.asarray(full_feat),
        rtol=2e-4, atol=2e-4,
    )


def test_ar_generation_loop(built):
    """The jitted rollout: shapes, eos-frozen lengths, gcmvn denorm, and
    the host wrapper's per-sentence cutoff + vocoder hook."""
    model, variables, src, feat_tgt, tgt_lengths, tgt_mask, prev = built
    stats = {"mean": np.full((8,), 2.0, np.float32),
             "std": np.full((8,), 3.0, np.float32)}
    feats, out_lens, eos_prob = ar_speech_generate(
        model, variables, src, max_iter=9, rng=jax.random.PRNGKey(0),
        gcmvn_stats=stats,
    )
    assert feats.shape == (2, 9, 8)
    assert eos_prob.shape == (2, 9)
    lens = np.asarray(out_lens)
    assert ((lens >= 1) & (lens <= 9)).all()

    # gcmvn: regenerate without stats and check the affine relation
    feats0, _, _ = ar_speech_generate(
        model, variables, src, max_iter=9, rng=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        np.asarray(feats), np.asarray(feats0) * 3.0 + 2.0, rtol=1e-4,
        atol=1e-4,
    )

    calls = []
    gen = ARSpeechGenerator(
        model, variables, vocoder=lambda f: calls.append(f.shape) or
        np.zeros(f.shape[0] * 4), gcmvn_stats=stats, max_iter=9,
    )
    finalized = gen.generate(src)
    assert len(finalized) == 2
    for i, entry in enumerate(finalized):
        assert entry["feature"].shape == (lens[i], 8)
        assert entry["waveform"].shape == (lens[i] * 4,)
