"""Secondary model families: continuous diffusion, hubert-VAE, feature-space
diffusion, text CMLM-CG, multitask CTC head."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnorm_tpu.config import Config
from diffnorm_tpu.registry import TASKS


def test_hubert_vae_loss_excludes_ce():
    cfg = Config(
        arch="speech_vae_decoder", criterion="hubert_vae_loss",
        feature_dim=24, latent_dim=3, chan_mults=[4], vae_decoder_depth=1,
        vae_decoder_dim_head=8, vae_decoder_heads=2, target_code_size=16,
    )
    task = TASKS.get("hubert_vae").setup_task(cfg)
    model = task.build_model()
    crit = task.build_criterion()
    from diffnorm_tpu.tasks.dummy import DummyVAETask

    batch = DummyVAETask(cfg).dummy_batch(2, 8)
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    loss, mets, _ = crit(model, variables, batch, jax.random.PRNGKey(1),
                         train=False)
    # 10*mse + 1e-4*kl, no CE contribution
    expected = 10 * float(mets["mse_loss"]) + 1e-4 * float(mets["kl_loss"])
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_feature_space_diffusion_no_vae():
    cfg = Config(
        arch="diff_hubert", criterion="ddpm_latent_loss",
        hidden_dim=16, feature_dim=24, denoiser_depth=1, wavenet_layers=2,
        wavenet_stacks=1, timesteps=10, target_code_size=16,
    )
    cfg["latent_dim"] = 24  # feature-space: latent == feature dim
    task = TASKS.get("speech_diffusion_hubert").setup_task(cfg)
    model = task.build_model()
    crit = task.build_criterion()
    assert task.frozen_param_keys == ()
    from diffnorm_tpu.tasks.dummy import DummyVAETask

    batch = DummyVAETask(Config(feature_dim=24, target_code_size=16)).dummy_batch(2, 8)
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    assert "vae" not in variables["params"]
    loss, mets, _ = crit(model, variables, batch, jax.random.PRNGKey(1),
                         train=False)
    assert np.isfinite(float(loss))


def test_text_cmlm_cg_forward_and_decode():
    cfg = Config(
        arch="cmlm_transformer", criterion="nar_speech_to_unit",
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=1,
        decoder_layers=1, encoder_attention_heads=2, target_code_size=20,
        src_vocab_size=24, cg_prob=0.1, label_smoothing=0.1,
    )
    task = TASKS.get("dummy_cmlm_cg").setup_task(cfg)
    model = task.build_model()
    crit = task.build_criterion()
    batch = task.dummy_batch(2, 10)
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    loss, mets, _ = crit(model, variables, batch, jax.random.PRNGKey(1),
                         train=True)
    assert np.isfinite(float(loss))
    # mask-predict decoding works on the text model too (CG path included)
    from diffnorm_tpu.generate.mask_predict import mask_predict_decode

    tokens, scores, steps = mask_predict_decode(
        model, variables, batch["src_tokens"], batch["src_lengths"],
        max_iter=1, max_len=16, cond_scale=1.5,
    )
    assert np.asarray(tokens).shape == (2, 16)


def test_nar_multitask_ctc():
    cfg = Config(
        arch="nar_s2ut_conformer", criterion="nar_speech_to_unit",
        encoder_layers=1, decoder_layers=1, encoder_embed_dim=32,
        encoder_ffn_embed_dim=64, encoder_attention_heads=2,
        decoder_attention_heads=2, decoder_embed_dim=32,
        decoder_ffn_embed_dim=64, conv_channels=32,
        depthwise_conv_kernel_size=7, target_code_size=20,
        label_smoothing=0.2, multitask_ctc_vocab=12,
    )
    task = TASKS.get("dummy_nar").setup_task(cfg)
    model = task.build_model()
    crit = task.build_criterion()
    batch = task.dummy_batch(2, 48)
    # aux CTC targets (e.g. source phonemes), pad=1, blank=0
    batch["ctc_target"] = np.asarray([[5, 6, 7, 1], [4, 5, 1, 1]], np.int32)
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    loss, mets, _ = crit(model, variables, batch, jax.random.PRNGKey(1),
                         train=True)
    assert np.isfinite(float(loss))
    assert "ctc_loss" in mets and np.isfinite(float(mets["ctc_loss"]))


@pytest.mark.parametrize(
    "wscalar,ascalar", [(True, False), (False, True), (True, True)]
)
def test_int8_scale_granularity_parity(monkeypatch, wscalar, ascalar):
    """The coarse-scale knobs (DIFFNORM_INT8_WSCALAR / _ASCALAR, which trade
    per-channel/per-token scales for fewer VPU dequant multiplies) must track
    the float path through a full DDIM chain within the same bounds as the
    default int8 scheme."""
    from diffnorm_tpu.models.diffusion import LatentDiffusionModel, ddim_sample
    from diffnorm_tpu.ops import quant

    monkeypatch.setattr(quant, "_W_SCALAR", wscalar)
    monkeypatch.setattr(quant, "_A_SCALAR", ascalar)
    common = dict(hidden_dim=64, latent_dim=3, feature_dim=24, timesteps=50,
                  vocab_size=52, denoiser_depth=2, wavenet_layers=3,
                  wavenet_stacks=2, chan_mults=[4])
    m_f = LatentDiffusionModel.build_model(Config(**common))
    m_q = LatentDiffusionModel.build_model(Config(**common, quant_int8=True))
    rng = jax.random.PRNGKey(0)
    feat = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 32, 24)), jnp.float32)
    mask = jnp.ones((4, 32), bool)
    v = m_f.module.init({"params": rng}, feat, mask, rng, deterministic=True)
    uf, rf = ddim_sample(m_f, v, feat, mask, jax.random.PRNGKey(7),
                         start_step=12)
    uq, rq = ddim_sample(m_q, v, feat, mask, jax.random.PRNGKey(7),
                         start_step=12)
    assert float(jnp.mean(uf == uq)) > 0.95
    assert float(jnp.linalg.norm(rq - rf) / jnp.linalg.norm(rf)) < 0.03


def test_int8_inference_parity():
    """quant_int8: the W8A8 denoiser path must track the float path through
    a full DDIM chain — near-total unit agreement and tiny recon error
    (the int8 matmuls run at 2x the bf16 MXU rate on v5e)."""
    from diffnorm_tpu.models.diffusion import LatentDiffusionModel, ddim_sample

    common = dict(hidden_dim=64, latent_dim=3, feature_dim=24, timesteps=50,
                  vocab_size=52, denoiser_depth=2, wavenet_layers=3,
                  wavenet_stacks=2, chan_mults=[4])
    m_f = LatentDiffusionModel.build_model(Config(**common))
    m_q = LatentDiffusionModel.build_model(Config(**common, quant_int8=True))
    rng = jax.random.PRNGKey(0)
    feat = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 32, 24)), jnp.float32)
    mask = jnp.ones((4, 32), bool)
    v = m_f.module.init({"params": rng}, feat, mask, rng, deterministic=True)
    uf, rf = ddim_sample(m_f, v, feat, mask, jax.random.PRNGKey(7),
                         start_step=12)
    uq, rq = ddim_sample(m_q, v, feat, mask, jax.random.PRNGKey(7),
                         start_step=12)
    assert float(jnp.mean(uf == uq)) > 0.95
    assert float(jnp.linalg.norm(rq - rf) / jnp.linalg.norm(rf)) < 0.02


def test_int8_nar_decode_parity():
    """quant_int8 on the NAR path: int8 W8A8 conformer/decoder matmuls must
    track the float decode (same weights, high token agreement)."""
    from diffnorm_tpu.generate.mask_predict import mask_predict_decode
    from diffnorm_tpu.registry import TASKS

    common = dict(
        arch="nar_s2ut_conformer", criterion="nar_speech_to_unit",
        encoder_layers=2, decoder_layers=2, encoder_embed_dim=32,
        encoder_ffn_embed_dim=64, encoder_attention_heads=2,
        decoder_attention_heads=2, decoder_embed_dim=32,
        decoder_ffn_embed_dim=64, conv_channels=32,
        depthwise_conv_kernel_size=7, target_code_size=20,
        label_smoothing=0.2, lr=5e-4,
    )
    task_f = TASKS.get("dummy_nar").setup_task(Config(**common))
    model_f = task_f.build_model()
    task_q = TASKS.get("dummy_nar").setup_task(
        Config(**common, quant_int8=True))
    model_q = task_q.build_model()
    batch = task_f.dummy_batch(2, 48)
    variables = task_f.init_variables(model_f, jax.random.PRNGKey(0), batch)
    src = jnp.asarray(batch["src_tokens"])
    lens = jnp.asarray(batch["src_lengths"])
    tf, _, _ = mask_predict_decode(model_f, variables, src, lens,
                                   max_iter=3, max_len=16)
    tq, _, _ = mask_predict_decode(model_q, variables, src, lens,
                                   max_iter=3, max_len=16)
    # at dim 32 with random weights the logit margins are tiny, so int8
    # rounding flips more argmaxes than at the real 512-dim scale; this
    # bounds gross layout/scale bugs, not production quality
    assert float(jnp.mean(tf == tq)) > 0.75


def test_int8_static_scale_parity(monkeypatch):
    """DIFFNORM_INT8_STATIC: calibrated per-site activation scales (no
    max-abs reduce in the sampling scan) must track the float path through
    a full DDIM chain within the dynamic-int8 bounds, and the calibrated
    variables must carry a populated quant_stats collection."""
    import os

    from diffnorm_tpu.models.diffusion import (
        LatentDiffusionModel,
        calibrate_act_scales,
        ddim_sample,
    )

    common = dict(hidden_dim=64, latent_dim=3, feature_dim=24, timesteps=50,
                  vocab_size=52, denoiser_depth=2, wavenet_layers=3,
                  wavenet_stacks=2, chan_mults=[4])
    m_f = LatentDiffusionModel.build_model(Config(**common))
    m_q = LatentDiffusionModel.build_model(Config(**common, quant_int8=True))
    rng = jax.random.PRNGKey(0)
    feat = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 32, 24)), jnp.float32)
    mask = jnp.ones((4, 32), bool)
    v = m_f.module.init({"params": rng}, feat, mask, rng, deterministic=True)
    uf, rf = ddim_sample(m_f, v, feat, mask, jax.random.PRNGKey(7),
                         start_step=12)

    v_cal = calibrate_act_scales(m_q, v, feat, mask, jax.random.PRNGKey(3),
                                 start_step=12)
    assert "quant_stats" in v_cal
    leaves = jax.tree_util.tree_leaves(v_cal["quant_stats"])
    assert leaves and all(float(a) > 0 for a in leaves)

    monkeypatch.setenv("DIFFNORM_INT8_STATIC", "1")
    us, rs = ddim_sample(m_q, v_cal, feat, mask, jax.random.PRNGKey(7),
                         start_step=12)
    monkeypatch.delenv("DIFFNORM_INT8_STATIC")
    assert float(jnp.mean(uf == us)) > 0.95
    assert float(jnp.linalg.norm(rs - rf) / jnp.linalg.norm(rf)) < 0.03


def test_int8_static_nar_decode_parity(monkeypatch):
    """Static activation scales on the NAR decode path: calibrate on a
    train-style forward (ops/quant.calibrate_apply), decode with
    DIFFNORM_INT8_STATIC — token agreement with the float decode must stay
    within the dynamic-int8 bound."""
    from diffnorm_tpu.generate.mask_predict import mask_predict_decode
    from diffnorm_tpu.ops.quant import calibrate_apply
    from diffnorm_tpu.registry import TASKS

    common = dict(
        arch="nar_s2ut_conformer", criterion="nar_speech_to_unit",
        encoder_layers=2, decoder_layers=2, encoder_embed_dim=32,
        encoder_ffn_embed_dim=64, encoder_attention_heads=2,
        decoder_attention_heads=2, decoder_embed_dim=32,
        decoder_ffn_embed_dim=64, conv_channels=32,
        depthwise_conv_kernel_size=7, target_code_size=20,
        label_smoothing=0.2, lr=5e-4,
    )
    task_f = TASKS.get("dummy_nar").setup_task(Config(**common))
    model_f = task_f.build_model()
    task_q = TASKS.get("dummy_nar").setup_task(
        Config(**common, quant_int8=True))
    model_q = task_q.build_model()
    batch = task_f.dummy_batch(2, 48)
    variables = task_f.init_variables(model_f, jax.random.PRNGKey(0), batch)
    src = jnp.asarray(batch["src_tokens"])
    lens = jnp.asarray(batch["src_lengths"])
    tf, _, _ = mask_predict_decode(model_f, variables, src, lens,
                                   max_iter=3, max_len=16)

    v_cal = calibrate_apply(
        model_q.module.apply, variables, src, lens,
        jnp.asarray(batch["prev_target"]),
        tgt_tokens=jnp.asarray(batch["target"]), deterministic=True,
    )
    assert "quant_stats" in v_cal
    monkeypatch.setenv("DIFFNORM_INT8_STATIC", "1")
    ts, _, _ = mask_predict_decode(model_q, v_cal, src, lens,
                                   max_iter=3, max_len=16)
    monkeypatch.delenv("DIFFNORM_INT8_STATIC")
    assert float(jnp.mean(tf == ts)) > 0.75
