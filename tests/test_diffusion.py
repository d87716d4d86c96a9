"""Latent diffusion: training forward components, DDIM scan vs python-loop
golden parity, frozen-VAE param partition."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnorm_tpu.config import Config
from diffnorm_tpu.models.diffusion import (
    DDPMSchedule,
    LatentDiffusionModel,
    LatentDiffusionModule,
    ddim_sample,
    extract,
    safe_div,
)
from diffnorm_tpu.registry import TASKS


def tiny_cfg(**kw):
    cfg = Config(
        arch="diff_discrete", criterion="ddpm_discrete_loss",
        hidden_dim=16, latent_dim=3, feature_dim=24, chan_mults=[4],
        vae_decoder_depth=1, vae_decoder_dim_head=8, vae_decoder_heads=2,
        denoiser_depth=1, wavenet_layers=2, wavenet_stacks=1,
        timesteps=20, target_code_size=16, lr=1e-4,
    )
    cfg.update(**kw)
    return cfg


@pytest.fixture(scope="module")
def built():
    cfg = tiny_cfg()
    task = TASKS.get("speech_diffusion_discrete").setup_task(cfg)
    # reuse the dummy VAE batch format
    from diffnorm_tpu.tasks.dummy import DummyVAETask

    dummy = DummyVAETask(cfg)
    batch = dummy.dummy_batch(2, 10)
    model = task.build_model()
    crit = task.build_criterion()
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    return task, model, crit, batch, variables


def test_training_forward_finite(built):
    task, model, crit, batch, variables = built
    loss, mets, _ = crit(model, variables, batch, jax.random.PRNGKey(1),
                         train=False)
    assert np.isfinite(float(loss))
    for k in ("noise_loss", "recon_mse_loss", "nll_loss", "acc"):
        assert np.isfinite(float(mets[k])), k


def test_frozen_partition(built):
    from diffnorm_tpu.train.trainer import merge_params, partition_params

    task, model, crit, batch, variables = built
    trainable, frozen = partition_params(
        variables["params"], task.frozen_param_keys
    )
    assert set(frozen) == {"vae"}
    assert "denoiser" in trainable
    merged = merge_params(trainable, frozen)
    assert set(merged) == set(variables["params"])


def test_ddim_scan_matches_python_loop(built):
    """The lax.scan DDIM must match a step-by-step python re-implementation
    of the reference update rule (latent_module.py:1411-1445, eta=0)."""
    task, model, crit, batch, variables = built
    module = model.module
    feature = jnp.asarray(batch["reduce_target"])
    mask = jnp.ones(feature.shape[:2], bool)
    rng = jax.random.PRNGKey(7)
    start_step = 6

    units, recon = ddim_sample(model, variables, feature, mask, rng,
                               start_step=start_step)

    # python reference loop with the same rngs
    schedule = DDPMSchedule.create(module.timesteps, module.schedule_name)
    r_enc, r_noise = jax.random.split(rng)
    z = module.apply(variables, feature, r_enc,
                     method=LatentDiffusionModule.encode)
    b = z.shape[0]
    t0 = jnp.full((b,), start_step, jnp.int32)
    x = (extract(schedule.sqrt_alphas_cumprod, t0, z.ndim) * z
         + extract(schedule.sqrt_one_minus_alphas_cumprod, t0, z.ndim)
         * jax.random.normal(r_noise, z.shape, z.dtype))
    for time in range(start_step - 1, 0, -1):
        t = jnp.full((b,), time, jnp.int32)
        noise = module.apply(variables, x, t, mask,
                             method=LatentDiffusionModule.denoise)
        sac = extract(schedule.sqrt_alphas_cumprod, t, noise.ndim)
        s1mac = extract(schedule.sqrt_one_minus_alphas_cumprod, t, noise.ndim)
        x1_hat = safe_div(x - s1mac * noise, sac)
        pred_noise = safe_div(x - sac * x1_hat, s1mac)
        ab_prev = extract(schedule.alphas_cumprod_prev, t, noise.ndim)
        x = x1_hat * jnp.sqrt(ab_prev) + jnp.sqrt(1 - ab_prev) * pred_noise
    feat2, logits2 = module.apply(variables, x, mask,
                                  method=LatentDiffusionModule.decode)
    units2 = jnp.argmax(logits2, axis=-1).astype(jnp.int32) - 4
    np.testing.assert_array_equal(np.asarray(units), np.asarray(units2))
    np.testing.assert_allclose(np.asarray(recon), np.asarray(feat2),
                               rtol=2e-4, atol=2e-4)


def test_unit_offset_minus_4(built):
    """ddim_sample output must be in raw-unit space (dictionary -4 offset,
    latent_module.py:1450-1451)."""
    task, model, crit, batch, variables = built
    feature = jnp.asarray(batch["reduce_target"])
    mask = jnp.ones(feature.shape[:2], bool)
    units, _ = ddim_sample(model, variables, feature, mask,
                           jax.random.PRNGKey(0), start_step=4)
    assert np.asarray(units).min() >= -4
    assert np.asarray(units).max() < 16 + 4


def test_diff_norm_synthesis_data_parallel(built, tmp_path):
    """--data-parallel N shards the normalization batch over a "data" mesh
    (GSPMD; params replicated). The sharded run must produce the SAME
    normalized manifests as the single-device run — threefry noise is
    counter-based, so the padded rows appended for even sharding do not
    perturb the real rows' random streams."""
    import orbax.checkpoint as ocp

    from diffnorm_tpu.cli import diff_norm_synthesis
    from diffnorm_tpu.data.manifest import (
        read_translation_manifest,
        write_feature_manifest,
        write_translation_manifest,
    )

    task, model, crit, batch, variables = built
    ckpt = str(tmp_path / "ckpt")
    ocp.StandardCheckpointer().save(ckpt, {"params": variables["params"]})

    rng = np.random.default_rng(0)
    feat_dir = tmp_path / "feat"
    feat_dir.mkdir()
    rows, frows = [], []
    for i in range(3):  # 2 chunks at batch_size=2: exercises last-chunk pad
        t = int(rng.integers(8, 12))
        units = np.repeat(rng.integers(0, 16, size=t // 2 + 1), 2)[:t]
        feat = rng.normal(size=(t, 24)).astype(np.float32)
        np.save(feat_dir / f"u{i}.feat.npy", feat)
        frows.append((f"u{i}.feat.npy", t))
        rows.append({"id": f"u{i}", "src_audio": f"u{i}",
                     "src_n_frames": t,
                     "tgt_audio": " ".join(map(str, units)),
                     "tgt_n_frames": t})
    write_feature_manifest(str(feat_dir / "test.manifest.tsv"),
                           str(feat_dir), frows)
    write_translation_manifest(str(tmp_path / "test.tsv"), rows)

    outs = {}
    for dp in (0, 4):
        out_dir = str(tmp_path / f"out_dp{dp}")
        rc = diff_norm_synthesis.main(Config(
            data=str(tmp_path), ckpt=ckpt, tgt_feat_dir=str(feat_dir),
            output_dir=out_dir, start_step=4, batch_size=2, cpu=True,
            splits="test", data_parallel=dp, seed=7,
            **dict(tiny_cfg()),
        ))
        assert rc == 0
        outs[dp] = {r["id"]: r["tgt_audio"]
                    for r in read_translation_manifest(
                        os.path.join(out_dir, "test.tsv"))}
    assert set(outs[0]) == {"u0", "u1", "u2"}
    assert outs[0] == outs[4], (outs[0], outs[4])


def test_diff_norm_synthesis_static_int8(built, tmp_path, monkeypatch):
    """--quant-int8 --quant-int8-static: first-batch calibration populates
    quant_stats and the run completes with static activation scales; the
    normalized manifests stay valid unit strings."""
    import orbax.checkpoint as ocp

    from diffnorm_tpu.cli import diff_norm_synthesis
    from diffnorm_tpu.data.manifest import (
        read_translation_manifest,
        write_feature_manifest,
        write_translation_manifest,
    )

    task, model, crit, batch, variables = built
    ckpt = str(tmp_path / "ckpt")
    ocp.StandardCheckpointer().save(ckpt, {"params": variables["params"]})

    rng = np.random.default_rng(0)
    feat_dir = tmp_path / "feat"
    feat_dir.mkdir()
    rows, frows = [], []
    for i in range(3):
        t = int(rng.integers(8, 12))
        units = np.repeat(rng.integers(0, 16, size=t // 2 + 1), 2)[:t]
        feat = rng.normal(size=(t, 24)).astype(np.float32)
        np.save(feat_dir / f"u{i}.feat.npy", feat)
        frows.append((f"u{i}.feat.npy", t))
        rows.append({"id": f"u{i}", "src_audio": f"u{i}",
                     "src_n_frames": t,
                     "tgt_audio": " ".join(map(str, units)),
                     "tgt_n_frames": t})
    write_feature_manifest(str(feat_dir / "test.manifest.tsv"),
                           str(feat_dir), frows)
    write_translation_manifest(str(tmp_path / "test.tsv"), rows)

    monkeypatch.delenv("DIFFNORM_INT8_STATIC", raising=False)
    out_dir = str(tmp_path / "out_static")
    rc = diff_norm_synthesis.main(Config(
        data=str(tmp_path), ckpt=ckpt, tgt_feat_dir=str(feat_dir),
        output_dir=out_dir, start_step=4, batch_size=2, cpu=True,
        splits="test", seed=7, quant_int8=True, quant_int8_static=True,
        **dict(tiny_cfg()),
    ))
    monkeypatch.delenv("DIFFNORM_INT8_STATIC", raising=False)
    assert rc == 0
    out = {r["id"]: r["tgt_audio"] for r in read_translation_manifest(
        os.path.join(out_dir, "test.tsv"))}
    assert set(out) == {"u0", "u1", "u2"}
    for units in out.values():  # well-formed unit strings (random weights
        assert units.split()    # put no bound on argmax-4 values)
        [int(u) for u in units.split()]


def test_ddim_stride_matches_python_respaced_loop(built):
    """stride > 1 must equal a python re-implementation of the IDDPM
    respaced DDIM walk (reference respace.py space_timesteps +
    gaussian_diffusion.py ddim_sample at eta=0): denoise at t, jump to
    alphas_cumprod[t - stride] (clamped to 0); stride >= start_step is a
    single x1-hat jump."""
    task, model, crit, batch, variables = built
    module = model.module
    feature = jnp.asarray(batch["reduce_target"])
    mask = jnp.ones(feature.shape[:2], bool)
    rng = jax.random.PRNGKey(9)
    start_step, stride = 6, 3

    units, recon = ddim_sample(model, variables, feature, mask, rng,
                               start_step=start_step, stride=stride)

    schedule = DDPMSchedule.create(module.timesteps, module.schedule_name)
    r_enc, r_noise = jax.random.split(rng)
    z = module.apply(variables, feature, r_enc,
                     method=LatentDiffusionModule.encode)
    b = z.shape[0]
    t0 = jnp.full((b,), start_step, jnp.int32)
    x = (extract(schedule.sqrt_alphas_cumprod, t0, z.ndim) * z
         + extract(schedule.sqrt_one_minus_alphas_cumprod, t0, z.ndim)
         * jax.random.normal(r_noise, z.shape, z.dtype))
    for time in range(start_step, 0, -stride):
        t = jnp.full((b,), time, jnp.int32)
        noise = module.apply(variables, x, t, mask,
                             method=LatentDiffusionModule.denoise)
        sac = extract(schedule.sqrt_alphas_cumprod, t, noise.ndim)
        s1mac = extract(schedule.sqrt_one_minus_alphas_cumprod, t, noise.ndim)
        x1_hat = safe_div(x - s1mac * noise, sac)
        pred_noise = safe_div(x - sac * x1_hat, s1mac)
        prev = max(time - stride, 0)
        ab_prev = schedule.alphas_cumprod[prev]
        x = x1_hat * jnp.sqrt(ab_prev) + jnp.sqrt(1 - ab_prev) * pred_noise
    feat2, logits2 = module.apply(variables, x, mask,
                                  method=LatentDiffusionModule.decode)
    units2 = jnp.argmax(logits2, axis=-1).astype(jnp.int32) - 4
    np.testing.assert_array_equal(np.asarray(units), np.asarray(units2))
    np.testing.assert_allclose(np.asarray(recon), np.asarray(feat2),
                               rtol=2e-4, atol=2e-4)

    # stride >= start_step: exactly one denoiser call, the x1-hat jump
    units_j, _ = ddim_sample(model, variables, feature, mask, rng,
                             start_step=start_step, stride=start_step)
    t = jnp.full((b,), start_step, jnp.int32)
    x = (extract(schedule.sqrt_alphas_cumprod, t, z.ndim) * z
         + extract(schedule.sqrt_one_minus_alphas_cumprod, t, z.ndim)
         * jax.random.normal(r_noise, z.shape, z.dtype))
    noise = module.apply(variables, x, t, mask,
                         method=LatentDiffusionModule.denoise)
    sac = extract(schedule.sqrt_alphas_cumprod, t, noise.ndim)
    s1mac = extract(schedule.sqrt_one_minus_alphas_cumprod, t, noise.ndim)
    x1_hat = safe_div(x - s1mac * noise, sac)
    pred_noise = safe_div(x - sac * x1_hat, s1mac)
    ab0 = schedule.alphas_cumprod[0]
    x = x1_hat * jnp.sqrt(ab0) + jnp.sqrt(1 - ab0) * pred_noise
    _, logits_j = module.apply(variables, x, mask,
                               method=LatentDiffusionModule.decode)
    np.testing.assert_array_equal(
        np.asarray(units_j),
        np.asarray(jnp.argmax(logits_j, axis=-1).astype(jnp.int32) - 4))
