"""Trainer infrastructure: checkpoint rotation/best tracking, non-finite
gradient step skipping, watchdog, waveform transforms, progress writer."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnorm_tpu.config import Config, make_trainer_config
from diffnorm_tpu.registry import TASKS
from diffnorm_tpu.train.checkpoint import CheckpointManager


def test_checkpoint_rotation_and_best(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep_last=2, keep_best=1,
                            metric="loss")
    state = {"w": np.ones((2,))}
    metrics = {10: 5.0, 20: 3.0, 30: 4.0, 40: 6.0}
    for step, m in metrics.items():
        mgr.save(step, {"w": np.full((2,), step)}, metric_value=m)
    mgr.finalize()  # saves are async; commit the in-flight one
    # keep_last=2 -> steps 30, 40; keep_best=1 -> step 20 (loss 3.0)
    kept = sorted(
        int(d.split("_")[1]) for d in os.listdir(tmp_path)
        if d.startswith("step_") and not d.endswith(".json")
    )
    assert kept == [20, 30, 40]
    assert mgr.best_step() == 20
    assert mgr.latest_step() == 40
    best, extra = mgr.load_best()
    np.testing.assert_array_equal(best["w"], 20)

    # a fresh manager over the same dir sees the same manifest
    mgr2 = CheckpointManager(str(tmp_path), keep_last=2, keep_best=1)
    assert mgr2.best_step() == 20


def test_trainer_skips_nonfinite_gradients():
    from diffnorm_tpu.train.trainer import Trainer

    cfg = Config(
        arch="speech_vae_decoder", criterion="speech_vae_decoder_loss",
        feature_dim=24, latent_dim=3, chan_mults=[4], vae_decoder_depth=1,
        vae_decoder_dim_head=8, vae_decoder_heads=2, target_code_size=16,
        lr=1e-3,
    )
    task = TASKS.get("dummy_vae").setup_task(cfg)
    model = task.build_model()
    crit = task.build_criterion()
    trainer = Trainer(make_trainer_config(cfg), task, model, crit)
    batch = task.dummy_batch(2, 8)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    p0 = jax.device_get(state.params)

    bad = dict(batch)
    bad["reduce_target"] = batch["reduce_target"] * np.nan
    state2, mets = trainer.train_step(state, [bad], jax.random.PRNGKey(1))
    assert trainer.skipped_steps == 1
    # params unchanged after the skipped update
    p1 = jax.device_get(state2.params)
    chex = [np.allclose(a, b) for a, b in zip(
        jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1))]
    assert all(chex)

    # a good batch afterwards updates normally
    state3, mets = trainer.train_step(state2, [batch], jax.random.PRNGKey(2))
    p2 = jax.device_get(state3.params)
    changed = [not np.allclose(a, b) for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2))]
    assert any(changed)


def test_watchdog_fires(caplog):
    from diffnorm_tpu.utils.watchdog import Watchdog

    w = Watchdog(timeout=0.2, kill=False).start()
    time.sleep(0.7)
    w.stop()
    # the error path logged (stack dump goes to stderr)
    assert any("watchdog" in r.message for r in caplog.records)


def test_noisy_overlap_and_concat_augment():
    from diffnorm_tpu.data.augment import ConcatAugment, NoisyOverlapAugment

    rng = np.random.default_rng(0)
    wav = rng.normal(size=1000).astype(np.float32)
    other = rng.normal(size=800).astype(np.float32)
    # utterance-mixing branch at fixed 10 dB SNR
    aug = NoisyOverlapAugment(rate=1.0, mixing_noise_rate=0.0,
                              utterance_snr_min=10, utterance_snr_max=10)
    out = aug([wav, other], rng=rng)
    assert out[0].shape == wav.shape and out[1].shape == other.shape
    changed = ~np.isclose(out[0], wav)
    assert changed.any() and changed.sum() <= 500  # snippet <= L1/2
    noise = out[0] - wav
    snr = 10 * np.log10(np.mean(wav ** 2) / np.mean(noise[changed] ** 2))
    assert 8.0 < snr < 12.0

    cat = ConcatAugment(rate=1.0, max_tokens=3000)
    n_frames = [1000, 800, 2500]
    idx = cat.find_indices(0, n_frames, 3, rng=rng)
    assert idx[0] == 0 and len(idx) == 2 and idx[1] in (1, 2)
    assert n_frames[idx[0]] + n_frames[idx[1]] < 3000
    # base sample over max_tokens -> no concat
    assert cat.find_indices(2, [1000, 800, 3500], 3, rng=rng) == [2]


def test_progress_writer_json(capsys):
    from diffnorm_tpu.train.progress import ProgressWriter

    w = ProgressWriter(log_format="json")
    w.log({"loss": 1.5}, step=10)
    out = capsys.readouterr().out
    assert '"step": 10' in out and '"loss": 1.5' in out


def test_metric_key_drift_fails_loudly():
    """A criterion whose metric key set changes between traces (here: keyed
    on sequence length, so a new input shape retraces with different keys)
    must raise instead of silently mislabeling the packed metric vector."""
    from diffnorm_tpu.train.trainer import Trainer

    cfg = Config(
        arch="speech_vae_decoder", criterion="speech_vae_decoder_loss",
        feature_dim=24, latent_dim=3, chan_mults=[4], vae_decoder_depth=1,
        vae_decoder_dim_head=8, vae_decoder_heads=2, target_code_size=16,
        lr=1e-3,
    )
    task = TASKS.get("dummy_vae").setup_task(cfg)
    inner = task.build_criterion()

    class DriftingCriterion:
        def __call__(self, model, variables, batch, rng, train=True):
            loss, mets, mutated = inner(model, variables, batch, rng, train)
            if batch["reduce_target"].shape[1] > 8:  # static at trace time
                mets = {**mets, "extra_metric": loss}
            return loss, mets, mutated

    trainer = Trainer(make_trainer_config(cfg), task, task.build_model(),
                      DriftingCriterion())
    state = trainer.init_state(jax.random.PRNGKey(0), task.dummy_batch(2, 8))
    state, _ = trainer.train_step(state, [task.dummy_batch(2, 8)],
                                  jax.random.PRNGKey(1))
    with pytest.raises(ValueError, match="different metric key set"):
        trainer.train_step(state, [task.dummy_batch(2, 12)],
                           jax.random.PRNGKey(2))


def test_declared_metric_keys_checked_at_first_trace():
    """A criterion that declares metric_keys up front fails at the FIRST
    trace if the declaration and the returned dict disagree."""
    from diffnorm_tpu.train.trainer import Trainer

    cfg = Config(
        arch="speech_vae_decoder", criterion="speech_vae_decoder_loss",
        feature_dim=24, latent_dim=3, chan_mults=[4], vae_decoder_depth=1,
        vae_decoder_dim_head=8, vae_decoder_heads=2, target_code_size=16,
        lr=1e-3,
    )
    task = TASKS.get("dummy_vae").setup_task(cfg)
    inner = task.build_criterion()

    class MisdeclaredCriterion:
        metric_keys = ("loss", "not_actually_returned")

        def __call__(self, *a, **k):
            return inner(*a, **k)

    trainer = Trainer(make_trainer_config(cfg), task, task.build_model(),
                      MisdeclaredCriterion())
    state = trainer.init_state(jax.random.PRNGKey(0), task.dummy_batch(2, 8))
    with pytest.raises(ValueError, match="declared"):
        trainer.train_step(state, [task.dummy_batch(2, 8)],
                           jax.random.PRNGKey(1))


def test_grad_accum_conventions():
    """Criterions declare their fairseq grad-accumulation convention
    (trainer.py _grad_step): sum_loss pre-scales grads by sample_size,
    mean_loss leaves them unscaled (fairseq backwards the normalized loss
    verbatim, e.g. speech_vae_decoder_loss), mean_loss_per_batch divides by
    the microbatch count. Pinned end-to-end by
    tests/test_train_trajectory_parity.py; this is the fast regression."""
    from diffnorm_tpu.train.trainer import Trainer

    cfg = Config(
        arch="speech_vae_decoder", criterion="speech_vae_decoder_loss",
        feature_dim=24, latent_dim=3, chan_mults=[4], vae_decoder_depth=1,
        vae_decoder_dim_head=8, vae_decoder_heads=2, target_code_size=16,
        lr=1e-3,
    )
    task = TASKS.get("dummy_vae").setup_task(cfg)
    model = task.build_model()
    crit = task.build_criterion()
    assert getattr(crit, "grad_accum", None) == "mean_loss"
    trainer = Trainer(make_trainer_config(cfg), task, model, crit)
    batch = task.dummy_batch(4, 8)  # sample_size = nsentences = 4
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    import jax.numpy as jnp

    rng = jax.random.PRNGKey(1)
    grads, vec, _ = trainer._jit_grad(state, batch, rng)

    # raw criterion gradient of the (already normalized) loss
    def loss_fn(p):
        loss, _, _ = crit(model, {"params": p}, batch, rng, train=True)
        return loss

    raw = jax.grad(loss_fn)(state.params)
    g0 = jax.tree_util.tree_leaves(grads)[0]
    r0 = jax.tree_util.tree_leaves(raw)[0]
    # mean_loss: NOT multiplied by sample_size (the old sum_loss behavior
    # would make this 4x)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(r0),
                               rtol=1e-4, atol=1e-6)

    # a sum_loss criterion on the same trainer scaffolding DOES pre-scale
    class _SumConv(type(crit)):
        grad_accum = "sum_loss"

    trainer2 = Trainer(make_trainer_config(cfg), task, model,
                       _SumConv(cfg, task))
    grads2, _, _ = trainer2._jit_grad(state, batch, rng)
    g2 = jax.tree_util.tree_leaves(grads2)[0]
    np.testing.assert_allclose(np.asarray(g2), 4.0 * np.asarray(r0),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("task_name,crit_kind", [
    ("dummy_vae", "mean_loss"),          # mean_loss convention
    ("dummy_translation", "sum_loss"),   # sum_loss convention
])
def test_fused_step_matches_split_path(task_name, crit_kind):
    """The TPU fused single-microbatch step (--fused-train-step 1) must
    produce the same update as the split grad+apply path: params, gnorm,
    lr and metrics agree to float tolerance for every grad-accum
    convention (sum_loss's pre/post sample_size scaling cancels exactly in
    the fused program)."""
    from diffnorm_tpu.train.trainer import Trainer

    if task_name == "dummy_vae":
        cfg = Config(
            arch="speech_vae_decoder", criterion="speech_vae_decoder_loss",
            feature_dim=24, latent_dim=3, chan_mults=[4],
            vae_decoder_depth=1, vae_decoder_dim_head=8,
            vae_decoder_heads=2, target_code_size=16, lr=1e-3,
        )
    else:
        cfg = Config(
            arch="transformer", criterion="label_smoothed_cross_entropy",
            label_smoothing=0.1, encoder_embed_dim=16,
            encoder_ffn_embed_dim=32, encoder_layers=1, decoder_layers=1,
            encoder_attention_heads=2, decoder_attention_heads=2,
            decoder_embed_dim=16, decoder_ffn_embed_dim=32,
            tokens_per_sample=10, lr=1e-3,
        )
    task = TASKS.get(task_name).setup_task(cfg)
    model = task.build_model()
    crit = task.build_criterion()
    assert getattr(crit, "grad_accum", "sum_loss") == crit_kind
    batch = task.dummy_batch(2, 8)

    results = {}
    for fused in (False, True):
        cfg["fused_train_step"] = fused
        trainer = Trainer(make_trainer_config(cfg), task, model, crit)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        state, mets = trainer.train_step(state, [batch],
                                         jax.random.PRNGKey(1))
        results[fused] = (jax.device_get(state.params), mets)

    p_split, m_split = results[False]
    p_fused, m_fused = results[True]
    for a, b in zip(jax.tree_util.tree_leaves(p_split),
                    jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
    for k in m_split:
        np.testing.assert_allclose(m_split[k], m_fused[k], rtol=2e-5,
                                   atol=2e-6, err_msg=k)
