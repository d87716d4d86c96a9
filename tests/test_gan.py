"""Vocoder GAN training: discriminator shapes, losses, one d+g step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnorm_tpu.config import Config
from diffnorm_tpu.models.hifigan import CodeGenerator
from diffnorm_tpu.models.hifigan_disc import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    generator_adv_loss,
)
from diffnorm_tpu.ops.mel import mel_spectrogram
from diffnorm_tpu.train.gan_trainer import GanTrainer


def test_mel_shapes_and_grad():
    wav = jnp.asarray(np.random.default_rng(0).normal(size=(2, 2048)), jnp.float32)
    mel = mel_spectrogram(wav, n_fft=512, hop=128, win=512, num_mels=20)
    assert mel.shape[0] == 2 and mel.shape[2] == 20
    g = jax.grad(lambda w: jnp.sum(mel_spectrogram(w, n_fft=512, hop=128,
                                                   win=512, num_mels=20)))(wav)
    assert np.isfinite(np.asarray(g)).all()


def test_discriminators():
    rng = jax.random.PRNGKey(0)
    real = jnp.asarray(np.random.default_rng(0).normal(size=(2, 1024)), jnp.float32)
    fake = real + 0.1
    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    vars_mpd = mpd.init(rng, real, fake)
    outs = mpd.apply(vars_mpd, real, fake)
    assert len(outs) == 2
    d_loss = discriminator_loss(outs)
    g_loss = generator_adv_loss(outs)
    assert np.isfinite(float(d_loss)) and np.isfinite(float(g_loss))

    msd = MultiScaleDiscriminator(scales=2)
    outs2 = msd.apply(msd.init(rng, real, fake), real, fake)
    assert len(outs2) == 2


def test_gan_train_step():
    gen = CodeGenerator(
        num_embeddings=10, embedding_dim=8,
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), dur_predictor=True,
    )
    cfg = Config(lr=1e-4, n_fft=64, hop_size=32, win_size=64, num_mels=20)
    trainer = GanTrainer(gen, cfg)
    rng = np.random.default_rng(0)
    code = jnp.asarray(rng.integers(0, 10, size=(2, 16)), jnp.int32)
    wav = jnp.asarray(rng.normal(size=(2, 16 * 8)) * 0.1, jnp.float32)
    state = trainer.init_state(jax.random.PRNGKey(0), code, wav)
    durations = jnp.ones((2, 16), jnp.int32)
    state, mets = trainer.train_step(
        state, {"code": code, "wav": wav, "durations": durations}
    )
    for k in ("loss_d", "loss_g", "mel", "adv", "fm", "dur_mse"):
        assert np.isfinite(mets[k]), (k, mets)
    assert int(state.step) == 1
    # a second step must reuse the jitted programs and still be finite
    state, mets2 = trainer.train_step(
        state, {"code": code, "wav": wav, "durations": durations}
    )
    assert np.isfinite(mets2["loss_g"])


def test_scale_discriminator_fractional_width():
    """disc_width values where int(c*w) is not a multiple of a layer's OWN
    feature_group_count (e.g. 0.1: 1024*0.1=102 vs groups=16) must still
    build — output channels round up to lcm(own groups, next groups)."""
    from diffnorm_tpu.models.hifigan_disc import ScaleDiscriminator

    wav = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 512)), jnp.float32)
    for width in (0.1, 0.3, 0.07):
        d = ScaleDiscriminator(width=width)
        score, fmaps = d.apply(d.init(jax.random.PRNGKey(0), wav), wav)
        assert np.isfinite(np.asarray(score)).all()
        assert len(fmaps) == 8


def test_dedup_dur_labels_and_training():
    """Run-length duration labels for dur-predictor fine-tuning (reference
    hubert_to_speech.py:67-92): reduced units + durations summing to the
    crop, -100 on padded slots, and a finite masked dur_mse in the G step."""
    from diffnorm_tpu.data.code_dataset import CodeToSpeechDataset

    units = np.asarray([5, 5, 5, 2, 2, 7, 7, 7], np.int32)
    wav = np.zeros(len(units) * 320, np.float32)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        from tests.helpers import write_wav16

        write_wav16(f"{td}/u0.wav", wav)
        (open(f"{td}/u.units", "w")
         ).write("u0|" + " ".join(map(str, units)) + "\n")
        ds = CodeToSpeechDataset.from_files(
            f"{td}/u.units", td, crop_units=8, is_train=False,
            dedup_dur=True)
        item = ds[0]
    np.testing.assert_array_equal(item["dur_code"][:3], [5, 2, 7])
    np.testing.assert_array_equal(item["durations"][:3], [3, 2, 3])
    assert (item["durations"][3:] == -100).all()
    assert item["durations"][item["durations"] > 0].sum() == 8

    batch = ds.collater([item, item])
    gen = CodeGenerator(
        num_embeddings=8, embedding_dim=8, upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4), upsample_initial_channel=16,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 2),),
        dur_predictor=True,
    )
    trainer = GanTrainer(gen, Config(
        lr=1e-4, n_fft=64, hop_size=32, win_size=64, num_mels=20,
        mpd_periods=(2, 3), msd_scales=2, disc_width=0.0625))
    state = trainer.init_state(
        jax.random.PRNGKey(0), jnp.asarray(batch["code"][:1]),
        jnp.asarray(batch["wav"][:1]))
    state, mets = trainer.train_step(state, batch)
    assert np.isfinite(mets["dur_mse"]) and np.isfinite(mets["loss_g"])


def test_vocoder_dataset_augment_wiring(tmp_path):
    """data_cfg waveform_transforms (noiseaugment on the crop) and
    dataset_transforms (batch noisy-overlap in the collater) change the
    waveform but not the codes, deterministically per seed."""
    from tests.helpers import write_wav16

    from diffnorm_tpu.data.code_dataset import CodeToSpeechDataset

    rng = np.random.default_rng(3)
    units = rng.integers(0, 8, size=16).astype(np.int32)
    wav = rng.normal(size=len(units) * 320).astype(np.float32) * 0.1
    write_wav16(tmp_path / "u0.wav", wav)
    write_wav16(tmp_path / "u1.wav", wav[::-1])
    (tmp_path / "noise").mkdir()
    write_wav16(tmp_path / "noise" / "n.wav",
                rng.normal(size=900).astype(np.float32) * 0.1)
    with open(tmp_path / "u.units", "w") as f:
        f.write("u0|" + " ".join(map(str, units)) + "\n")
        f.write("u1|" + " ".join(map(str, units)) + "\n")
    data_cfg = {
        "waveform_transforms": {"_train": ["noiseaugment"]},
        "noiseaugment": {"samples_path": str(tmp_path / "noise"),
                         "rate": 1.0, "snr_min": 5, "snr_max": 10},
        "dataset_transforms": {"_train": ["noisyoverlapaugment"]},
        "noisyoverlapaugment": {"rate": 1.0, "mixing_noise_rate": 0.0},
    }

    def build(cfg, seed=7):
        return CodeToSpeechDataset.from_files(
            str(tmp_path / "u.units"), str(tmp_path), crop_units=8,
            is_train=True, seed=seed, data_cfg=cfg)

    plain = build(None)
    aug = build(data_cfg)
    b0 = plain.collater([plain[0], plain[1]])
    b1 = aug.collater([aug[0], aug[1]])
    np.testing.assert_array_equal(b0["code"], b1["code"])
    assert not np.allclose(b0["wav"], b1["wav"])
    assert b1["wav"].dtype == np.float32
    # deterministic under the seeded pipeline rng
    d2 = build(data_cfg)
    b2 = d2.collater([d2[0], d2[1]])
    np.testing.assert_array_equal(b1["wav"], b2["wav"])
    # eval split ignores the _train blocks
    ev = CodeToSpeechDataset.from_files(
        str(tmp_path / "u.units"), str(tmp_path), crop_units=8,
        is_train=False, data_cfg=data_cfg)
    assert not ev.waveform_transforms and not ev.dataset_transforms
