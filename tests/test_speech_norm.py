"""TranSpeech speaker-normalization utilities: YIN pitch, phase-vocoder
pitch shift, energy norm, InterpLnr rhythm perturbation, gen_SN CLI."""

import numpy as np
import pytest

from diffnorm_tpu.ops.speech_norm import (
    mean_abs_energy,
    normalize_energy,
    pitch_median,
    pitch_shift,
    random_segment_resample,
    yin_cmndf,
    yin_difference,
    yin_pitch,
)

SR = 16000


def sine(freq, seconds=1.0, sr=SR, amp=0.5):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_yin_difference_matches_naive():
    rng = np.random.default_rng(0)
    w, tau_max = 64, 24
    x = rng.normal(size=(3, w)).astype(np.float32)
    d = np.asarray(yin_difference(x, tau_max))
    naive = np.zeros((3, tau_max))
    for b in range(3):
        for tau in range(tau_max):
            diff = x[b, : w - tau] - x[b, tau:]
            naive[b, tau] = np.sum(diff * diff)
    np.testing.assert_allclose(d, naive, rtol=1e-3, atol=1e-3)


def test_yin_cmndf_normalization():
    rng = np.random.default_rng(1)
    d = np.abs(rng.normal(size=(2, 16))).astype(np.float32)
    c = np.asarray(yin_cmndf(d))
    assert np.allclose(c[:, 0], 1.0)
    tau = 5
    expected = d[0, tau] * tau / np.sum(d[0, 1 : tau + 1])
    np.testing.assert_allclose(c[0, tau], expected, rtol=1e-4)


@pytest.mark.parametrize("freq", [110.0, 220.0, 330.0])
def test_yin_recovers_sine_frequency(freq):
    f0, voiced = yin_pitch(sine(freq), SR)
    f0 = np.asarray(f0)[np.asarray(voiced)]
    assert f0.size > 10
    assert abs(np.median(f0) - freq) / freq < 0.02


def test_pitch_median_silence_is_zero():
    assert pitch_median(np.zeros(SR, np.float32), SR) == 0.0


def test_pitch_shift_moves_median_by_ratio():
    wav = sine(160.0)
    out = pitch_shift(wav, SR, 1.25)
    assert out.shape == wav.shape
    med = pitch_median(out, SR)
    assert abs(med - 200.0) / 200.0 < 0.05


def test_energy_normalization():
    wav = sine(100.0, seconds=0.1)
    out = normalize_energy(wav, 0.123)
    assert abs(mean_abs_energy(out) - 0.123) < 1e-5
    assert np.allclose(normalize_energy(np.zeros(100), 0.5), 0.0)


def test_random_segment_resample_interpolates():
    rng = np.random.default_rng(2)
    t, c = 200, 4
    x = np.arange(t, dtype=np.float32)[:, None].repeat(c, 1)
    y = random_segment_resample(x, t, rng)
    # linear interpolation of a ramp stays within the ramp's range and is
    # monotone within the whole output (offsets are cumulative)
    assert y.shape[1] == c
    assert y.min() >= 0 and y.max() <= t - 1
    assert np.all(np.diff(y[:, 0]) >= 0)
    # expected length ~ t (scales are uniform around 1.0); loose bounds
    assert t // 2 <= y.shape[0] <= 2 * t


def test_random_segment_resample_statistics():
    rng = np.random.default_rng(3)
    lens = [
        random_segment_resample(np.ones((300, 2), np.float32), 300,
                                rng).shape[0]
        for _ in range(20)
    ]
    assert 200 < np.mean(lens) < 400


def test_speech_norm_cli(tmp_path):
    from diffnorm_tpu.cli.generate_waveform import write_wav
    from diffnorm_tpu.cli.speech_norm import main

    wav_root = tmp_path / "wavs"
    for split in ("dev",):
        (wav_root / split).mkdir(parents=True)
        write_wav(str(wav_root / split / "a.wav"), sine(150.0, 0.6), SR)
        write_wav(str(wav_root / split / "b.wav"), sine(210.0, 0.6) * 0.4,
                  SR)
    out_root = tmp_path / "out"
    main(["--wav", str(wav_root), "--out", str(out_root),
          "--splits", "dev", "--cpu"])
    results = sorted((out_root / "dev" / "result").glob("*.wav"))
    assert [p.name for p in results] == ["a.wav", "b.wav"]
    from diffnorm_tpu.data.audio import read_audio

    wa, _ = read_audio(str(results[0]))
    wb, _ = read_audio(str(results[1]))
    # energy-normalized to a common mean |x|
    assert abs(np.mean(np.abs(wa)) - np.mean(np.abs(wb))) < 2e-2
    # pitch moved toward the split mean (180 Hz): a up, b down
    ma = pitch_median(wa, SR)
    mb = pitch_median(wb, SR)
    assert ma > 155.0 and mb < 205.0
