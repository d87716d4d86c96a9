"""Audio augmentation parity vs the REAL reference transforms.

Loads fairseq/data/audio/waveform_transforms/noiseaugment.py and
dataset_transforms/{concataugment,noisyoverlapaugment}.py verbatim
(reference_loader.load_augment_transforms) and drives both sides with an
identical MT19937 stream: the reference through the global np.random, ours
through a RandomState-backed adapter. Outputs must match bit-for-bit —
branch gates, file picks, tile offsets, snippet bounds, SNR draws and the
mixing math all consume the same draws.
"""

import wave

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_loader import load_augment_transforms  # noqa: E402

from diffnorm_tpu.data.augment import (  # noqa: E402
    BabbleAugment,
    ConcatAugment,
    NoiseAugment,
    NoisyOverlapAugment,
    SporadicNoiseAugment,
)

SR = 16000


class _LegacyRng:
    """Generator-API adapter over the legacy MT19937 RandomState stream so
    our transforms consume draws identically to the reference's global
    np.random.{random,uniform,randint,normal} calls."""

    def __init__(self, seed):
        self._rs = np.random.RandomState(seed)

    def integers(self, low, high):
        return self._rs.randint(low, high)

    def random(self):
        return self._rs.random_sample()

    def uniform(self, a, b):
        return self._rs.uniform(a, b)

    def normal(self, mean, std):
        return self._rs.normal(mean, std)


def _write_wav(path, n, seed):
    data = (np.random.default_rng(seed).normal(size=n) * 8000).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(data.tobytes())


@pytest.fixture(scope="module")
def noise_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("noise")
    _write_wav(d / "a.wav", 300, seed=11)
    _write_wav(d / "b.wav", 517, seed=12)
    return str(d)


def _source(n=1000, seed=5, two_d=True):
    x = np.random.default_rng(seed).normal(size=n).astype(np.float32) * 0.1
    return x[None, :] if two_d else x


def _sorted_paths(t):
    # the reference globs in filesystem order; pin both sides to sorted
    t.paths = sorted(t.paths)
    t.n_samples = len(t.paths)
    return t


def test_noise_augment_matches_reference(noise_dir):
    ref = load_augment_transforms()
    for seed in range(6):
        src = _source(seed=40 + seed)
        rt = _sorted_paths(ref.NoiseAugmentTransform(noise_dir, 2.0, 9.0, 0.6))
        np.random.seed(seed)
        want, _ = rt(src.copy(), SR)
        ours = NoiseAugment(noise_dir, 2.0, 9.0, 0.6)
        got, _ = ours(src.copy(), SR, rng=_LegacyRng(seed))
        np.testing.assert_array_equal(got, want, err_msg=f"seed {seed}")


def test_babble_augment_matches_reference(noise_dir):
    ref = load_augment_transforms()
    for seed in range(4):
        src = _source(seed=60 + seed)
        rt = _sorted_paths(ref.BabbleAugmentTransform(noise_dir, rate=1.0))
        np.random.seed(seed)
        want, _ = rt(src.copy(), SR)
        got, _ = BabbleAugment(noise_dir, rate=1.0)(
            src.copy(), SR, rng=_LegacyRng(seed))
        np.testing.assert_array_equal(got, want, err_msg=f"seed {seed}")


def test_sporadic_noise_augment_matches_reference(noise_dir):
    ref = load_augment_transforms()
    kw = dict(rate=1.0, noise_rate=60.0, noise_len_mean=0.01,
              noise_len_std=0.004)
    for seed in range(4):
        src = _source(seed=80 + seed)
        rt = _sorted_paths(ref.SporadicNoiseAugmentTransform(
            noise_dir, SNR_MIN := 5.0, 15.0, kw["rate"], kw["noise_rate"],
            kw["noise_len_mean"], kw["noise_len_std"]))
        np.random.seed(seed)
        want, _ = rt(src.copy(), SR)
        got, _ = SporadicNoiseAugment(noise_dir, SNR_MIN, 15.0, **kw)(
            src.copy(), SR, rng=_LegacyRng(seed))
        np.testing.assert_array_equal(got, want, err_msg=f"seed {seed}")


def test_concat_augment_matches_reference():
    ref = load_augment_transforms()
    n_frames = [1200, 700, 2100, 3400, 50, 900]
    for seed in range(8):
        for rate, max_tokens, attempts in [(0.25, 3000, 5), (1.0, 3000, 5),
                                           (1.0, 0, 3), (1.0, 2200, 1)]:
            rt = ref.ConcatAugment(rate, max_tokens, attempts)
            ours = ConcatAugment(rate, max_tokens, attempts)
            for index in range(len(n_frames)):
                np.random.seed(seed)
                want = rt.find_indices(index, n_frames, len(n_frames))
                got = ours.find_indices(index, n_frames, len(n_frames),
                                        rng=_LegacyRng(seed))
                assert got == want, (seed, rate, max_tokens, attempts, index)


@pytest.mark.parametrize("mixing_noise_rate", [0.0, 0.5, 1.0])
def test_noisy_overlap_matches_reference(noise_dir, mixing_noise_rate):
    ref = load_augment_transforms()
    srcs = [_source(n, seed=s, two_d=False)
            for n, s in [(1000, 1), (700, 2), (900, 3)]]
    for seed in range(5):
        rt = ref.NoisyOverlapAugment(
            rate=0.8, mixing_noise_rate=mixing_noise_rate,
            noise_path=noise_dir, noise_snr_min=-3, noise_snr_max=4,
            utterance_snr_min=-4, utterance_snr_max=6)
        _sorted_paths(rt.noise_shaper)
        np.random.seed(seed)
        want = rt([torch.from_numpy(s.copy()) for s in srcs])
        ours = NoisyOverlapAugment(
            rate=0.8, mixing_noise_rate=mixing_noise_rate,
            noise_path=noise_dir, noise_snr_min=-3, noise_snr_max=4,
            utterance_snr_min=-4, utterance_snr_max=6)
        got = ours([s.copy() for s in srcs], rng=_LegacyRng(seed))
        for i, (g, w) in enumerate(zip(got, want)):
            np.testing.assert_array_equal(
                np.asarray(g, np.float32), w.numpy().astype(np.float32),
                err_msg=f"seed {seed} source {i}")
