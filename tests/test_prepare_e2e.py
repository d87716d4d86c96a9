"""Preprocessing pipeline e2e: WAV files -> (random-weight) HuBERT feature
dump -> k-means fit -> quantization, through cli/prepare.py. Also the
vocoder GAN-training CLI over the produced units."""

import os
import wave

import numpy as np
import pytest


def write_wav(path, seconds=0.6, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    wav = (rng.normal(size=int(sr * seconds)) * 0.1).astype(np.float32)
    pcm = (np.clip(wav, -1, 1) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


@pytest.mark.slow
def test_prepare_pipeline(tmp_path):
    from diffnorm_tpu.cli.prepare import main

    audio = tmp_path / "audio"
    audio.mkdir()
    for i in range(3):
        write_wav(audio / f"utt{i}.wav", seconds=0.5 + 0.1 * i, seed=i)
    manifest = tmp_path / "train_audio.tsv"
    with open(manifest, "w") as f:
        f.write(str(audio) + "\n")
        for i in range(3):
            f.write(f"utt{i}.wav\t{int(16000 * (0.5 + 0.1 * i))}\n")

    feat_dir = str(tmp_path / "feat")
    rc = main(["--cpu", "dump-features", "--manifest", str(manifest),
               "--layer", "2", "--out-dir", feat_dir, "--split", "train"])
    assert rc == 0
    feats = [f for f in os.listdir(feat_dir) if f.endswith(".feat.npy")]
    assert len(feats) == 3
    f0 = np.load(os.path.join(feat_dir, "utt0.feat.npy"))
    assert f0.shape[1] == 768
    # 320x downsampling: 8000 samples -> ~24 frames
    assert 20 <= f0.shape[0] <= 26

    km_path = str(tmp_path / "km.npy")
    rc = main(["--cpu", "learn-kmeans", "--feat-dir", feat_dir,
               "--split", "train", "--num-clusters", "8", "--iters", "3",
               "--out", km_path])
    assert rc == 0
    centroids = np.load(km_path)
    assert centroids.shape == (8, 768)

    units_path = str(tmp_path / "train.units")
    rc = main(["--cpu", "quantize", "--feat-dir", feat_dir,
               "--split", "train", "--kmeans", km_path, "--out", units_path])
    assert rc == 0
    lines = open(units_path).read().strip().split("\n")
    assert len(lines) == 3
    name, units = lines[0].split("|")
    vals = [int(u) for u in units.split()]
    assert all(0 <= v < 8 for v in vals)

    # ---- vocoder GAN training over these units ---------------------------
    import json

    from diffnorm_tpu.cli.train_vocoder import main as voc_main
    from diffnorm_tpu.config import Config

    vcfg = {
        "num_embeddings": 8, "embedding_dim": 8,
        "upsample_rates": [4, 2], "upsample_kernel_sizes": [8, 4],
        "upsample_initial_channel": 16, "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 2]],
    }
    cfg_path = tmp_path / "voc.json"
    cfg_path.write_text(json.dumps(vcfg))
    rc = voc_main(Config(
        cpu=True, units_file=units_path, audio_dir=str(audio),
        vocoder_cfg=str(cfg_path), save_dir=str(tmp_path / "voc_ckpt"),
        batch_size=2, crop_units=8, max_update=2, log_interval=1,
        save_interval_updates=2, n_fft=256, hop_size=64, win_size=256,
        num_mels=20,
    ))
    assert rc == 0
    assert any(d.startswith("step_") for d in os.listdir(tmp_path / "voc_ckpt"))
