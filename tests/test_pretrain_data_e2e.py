"""Real-file data path for the self-supervised pretraining tasks: a
wav2vec-style manifest + frame-level k-means label files + dict.km.txt on
disk, loaded through HubertPretrainDataset.from_manifest and trained for a
couple of steps through the REAL train CLI (hubert_pretraining with labels;
audio_pretraining label-free). Covers manifest parsing, label encoding
(+4 specials offset), static-canvas crops, frame alignment, collation, and
the prepare_batch mask draws on real batches."""

import wave

import numpy as np
import pytest


def _write_wav(path, n_samples, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    pcm = (rng.normal(size=n_samples) * 3000).astype(np.int16)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


def _make_data(tmp_path, n_utts=4, with_labels=True, k=16):
    lens = [4000 + 700 * i for i in range(n_utts)]
    (tmp_path / "audio").mkdir()
    with open(tmp_path / "train.tsv", "w") as f:
        f.write(str(tmp_path / "audio") + "\n")
        for i, n in enumerate(lens):
            _write_wav(tmp_path / "audio" / f"u{i}.wav", n, seed=i)
            f.write(f"u{i}.wav\t{n}\n")
    import shutil

    shutil.copy(tmp_path / "train.tsv", tmp_path / "dev.tsv")
    if with_labels:
        rng = np.random.default_rng(0)
        with open(tmp_path / "dict.km.txt", "w") as f:
            for u in range(k):
                f.write(f"{u} 1\n")
        for split in ("train", "dev"):
            with open(tmp_path / f"{split}.{'km'}", "w") as f:
                for n in lens:
                    frames = n // 320 + 2  # 50 Hz-ish label rows
                    f.write(" ".join(
                        str(int(x)) for x in rng.integers(0, k, frames))
                        + "\n")
    return lens


def test_hubert_pretrain_dataset_real_files(tmp_path):
    from diffnorm_tpu.data.dictionary import Dictionary
    from diffnorm_tpu.data.hubert_dataset import (
        HubertPretrainDataset,
        _host_frames_for_samples,
    )

    lens = _make_data(tmp_path, with_labels=True, k=16)
    tgt_dict = Dictionary.load(str(tmp_path / "dict.km.txt"))
    ds = HubertPretrainDataset.from_manifest(
        manifest=str(tmp_path / "train.tsv"),
        label_file=str(tmp_path / "train.km"),
        tgt_dict=tgt_dict,
        max_sample_size=5000, min_sample_size=1000,
    )
    assert len(ds) == len(lens)
    item = ds[0]
    assert item["wav"].shape == (5000,)  # static canvas
    assert item["length"] == min(lens[0], 5000)
    valid = _host_frames_for_samples(item["length"])
    assert (item["target"][:valid] >= 4).all()  # +4 specials offset
    assert (item["target"][valid:] == -1).all()
    batch = ds.collater([ds[0], ds[1]])
    assert batch["src_tokens"].shape == (2, 5000)
    assert batch["target"].shape[0] == 2

    # label-free (wav2vec2) mode
    ds2 = HubertPretrainDataset.from_manifest(
        manifest=str(tmp_path / "train.tsv"),
        max_sample_size=5000, min_sample_size=1000,
    )
    b2 = ds2.collater([ds2[0]])
    assert "target" not in b2 and b2["ntokens"] > 0


@pytest.mark.slow
def test_hubert_pretraining_cli_real_files(tmp_path):
    """2 CLI train steps of hubert_pretraining on real manifest+labels."""
    import subprocess
    import sys

    _make_data(tmp_path, with_labels=True, k=16)
    cmd = [
        sys.executable, "-m", "diffnorm_tpu.cli.train", "--cpu",
        "--task", "hubert_pretraining", "--arch", "hubert",
        "--criterion", "hubert", "--data", str(tmp_path),
        "--labels", "km", "--label-rate", "50",
        "--max-sample-size", "5000", "--min-sample-size", "1000",
        "--conv-feature-layers", "[(16,10,5),(16,3,2)]",
        "--encoder-embed-dim", "32", "--encoder-layers", "1",
        "--encoder-attention-heads", "2", "--encoder-ffn-embed-dim", "64",
        "--final-dim", "16", "--batch-size", "2",
        "--lr", "1e-3", "--warmup-updates", "2", "--max-update", "2",
        "--log-interval", "1", "--save-dir", str(tmp_path / "ckpt"),
        "--valid-subset", "dev",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "training done at step 2" in out.stderr + out.stdout


@pytest.mark.slow
def test_audio_pretraining_cli_real_files(tmp_path):
    """2 CLI train steps of label-free audio_pretraining (wav2vec2)."""
    import subprocess
    import sys

    _make_data(tmp_path, with_labels=False)
    cmd = [
        sys.executable, "-m", "diffnorm_tpu.cli.train", "--cpu",
        "--task", "audio_pretraining", "--arch", "wav2vec2",
        "--criterion", "wav2vec", "--data", str(tmp_path),
        "--max-sample-size", "5000", "--min-sample-size", "1000",
        "--conv-feature-layers", "[(16,10,5),(16,3,2)]",
        "--encoder-embed-dim", "32", "--encoder-layers", "1",
        "--encoder-attention-heads", "2", "--encoder-ffn-embed-dim", "64",
        "--final-dim", "16", "--latent-vars", "8", "--latent-groups", "2",
        "--num-negatives", "4", "--batch-size", "2",
        "--lr", "1e-3", "--warmup-updates", "2", "--max-update", "2",
        "--log-interval", "1", "--save-dir", str(tmp_path / "ckpt"),
        "--valid-subset", "dev",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "training done at step 2" in out.stderr + out.stdout
