"""End-to-end pipeline smoke over synthetic data through the REAL CLI mains
(reference test strategy: tests/test_binaries.py create_dummy_data + running
fairseq_cli.train/generate for a couple of epochs).

Stages (tiny dims, CPU):
  1. train the speech VAE       (cli.train, task speech_decoder)
  2. train the latent diffusion (cli.train, frozen VAE from stage-1 ckpt)
  3. DDIM-normalize the units   (cli.diff_norm_synthesis -> new {split}.tsv)
  4. train NAR S2UT on the normalized manifests (cli.train)
  5. decode with mask-predict   (cli.generate -> generate-*.txt + unit BLEU)
"""

import json
import os

import numpy as np
import pytest

from diffnorm_tpu.config import Config
from diffnorm_tpu.data.manifest import (
    read_translation_manifest,
    write_feature_manifest,
    write_translation_manifest,
)

FEAT_DIM = 24
CODE_SIZE = 12


def synth_data(tmp_path, n=6, seed=0):
    """Reference-format data dir: translation TSVs + per-utt feature dumps +
    source audio features (.npy fbank stand-ins)."""
    rng = np.random.default_rng(seed)
    feat_dir = tmp_path / "feat"
    audio_dir = tmp_path / "audio"
    feat_dir.mkdir()
    audio_dir.mkdir()
    for split, count in [("train", n), ("dev", 2), ("test", 2)]:
        rows, frows = [], []
        for i in range(count):
            t = int(rng.integers(8, 14))
            # runs of repeated units so reduction does something
            units = np.repeat(rng.integers(0, CODE_SIZE, size=t // 2 + 1), 2)[:t]
            feat = rng.normal(size=(t, FEAT_DIM)).astype(np.float32)
            name = f"{split}_utt{i}.feat.npy"
            np.save(feat_dir / name, feat)
            frows.append((name, t))
            src_len = int(rng.integers(20, 30))
            src = rng.normal(size=(src_len, 80)).astype(np.float32)
            np.save(audio_dir / f"{split}_utt{i}.npy", src)
            rows.append({
                "id": f"{split}_utt{i}",
                "src_audio": str(audio_dir / f"{split}_utt{i}.npy"),
                "src_n_frames": src_len,
                "tgt_audio": " ".join(map(str, units)),
                "tgt_n_frames": t,
            })
        write_feature_manifest(str(feat_dir / f"{split}.manifest.tsv"),
                               str(feat_dir), frows)
        write_translation_manifest(str(tmp_path / f"{split}.tsv"), rows)
    return tmp_path, feat_dir


TINY_VAE = dict(
    feature_dim=FEAT_DIM, latent_dim=3, chan_mults=[4], vae_decoder_depth=1,
    vae_decoder_dim_head=8, vae_decoder_heads=2, target_code_size=CODE_SIZE,
)


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    from diffnorm_tpu.cli import diff_norm_synthesis, generate, train

    root, feat_dir = synth_data(tmp_path)
    common = dict(
        data=str(root), tgt_feat_dir=str(feat_dir), batch_size=2,
        lr=1e-3, warmup_updates=2, log_interval=1, max_updates=2,
        keep_last_epochs=1, keep_best_checkpoints=1, seed=3,
        train_subset="train", valid_subset="dev",
    )

    # ---- stage 1: VAE ----------------------------------------------------
    vae_dir = str(tmp_path / "ckpt_vae")
    rc = train.main(Config(
        task="speech_decoder", arch="speech_vae_decoder",
        criterion="speech_vae_decoder_loss", save_dir=vae_dir, cpu=True,
        **TINY_VAE, **common,
    ))
    assert rc == 0
    vae_ckpts = sorted(d for d in os.listdir(vae_dir) if d.startswith("step_")
                       and not d.endswith(".json"))
    assert vae_ckpts, os.listdir(vae_dir)
    vae_ckpt = os.path.join(vae_dir, vae_ckpts[-1])

    # ---- stage 2: latent diffusion over the frozen VAE --------------------
    diff_dir = str(tmp_path / "ckpt_diff")
    rc = train.main(Config(
        task="speech_diffusion_discrete", arch="diff_discrete",
        criterion="ddpm_discrete_loss", save_dir=diff_dir, cpu=True,
        speech_decoder_ckpt=vae_ckpt,
        hidden_dim=16, denoiser_depth=1, wavenet_layers=2, wavenet_stacks=1,
        timesteps=8, **TINY_VAE, **common,
    ))
    assert rc == 0
    diff_ckpts = sorted(d for d in os.listdir(diff_dir) if d.startswith("step_")
                        and not d.endswith(".json"))
    diff_ckpt = os.path.join(diff_dir, diff_ckpts[-1])

    # ---- stage 3: DDIM normalization -> new unit manifests ----------------
    norm_dir = str(tmp_path / "norm_units")
    rc = diff_norm_synthesis.main(Config(
        data=str(root), ckpt=diff_ckpt, tgt_feat_dir=str(feat_dir),
        output_dir=norm_dir, start_step=4, batch_size=4, cpu=True,
        splits="train,dev,test",
        task="speech_diffusion_discrete", arch="diff_discrete",
        criterion="ddpm_discrete_loss",
        hidden_dim=16, denoiser_depth=1, wavenet_layers=2, wavenet_stacks=1,
        timesteps=8, **TINY_VAE,
    ))
    assert rc == 0
    norm_rows = read_translation_manifest(os.path.join(norm_dir, "train.tsv"))
    assert len(norm_rows) == 6
    units = [int(x) for x in norm_rows[0]["tgt_audio"].split()]
    # -4..-1 possible for an untrained LM head (argmax - 4 offset parity,
    # latent_module.py:1450-1451); trained models emit 0..CODE_SIZE-1
    assert all(-4 <= u < CODE_SIZE for u in units)
    # normalized units are reduced (no consecutive duplicates)
    assert all(a != b for a, b in zip(units, units[1:]))

    # copy source-audio info is already in the rewritten manifests; stage 4
    # trains NAR S2UT on them
    nar_dir = str(tmp_path / "ckpt_nar")
    nar_cfg = dict(
        task="speech_to_speech_fasttranslate", arch="nar_s2ut_conformer",
        criterion="nar_speech_to_unit", label_smoothing=0.2,
        encoder_layers=1, decoder_layers=1, encoder_embed_dim=16,
        encoder_ffn_embed_dim=32, encoder_attention_heads=2,
        decoder_attention_heads=2, decoder_embed_dim=16,
        decoder_ffn_embed_dim=32, conv_channels=16,
        depthwise_conv_kernel_size=7, target_code_size=CODE_SIZE,
    )
    stage4 = {**common, **nar_cfg, "data": norm_dir, "save_dir": nar_dir,
              "cpu": True}
    rc = train.main(Config(**stage4))
    assert rc == 0
    nar_ckpts = sorted(d for d in os.listdir(nar_dir) if d.startswith("step_")
                       and not d.endswith(".json"))
    nar_ckpt = os.path.join(nar_dir, nar_ckpts[-1])

    # ---- stage 5: mask-predict decode + unit files -------------------------
    results = str(tmp_path / "results")
    rc = generate.main(Config(
        data=norm_dir, gen_subset="test", path=nar_ckpt, results_path=results,
        iter_decode_max_iter=2, batch_size=2, cpu=True,
        max_target_positions=64, **nar_cfg,
    ))
    assert rc == 0
    gen_file = os.path.join(results, "generate-test.txt")
    assert os.path.exists(gen_file)
    content = open(gen_file).read()
    assert "H-" in content and "T-" in content

    from diffnorm_tpu.eval.unit_bleu import extract_unit_files

    hyp, ref = extract_unit_files(gen_file, results)
    assert os.path.getsize(hyp) > 0
