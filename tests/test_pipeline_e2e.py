"""End-to-end pipeline smoke over synthetic data through the REAL CLI mains
(reference test strategy: tests/test_binaries.py create_dummy_data + running
fairseq_cli.train/generate for a couple of epochs).

Stages (tiny dims, CPU):
  1. train the speech VAE       (cli.train, task speech_decoder)
  2. train the latent diffusion (cli.train, frozen VAE from stage-1 ckpt)
  3. DDIM-normalize the units   (cli.diff_norm_synthesis -> new {split}.tsv)
  4. train NAR S2UT on the normalized manifests (cli.train)
  5. decode with mask-predict   (cli.generate -> generate-*.txt + unit BLEU)
  6. fine-tune the code-HiFi-GAN vocoder (cli.train_vocoder, MPD/MSD GAN)
  7. synthesize waveforms from the stage-5 units with the fine-tuned
     vocoder (cli.generate_waveform --dur-prediction --reduce)
  8. ASR-BLEU the waveforms (eval.asr_bleu over a materialized CTC ckpt;
     skipped when torch/transformers are unavailable)

Together the eight stages are the full CVSS recipe shape
(scripts/{prepare,vae,diffusion,s2ut}/*.sh + asr_bleu) on synthetic data.
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

    # ---- stage 6: vocoder fine-tune (unit -> waveform MPD/MSD GAN) ---------
    from tests.helpers import write_wav16

    from diffnorm_tpu.cli import train_vocoder

    rng = np.random.default_rng(7)
    voc_audio = tmp_path / "voc_audio"
    voc_audio.mkdir()
    unit_lines = []
    for i in range(4):
        units = rng.integers(0, CODE_SIZE, size=8)
        unit_lines.append(f"voc{i}|{' '.join(map(str, units))}")
        # 320 samples per 50 Hz unit at 16 kHz (data/code_dataset.py)
        write_wav16(voc_audio / f"voc{i}.wav",
                    (rng.normal(size=8 * 320) * 0.1).astype(np.float32))
    units_file = tmp_path / "voc.units"
    units_file.write_text("\n".join(unit_lines) + "\n")
    vcfg = dict(
        num_embeddings=CODE_SIZE, embedding_dim=8,
        upsample_rates=[4, 2], upsample_kernel_sizes=[8, 4],
        upsample_initial_channel=16, resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 2]],
        dur_predictor_params={"var_pred_hidden_dim": 8},
    )
    vcfg_path = tmp_path / "vocoder_cfg.json"
    vcfg_path.write_text(json.dumps(vcfg))
    voc_dir = str(tmp_path / "ckpt_voc")
    rc = train_vocoder.main(Config(
        units_file=str(units_file), audio_dir=str(voc_audio),
        vocoder_cfg=str(vcfg_path), save_dir=voc_dir, cpu=True,
        batch_size=2, crop_units=8, max_update=2, log_interval=1,
        save_interval_updates=2, lr=1e-4,
        mpd_periods=(2, 3), msd_scales=2, disc_width=0.0625,
        n_fft=64, hop_size=32, win_size=64, num_mels=20,
    ))
    assert rc == 0
    voc_ckpts = sorted(d for d in os.listdir(voc_dir)
                       if d.startswith("step_") and not d.endswith(".json"))
    assert voc_ckpts, os.listdir(voc_dir)
    voc_ckpt = os.path.join(voc_dir, voc_ckpts[-1])

    # ---- stage 7: unit -> waveform synthesis with the fine-tuned ckpt -----
    from diffnorm_tpu.cli import generate_waveform

    wav_dir = str(tmp_path / "wavs")
    # append one known-numeric line: an undertrained NAR can emit all-<unk>
    # hypotheses (silence path), and the vocoder forward must still be
    # exercised through the fine-tuned checkpoint
    hyp_plus = str(tmp_path / "hyp_plus.unit")
    with open(hyp_plus, "w") as f:
        f.write(open(hyp).read())
        f.write("0 1 2 3 4 5\n")
    generate_waveform.main([
        "--in-code-file", hyp_plus, "--vocoder", voc_ckpt,
        "--vocoder-cfg", str(vcfg_path), "--results-path", wav_dir,
        "--dur-prediction", "--reduce", "--cpu",
    ])
    wavs = sorted(f for f in os.listdir(wav_dir) if f.endswith("_pred.wav"))
    assert len(wavs) == sum(1 for l in open(hyp_plus) if l.strip())
    import wave as _wave

    last = sorted(wavs, key=lambda f: int(f.split("_")[0]))[-1]
    with _wave.open(os.path.join(wav_dir, last)) as w:
        # 6 units x >=1 predicted duration x 8 upsample samples each
        assert w.getframerate() == 16000 and w.getnframes() >= 6 * 8

    # ---- stage 8: ASR-BLEU over the synthesized waveforms ------------------
    pytest.importorskip("torch")
    pytest.importorskip("transformers")
    from tests.helpers import make_tiny_ctc_checkpoint

    from diffnorm_tpu.eval.asr_bleu import run_asr_bleu

    ctc = make_tiny_ctc_checkpoint(tmp_path / "tiny_ctc")
    ref_path = tmp_path / "refs.txt"
    ref_path.write_text("\n".join("hello world" for _ in wavs) + "\n")
    bleu, transcripts, refs = run_asr_bleu(wav_dir, str(ref_path),
                                           model_name=ctc)
    assert len(transcripts) == len(wavs) and len(refs) == len(wavs)
    assert 0.0 <= bleu <= 100.0  # untrained ASR -> ~0, but a valid score
