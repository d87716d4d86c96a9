"""Execute scripts/parity_eval.sh end-to-end against synthetic stand-in
assets (VERDICT r3 item 4: the asset-day script must be known-executable,
not 85 lines of hope).

Every asset is materialized in the reference's RELEASED format at rehearsal
scale: the verbatim fairseq modules produce the state dicts (same key
layouts as the real checkpoints, tests/test_convert_released_inventory.py),
wrapped in the fairseq save envelope; the k-means codebook is a joblib
sklearn KMeans like mhubert_..._km1000.bin; the ASR stage runs a
materialized HF CTC checkpoint. The script's own staging (convert -> dump ->
quantize -> normalize -> fused decode -> unit BLEU -> ASR-BLEU) runs through
bash exactly as it would on asset day, with CPU_FLAG/MODEL_FLAGS scaling the
shapes down (reference scripts/s2ut/eval.sh +
examples/speech_to_speech/asr_bleu/compute_asr_bleu_custom.py:129-186).
"""

import json
import os
import subprocess
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CODE = 10  # stand-in unit vocabulary (released: 1000)

pytestmark = pytest.mark.slow


def _build_assets(tmp_path):
    from test_convert_released_inventory import _fairseq_envelope
    from reference_loader import (
        load_code_hifigan,
        load_hubert,
        load_latent_module,
    )

    assets = tmp_path / "assets"
    assets.mkdir()

    # mHuBERT: the real HubertModel at rehearsal width (48-d, 1 head = the
    # released 64-d-per-head ratio the dump stage's arch inference assumes)
    hub = load_hubert()
    hcfg = hub.HubertConfig()
    hcfg.encoder_layers = 2
    hcfg.encoder_embed_dim = 48
    hcfg.encoder_attention_heads = 1
    hcfg.encoder_ffn_embed_dim = 96
    hcfg.label_rate = 50
    task_cfg = types.SimpleNamespace(sample_rate=16000, normalize=False,
                                     data="")
    torch.manual_seed(0)
    hubert = hub.HubertModel(hcfg, task_cfg, [list("abcdefgh")])
    torch.save(_fairseq_envelope(hubert.state_dict()),
               str(assets / "mhubert_base_vp_en_es_fr_it3.pt"))

    # k-means codebook in the released joblib format
    sklearn = pytest.importorskip("sklearn")
    import joblib
    from sklearn.cluster import KMeans

    rng = np.random.default_rng(1)
    km = KMeans(n_clusters=CODE, n_init=2, random_state=0).fit(
        rng.normal(size=(200, 48)).astype(np.float32))
    joblib.dump(km, str(assets / "mhubert_base_vp_en_es_fr_it3_L11_km1000.bin"))

    # speech VAE + latent diffusion (verbatim modules; dim=48 with the
    # latent-16 chan_mults [4,3,2] -> true latent width 1)
    lm = load_latent_module()
    torch.manual_seed(2)
    vae = lm.SpeechVAEEncoderDecoder(dim=48, latent_dim=16)
    torch.save(_fairseq_envelope(vae.state_dict()),
               str(assets / "speech_vae.pt"))
    holder = types.SimpleNamespace(encoder=vae)
    ldm = lm.LatentDiscreteModel(holder, 32, 1, timesteps=8)
    ldm.model = lm.Model(32, 1, depth=1, wavenet_layers=2, wavenet_stacks=1)
    torch.save(_fairseq_envelope(ldm.state_dict()),
               str(assets / "diff_discrete.pt"))

    # NAR S2UT conformer (verbatim full model, trajectory-test dims)
    from test_train_trajectory_parity import _nar_args
    from reference_loader import load_dictionary, load_nar_full_model

    m = load_nar_full_model()
    d = load_dictionary().Dictionary()
    for u in range(CODE):
        d.add_symbol(str(u))
    task_ns = types.SimpleNamespace(
        args=types.SimpleNamespace(target_is_code=True),
        target_dictionary=d, multitask_tasks={},
    )
    torch.manual_seed(3)
    nar = m.NARS2UTConformerModel.build_model(_nar_args(), task_ns)
    torch.save(_fairseq_envelope(nar.state_dict()),
               str(assets / "nar_s2ut_fr.pt"))

    # code-HiFi-GAN generator in the released {"generator": sd} layout
    ref_hifi = load_code_hifigan()
    vcfg = {
        "num_embeddings": 16, "embedding_dim": 8, "model_in_dim": 8,
        "upsample_rates": [4, 2], "upsample_kernel_sizes": [8, 4],
        "upsample_initial_channel": 16, "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3, 5]],
        "dur_predictor_params": {
            "encoder_embed_dim": 8, "var_pred_hidden_dim": 8,
            "var_pred_kernel_size": 3, "var_pred_dropout": 0.0,
        },
    }
    torch.manual_seed(4)
    gen = ref_hifi.CodeGenerator(vcfg)
    torch.save({"generator": gen.state_dict()}, str(assets / "g_00500000"))
    (assets / "config.json").write_text(json.dumps(vcfg))
    return assets


def _build_data(tmp_path):
    """S2UT eval manifests + target-speech wavs + reference transcripts."""
    from helpers import write_wav16

    from diffnorm_tpu.data.manifest import write_translation_manifest

    data = tmp_path / "s2ut_data"
    data.mkdir()
    wav_dir = tmp_path / "tgt_wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(5)
    rows, wav_lines = [], []
    for i in range(3):
        src = rng.normal(size=(24, 80)).astype(np.float32)
        np.save(data / f"utt{i}.npy", src)
        units = rng.integers(0, CODE, size=10)
        rows.append({
            "id": f"utt{i}", "src_audio": str(data / f"utt{i}.npy"),
            "src_n_frames": 24,
            "tgt_audio": " ".join(map(str, units)), "tgt_n_frames": 10,
        })
        n = 8000
        write_wav16(wav_dir / f"utt{i}.wav",
                    (rng.normal(size=n) * 0.1).astype(np.float32))
        wav_lines.append(f"utt{i}.wav\t{n}")
    write_translation_manifest(str(data / "test.tsv"), rows)
    audio_manifest = tmp_path / "tgt_audio.tsv"
    audio_manifest.write_text(str(wav_dir) + "\n" + "\n".join(wav_lines) + "\n")
    refs = tmp_path / "refs.txt"
    refs.write_text("\n".join("hello world" for _ in rows) + "\n")
    return data, audio_manifest, refs


def test_parity_eval_script_executes(tmp_path):
    pytest.importorskip("transformers")
    from helpers import make_tiny_ctc_checkpoint

    assets = _build_assets(tmp_path)
    data, audio_manifest, refs = _build_data(tmp_path)
    ctc = make_tiny_ctc_checkpoint(tmp_path / "tiny_ctc")

    model_flags = (
        # VAE/diffusion rehearsal dims (diff_norm_synthesis stage)
        "--feature-dim 48 --latent-dim 1 --chan-mults [4,3,2] "
        "--vae-decoder-depth 6 --vae-decoder-dim-head 96 "
        "--vae-decoder-heads 8 --hidden-dim 32 --denoiser-depth 1 "
        "--wavenet-layers 2 --wavenet-stacks 1 --timesteps 8 "
        # NAR rehearsal dims (fused s2st stage; trajectory-fixture arch)
        "--encoder-layers 2 --decoder-layers 2 --encoder-embed-dim 32 "
        "--encoder-ffn-embed-dim 64 --encoder-attention-heads 2 "
        "--decoder-attention-heads 2 --depthwise-conv-kernel-size 7 "
        "--conv-channels 32 --max-target-positions 32"
    )
    env = dict(
        os.environ,
        ASSETS_DIR=str(assets),
        S2UT_DATA_DIR=str(data),
        TGT_AUDIO_MANIFEST=str(audio_manifest),
        REF_TRANSCRIPTS=str(refs),
        RESULTS_DIR=str(tmp_path / "results"),
        LANG_CODE="fr",
        CPU_FLAG="--cpu",
        MODEL_FLAGS=model_flags,
        START_STEP="4",
        CODE_SIZE=str(CODE),
        ITERS="2",
        BATCH="2",
        ASR_MODEL=str(ctc),
    )
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "parity_eval.sh")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600,
    )
    sys_out = proc.stdout + "\n" + proc.stderr
    assert proc.returncode == 0, sys_out[-4000:]

    results = tmp_path / "results" / "parity_en2fr"
    # stage 1: all five conversions landed (strict inventory audit passed)
    for name in ("hubert", "vae", "diffusion", "nar", "vocoder"):
        assert (results / "converted" / name).is_dir(), name
    # stage 2: features + units for every utterance
    assert (results / "feats" / "test.manifest.tsv").exists()
    units = [l for l in (results / "units" / "test.unit").read_text()
             .splitlines() if l.strip()]
    assert len(units) == 3 and all("|" in l for l in units)
    assert all(0 <= int(u) < CODE
               for l in units for u in l.split("|")[1].split())
    # stage 3: normalized manifests written
    assert (results / "norm" / "test.tsv").exists()
    # stages 4+6: decoded unit streams + one waveform per utterance
    s2st_units = (results / "wav" / "s2st-test.unit").read_text()
    assert len([l for l in s2st_units.splitlines() if l.strip()]) == 3
    wavs = [f for f in os.listdir(results / "wav") if f.endswith("_pred.wav")]
    assert len(wavs) == 3
    # stage 5: unit BLEU recorded
    assert "unit BLEU" in (results / "unit_bleu.txt").read_text()
    # stage 7: ASR-BLEU emitted a score and per-utterance transcripts
    assert "ASR-BLEU" in (results / "asr_bleu.json").read_text()
    transcripts = (results / "asr_transcripts.txt").read_text().splitlines()
    assert len(transcripts) == 3
    assert "parity_eval done" in proc.stdout
