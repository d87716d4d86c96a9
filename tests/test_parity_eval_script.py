"""Execute scripts/parity_eval.sh end-to-end against synthetic stand-in
assets — with GATED quality numbers, not just structure (VERDICT r3 item 4
made the script executable; VERDICT r4 item 2 demands the rehearsal catch
silent unit permutations / offset bugs, which structure checks cannot).

Every asset is materialized in the reference's RELEASED format at rehearsal
scale: the verbatim fairseq modules produce the state dicts (same key
layouts as the real checkpoints, tests/test_convert_released_inventory.py),
wrapped in the fairseq save envelope; the k-means codebook is a joblib
sklearn KMeans like mhubert_..._km1000.bin; the ASR stage runs a
materialized HF CTC checkpoint.

The quality gates work because two of the stand-ins are TRAINED to
memorization before being saved:

* the NAR S2UT conformer is trained (in torch, on the verbatim module) to
  map each eval utterance's source features to the REDUCED target units
  the pipeline itself derives (hubert dump -> k-means quantize, computed
  in-test with the same CLIs stage 2 runs) — so stage 5's unit BLEU vs
  the reduced quantized references is ~100 when conversion + decode are
  correct, and collapses if a conversion permutes unit embeddings or an
  offset is dropped anywhere in the chain;
* the tiny wav2vec2-CTC ASR is trained (in torch) to transcribe the
  waveforms the code-HiFi-GAN stand-in synthesizes for exactly those unit
  streams into per-utterance DISTINCT transcripts — so stage 7's ASR-BLEU
  is ~100 when the vocoder conversion + fused synthesis are faithful, and
  collapses if the waveforms change.

The script runs twice: NORMALIZE=1 (exercises the diff_norm stage;
structure asserted, ASR-BLEU gated) then NORMALIZE=0 (stage 5 re-scored
against the reduced quantized units; unit BLEU gated). Reference:
scripts/s2ut/eval.sh + examples/speech_to_speech/asr_bleu/
compute_asr_bleu_custom.py:129-186.
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
UNIT_GATE = 50.0
ASR_GATE = 50.0

pytestmark = pytest.mark.slow

# per-utterance DISTINCT transcripts over the tiny CTC vocab letters —
# identical lines would let a mis-paired or permuted pipeline still score
TEXTS = ["the cat", "we do a lot", "hello bold cow"]


def _build_hubert_km_assets(tmp_path):
    from test_convert_released_inventory import _fairseq_envelope

    from reference_loader import load_hubert

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
    pytest.importorskip("sklearn")
    import joblib
    from sklearn.cluster import KMeans

    rng = np.random.default_rng(1)
    km = KMeans(n_clusters=CODE, n_init=2, random_state=0).fit(
        rng.normal(size=(200, 48)).astype(np.float32))
    joblib.dump(km,
                str(assets / "mhubert_base_vp_en_es_fr_it3_L11_km1000.bin"))
    return assets


def _build_vae_diffusion_assets(assets):
    from test_convert_released_inventory import _fairseq_envelope

    from reference_loader import load_latent_module

    # speech VAE + latent diffusion (verbatim modules; dim=48 with the
    # latent-16 chan_mults [4,3,2] -> true latent width 1). Random weights:
    # the normalization stage is exercised structurally (NORMALIZE=1 run);
    # quality gates ride the NORMALIZE=0 pass.
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


def _build_data(tmp_path):
    """S2UT eval manifests + target-speech wavs + DISTINCT transcripts."""
    from helpers import write_wav16

    from diffnorm_tpu.data.manifest import write_translation_manifest

    data = tmp_path / "s2ut_data"
    data.mkdir()
    wav_dir = tmp_path / "tgt_wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(5)
    rows, wav_lines = [], []
    for i in range(len(TEXTS)):
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
    audio_manifest.write_text(str(wav_dir) + "\n" + "\n".join(wav_lines)
                              + "\n")
    refs = tmp_path / "refs.txt"
    refs.write_text("\n".join(TEXTS) + "\n")
    return data, audio_manifest, refs


def _expected_units(tmp_path, assets, audio_manifest):
    """Re-derive the unit streams stage 2 will produce, with the SAME CLIs
    (convert -> dump-features -> quantize); deterministic, so the trained
    NAR's targets equal the script's references unless a conversion bug
    changes them — which is exactly what the gate must catch."""
    from diffnorm_tpu.cli import convert_checkpoint, prepare
    from diffnorm_tpu.eval.unit_bleu import read_unit_lines

    pre = tmp_path / "precheck"
    rc = convert_checkpoint.main([
        "--type", "hubert",
        "--input", str(assets / "mhubert_base_vp_en_es_fr_it3.pt"),
        "--output", str(pre / "hubert")])
    assert rc in (0, None)
    rc = prepare.main([
        "--cpu", "dump-features", "--manifest", str(audio_manifest),
        "--hubert-ckpt", str(pre / "hubert"), "--layer", "11",
        "--split", "test", "--out-dir", str(pre / "feats")])
    assert rc in (0, None)
    rc = prepare.main([
        "--cpu", "quantize", "--feat-dir", str(pre / "feats"),
        "--split", "test",
        "--kmeans", str(assets /
                        "mhubert_base_vp_en_es_fr_it3_L11_km1000.bin"),
        "--out", str(pre / "test.unit")])
    assert rc in (0, None)
    return {uid: np.array([int(u) for u in units.split()])
            for uid, units in read_unit_lines(str(pre / "test.unit")).items()}


def _build_trained_nar_asset(assets, data, units_map):
    """Train the verbatim torch NAR to memorize src features -> REDUCED
    quantized units, then save it in the fairseq envelope."""
    from test_convert_released_inventory import _fairseq_envelope
    from test_train_trajectory_parity import _nar_args

    from reference_loader import load_dictionary, load_nar_full_model

    from diffnorm_tpu.data.manifest import read_translation_manifest
    from diffnorm_tpu.ops.unit_reduce import reduce_units
    from diffnorm_tpu.tasks.nar_s2ut_task import random_mask

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
    nar.train()

    rows = read_translation_manifest(str(data / "test.tsv"))
    srcs, tgt_rows = [], []
    for r in rows:
        srcs.append(np.load(r["src_audio"]))
        red, _, _ = reduce_units(units_map[r["id"]])
        tgt_rows.append(np.concatenate([red + 4, [2]]))  # +4 offset, eos
    B = len(srcs)
    T = max(len(t) for t in tgt_rows)
    tgt = np.full((B, T), 1, np.int64)  # pad=1
    for i, t in enumerate(tgt_rows):
        tgt[i, :len(t)] = t
    src = np.stack(srcs).astype(np.float32)
    lengths = np.full((B,), src.shape[1], np.int64)

    src_t = torch.from_numpy(src)
    len_t = torch.from_numpy(lengths)
    tgt_t = torch.from_numpy(tgt)
    opt = torch.optim.Adam(nar.parameters(), lr=2e-3)
    final = None
    for step in range(400):
        prev = torch.from_numpy(
            random_mask(tgt, np.random.default_rng(step))).long()
        logits, extra = nar(src_t, len_t, prev, tgt_tokens=tgt_t,
                            return_all_hiddens=True)
        masks = extra["word_ins_mask"]
        loss_w = torch.nn.functional.cross_entropy(
            logits[masks].float(), tgt_t[masks].view(-1))
        loss_len = torch.nn.functional.cross_entropy(
            extra["length_out"].float(), extra["length_tgt"].view(-1))
        loss = loss_w + loss_len
        opt.zero_grad()
        loss.backward()
        opt.step()
        final = float(loss.detach())
    assert final is not None and final < 0.5, (
        f"NAR stand-in failed to memorize (loss {final:.3f})")
    nar.eval()
    torch.save(_fairseq_envelope(nar.state_dict()),
               str(assets / "nar_s2ut_fr.pt"))
    return d


def _build_vocoder_asset(assets):
    from reference_loader import load_code_hifigan

    ref_hifi = load_code_hifigan()
    vcfg = {
        "num_embeddings": 16, "embedding_dim": 8, "model_in_dim": 8,
        # x64 total upsample: unit streams of ~20 reduced units map to
        # >=1280 samples, clearing the ASR conv extractor's 640-sample
        # receptive-field floor (asr_bleu.transcribe_file)
        "upsample_rates": [8, 8], "upsample_kernel_sizes": [16, 16],
        "upsample_initial_channel": 16, "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3, 5]],
        "dur_predictor_params": {
            "encoder_embed_dim": 8, "var_pred_hidden_dim": 8,
            "var_pred_kernel_size": 3, "var_pred_dropout": 0.0,
        },
    }
    torch.manual_seed(4)
    gen = ref_hifi.CodeGenerator(vcfg)
    gen.eval()
    torch.save({"generator": gen.state_dict()}, str(assets / "g_00500000"))
    (assets / "config.json").write_text(json.dumps(vcfg))
    return gen


def _build_trained_ctc_asset(tmp_path, gen, units_map, data):
    """Synthesize each eval utterance's waveform with the torch vocoder
    stand-in (dur_prediction, as the fused s2st stage runs it) and train
    the tiny CTC to transcribe it to its DISTINCT reference text."""
    from helpers import make_tiny_ctc_checkpoint, write_wav16
    from transformers import AutoModelForCTC, AutoProcessor

    from diffnorm_tpu.data.audio import read_audio
    from diffnorm_tpu.data.manifest import read_translation_manifest
    from diffnorm_tpu.eval.asr_bleu import normalize_text
    from diffnorm_tpu.ops.unit_reduce import reduce_units

    ctc_dir = make_tiny_ctc_checkpoint(tmp_path / "tiny_ctc")
    processor = AutoProcessor.from_pretrained(ctc_dir)
    model = AutoModelForCTC.from_pretrained(ctc_dir)
    model.train()

    wavs = []
    rows = read_translation_manifest(str(data / "test.tsv"))
    for i, r in enumerate(rows):
        red, _, _ = reduce_units(units_map[r["id"]])
        with torch.no_grad():
            wav = gen(code=torch.from_numpy(np.asarray(red))[None].long(),
                      dur_prediction=True).view(-1).numpy()
        # round-trip through the same 16-bit PCM the pipeline writes
        p = tmp_path / f"ctc_train_{i}.wav"
        write_wav16(p, wav)
        wavs.append(read_audio(str(p))[0])

    labels = [processor.tokenizer(normalize_text(t)).input_ids
              for t in TEXTS]
    unk = processor.tokenizer.unk_token_id
    assert all(unk not in ids for ids in labels), labels
    # memorization recipe (calibrated round 5): spec-augment off, the
    # random conv extractor FROZEN (updating it concurrently destabilizes
    # from-scratch CTC into blank collapse), all utterances in ONE padded
    # batch per step (per-sample alternation oscillates), grad clip
    model.config.apply_spec_augment = False
    model.config.ctc_zero_infinity = True
    model.freeze_feature_encoder()

    maxl = max(len(ids) for ids in labels)
    lab = torch.full((len(labels), maxl), -100, dtype=torch.long)
    for i, ids in enumerate(labels):
        lab[i, :len(ids)] = torch.tensor(ids)
    inputs = processor([w.astype(np.float32) for w in wavs],
                       sampling_rate=16000, return_tensors="pt",
                       padding=True)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    torch.manual_seed(0)
    final = None
    for step in range(1500):
        noisy = (inputs.input_values
                 + 2e-3 * torch.randn_like(inputs.input_values))
        out = model(noisy, labels=lab)
        opt.zero_grad()
        out.loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        final = float(out.loss.detach())
    # phase 2: per-sample UNPADDED fine-tune — the scoring pipeline
    # transcribes each wav individually, and the padded-batch input
    # statistics (do_normalize over zero tails + global attention) differ
    # enough to garble unpadded eval without this
    for g in opt.param_groups:
        g["lr"] = 3e-4
    for step in range(600):
        i = step % len(wavs)
        one = processor(wavs[i].astype(np.float32), sampling_rate=16000,
                        return_tensors="pt")
        noisy = (one.input_values
                 + 2e-3 * torch.randn_like(one.input_values))
        out = model(noisy, labels=torch.tensor([labels[i]]))
        opt.zero_grad()
        out.loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        final = float(out.loss.detach())
    model.eval()
    # memorization check: greedy decode of the clean round-tripped wavs
    hyps = []
    with torch.no_grad():
        for w in wavs:
            inputs = processor(w.astype(np.float32), sampling_rate=16000,
                               return_tensors="pt")
            ids = model(inputs.input_values).logits.argmax(-1)
            hyps.append(normalize_text(processor.batch_decode(ids)[0]))
    expect = [normalize_text(t) for t in TEXTS]
    assert hyps == expect, (
        f"CTC stand-in failed to memorize (loss {final:.3f}): "
        f"{hyps} != {expect}")
    model.save_pretrained(str(ctc_dir))
    return ctc_dir


def _score(text, prefix):
    for line in text.splitlines():
        if prefix in line:
            return float(line.split(prefix)[-1].strip())
    raise AssertionError(f"{prefix!r} not found in: {text[-500:]}")


def test_parity_eval_script_executes(tmp_path):
    pytest.importorskip("transformers")

    data, audio_manifest, refs = _build_data(tmp_path)
    assets = _build_hubert_km_assets(tmp_path)
    units_map = _expected_units(tmp_path, assets, audio_manifest)
    assert sorted(units_map) == [f"utt{i}" for i in range(len(TEXTS))]
    _build_vae_diffusion_assets(assets)
    _build_trained_nar_asset(assets, data, units_map)
    gen = _build_vocoder_asset(assets)
    ctc = _build_trained_ctc_asset(tmp_path, gen, units_map, data)

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
    n = len(TEXTS)
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "parity_eval.sh")],
        cwd=REPO, env=dict(env, NORMALIZE="1"),
        capture_output=True, text=True, timeout=3600,
    )
    sys_out = proc.stdout + "\n" + proc.stderr
    assert proc.returncode == 0, sys_out[-4000:]

    results = tmp_path / "results" / "parity_en2fr"
    # stage 1: all five conversions landed (strict inventory audit passed)
    for name in ("hubert", "vae", "diffusion", "nar", "vocoder"):
        assert (results / "converted" / name).is_dir(), name
    # stage 2: features + units for every utterance — and the SAME streams
    # the in-test precheck derived (the NAR's training targets)
    assert (results / "feats" / "test.manifest.tsv").exists()
    units = [l for l in (results / "units" / "test.unit").read_text()
             .splitlines() if l.strip()]
    assert len(units) == n and all("|" in l for l in units)
    for line in units:
        uid, stream = line.split("|", 1)
        np.testing.assert_array_equal(
            np.array([int(u) for u in stream.split()]), units_map[uid])
    # stage 3: normalized manifests written
    assert (results / "norm" / "test.tsv").exists()
    # stages 4+6: decoded unit streams + one waveform per utterance
    s2st_units = (results / "wav" / "s2st-test.unit").read_text()
    assert len([l for l in s2st_units.splitlines() if l.strip()]) == n
    wavs = [f for f in os.listdir(results / "wav")
            if f.endswith("_pred.wav")]
    assert len(wavs) == n
    # stage 5 (NORMALIZE=1): structural only — the normalization stand-in
    # is random-weight, so its rewritten references carry no quality signal
    assert "unit BLEU" in (results / "unit_bleu.txt").read_text()
    # stage 7 GATE: the trained CTC transcribes the synthesized waveforms
    # back to the per-utterance transcripts — silent waveform corruption
    # (vocoder conversion, unit permutation, wav<->transcript mispairing)
    # collapses this score
    asr_bleu = _score((results / "asr_bleu.json").read_text(), "ASR-BLEU:")
    assert asr_bleu >= ASR_GATE, f"ASR-BLEU {asr_bleu} < {ASR_GATE}"
    transcripts = (results / "asr_transcripts.txt").read_text().splitlines()
    assert len(transcripts) == n
    assert "parity_eval done" in proc.stdout

    # ---- second pass: NORMALIZE=0 re-scores stage 5 against the reduced
    # quantized units (decode targets) — the unit-level quality gate
    proc2 = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "parity_eval.sh")],
        cwd=REPO, env=dict(env, NORMALIZE="0"),
        capture_output=True, text=True, timeout=1800,
    )
    assert proc2.returncode == 0, (proc2.stdout + proc2.stderr)[-4000:]
    unit_bleu = _score((results / "unit_bleu.txt").read_text(),
                       "unit BLEU:")
    assert unit_bleu >= UNIT_GATE, f"unit BLEU {unit_bleu} < {UNIT_GATE}"
