"""The DiffNorm effect, demonstrated end-to-end on synthetic data (VERDICT
r3 item 1 — the core thesis of the system, shown working, not just pinned).

Synthetic world: 4 template unit sequences; every training utterance is a
template whose reduced stream carries random aligned substitutions at 15% of
positions (the analogue of CVSS's idiosyncratic speaker/acoustic unit noise
— non-memorizable because each of the 512 utterances has a distinct
corruption pattern) plus per-frame feature noise. The VAE compresses
features to latents; the latent diffusion trains on the frozen-VAE latents
of this NOISY corpus — exactly the real recipe
(scripts/vae/train.sh + scripts/diffusion/train.sh shapes).

Gates, in pipeline order:
 1. VAE reconstruction: LM-head accuracy on the training corpus >= 0.95
    (chance 1/16).
 2. ddim_sample faithfulness at light noise (reference's own validation
    signal, latent_module.py:1453-1471): accuracy vs the INPUT units at
    start_step=4 >= 0.95.
 3. RECOVERY: normalizing the corpus at start_step=16 with the respaced
    single-jump chain (stride=16; IDDPM respace.py semantics) moves units
    TOWARD the clean templates: normalized-vs-clean accuracy beats the
    corrupted baseline by >= 0.01 (measured +0.028 at this budget; the
    corrupted tokens are genuinely re-estimated from context by the
    diffusion prior, fixes >> breaks).
 4. Downstream composition (the paper's raison d'etre, arXiv 2405.13274):
    (a) target-level A/B — the normalized training targets agree with the
    clean templates strictly more than the corrupted targets do; (b) an
    NAR S2UT model trained on the NORMALIZED targets mask-predict-decodes
    the clean templates at >= 95 unit-BLEU (the full
    VAE -> diffusion -> normalize -> NAR -> decode chain composes into a
    clean translator). A decode-level corrupted-vs-normalized BLEU gap is
    NOT asserted: measured at this scale BOTH arms saturate at 100 — a
    converged CMLM's position-wise argmax is itself a denoiser of
    position-independent target noise (the conditional mode given the
    source equals the clean template), so the paper's +BLEU can only
    manifest on data whose noise modes exceed what marginal argmax
    erases (real CVSS); the corrupted arm is still trained/decoded and
    its BLEU printed for the record.

Heavy (VAE 2k + diffusion 12k + 2x NAR CLI trainings on one CPU core,
~40-50 min) — slow-marked; the measured margins are recorded in
PERFORMANCE.md "DiffNorm effect".
"""

import os

import numpy as np
import pytest

from diffnorm_tpu.config import Config
from diffnorm_tpu.data.manifest import (
    read_translation_manifest,
    write_feature_manifest,
    write_translation_manifest,
)
from diffnorm_tpu.ops.unit_reduce import reduce_units

pytestmark = pytest.mark.slow

CODE, FEAT, T_RED, SIGMA, P_CORRUPT = 16, 32, 8, 0.1, 0.15
N_TEMPLATES, REPEATS = 4, 128
TIMESTEPS, START, STRIDE = 32, 16, 16

TINY_VAE = dict(
    feature_dim=FEAT, latent_dim=4, chan_mults=[4], vae_decoder_depth=2,
    vae_decoder_dim_head=8, vae_decoder_heads=2, target_code_size=CODE,
)
DIFF_CFG = dict(hidden_dim=64, denoiser_depth=3, wavenet_layers=6,
                wavenet_stacks=1, timesteps=TIMESTEPS)


def _templates(rng):
    out = []
    for _ in range(N_TEMPLATES):
        seq = [int(rng.integers(0, CODE))]
        while len(seq) < T_RED:
            u = int(rng.integers(0, CODE))
            if u != seq[-1]:
                seq.append(u)
        out.append(np.array(seq))
    return out


def _corrupt(red, rng):
    """Aligned substitutions: adjacent tokens stay distinct so
    reduce(expand(red)) == red and positions stay template-aligned."""
    red = red.copy()
    k = max(1, int(round(P_CORRUPT * len(red))))
    for j in rng.choice(len(red), size=k, replace=False):
        bad = {red[j]}
        if j > 0:
            bad.add(red[j - 1])
        if j < len(red) - 1:
            bad.add(red[j + 1])
        red[j] = rng.choice([u for u in range(CODE) if u not in bad])
    return red


def _synth_corpus(root):
    """Noisy training corpus in the reference data layout + metas for the
    metrics: (template_idx, clean_template, corrupted_reduced, keep)."""
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(CODE, FEAT)).astype(np.float32)
    src_emb = rng.normal(size=(N_TEMPLATES, 20, 80)).astype(np.float32)
    templates = _templates(rng)
    feat_dir = root / "feat"
    feat_dir.mkdir(parents=True)
    data_rng = np.random.default_rng(1)
    rows, frows, meta = [], [], []
    for i in range(N_TEMPLATES * REPEATS):
        ti = i % N_TEMPLATES
        red = _corrupt(templates[ti], data_rng)
        runs = data_rng.integers(2, 4, size=len(red))
        full = np.repeat(red, runs)
        feat = (emb[full] + SIGMA * data_rng.normal(size=(len(full), FEAT))
                ).astype(np.float32)
        name = f"train_utt{i}.feat.npy"
        np.save(feat_dir / name, feat)
        frows.append((name, len(full)))
        src = (src_emb[ti]
               + 0.05 * data_rng.normal(size=src_emb[ti].shape)
               ).astype(np.float32)
        np.save(root / f"train_utt{i}_src.npy", src)
        rows.append({
            "id": f"train_utt{i}",
            "src_audio": str(root / f"train_utt{i}_src.npy"),
            "src_n_frames": 20,
            "tgt_audio": " ".join(map(str, full)),
            "tgt_n_frames": len(full),
        })
        _, _, keep = reduce_units(full)
        meta.append((ti, templates[ti], red, keep, feat[keep]))
    write_feature_manifest(str(feat_dir / "train.manifest.tsv"),
                           str(feat_dir), frows)
    write_translation_manifest(str(root / "train.tsv"), rows)
    # dev: 8 more noisy utterances (training-loop validation only)
    dev_rows, dev_frows = [], []
    for i in range(8):
        ti = i % N_TEMPLATES
        red = _corrupt(templates[ti], data_rng)
        full = np.repeat(red, data_rng.integers(2, 4, size=len(red)))
        feat = (emb[full] + SIGMA * data_rng.normal(size=(len(full), FEAT))
                ).astype(np.float32)
        name = f"dev_utt{i}.feat.npy"
        np.save(feat_dir / name, feat)
        dev_frows.append((name, len(full)))
        dev_rows.append({
            "id": f"dev_utt{i}", "src_audio": rows[i]["src_audio"],
            "src_n_frames": 20,
            "tgt_audio": " ".join(map(str, full)),
            "tgt_n_frames": len(full),
        })
    write_feature_manifest(str(feat_dir / "dev.manifest.tsv"),
                           str(feat_dir), dev_frows)
    write_translation_manifest(str(root / "dev.tsv"), dev_rows)
    return emb, src_emb, templates, rows, meta


def _train_cli(save_dir, max_updates, lr, extra):
    from diffnorm_tpu.cli import train

    rc = train.main(Config(
        save_dir=str(save_dir), cpu=True, batch_size=8, lr=lr,
        warmup_updates=50, log_interval=2000, max_updates=max_updates,
        save_interval=200, validate_interval=200,
        keep_last_epochs=1, keep_best_checkpoints=1, seed=3,
        train_subset="train", valid_subset="dev", **extra,
    ))
    assert rc == 0
    ckpts = sorted(d for d in os.listdir(save_dir)
                   if d.startswith("step_") and not d.endswith(".json")
                   and "tmp" not in d)
    assert ckpts, os.listdir(save_dir)
    return os.path.join(save_dir, ckpts[-1])


def test_diffnorm_effect(tmp_path):
    import jax

    import jax.numpy as jnp

    from diffnorm_tpu.models.diffusion import ddim_sample
    from diffnorm_tpu.models.vae import SpeechVAEModel
    from diffnorm_tpu.registry import TASKS
    from diffnorm_tpu.train.checkpoint import load_checkpoint_params

    root = tmp_path / "corpus"
    emb, src_emb, templates, rows, meta = _synth_corpus(root)
    common = dict(data=str(root), tgt_feat_dir=str(root / "feat"))

    # ---- stage 1: VAE on the noisy corpus; reconstruction gate ------------
    vae_ckpt = _train_cli(
        tmp_path / "ckpt_vae", 2000, 2e-3, dict(
            task="speech_decoder", arch="speech_vae_decoder",
            criterion="speech_vae_decoder_loss",
            # beta calibrated so the latent scale matches the schedule's
            # unit noise (reference 1e-4 leaves tiny-data latents at std ~5
            # and the sampler trivially faithful — PERFORMANCE.md)
            vae_kl_weight=0.02, **TINY_VAE, **common))

    vae_model = SpeechVAEModel.build_model(Config(vocab_size=CODE + 4,
                                                  **TINY_VAE))
    restored = load_checkpoint_params(vae_ckpt)
    vae_vars = {"params": restored.get("params", restored)}

    def batch_feats():
        T = max(len(m[2]) for m in meta)
        fb = np.zeros((len(meta), T, FEAT), np.float32)
        msk = np.zeros((len(meta), T), bool)
        for i, (_, _, red, _, rfeat) in enumerate(meta):
            fb[i, :len(red)] = rfeat
            msk[i, :len(red)] = True
        return jnp.asarray(fb), msk

    fb, msk = batch_feats()
    _, logits, _ = vae_model.apply(vae_vars, fb, jnp.asarray(msk),
                                   jax.random.PRNGKey(0))
    pred = np.asarray(jnp.argmax(logits, -1)) - 4
    inputs = np.zeros(msk.shape, np.int64)
    clean = np.zeros(msk.shape, np.int64)
    for i, (_, tmpl, red, _, _) in enumerate(meta):
        inputs[i, :len(red)] = red
        clean[i, :len(red)] = tmpl
    vae_acc = float(((pred == inputs) & msk).sum() / msk.sum())
    assert vae_acc >= 0.95, f"VAE reconstruction acc {vae_acc:.3f}"

    # ---- stage 2: latent diffusion on the frozen VAE -----------------------
    diff_ckpt = _train_cli(
        tmp_path / "ckpt_diff", 12000, 1e-3, dict(
            task="speech_diffusion_discrete", arch="diff_discrete",
            criterion="ddpm_discrete_loss", speech_decoder_ckpt=vae_ckpt,
            **DIFF_CFG, **TINY_VAE, **common))

    dcfg = Config(task="speech_diffusion_discrete", arch="diff_discrete",
                  criterion="ddpm_discrete_loss", cpu=True,
                  **DIFF_CFG, **TINY_VAE, **common)
    dmodel = TASKS.get("speech_diffusion_discrete").setup_task(dcfg).build_model()
    restored = load_checkpoint_params(diff_ckpt)
    params = ({**restored["params"], **restored["frozen_params"]}
              if "frozen_params" in restored
              else restored.get("params", restored))
    dvars = {"params": params}

    def sample(start, stride):
        fn = jax.jit(lambda v, f, m, r: ddim_sample(
            dmodel, v, f, m, r, start_step=start, stride=stride))
        out, _ = fn(dvars, fb, jnp.asarray(msk), jax.random.PRNGKey(7))
        return np.asarray(out)

    # ---- gate 2: faithfulness at light noise (reference's validation) -----
    out_light = sample(4, 1)
    acc_vs_input = float(((out_light == inputs) & msk).sum() / msk.sum())
    assert acc_vs_input >= 0.95, f"ddim faithfulness {acc_vs_input:.3f}"

    # ---- gate 3: recovery toward the clean templates -----------------------
    out_norm = sample(START, STRIDE)
    acc_corr = float(((inputs == clean) & msk).sum() / msk.sum())
    acc_norm = float(((out_norm == clean) & msk).sum() / msk.sum())
    fixes = int(((out_norm == clean) & (inputs != clean) & msk).sum())
    breaks = int(((out_norm != clean) & (inputs == clean) & msk).sum())
    print(f"recovery: corrupted {acc_corr:.3f} -> normalized {acc_norm:.3f} "
          f"(fixes {fixes}, breaks {breaks})")
    assert acc_norm > acc_corr + 0.01, (
        f"normalization did not recover corrupted units: "
        f"{acc_corr:.3f} -> {acc_norm:.3f} (fixes {fixes} breaks {breaks})")

    # ---- stage 3: write the A/B target manifests ---------------------------
    # corrupted arm: reduced corrupted units; normalized arm: the sampler's
    # re-reduced outputs (diff_norm_synthesis semantics); both keep sources
    corr_dir = tmp_path / "arm_corrupted"
    norm_dir = tmp_path / "arm_normalized"
    corr_dir.mkdir()
    norm_dir.mkdir()
    corr_rows, norm_rows = [], []
    for i, (row, (_, tmpl, red, _, _)) in enumerate(zip(rows, meta)):
        cr = dict(row)
        cr["tgt_audio"] = " ".join(map(str, red))
        cr["tgt_n_frames"] = len(red)
        corr_rows.append(cr)
        pred_u, _, _ = reduce_units(out_norm[i, :len(red)])
        nr = dict(row)
        nr["tgt_audio"] = " ".join(str(int(u)) for u in pred_u)
        nr["tgt_n_frames"] = len(pred_u)
        norm_rows.append(nr)
    # eval split: one clean utterance per template, clean-template refs
    test_rows = []
    for ti, tmpl in enumerate(templates):
        src_path = str(tmp_path / f"eval_src{ti}.npy")
        np.save(src_path, src_emb[ti].astype(np.float32))
        test_rows.append({
            "id": f"eval{ti}", "src_audio": src_path, "src_n_frames": 20,
            "tgt_audio": " ".join(map(str, tmpl)),
            "tgt_n_frames": len(tmpl),
        })
    for d, train_rows_arm in ((corr_dir, corr_rows), (norm_dir, norm_rows)):
        write_translation_manifest(str(d / "train.tsv"), train_rows_arm)
        write_translation_manifest(str(d / "dev.tsv"), train_rows_arm[:8])
        write_translation_manifest(str(d / "test.tsv"), test_rows)

    # ---- stage 4: NAR A/B — train on each arm, decode, unit-BLEU vs clean --
    from diffnorm_tpu.cli import generate as gen_cli
    from diffnorm_tpu.eval.unit_bleu import unit_bleu

    nar_cfg = dict(
        task="speech_to_speech_fasttranslate", arch="nar_s2ut_conformer",
        criterion="nar_speech_to_unit", label_smoothing=0.1,
        encoder_layers=2, decoder_layers=2, encoder_embed_dim=32,
        encoder_ffn_embed_dim=64, encoder_attention_heads=2,
        decoder_attention_heads=2, decoder_embed_dim=32,
        decoder_ffn_embed_dim=64, conv_channels=32,
        depthwise_conv_kernel_size=7, target_code_size=CODE, dropout=0.0,
    )
    # (a) target-level A/B: the normalized training targets score strictly
    # higher unit-BLEU against the clean templates than the corrupted ones
    # (corpus BLEU is alignment-robust — a fix that merges two reduced
    # positions shortens the row; measured 67.2 -> 73.2, +6.0 BLEU)
    from diffnorm_tpu.eval.bleu import corpus_bleu

    def target_bleu(arm_rows):
        refs = [" ".join(map(str, m[1])) for m in meta]
        return corpus_bleu(refs, [r["tgt_audio"] for r in arm_rows])

    bleu_tgt_corr = target_bleu(corr_rows)
    bleu_tgt_norm = target_bleu(norm_rows)
    print(f"target-level A/B unit-BLEU vs clean: corrupted "
          f"{bleu_tgt_corr:.2f}, normalized {bleu_tgt_norm:.2f}")
    assert bleu_tgt_norm > bleu_tgt_corr + 2.0, (bleu_tgt_corr, bleu_tgt_norm)

    # (b) the full normalized chain composes into a clean translator
    bleus = {}
    for arm, d in (("corrupted", corr_dir), ("normalized", norm_dir)):
        ckpt = _train_cli(tmp_path / f"ckpt_nar_{arm}", 400, 5e-3,
                          dict(nar_cfg, data=str(d)))
        results = str(tmp_path / f"results_{arm}")
        rc = gen_cli.main(Config(
            path=ckpt, results_path=results, cpu=True, batch_size=4,
            gen_subset="test", iter_decode_max_iter=9,
            max_target_positions=24, **dict(nar_cfg, data=str(d))))
        assert rc == 0
        bleus[arm] = unit_bleu(os.path.join(results, "generate-test.txt"))
    print(f"A/B unit-BLEU vs clean templates: corrupted-arm "
          f"{bleus['corrupted']:.1f}, normalized-arm {bleus['normalized']:.1f}")
    # see the module docstring: only the normalized arm's quality is gated
    assert bleus["normalized"] >= 95.0, bleus
