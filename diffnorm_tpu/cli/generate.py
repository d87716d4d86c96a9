"""Generation CLI (reference: fairseq_cli/generate.py).

Loads a checkpoint, decodes a split with the jitted mask-predict generator,
writes `generate-{split}.txt` with the reference's H-/T-/D- line format
(fairseq_cli/generate.py:282-420) and reports corpus unit-BLEU via the
native BLEU counters (falling back to sacrebleu when available).

  python -m diffnorm_tpu.cli.generate $DATA --task speech_to_speech_fasttranslate \
      --path ckpt/nar/step_000400000 --arch nar_s2ut_conformer \
      --gen-subset test --max-tokens 20000 --iter-decode-max-iter 15 \
      --results-path results/
"""

from __future__ import annotations

import logging
import os
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffnorm_tpu.cli.args import parse_args
from diffnorm_tpu.config import Config
from diffnorm_tpu.data.iterators import EpochBatchIterator
from diffnorm_tpu.generate.mask_predict import mask_predict_decode_chunked
from diffnorm_tpu.registry import TASKS, _import_all, import_user_module
from diffnorm_tpu.train.checkpoint import (
    load_checkpoint_params,
    restored_to_variables,
)

logger = logging.getLogger("diffnorm_tpu.generate")

PAD, EOS, UNK = 1, 2, 3


def strip_special(tokens, dictionary):
    """Drop bos/pad/eos; map dictionary ids back to raw unit strings."""
    toks = [int(t) for t in tokens if int(t) not in (0, PAD, EOS)]
    return " ".join(dictionary[t] for t in toks)


_to_variables = restored_to_variables  # back-compat alias for tests


def _tts_generate(cfg, task, model, split) -> int:
    """TTS synthesis branch of the generate CLI (reference: fairseq-generate
    with --task text_to_speech through speech_generator.py): decode each
    utterance to mel features, write `{results_path}/{id}.npy`, report frame
    stats. AR tts_transformer uses the jitted AR rollout with eos stopping;
    fastspeech2 uses the NAR forward with predicted variances."""
    import numpy as _np

    batch0 = (task.dataset(split).collater([task.dataset(split)[0]])
              if hasattr(task.dataset(split), "collater")
              else next(iter(task.dataset(split))))
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch0)
    if cfg.get("path"):
        restored = restored_to_variables(load_checkpoint_params(cfg["path"]))
        if restored is not None:
            variables = restored
        logger.info("restored checkpoint from %s", cfg["path"])

    if "fastspeech" in str(cfg.get("arch", "")):
        from diffnorm_tpu.models.fastspeech2 import NonARSpeechGenerator

        gen = NonARSpeechGenerator(model, variables)

        def synthesize(batch, rng):
            out = gen.generate(batch["src_tokens"])
            feats, masks = out["feature"], out["frame_mask"]
            return [feats[i][masks[i]] for i in range(feats.shape[0])]
    elif hasattr(model.module, "decode_mt_step"):
        # Translatotron2 two-pass: first-pass text beam + AR mel rollout
        # (reference MultiDecoderSpeechGenerator via
        # task.build_generator, speech_to_speech.py:448-465); --beam-mt /
        # --lenpen-mt / --max-len-b-mt control the text pass
        from diffnorm_tpu.generate.translatotron2 import (
            Translatotron2SpeechGenerator,
        )

        mt_dict = task.multitask_tasks[task.mt_task_name].tgt_dict
        beam = int(cfg.get("beam", 5))
        gen = Translatotron2SpeechGenerator(
            model, variables,
            max_iter=int(cfg.get("max_target_positions", 256)),
            eos_prob_threshold=float(cfg.get("eos_prob_threshold", 0.5)),
            beam_size_mt=int(cfg.get("beam_mt", beam)),
            max_len_mt=min(int(cfg.get("max_len_b_mt", 200)), 256),
            len_penalty_mt=float(cfg.get("lenpen_mt", 1.0)),
            no_repeat_ngram=int(cfg.get("no_repeat_ngram_size", 0)),
        )

        def synthesize(batch, rng):
            entries = gen.generate(batch["src_tokens"],
                                   batch["src_lengths"], rng=rng)
            ids = batch.get("id", range(len(entries)))
            for i, e in enumerate(entries):
                # the reference prints the first-pass text per sample
                # (speech_generator.py:219-228)
                text = " ".join(mt_dict[int(t)] for t in e["mt_tokens"])
                logger.info("MT-%d\t%s", int(ids[i]), text)
            return [e["feature"] for e in entries]
    else:
        from diffnorm_tpu.generate.speech_ar import ARSpeechGenerator

        gen = ARSpeechGenerator(
            model, variables,
            max_iter=int(cfg.get("max_target_positions", 256)),
            eos_prob_threshold=float(cfg.get("eos_prob_threshold", 0.5)),
        )

        def synthesize(batch, rng):
            return [e["feature"] for e in
                    gen.generate(batch["src_tokens"], rng=rng,
                                 src_lengths=batch.get("src_lengths"))]

    vocode = None
    if cfg.get("vocoder"):
        # mel -> waveform through a FeatureGenerator HiFi-GAN (the
        # `--input-type features` fine-tune of cli.train_vocoder; reference
        # repr_hifigan_task.py). Accepts GAN TrainState or raw params.
        import json as _json

        from diffnorm_tpu.models.hifigan import FeatureGenerator

        with open(cfg["vocoder_cfg"]) as f:
            vcfg = _json.load(f)
        fgen = FeatureGenerator(
            feature_dim=vcfg.get("model_in_dim",
                                 cfg.get("output_frame_dim", 80)),
            embedding_dim=vcfg["embedding_dim"],
            upsample_rates=tuple(vcfg["upsample_rates"]),
            upsample_kernel_sizes=tuple(vcfg["upsample_kernel_sizes"]),
            upsample_initial_channel=vcfg["upsample_initial_channel"],
            resblock_kernel_sizes=tuple(vcfg["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in vcfg["resblock_dilation_sizes"]),
        )
        raw = load_checkpoint_params(cfg["vocoder"])
        if isinstance(raw, dict) and "g_params" in raw:
            gvars = {"params": raw["g_params"]}
        else:
            gvars = restored_to_variables(raw) or {"params": raw}
        wave_fn = jax.jit(fgen.apply)

        def vocode(feat):
            return _np.asarray(wave_fn(gvars, jnp.asarray(feat)[None]))[0]

    dataset = task.dataset(split)
    if hasattr(dataset, "collater"):
        itr = EpochBatchIterator(
            dataset, max_tokens=cfg.get("max_tokens"),
            max_sentences=cfg.get("batch_size"), shuffle=False,
            num_workers=int(cfg.get("num_workers", 0) or 0),
        ).next_epoch_itr(shuffle=False)
    else:
        itr = iter(dataset)

    results_path = cfg.get("results_path", "tts_out")
    os.makedirs(results_path, exist_ok=True)
    n_utts, n_frames, t0 = 0, 0, time.time()
    base_key = jax.random.PRNGKey(int(cfg.get("seed", 1)))
    for bi, batch in enumerate(itr):
        feats = synthesize(batch, jax.random.fold_in(base_key, bi))
        ids = batch.get("id", range(n_utts, n_utts + len(feats)))
        for i, feat in enumerate(feats):
            _np.save(os.path.join(results_path, f"{int(ids[i])}.npy"),
                     _np.asarray(feat, _np.float32))
            if vocode is not None and feat.shape[0] > 0:
                from diffnorm_tpu.cli.generate_waveform import write_wav

                write_wav(
                    os.path.join(results_path, f"{int(ids[i])}_pred.wav"),
                    vocode(feat), int(cfg.get("sample_rate", 16000)),
                )
            n_frames += feat.shape[0]
            n_utts += 1
    wall = time.time() - t0
    logger.info(
        "synthesized %d utterances (%d frames, %.1f avg) in %.1fs -> %s",
        n_utts, n_frames, n_frames / max(n_utts, 1), wall, results_path,
    )
    return 0


def main(cfg: Optional[Config] = None) -> int:
    logging.basicConfig(level=logging.INFO, force=True,
                        format="%(asctime)s | %(levelname)s | %(message)s")
    _import_all()
    if cfg is None:
        cfg = parse_args()
    if cfg.get("cpu"):
        jax.config.update("jax_platforms", "cpu")
    # AFTER the platform pin: a user module that touches jax at import time
    # would otherwise initialize the TPU backend and make --cpu a no-op
    import_user_module(cfg.get("user_dir"))
    from diffnorm_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    task = TASKS.get(cfg.get("task")).setup_task(cfg)
    # --path fully restores the model; a --w2v-path warm start (train-time
    # only) would just be overwritten, and the file may be gone
    cfg.w2v_path = None
    model = task.build_model()
    split = cfg.get("gen_subset", "test")

    from diffnorm_tpu.tasks.tts_task import TextToSpeechTask

    if isinstance(task, TextToSpeechTask) or getattr(
            task, "tts_generation", False):
        # text->mel TTS and speech->mel s2spect both synthesize features
        return _tts_generate(cfg, task, model, split)

    dataset = task.dataset(split)
    tgt_dict = task.target_dictionary

    # restore parameters
    batch0 = dataset.collater([dataset[0]]) if hasattr(dataset, "collater") else task.dummy_batch()
    batch0.setdefault("prev_target", batch0["target"])
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch0)
    path = cfg.get("path")
    if path:
        def _restore_one(p):
            restored = _to_variables(load_checkpoint_params(p))
            return restored if restored is not None else variables

        # fairseq parity: --path a:b:c loads a decode-time model ensemble
        # (checkpoint_utils.load_model_ensemble); per-step probabilities are
        # averaged inside the jitted decode loops
        paths = [p for p in str(path).split(":") if p]
        if len(paths) > 1:
            variables = [_restore_one(p) for p in paths]
            logger.info("restored %d-model ensemble from %s",
                        len(paths), ", ".join(paths))
        else:
            variables = _restore_one(paths[0])
            logger.info("restored checkpoint from %s", paths[0])

    max_iter = cfg.get("iter_decode_max_iter", 15)
    beam = cfg.get("iter_decode_with_beam", 1)
    cond_scale = cfg.get("cond_scale", 1.0)
    max_len = cfg.get("max_target_positions", 256)

    from diffnorm_tpu.tasks.ar_s2ut_task import ARS2UTTask
    from diffnorm_tpu.tasks.levenshtein_task import LevenshteinTask

    # AR beam decoding: the AR S2UT task family, plus any task flagged
    # ar_generation (text translation)
    is_ar = isinstance(task, ARS2UTTask) or getattr(task, "ar_generation",
                                                    False)
    # UnitY two-pass models expose a first-pass decode method
    is_unity = is_ar and hasattr(model.module, "decode_mt_step")
    n_frames = int(cfg.get("n_frames_per_step", 1))
    needs_target = False  # set by decoders that consume the reference
    needs_rng = False  # set by stochastic decoders (--sampling)
    accepts_speaker = False  # S2UT decoders (--target-speaker-embed)
    init_lengths = None  # set by --init-unit-file (mask-predict branch)
    if isinstance(task, LevenshteinTask):
        # iterative insert/delete refinement, one shape-static jitted scan
        from diffnorm_tpu.models.levenshtein import levenshtein_decode_jit

        def _decode(v, src, lengths):
            canvas = levenshtein_decode_jit(
                model, v, src, lengths, max_iter=max_iter,
                max_len=min(max_len, 256),
                eos_penalty=float(cfg.get("iter_decode_eos_penalty", 0.0)),
            )
            b = canvas.shape[0]
            return canvas, jnp.zeros(canvas.shape, jnp.float32), \
                jnp.full((b,), max_iter, jnp.int32)
    elif is_unity:
        # UnitY two-pass beam decoding (reference
        # MultiDecoderSequenceGenerator via task.build_generator_dual_decoder,
        # speech_to_speech.py:373-401): --beam-mt / --lenpen-mt /
        # --max-len-b-mt control the first (text) pass
        from diffnorm_tpu.generate.unity import unity_generate

        beam = int(cfg.get("beam", 5))
        if isinstance(variables, list):
            logger.warning("unity generation uses the first model of the "
                           "ensemble")
            variables = variables[0]
        if n_frames > 1:
            raise NotImplementedError(
                "unity generation with n_frames_per_step>1")
        accepts_speaker = True

        def _decode(v, src, lengths, tgt_speaker=None):
            seqs, scores, _mt = unity_generate(
                model, v, src, lengths, beam_size=beam,
                tgt_speaker=tgt_speaker,
                beam_size_mt=int(cfg.get("beam_mt", beam)),
                max_len=min(max_len, 256),
                max_len_mt=min(int(cfg.get("max_len_b_mt", 200)), 256),
                min_len=int(cfg.get("min_len", 1)),
                len_penalty=float(cfg.get("lenpen", 1.0)),
                len_penalty_mt=float(cfg.get("lenpen_mt", 1.0)),
                no_repeat_ngram=int(cfg.get("no_repeat_ngram_size", 0)),
                unk_penalty=float(cfg.get("unkpen", 0.0)),
            )
            best = seqs[:, 0]
            return best, jnp.broadcast_to(
                scores[:, :1], best.shape
            ).astype(jnp.float32), jnp.ones((best.shape[0],), jnp.int32)
    elif is_ar and n_frames > 1:
        # greedy stacked-unit generation; report the full-rate unit stream
        # (no ensemble support here — the reference's StackUnitSequenceGenerator
        # also decodes models[0] only)
        from diffnorm_tpu.generate.beam_search import ar_generate_stacked

        if isinstance(variables, list):
            logger.warning("stacked-unit generation uses the first model "
                           "of the ensemble")
            variables = variables[0]
        accepts_speaker = True

        def _decode(v, src, lengths, tgt_speaker=None):
            packed, sub = ar_generate_stacked(
                model, v, src, lengths, max_len=min(max_len, 256),
                tgt_speaker=tgt_speaker,
            )
            b = sub.shape[0]
            tokens = sub.reshape(b, -1)  # [B, L*k] full-rate units
            return tokens, jnp.zeros(tokens.shape, jnp.float32), \
                jnp.ones((b,), jnp.int32)
    elif is_ar and cfg.get("score_reference"):
        # fairseq --score-reference (sequence_scorer.py): emit the reference
        # as the hypothesis with its teacher-forced log-prob under the
        # model (ensemble members' probs are averaged)
        needs_target = True

        def _decode(v, src, lengths, target):
            # jnp shift_right (tasks.ar_s2ut_task.shift_right is host-side):
            # prev = [eos, t0, t1, ...], pad stays pad
            prev = jnp.full_like(target, PAD).at[:, 0].set(EOS)
            prev = prev.at[:, 1:].set(target[:, :-1])
            prev = jnp.where(target == PAD, PAD, prev)
            lps = []
            for vv in (v if isinstance(v, list) else [v]):
                out = model.module.apply(vv, src, lengths, prev)
                logits = out["logits"] if isinstance(out, dict) else out
                lps.append(jax.nn.log_softmax(
                    logits.astype(jnp.float32), axis=-1))
            lp = (lps[0] if len(lps) == 1 else
                  jax.nn.logsumexp(jnp.stack(lps), axis=0)
                  - jnp.log(float(len(lps))))
            tok_lp = jnp.take_along_axis(lp, target[..., None], axis=-1)[..., 0]
            return target, tok_lp, jnp.ones((target.shape[0],), jnp.int32)
    elif getattr(task, "ctc_generation", False):
        # greedy best-path CTC decoding (reference ctc.py valid-step
        # viterbi / examples.speech_recognition W2lViterbiDecoder): argmax
        # per frame, collapse repeats, strip blanks. Non-emission frames
        # become pad — the output formatter drops pad/bos/eos, so order is
        # preserved without a left-pack. Ensembles average frame log-probs.
        def _decode(v, src, lengths):
            lps, mask = [], None
            for vv in (v if isinstance(v, list) else [v]):
                out = model.module.apply(vv, src, lengths,
                                         deterministic=True)
                lps.append(jax.nn.log_softmax(
                    out["logits"].astype(jnp.float32), axis=-1))
                mask = out["mask"]
            lp = (lps[0] if len(lps) == 1 else
                  jax.nn.logsumexp(jnp.stack(lps), axis=0)
                  - jnp.log(float(len(lps))))
            pred = jnp.argmax(lp, axis=-1)
            prev = jnp.pad(pred[:, :-1], ((0, 0), (1, 0)),
                           constant_values=0)
            emit = (pred != 0) & (pred != prev) & mask
            tokens = jnp.where(emit, pred, PAD)
            scores = jnp.max(lp, axis=-1)
            return tokens, scores, jnp.ones((tokens.shape[0],), jnp.int32)
    elif is_ar:
        from diffnorm_tpu.generate.beam_search import ar_generate

        beam = int(cfg.get("beam", 5))  # the summary line logs this
        sampling = bool(cfg.get("sampling"))
        prefix_size = int(cfg.get("prefix_size", 0))
        needs_target = prefix_size > 0
        needs_rng = sampling
        accepts_speaker = True

        def _decode(v, src, lengths, target=None, rng=None, tgt_speaker=None):
            seqs, scores = ar_generate(
                model, v, src, lengths, beam_size=beam,
                tgt_speaker=tgt_speaker,
                max_len=min(max_len, 256),
                len_penalty=cfg.get("lenpen", 1.0),
                min_len=int(cfg.get("min_len", 1)),
                no_repeat_ngram=int(cfg.get("no_repeat_ngram_size", 0)),
                unk_penalty=float(cfg.get("unkpen", 0.0)),
                prefix_tokens=(target[:, :prefix_size]
                               if prefix_size > 0 else None),
                sampling=sampling,
                sampling_topk=int(cfg.get("sampling_topk", 0)),
                sampling_topp=float(cfg.get("sampling_topp", 0.0)),
                temperature=float(cfg.get("temperature", 1.0)),
                rng=rng,
            )
            best = seqs[:, 0]  # [B, L] top beam
            return best, jnp.broadcast_to(
                scores[:, :1], best.shape
            ).astype(jnp.float32), jnp.ones((best.shape[0],), jnp.int32)
    else:
        # optional AR reranker over the length beam (reference
        # --iter-decode-with-external-reranker,
        # iterative_refinement_generator.py:294-361): any --rerank-<key>
        # flag overrides <key> in the reranker model's config
        reranker = None
        rerank_path = cfg.get("rerank_path")
        if rerank_path and beam > 1:
            from diffnorm_tpu.registry import build_model as _build_model

            overrides = {k[len("rerank_"):]: v for k, v in cfg.items()
                         if k.startswith("rerank_") and k != "rerank_path"}
            r_cfg = Config(**{
                **{k: v for k, v in cfg.items()
                   if not k.startswith("rerank_")},
                **overrides,
            })
            r_cfg["arch"] = overrides.get("arch", "s2ut_conformer")
            ar_model = _build_model(r_cfg["arch"], r_cfg, task=task)
            raw = load_checkpoint_params(rerank_path)
            # TrainState checkpoints (this repo's trainer output) and raw
            # param trees are both accepted, same as --path
            restored = _to_variables(raw) or {"params": raw}
            reranker = (ar_model, restored)
            logger.info("reranking beam=%d with AR model from %s",
                        beam, rerank_path)
        retain_history = bool(cfg.get("retain_iter_history"))
        # reference --iter-decode-force-max-iter (dataclass/configs.py:976):
        # disable the adaptive early exit and always run max_iter+1 fills
        adaptive = not bool(cfg.get("iter_decode_force_max_iter"))
        # --init-unit-file: force the decode canvas lengths from a prior
        # run's unit files instead of the model's length head (reference
        # nat_gen.py --use_hyp_unit/--ref_unit_file + prepare_batch_data
        # :107-117 — the CG eval recipe reuses the baseline model's
        # predicted lengths so ablations share identical canvases).
        # Accepts `id\tunits` lines (eval/unit_bleu.py output) or plain
        # `units` lines keyed by order.
        init_lengths = None
        if cfg.get("init_unit_file"):
            init_lengths = {}
            with open(cfg["init_unit_file"]) as fh:
                for j, line in enumerate(fh):
                    line = line.rstrip("\n")
                    if not line:
                        continue
                    if "\t" in line:
                        sid, units = line.split("\t", 1)
                        key = int(sid) if sid.lstrip("-").isdigit() else sid
                    else:
                        key, units = j, line
                    # +1: the canvas length includes the eos slot (the
                    # reference fills units positions with mask then
                    # appends eos, nat_gen.py:110-113)
                    init_lengths[key] = len(units.split()) + 1
            logger.info("forcing canvas lengths from %s (%d utts)",
                        cfg["init_unit_file"], len(init_lengths))

        accepts_speaker = True

        def _decode(v, src, lengths, true_length=None, tgt_speaker=None):
            return mask_predict_decode_chunked(
                model, v, src, lengths,
                chunk=int(cfg.get("decode_chunk", 0)),
                max_iter=max_iter,
                max_len=min(max_len, 256), cond_scale=cond_scale,
                length_beam=beam, n_frames_per_step=n_frames,
                reranker=reranker, retain_history=retain_history,
                adaptive=adaptive, true_length=true_length,
                tgt_speaker=tgt_speaker,
            )

    decode = jax.jit(_decode)

    if hasattr(dataset, "collater"):
        itr = EpochBatchIterator(
            dataset,
            max_tokens=cfg.get("max_tokens"),
            max_sentences=cfg.get("batch_size"),
            shuffle=False,
        ).next_epoch_itr(shuffle=False)
    else:  # synthetic iterable dataset (dummy tasks)
        itr = iter(dataset)

    results_path = cfg.get("results_path")
    out_f = sys.stdout
    if results_path:
        os.makedirs(results_path, exist_ok=True)
        out_f = open(os.path.join(results_path, f"generate-{split}.txt"), "w")

    from diffnorm_tpu.eval.bleu import BleuAccumulator

    # --scoring sacrebleu (reference fairseq_cli/generate.py cfg.scoring /
    # --sacrebleu): corpus sacrebleu over the post-processed text instead
    # of the native token-level BLEU4 counters
    use_sacrebleu = (cfg.get("scoring") == "sacrebleu"
                     or bool(cfg.get("sacrebleu")))
    # --scoring wer (reference fairseq/scoring/wer.py — the ASR metric):
    # corpus word edit distance / reference words over the D- text
    use_wer = cfg.get("scoring") == "wer"
    wer = None
    if use_wer:
        from diffnorm_tpu.eval.wer import WerAccumulator

        wer = WerAccumulator()
    sb_hyps: list = []
    sb_refs: list = []
    bleu = BleuAccumulator()
    n_sent, t0, total_steps = 0, time.time(), 0

    from diffnorm_tpu.data.iterators import read_ahead

    def _upload_src(b):
        """Start the source upload (async jax.device_put) ahead of the
        decode so H2D transfers overlap the previous batch's compute."""
        b = dict(b)
        for k in ("src_tokens", "src_lengths"):
            if k in b:
                b[k] = jax.device_put(np.asarray(b[k]))
        return b

    # the RNG advances across batches (fairseq parity: a jit-baked constant
    # key would replay the identical random stream for every batch)
    base_key = (jax.random.PRNGKey(int(cfg.get("seed", 1)))
                if needs_rng else None)

    # --quant-int8-static (with --quant-int8): calibrate per-site activation
    # scales on the first batch's teacher-style forward, then decode with
    # static scales (no max-abs reduce inside the decode scan). Measured on
    # the NAR decode: bf16 590.8 / int8-dynamic 606.3 / int8-static 685.3
    # utts/s (PERFORMANCE.md "Static scales on the NAR decode").
    want_static = bool(
        cfg.get("quant_int8") and cfg.get("quant_int8_static")
        and not isinstance(task, LevenshteinTask)
        and not getattr(task, "ctc_generation", False)
        and not is_unity)  # two-pass forward needs prev_tokens_mt
    static_done = False

    def _calibrate_static(batch):
        from diffnorm_tpu.ops.quant import calibrate_apply

        src = jnp.asarray(np.asarray(batch["src_tokens"]))
        lengths = jnp.asarray(np.asarray(batch["src_lengths"]))
        tgt = batch.get("target")
        tgt = jnp.asarray(np.asarray(tgt)) if tgt is not None else None
        if is_ar:
            if tgt is not None:
                prev = jnp.full_like(tgt, PAD).at[:, 0].set(EOS)
                prev = prev.at[:, 1:].set(tgt[:, :-1])
                prev = jnp.where(tgt == PAD, PAD, prev)
            else:
                prev = jnp.full((src.shape[0], 8), EOS, jnp.int32)
            args, kwargs = (src, lengths, prev), {}
        else:
            # CMLM-style: an all-masked canvas (what the decode loop fills)
            if tgt is not None:
                canvas = jnp.where(tgt != PAD, UNK, PAD)
            else:
                canvas = jnp.full((src.shape[0], 32), UNK, jnp.int32)
            args = (src, lengths, canvas)
            kwargs = {"tgt_tokens": tgt} if tgt is not None else {}

        def _one(v):
            return calibrate_apply(model.module.apply, v, *args,
                                   deterministic=True, **kwargs)

        out = ([_one(v) for v in variables]
               if isinstance(variables, list) else _one(variables))
        os.environ["DIFFNORM_INT8_STATIC"] = "1"
        logger.info("calibrated static int8 activation scales on the "
                    "first batch")
        return out

    # --post-process / --remove-bpe: detokenize the D- lines and score on
    # the processed text (reference fairseq_cli/generate.py + data_utils
    # .post_process; e.g. `--post-process subword_nmt` or `--remove-bpe "@@ "`)
    pp_symbol = cfg.get("post_process") or cfg.get("remove_bpe")
    from diffnorm_tpu.data.encoders import post_process as _pp

    for batch_i, batch in enumerate(read_ahead(itr, _upload_src, depth=2)):
        if "id" not in batch:
            batch["id"] = np.arange(n_sent, n_sent + len(batch["src_lengths"]))
        if want_static and not static_done:
            variables = _calibrate_static(batch)
            static_done = True
        kw = {"rng": jax.random.fold_in(base_key, batch_i)} if needs_rng else {}
        if accepts_speaker and batch.get("tgt_speaker") is not None:
            # --target-speaker-embed inference conditioning
            kw["tgt_speaker"] = jnp.asarray(
                np.asarray(batch["tgt_speaker"]), jnp.float32)
        if init_lengths is not None:
            def _lookup(bid):
                for key in (int(bid), str(bid)):
                    if key in init_lengths:
                        return init_lengths[key]
                raise KeyError(
                    f"--init-unit-file has no units for utterance id {bid!r}")
            kw["true_length"] = jnp.asarray(
                [_lookup(b) for b in np.asarray(batch["id"]).tolist()],
                jnp.int32)
        if needs_target:
            out = decode(variables, batch["src_tokens"],
                         batch["src_lengths"],
                         jnp.asarray(np.asarray(batch["target"]), jnp.int32),
                         **kw)
        else:
            out = decode(variables, batch["src_tokens"], batch["src_lengths"],
                         **kw)
        history = None
        if len(out) == 4:  # --retain-iter-history
            tokens, scores, steps, history = out
            history = np.asarray(history)
        else:
            tokens, scores, steps = out
        tokens = np.asarray(tokens)
        scores = np.asarray(scores)
        total_steps += int(np.asarray(steps).sum())
        for i in range(tokens.shape[0]):
            sid = int(batch["id"][i])
            hyp = strip_special(tokens[i], tgt_dict)
            # stacked tasks carry [T, k] sub-frame targets; flatten to the
            # full-rate unit stream for scoring
            ref = strip_special(np.asarray(batch["target"][i]).reshape(-1),
                                tgt_dict)
            score = float(scores[i][tokens[i] != PAD].mean()) if (tokens[i] != PAD).any() else 0.0
            if pp_symbol:
                hyp_d = _pp(hyp, pp_symbol)
                ref = _pp(ref, pp_symbol)
            else:
                hyp_d = hyp
            print(f"T-{sid}\t{ref}", file=out_f)
            print(f"H-{sid}\t{score:.4f}\t{hyp}", file=out_f)
            print(f"D-{sid}\t{score:.4f}\t{hyp_d}", file=out_f)
            if history is not None:
                # reference E-{id}_{step} lines (fairseq_cli/generate.py
                # retain_iter_history output)
                for st in range(history.shape[0]):
                    h = strip_special(history[st, i], tgt_dict)
                    print(f"E-{sid}_{st}\t{h}", file=out_f)
            if use_sacrebleu:
                sb_hyps.append(hyp_d)
                sb_refs.append(ref)
            elif use_wer:
                wer.add(ref, hyp_d)
            else:
                bleu.add(ref.split(), hyp_d.split())
            n_sent += 1
    wall = time.time() - t0
    logger.info(
        "decoded %d sentences in %.1fs (%.2f sent/s, avg %.1f iters)",
        n_sent, wall, n_sent / max(wall, 1e-6),
        total_steps / max(n_sent, 1),
    )
    if use_sacrebleu:
        import sacrebleu

        score_str = str(sacrebleu.corpus_bleu(sb_hyps, [sb_refs]))
    elif use_wer:
        score_str = wer.result_string()
    else:
        score_str = bleu.result_string()
    logger.info("Generate %s with beam=%d: %s", split, beam, score_str)
    if results_path:
        # fairseq writes the scoring summary into generate-{split}.txt too
        print(f"Generate {split} with beam={beam}: {score_str}", file=out_f)
        out_f.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
