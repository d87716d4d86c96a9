"""Fused end-to-end S2ST CLI: audio manifest in -> waveforms out, one
process, one device program per bucket.

Replaces the reference's three-stage round trip (fairseq-generate writes
unit hypotheses -> grep -> generate_waveform_from_code.py re-reads them and
synthesizes; scripts/s2ut/eval.sh + examples/speech_to_speech/
generate_waveform_from_code.py:58-99) with the fused `s2st_generate`
program: NAR mask-predict decode -> unit reduction -> duration expansion ->
chunked code-HiFi-GAN, all inside jit.

  python -m diffnorm_tpu.cli.s2st $DATA --task speech_to_speech_fasttranslate \
      --path ckpt/nar/step_000400000 --arch nar_s2ut_conformer \
      --gen-subset test --vocoder ckpt/hifigan --vocoder-cfg config.json \
      --results-path wavs/ --dur-prediction

Writes `{utt_id}_pred.wav` @ --sample-rate plus a `s2st-{split}.unit` file
(`id|u1 u2 ...` reduced unit lines — byte-compatible with what
generate_waveform_from_code.py consumes, so the separate pipeline can be
diffed against this one).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional

import numpy as np

from diffnorm_tpu.cli.args import parse_args
from diffnorm_tpu.config import Config
from diffnorm_tpu.registry import TASKS, _import_all, import_user_module

logger = logging.getLogger("diffnorm_tpu.s2st")


def _bucket(n: int, step: int = 64) -> int:
    return max(step, ((n + step - 1) // step) * step)


def main(cfg: Optional[Config] = None) -> int:
    logging.basicConfig(level=logging.INFO, force=True,
                        format="%(asctime)s | %(levelname)s | %(message)s")
    _import_all()
    if cfg is None:
        cfg = parse_args()
    import jax

    if cfg.get("cpu"):
        jax.config.update("jax_platforms", "cpu")
    import_user_module(cfg.get("user_dir"))
    import jax.numpy as jnp

    from diffnorm_tpu.cli.generate_waveform import load_vocoder, write_wav
    from diffnorm_tpu.generate.s2st import s2st_generate
    from diffnorm_tpu.train.checkpoint import (
        load_checkpoint_params,
        restored_to_variables,
    )
    from diffnorm_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    task = TASKS.get(cfg.get("task",
                             "speech_to_speech_fasttranslate")).setup_task(cfg)
    cfg.w2v_path = None
    model = task.build_model()
    split = cfg.get("gen_subset", "test")
    dataset = task.dataset(split)

    batch0 = (dataset.collater([dataset[0]])
              if hasattr(dataset, "collater") else task.dummy_batch())
    batch0.setdefault("prev_target", batch0["target"])
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch0)
    path = cfg.get("path")
    if path:
        restored = restored_to_variables(load_checkpoint_params(path))
        if restored is not None:
            variables = restored
        logger.info("restored NAR checkpoint from %s", path)

    vocoder = load_vocoder(cfg.get("vocoder"), cfg.get("vocoder_cfg"))
    voc_module, voc_vars = vocoder.module, vocoder.variables

    results_path = cfg.get("results_path", ".")
    os.makedirs(results_path, exist_ok=True)
    max_iter = int(cfg.get("iter_decode_max_iter", 15))
    max_len = int(cfg.get("max_target_positions", 256))
    dur_prediction = bool(cfg.get("dur_prediction", False))
    max_duration = int(cfg.get("max_duration", 8))
    sample_rate = int(cfg.get("sample_rate", 16000))
    voc_chunk = int(cfg.get("vocoder_chunk", 4))

    fns = {}  # (T_bucket, B) -> jitted program

    def _run(batch):
        src = np.asarray(batch["src_tokens"], np.float32)
        lengths = np.asarray(batch["src_lengths"], np.int32)
        b, t = src.shape[:2]
        tb = _bucket(t)
        if tb > t:
            src = np.pad(src, ((0, 0), (0, tb - t), (0, 0)))
        key = (tb, b)
        if key not in fns:
            def fn(v, vv, s, ln, spk):
                return s2st_generate(
                    model, v, voc_module, vv, s, ln,
                    max_iter=max_iter, max_len=max_len,
                    cond_scale=float(cfg.get("cond_scale", 1.0)),
                    length_beam=int(cfg.get("iter_decode_with_beam", 1)),
                    dur_prediction=dur_prediction,
                    max_duration=max_duration, vocoder_chunk=voc_chunk,
                    tgt_speaker=spk,
                )

            fns[key] = jax.jit(fn)
        spk = (jnp.asarray(np.asarray(batch["tgt_speaker"]), jnp.float32)
               if batch.get("tgt_speaker") is not None else None)
        return fns[key](variables, voc_vars, jnp.asarray(src),
                        jnp.asarray(lengths), spk)

    # length-bucketed batching (desc source frames, like the generate CLI)
    bsz = int(cfg.get("batch_size", 8) or 8)
    order = (dataset.ordered_indices()
             if hasattr(dataset, "ordered_indices")
             else np.arange(len(dataset)))
    n_wav, t0 = 0, time.time()
    audio_s = 0.0
    unit_lines = []
    for start in range(0, len(order), bsz):
        idx = [int(i) for i in order[start:start + bsz]]
        batch = dataset.collater([dataset[i] for i in idx])
        wav, wav_lengths, units, counts = _run(batch)
        wav = np.asarray(wav)
        wav_lengths = np.asarray(wav_lengths)
        units = np.asarray(units)
        counts = np.asarray(counts)
        # true utterance ids: the collated "id" field is the numeric
        # example index (and follows any collater reordering); map it
        # through the dataset's manifest ids — downstream consumers
        # (unit BLEU vs reference manifests, ASR-BLEU transcript join)
        # key by utt id (caught by tests/test_parity_eval_script.py)
        utt_ids = getattr(dataset, "ids", None)
        row_idx = np.asarray(batch.get("id", idx)).tolist()
        ids = [str(utt_ids[int(i)]) if utt_ids is not None else str(i)
               for i in row_idx]
        for row, uid in enumerate(ids):
            n = int(wav_lengths[row])
            write_wav(os.path.join(results_path, f"{uid}_pred.wav"),
                      wav[row, :n], sample_rate)
            unit_lines.append(
                f"{uid}|" + " ".join(
                    str(int(u)) for u in units[row, : int(counts[row])]))
            audio_s += n / sample_rate
            n_wav += 1
    with open(os.path.join(results_path, f"s2st-{split}.unit"), "w") as f:
        f.write("\n".join(unit_lines) + "\n")
    wall = time.time() - t0
    logger.info(
        "synthesized %d waveforms (%.1f audio-s) in %.1f s (RTF %.1f) -> %s",
        n_wav, audio_s, wall, audio_s / max(wall, 1e-9), results_path)
    return 0


if __name__ == "__main__":
    main()
