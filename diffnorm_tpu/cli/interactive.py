"""Interactive generation CLI (reference: fairseq_cli/interactive.py).

Reads inputs from stdin (text token lines for cmlm_cg/text models, audio
file paths or .npy feature paths for the speech tasks), decodes with the
task-appropriate generator, prints H- lines.
"""

from __future__ import annotations

import logging
import sys
from typing import Optional

import jax
import numpy as np

from diffnorm_tpu.cli.args import parse_args
from diffnorm_tpu.config import Config
from diffnorm_tpu.registry import TASKS, _import_all, import_user_module
from diffnorm_tpu.train.checkpoint import (
    load_checkpoint_params,
    restored_to_variables,
)

logger = logging.getLogger("diffnorm_tpu.interactive")


def main(cfg: Optional[Config] = None) -> int:
    logging.basicConfig(level=logging.INFO, force=True)
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
    model = task.build_model()
    batch0 = task.dummy_batch()
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch0)
    if cfg.get("path"):
        restored = restored_to_variables(load_checkpoint_params(cfg["path"]))
        if restored is not None:
            variables = restored
        logger.info("restored %s", cfg["path"])

    is_speech = cfg.get("task") not in (
        "cmlm_cg", "dummy_cmlm_cg", "translation", "dummy_translation")
    tgt_dict = task.target_dictionary
    # raw-text pre/post processing (reference fairseq_cli/interactive.py
    # encode_fn/decode_fn: tokenizer then BPE in, inverted out)
    from diffnorm_tpu.data.encoders import (
        build_bpe, build_tokenizer, decode_fn, encode_fn)

    tokenizer = build_tokenizer(cfg)
    bpe = build_bpe(cfg)
    max_iter = cfg.get("iter_decode_max_iter", 15)
    max_len = cfg.get("max_target_positions", 256)

    from diffnorm_tpu.tasks.ar_s2ut_task import ARS2UTTask

    if isinstance(task, ARS2UTTask) or getattr(task, "ar_generation", False):
        # AR models decode with beam search, like fairseq-interactive
        from diffnorm_tpu.generate.beam_search import ar_generate

        def decode(src, src_lengths):
            seqs, _ = ar_generate(
                model, variables, src, src_lengths,
                beam_size=cfg.get("beam", 5), max_len=min(max_len, 256),
                len_penalty=cfg.get("lenpen", 1.0),
                no_repeat_ngram=int(cfg.get("no_repeat_ngram_size", 0)),
            )
            return seqs[:, 0]
    else:
        from diffnorm_tpu.generate.mask_predict import mask_predict_decode

        def decode(src, src_lengths):
            tokens, _, _ = mask_predict_decode(
                model, variables, src, src_lengths, max_iter=max_iter,
                max_len=max_len, cond_scale=cfg.get("cond_scale", 1.0),
            )
            return tokens

    print("| enter input (text tokens, or audio/.npy path); ctrl-d to quit",
          file=sys.stderr)
    for i, line in enumerate(sys.stdin):
        line = line.strip()
        if not line:
            continue
        if is_speech:
            from diffnorm_tpu.data.audio import get_features_or_waveform

            feat = np.asarray(get_features_or_waveform(line), np.float32)
            src = feat[None]
            src_lengths = np.asarray([feat.shape[0]], np.int32)
        else:
            line = encode_fn(line, bpe=bpe, tokenizer=tokenizer)
            enc = task.src_dict.encode_line(line, append_eos=True)
            src = enc[None].astype(np.int32)
            src_lengths = np.asarray([len(enc)], np.int32)
        tokens = decode(src, src_lengths)
        toks = [int(t) for t in np.asarray(tokens)[0] if int(t) not in (1, 2)]
        hyp = " ".join(tgt_dict[t] for t in toks)
        print(f"H-{i}\t{hyp}")
        if bpe is not None or tokenizer is not None:
            print(f"D-{i}\t{decode_fn(hyp, bpe=bpe, tokenizer=tokenizer)}")
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
