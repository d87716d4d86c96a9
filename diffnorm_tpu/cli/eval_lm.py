"""LM evaluation CLI (reference: fairseq_cli/eval_lm.py): per-token NLL and
perplexity of a unit LM over a split.

  python -m diffnorm_tpu.cli.eval_lm $DATA --task sedd_lm --arch transformer_lm \
      --criterion lm_cross_entropy --path ckpt/lm/step_... --gen-subset test
"""

from __future__ import annotations

import logging
import math
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffnorm_tpu.cli.args import parse_args
from diffnorm_tpu.config import Config
from diffnorm_tpu.data.iterators import EpochBatchIterator
from diffnorm_tpu.registry import TASKS, _import_all, import_user_module
from diffnorm_tpu.train.checkpoint import (
    load_checkpoint_params,
    restored_to_variables,
)

logger = logging.getLogger("diffnorm_tpu.eval_lm")

PAD, EOS = 1, 2


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

    cfg.setdefault("task", "sedd_lm")
    cfg.setdefault("arch", "transformer_lm")
    task = TASKS.get(cfg["task"]).setup_task(cfg)
    model = task.build_model()

    batch0 = task.dummy_batch()
    tokens0 = batch0["target_unit"]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        tokens0, deterministic=True,
    )
    if cfg.get("path"):
        restored = restored_to_variables(load_checkpoint_params(cfg["path"]))
        if restored is not None:
            variables = restored
        logger.info("restored %s", cfg["path"])

    @jax.jit
    def nll_fn(v, tokens):
        # next-token prediction: shift targets left, prepend EOS
        prev = jnp.concatenate(
            [jnp.full((tokens.shape[0], 1), EOS, tokens.dtype), tokens[:, :-1]],
            axis=1,
        )
        logits = model.apply(v, prev, deterministic=True)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(lp, tokens[..., None].astype(jnp.int32),
                                   axis=-1)[..., 0]
        keep = tokens != PAD
        return jnp.sum(jnp.where(keep, nll, 0.0)), jnp.sum(keep)

    split = cfg.get("gen_subset", "test")
    dataset = task.dataset(split)
    if hasattr(dataset, "collater"):
        itr = EpochBatchIterator(
            dataset, max_tokens=cfg.get("max_tokens", 8192),
            max_sentences=cfg.get("batch_size"), shuffle=False,
        ).next_epoch_itr(shuffle=False)
    else:
        itr = iter(dataset)

    total_nll, total_tokens = 0.0, 0
    for batch in itr:
        nll, n = nll_fn(variables, jnp.asarray(batch["target_unit"]))
        total_nll += float(nll)
        total_tokens += int(n)
    avg = total_nll / max(total_tokens, 1)
    logger.info(
        "Evaluated %d tokens: loss %.4f nats, ppl %.2f",
        total_tokens, avg, math.exp(avg),
    )
    print(f"Loss (nats): {avg:.4f}, Perplexity: {math.exp(avg):.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
