"""Validation CLI (reference: fairseq_cli/validate.py): load a checkpoint,
run the criterion over a split, print aggregated metrics."""

from __future__ import annotations

import logging
import sys
from typing import Optional

import jax
import numpy as np

from diffnorm_tpu.cli.args import parse_args
from diffnorm_tpu.config import Config, make_trainer_config
from diffnorm_tpu.data.iterators import EpochBatchIterator
from diffnorm_tpu.registry import TASKS, _import_all, import_user_module
from diffnorm_tpu.train import metrics as metrics_mod
from diffnorm_tpu.train.checkpoint import load_checkpoint_params
from diffnorm_tpu.train.trainer import Trainer

logger = logging.getLogger("diffnorm_tpu.validate")


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
    criterion = task.build_criterion()
    trainer = Trainer(make_trainer_config(cfg), task, model, criterion)

    split = cfg.get("valid_subset", "dev")
    dataset = task.dataset(split)
    example = (
        task.prepare_batch(dataset.collater([dataset[0]]),
                           np.random.default_rng(cfg.get("seed", 1)))
        if hasattr(dataset, "collater")
        else task.dummy_batch()
    )
    state = trainer.init_state(jax.random.PRNGKey(cfg.get("seed", 1)), example)
    path = cfg.get("path")
    if path:
        restored = load_checkpoint_params(path, target=jax.device_get(state))
        state = jax.device_put(restored)
        logger.info("restored %s", path)

    np_rng = np.random.default_rng(cfg.get("seed", 1))
    agg = metrics_mod.MetricsAggregator()
    with metrics_mod.aggregate(agg):
        if hasattr(dataset, "collater"):
            from diffnorm_tpu.cli.train import _max_positions

            itr = EpochBatchIterator(
                dataset, max_tokens=cfg.get("max_tokens"),
                max_sentences=cfg.get("batch_size"), shuffle=False,
                max_positions=_max_positions(cfg),
                ignore_invalid_inputs=bool(
                    cfg.get("skip_invalid_size_inputs_valid_test")),
            ).next_epoch_itr(shuffle=False)
        else:
            itr = iter(dataset)
        for batch in itr:
            batch = task.prepare_batch(batch, np_rng)
            trainer.valid_step(state, batch, jax.random.PRNGKey(0))
    vals = agg.get_smoothed_values()
    logger.info("%s | %s", split,
                " ".join(f"{k} {v:.4g}" for k, v in sorted(vals.items())))
    return 0


if __name__ == "__main__":
    sys.exit(main())
