"""Training CLI (reference: fairseq_cli/train.py).

Usage mirrors the reference recipes, e.g.:

  python -m diffnorm_tpu.cli.train $DATA \
      --task speech_decoder --arch speech_vae_decoder \
      --criterion speech_vae_decoder_loss --latent-dim 128 \
      --lr 5e-4 --lr-scheduler inverse_sqrt --warmup-updates 10000 \
      --max-update 200000 --max-tokens 15000 --clip-norm 2.0 \
      --save-dir ckpt/vae --keep-best-checkpoints 5 --keep-last-epochs 5

Orchestrates: task setup -> model/criterion build -> Trainer -> epoch loop
with validate_and_save, checkpoint resume (incl. iterator position), early
stopping on patience, and metric logging.
"""

from __future__ import annotations

import logging
import os
import sys
import time
from typing import Optional

import jax
import numpy as np

from diffnorm_tpu.cli.args import parse_args
from diffnorm_tpu.config import Config, make_trainer_config
from diffnorm_tpu.data.iterators import EpochBatchIterator, GroupedIterator
from diffnorm_tpu.parallel.mesh import init_distributed
from diffnorm_tpu.registry import TASKS, _import_all, import_user_module
from diffnorm_tpu.train import metrics as metrics_mod
from diffnorm_tpu.train.checkpoint import CheckpointManager
from diffnorm_tpu.train.trainer import Trainer

logger = logging.getLogger("diffnorm_tpu.train")


def _max_positions(cfg):
    """The size cap used for filter-by-size (fairseq task.max_positions()):
    a (max_source_positions, max_target_positions) tuple compared per
    component against dataset.size(i); datasets exposing only scalar
    num_tokens fall back to the min of the set components."""
    src = cfg.get("max_source_positions")
    tgt = cfg.get("max_target_positions")
    if not src and not tgt:
        return None
    return (int(src) if src else None, int(tgt) if tgt else None)


def normalize_cfg(cfg: Config) -> Config:
    """Map reference-recipe flag spellings onto trainer config names."""
    aliases = {
        "max_update": "max_updates",
        "max_epoch": "max_epochs",
        "update_freq": "update_freq",
        "save_interval_updates": "save_interval_updates",
        "validate_interval_updates": "validate_interval_updates",
    }
    for src, dst in aliases.items():
        if src in cfg and dst not in cfg:
            cfg[dst] = cfg[src]
    return cfg


def main(cfg: Optional[Config] = None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        force=True,  # jax/absl may have configured handlers already
    )
    _import_all()
    if cfg is None:
        cfg = parse_args()
    if cfg.get("cpu"):  # force host CPU (the image pins jax to the TPU tunnel)
        jax.config.update("jax_platforms", "cpu")
    # AFTER the platform pin: a user module that touches jax at import time
    # would otherwise initialize the TPU backend and make --cpu a no-op
    import_user_module(cfg.get("user_dir"))
    if cfg.get("prng_impl"):
        # --prng-impl rbg: hardware RNG for dropout masks. Profiling showed
        # threefry mask generation is ~60% of the NAR train step's device
        # time (PERFORMANCE.md "NAR train step: RNG dominates"); rbg trades
        # cross-version reproducibility for ~2x step throughput. The
        # reference trains with unseeded torch RNG, so rbg matches its
        # reproducibility story.
        jax.config.update("jax_default_prng_impl", cfg.prng_impl)
    from diffnorm_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    init_distributed()
    cfg = normalize_cfg(cfg)

    # The reference's vocoder fine-tune tasks (fairseq/tasks/code_hifigan.py
    # "unit_to_speech", repr_hifigan_task.py "repr_to_speech") train a GAN
    # (alternating MPD/MSD discriminator + generator updates), which the
    # optimizer-centric Trainer does not model — dispatch them to the GAN
    # training CLI (cli/train_vocoder.py), keeping the fairseq-train entry
    # point working for those task names.
    if cfg.get("task") in ("unit_to_speech", "repr_to_speech"):
        from diffnorm_tpu.cli import train_vocoder

        if cfg.get("task") == "repr_to_speech":
            cfg.input_type = "features"
        return train_vocoder.main(cfg)

    tcfg = make_trainer_config(cfg)

    task = TASKS.get(cfg.get("task")).setup_task(cfg)
    model = task.build_model()
    criterion = task.build_criterion()
    trainer = Trainer(tcfg, task, model, criterion)

    n_params = None  # filled after init
    rng = jax.random.PRNGKey(tcfg.seed)
    rng, init_rng = jax.random.split(rng)

    # ------------------------------------------------------------------ data
    train_split = cfg.get("train_subset", "train")
    valid_split = cfg.get("valid_subset", "dev")
    dataset = task.dataset(train_split)

    def make_epoch_itr(ds):
        return EpochBatchIterator(
            ds,
            max_tokens=cfg.get("max_tokens"),
            max_sentences=cfg.get("batch_size"),
            required_batch_size_multiple=cfg.get("required_batch_size_multiple", 1),
            seed=tcfg.seed,
            shuffle=True,
            num_workers=int(cfg.get("num_workers", 0) or 0),
            # fairseq trainer.get_train_iterator: train skips over-long
            # samples with a warning (ignore_invalid_inputs=True)
            max_positions=_max_positions(cfg),
            ignore_invalid_inputs=True,
            curriculum=int(cfg.get("curriculum", 0) or 0),
        )

    if hasattr(dataset, "collater"):
        epoch_itr = make_epoch_itr(dataset)
        example_batch = task.prepare_batch(
            dataset.collater([dataset[0]]), np.random.default_rng(tcfg.seed)
        )
    else:  # synthetic iterable dataset (dummy tasks)
        epoch_itr = None
        example_batch = task.dummy_batch()

    # ------------------------------------------------------------------ state
    if cfg.get("w2v_path"):
        # --w2v-path warm start only applies to a FRESH run: on resume the
        # restored checkpoint fully overwrites the graft, and the
        # pretraining file may have been rotated away since
        ckpt_probe = CheckpointManager(tcfg.save_dir)
        if ckpt_probe.latest_step() is not None:
            logger.info("resuming from %s; ignoring --w2v-path", tcfg.save_dir)
            cfg.w2v_path = None
    state = trainer.init_state(init_rng, example_batch)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    logger.info("model params (trainable): %.2fM", n_params / 1e6)

    ckpt = CheckpointManager(
        tcfg.save_dir,
        keep_last=tcfg.keep_last_epochs,
        keep_best=tcfg.keep_best_checkpoints,
        metric=tcfg.best_checkpoint_metric,
        maximize=tcfg.maximize_best_checkpoint_metric,
    )
    start_epoch = 1
    restored, extra = ckpt.load_latest(target=jax.device_get(state))
    if restored is not None:
        from diffnorm_tpu.parallel.mesh import replicate

        state = replicate(restored, trainer.mesh)
        start_epoch = extra.get("epoch", 1)
        if epoch_itr is not None and "iterator" in extra:
            epoch_itr.load_state_dict(extra["iterator"])
        trainer.load_lr_state_dict(extra.get("lr_scheduler"))
        logger.info("resumed from step %s (epoch %d)", extra.get("step"), start_epoch)
    elif cfg.get("restore_file"):
        # fairseq --restore-file: warm-start from another run's checkpoint
        # when save_dir has no checkpoint of its own (fine-tuning).
        # --reset-optimizer takes only the model weights (fresh optimizer,
        # step 0); otherwise the full TrainState (step/optimizer) carries
        # over. --reset-dataloader skips the saved iterator position
        # (checkpoint_utils.load_checkpoint:188-280 semantics).
        from diffnorm_tpu.parallel.mesh import replicate
        from diffnorm_tpu.train.checkpoint import (
            load_checkpoint_params,
            restored_to_variables,
        )

        rf = cfg["restore_file"]
        if cfg.get("reset_optimizer"):
            v = restored_to_variables(load_checkpoint_params(rf))
            if v is None:
                raise ValueError(f"--restore-file {rf}: unrecognized layout")
            params = v["params"]
            missing = [k for k in state.params if k not in params]
            if missing:
                raise ValueError(
                    f"--restore-file {rf} lacks param subtrees {missing}")
            host = jax.device_get(state)
            state = replicate(
                host.replace(
                    params={k: params[k] for k in host.params},
                    frozen_params={k: params.get(k, fv) for k, fv in
                                   host.frozen_params.items()},
                    model_state={k: v[k] for k in host.model_state if k in v}
                    or host.model_state,
                ),
                trainer.mesh,
            )
            logger.info("warm-started params from %s (optimizer reset)", rf)
        else:
            full, extra = CheckpointManager.load_path(
                rf, target=jax.device_get(state))
            state = replicate(full, trainer.mesh)
            if not cfg.get("reset_dataloader"):
                start_epoch = extra.get("epoch", 1)
                if epoch_itr is not None and "iterator" in extra:
                    epoch_itr.load_state_dict(extra["iterator"])
            if not cfg.get("reset_lr_scheduler"):
                trainer.load_lr_state_dict(extra.get("lr_scheduler"))
            logger.info("restored %s at step %s", rf, extra.get("step"))

    np_rng = np.random.default_rng(tcfg.seed)
    best_metric = None
    patience_left = tcfg.patience
    step = int(jax.device_get(state.step))
    if hasattr(task, "set_num_updates"):
        # step-annealed host-side schedules (e.g. the wav2vec2 gumbel
        # temperature) — resume-aware
        task.set_num_updates(step)

    from diffnorm_tpu.train.progress import ProgressWriter
    from diffnorm_tpu.utils.watchdog import Watchdog

    progress = ProgressWriter(
        log_format=cfg.get("log_format", "simple"),
        tensorboard_logdir=cfg.get("tensorboard_logdir"),
        wandb_project=cfg.get("wandb_project"),
    )
    watchdog = Watchdog(cfg.get("heartbeat_timeout", 0)).start()
    if tcfg.profile:
        jax.profiler.start_trace(
            cfg.get("profile_dir", os.path.join(tcfg.save_dir, "profile"))
        )

    def run_validation(state):
        if valid_split is None:
            return None
        try:
            vdataset = task.dataset(valid_split)
        except Exception as e:  # no valid data configured
            logger.warning("validation skipped: %s", e)
            return None
        agg = metrics_mod.MetricsAggregator()
        with metrics_mod.aggregate(agg):
            if hasattr(vdataset, "collater"):
                vitr = EpochBatchIterator(
                    vdataset, max_tokens=cfg.get("max_tokens"),
                    max_sentences=cfg.get("batch_size"), seed=tcfg.seed,
                    shuffle=False,
                    max_positions=_max_positions(cfg),
                    ignore_invalid_inputs=bool(
                        cfg.get("skip_invalid_size_inputs_valid_test")),
                ).next_epoch_itr(shuffle=False)
            else:
                vitr = iter(vdataset)
            for vbatch in vitr:
                vbatch = task.prepare_batch(vbatch, np_rng)
                trainer.valid_step(state, vbatch, jax.random.PRNGKey(0))
        vals = agg.get_smoothed_values()
        logger.info("valid | %s", fmt_metrics(vals))
        return vals.get(tcfg.best_checkpoint_metric)

    def save(state, step, epoch, metric_value):
        extra = {"epoch": epoch}
        if epoch_itr is not None:
            extra["iterator"] = epoch_itr.state_dict()
        lr_sd = trainer.lr_state_dict()
        if lr_sd is not None:  # host-driven scheduler (manual/plateau) state
            extra["lr_scheduler"] = lr_sd
        ckpt.save(step, state, metric_value=metric_value,
                  extra=extra)
        logger.info("saved checkpoint at step %d (metric=%s)", step, metric_value)

    # ------------------------------------------------------------------ loop
    done = False
    for epoch in range(start_epoch, (tcfg.max_epochs or 10 ** 9) + 1):
        if done:
            break
        trainer.lr_step_begin_epoch(epoch)  # --lr-scheduler manual epoch2lr
        if epoch_itr is not None and task.has_sharded_data():
            # --data dir1:dir2:... rotates shards per epoch (fairseq
            # split_paths); rebuild the iterator when the shard changes,
            # carrying any resumed mid-epoch position into the first one
            ds = task.dataset(train_split, epoch=epoch)
            if ds is not dataset:
                saved = epoch_itr.state_dict() if epoch == start_epoch else None
                dataset = ds
                epoch_itr = make_epoch_itr(dataset)
                if saved is not None:
                    epoch_itr.load_state_dict(saved)
                else:
                    epoch_itr.epoch = epoch
                logger.info("loaded data shard %s for epoch %d",
                            task.data_path(epoch), epoch)
        if epoch_itr is not None:
            itr = epoch_itr.next_epoch_itr()
        else:
            itr = iter(task.dataset(train_split))
        grouped = GroupedIterator(itr, tcfg.update_freq)
        interval_agg = metrics_mod.MetricsAggregator()
        t0 = time.time()
        with metrics_mod.aggregate(interval_agg):
            from diffnorm_tpu.parallel.mesh import prefetch_to_device

            prepared = (
                [task.prepare_batch(b, np_rng) for b in g] for g in grouped
            )
            for microbatches in prefetch_to_device(prepared, trainer.mesh):
                rng, step_rng = jax.random.split(rng)
                state, mets = trainer.train_step(state, microbatches, step_rng)
                step += 1
                if hasattr(task, "set_num_updates"):
                    task.set_num_updates(step)
                if epoch_itr is not None:
                    # resume offset = batches TRAINED, not batches pulled
                    # (prefetch_to_device reads ahead of the step)
                    epoch_itr.mark_trained(len(microbatches))
                watchdog.pet()
                if step % tcfg.log_interval == 0:
                    progress.log(mets, step)
                    vals = interval_agg.get_smoothed_values()
                    ups = tcfg.log_interval / max(time.time() - t0, 1e-6)
                    logger.info(
                        "epoch %d | step %d | %s | ups %.2f",
                        epoch, step, fmt_metrics(vals), ups,
                    )
                    interval_agg.reset()
                    t0 = time.time()
                if (
                    tcfg.validate_interval_updates
                    and step % tcfg.validate_interval_updates == 0
                ):
                    run_validation(state)
                if tcfg.save_interval_updates and step % tcfg.save_interval_updates == 0:
                    save(state, step, epoch, None)
                if tcfg.max_updates and step >= tcfg.max_updates:
                    done = True
                    break
        if epoch_itr is not None:
            epoch_itr.finish_epoch()
        # ---- end of epoch: validate + save ----
        metric_value = None
        if epoch % tcfg.validate_interval == 0 or done:
            metric_value = run_validation(state)
        # reduce_lr_on_plateau consumes the epoch's validation metric here
        trainer.lr_step_epoch(epoch, metric_value)
        if epoch % tcfg.save_interval == 0 or done:
            save(state, step, epoch + 1, metric_value)
        if metric_value is not None and tcfg.patience > 0:
            better = best_metric is None or (
                metric_value > best_metric
                if tcfg.maximize_best_checkpoint_metric
                else metric_value < best_metric
            )
            if better:
                best_metric, patience_left = metric_value, tcfg.patience
            else:
                patience_left -= 1
                if patience_left <= 0:
                    logger.info("early stop: patience exhausted")
                    done = True
    watchdog.stop()
    ckpt.finalize()  # commit any in-flight async save before exit
    progress.close()
    if tcfg.profile:
        jax.profiler.stop_trace()
    logger.info("training done at step %d", step)
    return 0


def fmt_metrics(vals) -> str:
    keys = [k for k in vals if k not in ("ntokens", "nsentences")]
    return " ".join(f"{k} {vals[k]:.4g}" for k in sorted(keys))


if __name__ == "__main__":
    sys.exit(main())
