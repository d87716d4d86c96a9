"""Trainer: functional train/valid steps under jit, gradient accumulation,
clipping, frozen-parameter composition, checkpoint/resume.

Capability parity with fairseq/trainer.py:784-1109 redesigned functional:

* one jitted `grad_step` per microbatch (grad-accumulation = weighted grad
  averaging by sample_size, exactly fairseq's sum-loss / sum-sample_size)
* one jitted `apply_step` (global-norm clip + adam + LR schedule)
* frozen subtrees (e.g. the VAE inside the diffusion stage) live outside the
  optimized param tree and are merged inside the loss closure
* mutable model collections (conformer batch-norm stats) thread through
* NaN/Inf detection on the loss with a skipped-step counter (reference
  NanDetector/overflow-skip behavior)
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from diffnorm_tpu.config import TrainerConfig
from diffnorm_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from diffnorm_tpu.train import metrics as metrics_mod
from diffnorm_tpu.train.lr_schedules import build_lr_schedule

logger = logging.getLogger(__name__)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    frozen_params: Any
    model_state: Any
    opt_state: Any
    ema_params: Any = None


def partition_params(params: Dict, frozen_keys: Tuple[str, ...]):
    """Split the top level of a param dict into (trainable, frozen)."""
    frozen = {k: v for k, v in params.items() if k in frozen_keys}
    trainable = {k: v for k, v in params.items() if k not in frozen_keys}
    return trainable, frozen


def merge_params(trainable: Dict, frozen: Dict) -> Dict:
    return {**trainable, **frozen}


class Trainer:
    def __init__(self, cfg: TrainerConfig, task, model, criterion, mesh=None):
        self.cfg = cfg
        self.task = task
        self.model = model
        self.criterion = criterion
        self.mesh = mesh or make_mesh(
            data=cfg.data_parallel, model=cfg.model_parallel
        )
        sched = build_lr_schedule(task.cfg)
        # manual / reduce_lr_on_plateau: lr depends on host-side events; the
        # jitted apply step receives it as a traced scalar (lr_value) instead
        # of tracing the schedule, so epoch-boundary lr changes never retrace
        self.host_lr_sched = sched if getattr(sched, "host_driven", False) else None
        self.lr_schedule = (
            (lambda step: jnp.ones((), jnp.float32))
            if self.host_lr_sched is not None else sched
        )
        from diffnorm_tpu.train.optimizers import EMA, build_optimizer

        self.tx = build_optimizer(task.cfg, sched, cfg.clip_norm)
        ema_decay = task.cfg.get("ema_decay", 0.0)
        self.ema = EMA(ema_decay) if ema_decay else None
        self._jit_grad = jax.jit(self._grad_step)
        # donate the state AND the accumulated grads: both are dead after
        # the update, and aliasing them lets XLA run the adam update fully
        # in place (an xplane profile showed ~11% of the post-rbg step in
        # copies — PERFORMANCE.md "NAR train step: RNG dominates")
        self._jit_apply = jax.jit(self._apply_step, donate_argnums=(0, 1))
        # update_freq=1 fast path: grad + normalize + adam in ONE program
        # with the state donated — the full gradient tree never round-trips
        # through HBM between a grad program and an apply program, and the
        # backward epilogue fuses with the optimizer update (measured on
        # v5e, PERFORMANCE.md "Fused single-microbatch train step").
        # TPU-only by default: XLA:CPU schedules the monolithic program
        # ~2.4x SLOWER than the split pair (measured on the 1-core test
        # box); --fused-train-step {0,1} overrides the auto choice.
        fused_flag = task.cfg.get("fused_train_step")
        self._use_fused = (jax.default_backend() != "cpu"
                           if fused_flag is None else bool(fused_flag))
        self._jit_fused = jax.jit(self._fused_step, donate_argnums=(0,))
        self._jit_valid = jax.jit(self._valid_step)
        # microbatch grad accumulation as ONE compiled call (a host-side
        # tree_map of jnp.add is one dispatch per param leaf); the
        # accumulator is donated so XLA updates it in place instead of
        # allocating a fresh gradient tree per microbatch
        self._jit_acc = jax.jit(
            lambda a, b: jax.tree_util.tree_map(jnp.add, a, b),
            donate_argnums=(0,),
        )
        self.skipped_steps = 0
        # host-side mirror of state.step: avoids an int(state.step) device
        # sync every update (one round trip through the TPU tunnel)
        self._host_step: Optional[int] = None

    # ------------------------------------------------------------------ init
    def init_state(self, rng, example_batch) -> TrainState:
        from diffnorm_tpu.parallel.sharding_rules import shard_params

        variables = self.task.init_variables(self.model, rng, example_batch)
        params = variables.pop("params")
        model_state = dict(variables)  # batch_stats etc.
        trainable, frozen = partition_params(params, self.task.frozen_param_keys)
        frozen = self.task.load_frozen_params(frozen)
        # TP: place params by Megatron-style rules over the "model" axis;
        # optional FSDP/ZeRO-3: every param additionally sharded over "data"
        # (GSPMD all-gathers on use, reduce-scatters the grads)
        fsdp = bool(self.task.cfg.get("fsdp")) or (
            self.task.cfg.get("ddp_backend") == "fully_sharded"
        )
        trainable = shard_params(trainable, self.mesh, fsdp=fsdp)
        frozen = shard_params(frozen, self.mesh, fsdp=fsdp)
        opt_state = self.tx.init(trainable)
        if self.task.cfg.get("zero_sharding") == "os":
            from diffnorm_tpu.train.optimizers import shard_optimizer_state

            opt_state = shard_optimizer_state(opt_state, self.mesh)
        state = TrainState(
            step=replicate(jnp.zeros((), jnp.int32), self.mesh),
            params=trainable,
            frozen_params=frozen,
            model_state=replicate(model_state, self.mesh),
            opt_state=opt_state,
            ema_params=self.ema.init(trainable) if self.ema else None,
        )
        return state

    # ------------------------------------------------------------ step fns
    def _record_keys(self, mets: Dict, attr: str) -> List[str]:
        """Pin the criterion's metric key set at trace time, loudly.

        The packed metric vector's layout is baked into the compiled program,
        so within one compilation the keys cannot drift — the only hazard is a
        RETRACE (new input shapes) where the criterion returns a different key
        set, which previously clobbered the recorded order silently and
        mislabeled every metric thereafter. Raise instead. A criterion may
        also declare `metric_keys` up front; mismatches fail at first trace.
        """
        keys = sorted(mets)
        declared = getattr(self.criterion, "metric_keys", None)
        if declared is not None and set(declared) != set(keys):
            raise ValueError(
                f"criterion {type(self.criterion).__name__} declared "
                f"metric_keys={sorted(declared)} but returned {keys}"
            )
        prev = getattr(self, attr, None)
        if prev is not None and prev != keys:
            raise ValueError(
                f"criterion {type(self.criterion).__name__} returned a "
                f"different metric key set between traces: {prev} -> {keys}; "
                "metric keys must be static across batches (pad with 0.0 "
                "instead of omitting a key)"
            )
        setattr(self, attr, keys)
        return keys

    def _loss(self, trainable, frozen, model_state, batch, rng, train):
        variables = {"params": merge_params(trainable, frozen), **model_state}
        loss, mets, mutated = self.criterion(
            self.model, variables, batch, rng, train=train
        )
        return loss, (mets, mutated)

    def _grad_step(self, state: TrainState, batch, rng,
                   scale_for_accum: bool = True):
        (loss, (mets, mutated)), grads = jax.value_and_grad(
            self._loss, has_aux=True
        )(state.params, state.frozen_params, state.model_state, batch, rng, True)
        # pack metrics into ONE array so the host pulls a single transfer
        # (each scalar D2H costs a full round trip through the TPU tunnel);
        # the key order is recorded at trace time (static per criterion)
        keys = self._record_keys(mets, "_metric_keys")
        vec = jnp.stack([jnp.asarray(mets[k], jnp.float32) for k in keys])
        # fairseq grad-accumulation semantics: the effective gradient is
        # sum_i d(loss_ref_i) / denom, where loss_ref is what the reference
        # criterion hands optimizer.backward (fairseq trainer.py:832,932).
        # Criterions declare which convention their reference counterpart
        # uses via `grad_accum`:
        #   "sum_loss" (default): reference backwards a SUM loss; our
        #     criterion returns the mean, so pre-scale grads by sample_size
        #     (done ON DEVICE so accumulation needs no host sync), denom =
        #     total sample_size (label-smoothed CE, CTC, hubert, wav2vec...)
        #   "mean_loss": reference backwards the already-normalized loss
        #     verbatim (speech_vae_decoder_loss, ddpm_* losses, tts losses:
        #     reduction="mean" + multiply_grads(1/sample_size)); grads stay
        #     unscaled, denom = total sample_size
        #   "mean_loss_per_batch": reference backwards the normalized loss
        #     with sample_size=1 "just used for logging" (nat_loss.py:131);
        #     denom = number of microbatches
        if (scale_for_accum
                and getattr(self.criterion, "grad_accum",
                            "sum_loss") == "sum_loss"):
            ss = (vec[keys.index("sample_size")]
                  if "sample_size" in keys else 1.0)
            grads = jax.tree_util.tree_map(lambda g: g * ss, grads)
        return grads, vec, mutated

    def _apply_step(self, state: TrainState, grads, ss_total=None,
                    lr_value=None):
        model_state = state.model_state
        lr = self.lr_schedule(state.step) if lr_value is None else lr_value
        if ss_total is not None:
            # grad normalization by total sample size INSIDE the jit: a
            # host-side tree_map here costs one tiny XLA dispatch per param
            # leaf (377 leaves = ~100 ms/step through the TPU tunnel)
            grads = jax.tree_util.tree_map(lambda g: g / ss_total, grads)
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(gnorm)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        if lr_value is not None:
            # host-driven lr: optimizer ran at unit lr; scale the final
            # updates (exact — lr enters linearly at the end of the chain)
            updates = jax.tree_util.tree_map(
                lambda u: (u * lr_value).astype(u.dtype), updates)
        new_params = optax.apply_updates(state.params, updates)
        # skip the update entirely on non-finite gradients
        new_params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_params, state.params
        )
        new_opt = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old) if hasattr(new, "shape") else new,
            new_opt,
            state.opt_state,
        )
        ema_params = state.ema_params
        if self.ema is not None and ema_params is not None:
            ema_params = self.ema.update(ema_params, new_params)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            model_state=model_state,
            ema_params=ema_params,
        )
        return new_state, gnorm, ok, lr

    def _fused_step(self, state: TrainState, batch, rng, lr_value=None):
        """Single-microbatch update as one XLA program (see __init__).

        Grad-accumulation conventions reduce to, for ONE microbatch:
        sum_loss -> g*ss/ss = g (skip both scalings); mean_loss -> g/ss;
        mean_loss_per_batch -> g/1 = g. Semantics identical to
        _grad_step + _apply_step at update_freq=1 (modulo the exact
        float cancellation of the sum_loss pre/post scaling, which only
        IMPROVES accuracy)."""
        grads, vec, mutated = self._grad_step(
            state, batch, rng, scale_for_accum=False)
        keys = self._metric_keys
        accum = getattr(self.criterion, "grad_accum", "sum_loss")
        if accum == "mean_loss" and "sample_size" in keys:
            ss = jnp.maximum(vec[keys.index("sample_size")], 1.0)
            grads = jax.tree_util.tree_map(lambda g: g / ss, grads)
        # sum_loss: g*ss/ss cancels exactly; mean_loss_per_batch: denom 1
        state = state.replace(model_state={**state.model_state, **mutated})
        new_state, gnorm, ok, lr = self._apply_step(
            state, grads, None, lr_value)
        return new_state, gnorm, ok, lr, vec

    def _valid_step(self, state: TrainState, batch, rng):
        _, (mets, _) = self._loss(
            state.params, state.frozen_params, state.model_state, batch, rng, False
        )
        keys = self._record_keys(mets, "_valid_metric_keys")
        return jnp.stack([jnp.asarray(mets[k], jnp.float32) for k in keys])

    # ------------------------------------------------------------- public
    def train_step(
        self, state: TrainState, batches: List[Dict], rng
    ) -> Tuple[TrainState, Dict[str, float]]:
        """One optimizer update over `len(batches)` microbatches."""
        if len(batches) == 1 and self._use_fused:
            return self._train_step_fused(state, batches[0], rng)
        grads_acc = None
        vecs = []  # device metric vectors; pulled once after the loop
        model_state = state.model_state
        for i, batch in enumerate(batches):
            r = jax.random.fold_in(rng, i)
            batch = shard_batch(batch, self.mesh)
            micro_state = state.replace(model_state=model_state)
            grads, met_vec, mutated = self._jit_grad(micro_state, batch, r)
            model_state = {**model_state, **mutated}
            vecs.append(met_vec)
            grads_acc = (
                grads if grads_acc is None else self._jit_acc(grads_acc, grads)
            )
        keys = self._metric_keys
        # normalize grads ON DEVICE by the accumulation denominator (device
        # scalar; no host pull needed) — total sample_size, or the
        # microbatch count for "mean_loss_per_batch" criterions (see
        # _grad_step's grad_accum conventions)
        ss_idx = keys.index("sample_size") if "sample_size" in keys else None
        vec_stack = jnp.stack(vecs)
        accum_mode = getattr(self.criterion, "grad_accum", "sum_loss")
        if accum_mode == "mean_loss_per_batch" or ss_idx is None:
            ss_total_dev = jnp.asarray(float(len(vecs)))
        else:
            ss_total_dev = jnp.maximum(jnp.sum(vec_stack[:, ss_idx]), 1.0)
        if self._host_step is None:
            self._host_step = int(state.step)
        step_before = self._host_step
        lr_value = None
        if self.host_lr_sched is not None:
            # fairseq convention: the lr used by update k is the scheduler's
            # value after step_update(k) (warmup indexes by update count)
            lr_value = jnp.asarray(
                self.host_lr_sched.step_update(step_before), jnp.float32)
        new_state, gnorm, ok, lr = self._jit_apply(
            state.replace(model_state=model_state), grads_acc, ss_total_dev,
            lr_value,
        )
        self._host_step = step_before + 1
        # ONE host pull for everything the logger needs (each device->host
        # scalar read costs a full round trip through the TPU tunnel)
        all_vecs, gnorm_h, ok_h, lr_h = jax.device_get(
            (vec_stack, gnorm, ok, lr)
        )
        all_vecs = np.asarray(all_vecs)
        ss_per = all_vecs[:, ss_idx] if ss_idx is not None else np.ones(len(vecs))
        ss_total = float(ss_per.sum())
        mets_acc: Dict[str, float] = {}
        for k_i, k in enumerate(keys):
            if k in ("ntokens", "nsentences", "sample_size"):
                mets_acc[k] = float(all_vecs[:, k_i].sum())
            else:
                mets_acc[k] = float((all_vecs[:, k_i] * ss_per).sum())
        if not bool(ok_h):
            self.skipped_steps += 1
            logger.warning("non-finite gradients at step %d; update skipped",
                           step_before)
        out = {
            k: (v / max(ss_total, 1.0)
                if k not in ("ntokens", "nsentences", "sample_size") else v)
            for k, v in mets_acc.items()
        }
        out["gnorm"] = float(gnorm_h)
        out["lr"] = float(lr_h)
        metrics_mod.log_dict(out)
        return new_state, out

    def _train_step_fused(self, state: TrainState, batch, rng):
        """update_freq=1 driver around _jit_fused: one dispatch, one pull."""
        batch = shard_batch(batch, self.mesh)
        r = jax.random.fold_in(rng, 0)
        if self._host_step is None:
            self._host_step = int(state.step)
        step_before = self._host_step
        lr_value = None
        if self.host_lr_sched is not None:
            lr_value = jnp.asarray(
                self.host_lr_sched.step_update(step_before), jnp.float32)
        new_state, gnorm, ok, lr, vec = self._jit_fused(
            state, batch, r, lr_value)
        self._host_step = step_before + 1
        vec_h, gnorm_h, ok_h, lr_h = jax.device_get((vec, gnorm, ok, lr))
        vec_h = np.asarray(vec_h)
        keys = self._metric_keys
        out: Dict[str, float] = {k: float(vec_h[i])
                                 for i, k in enumerate(keys)}
        if not bool(ok_h):
            self.skipped_steps += 1
            logger.warning("non-finite gradients at step %d; update skipped",
                           step_before)
        out["gnorm"] = float(gnorm_h)
        out["lr"] = float(lr_h)
        metrics_mod.log_dict(out)
        return new_state, out

    # ---- host-driven lr scheduler hooks (no-ops for pure schedules) ----
    def lr_step_begin_epoch(self, epoch: int):
        if self.host_lr_sched is not None:
            return self.host_lr_sched.step_begin_epoch(epoch)

    def lr_step_epoch(self, epoch: int, val_loss=None):
        if self.host_lr_sched is not None:
            return self.host_lr_sched.step_epoch(epoch, val_loss)

    def lr_state_dict(self):
        if self.host_lr_sched is not None:
            return self.host_lr_sched.state_dict()
        return None

    def load_lr_state_dict(self, sd):
        if self.host_lr_sched is not None and sd:
            self.host_lr_sched.load_state_dict(sd)

    def valid_step(self, state: TrainState, batch, rng) -> Dict[str, float]:
        batch = shard_batch(batch, self.mesh)
        vec = self._jit_valid(state, batch, rng)
        out = {
            k: float(v)
            for k, v in zip(self._valid_metric_keys,
                            np.asarray(jax.device_get(vec)))
        }
        metrics_mod.log_dict(out)
        return out
