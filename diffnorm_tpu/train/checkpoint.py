"""Checkpoint management: atomic orbax saves + best-k/last-N rotation.

Capability parity with fairseq/checkpoint_utils.py:35-280: rotating
checkpoint_last / checkpoint_best, keep-best-k by validation metric,
keep-last-N, resume restores trainer state + epoch-iterator position. The
tensor payload is saved with orbax (async-capable, TPU-host friendly); scalar
sidecar state (step, epoch, iterator position, metric history) lives in a
JSON next to it.

Layout:  save_dir/
           step_000001000/   (orbax pytree)
           step_000001000.json
           manifest.json     ({"checkpoints": [...], "best": ..., "last": ...})
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(
        self,
        save_dir: str,
        keep_last: int = 5,
        keep_best: int = 5,
        metric: str = "loss",
        maximize: bool = False,
    ):
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        self.keep_last = keep_last
        self.keep_best = keep_best
        self.metric = metric
        self.maximize = maximize
        self._ckptr = ocp.StandardCheckpointer()
        self._manifest_path = os.path.join(self.save_dir, "manifest.json")
        self.manifest = self._load_manifest()
        # (step, metric, extra) of an in-flight async save; manifest entry
        # and sidecar are only written once the write has committed, so a
        # crash mid-save never leaves the manifest pointing at a missing dir
        self._pending: Optional[Tuple[int, Optional[float], Optional[Dict]]] = None

    # -- manifest ------------------------------------------------------------
    def _load_manifest(self) -> Dict[str, Any]:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {"checkpoints": []}

    def _write_manifest(self):
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=2)
        os.replace(tmp, self._manifest_path)

    def _name(self, step: int) -> str:
        return f"step_{step:09d}"

    def _path(self, step: int) -> str:
        return os.path.join(self.save_dir, self._name(step))

    # -- save ---------------------------------------------------------------
    def save(
        self,
        step: int,
        state,
        metric_value: Optional[float] = None,
        extra: Optional[Dict[str, Any]] = None,
        blocking: bool = False,
    ):
        """Async save (reference async checkpointing capability): orbax's
        StandardCheckpointer copies device arrays to host in the call, then
        writes to disk in a background thread while training continues. At
        most one save is in flight; the next save (or finalize()) waits for
        it and only then commits its manifest entry."""
        self.finalize()
        path = self._path(step)
        if jax.process_count() > 1:
            # multi-host: only the primary clears a stale dir, behind a
            # barrier so no peer starts writing shards into it first
            from jax.experimental import multihost_utils

            if self._primary() and os.path.exists(path):
                shutil.rmtree(path)
            multihost_utils.sync_global_devices(f"ckpt_clear_{step}")
            # keep sharded jax.Arrays as-is: each process hands orbax its
            # addressable shards (np.array on a non-addressable global
            # array would throw); orbax copies to host before returning
        else:
            # defensive host copy: the caller's buffers may be donated to
            # the next jitted step while the background write still reads
            if os.path.exists(path):
                shutil.rmtree(path)
            state = jax.tree_util.tree_map(
                lambda x: np.array(x) if hasattr(x, "__array__") else x, state
            )
        self._ckptr.save(path, state)
        self._pending = (step, metric_value, extra)
        if blocking:
            self.finalize()

    @staticmethod
    def _primary() -> bool:
        """True on the process that owns manifest/sidecar writes and
        rotation deletes (all processes in single-host mode)."""
        return jax.process_index() == 0

    def finalize(self):
        """Wait for the in-flight save (if any) and commit its manifest."""
        if self._pending is None:
            return
        self._ckptr.wait_until_finished()
        step, metric_value, extra = self._pending
        self._pending = None
        if self._primary():
            path = self._path(step)
            with open(path + ".json", "w") as f:
                json.dump(
                    {"step": step, "metric": metric_value, **(extra or {})}, f
                )
            entries = [
                e for e in self.manifest["checkpoints"] if e["step"] != step
            ]
            entries.append({"step": step, "metric": metric_value})
            entries.sort(key=lambda e: e["step"])
            self.manifest["checkpoints"] = entries
            self._rotate()
            self._write_manifest()
        if jax.process_count() > 1:
            # peers participate in the array write; the JSON state is
            # host-global and written once by the primary. Barrier, then
            # peers re-read the committed manifest so latest_step()/
            # best_step() agree across processes.
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ckpt_commit_{step}")
            if not self._primary():
                self.manifest = self._load_manifest()

    def _rotate(self):
        entries = self.manifest["checkpoints"]
        keep_steps = set()
        if self.keep_last > 0:
            keep_steps.update(e["step"] for e in entries[-self.keep_last:])
        else:
            keep_steps.update(e["step"] for e in entries)
        scored = [e for e in entries if e.get("metric") is not None]
        if scored and self.keep_best > 0:
            scored.sort(key=lambda e: e["metric"], reverse=self.maximize)
            keep_steps.update(e["step"] for e in scored[: self.keep_best])
            self.manifest["best"] = scored[0]["step"]
        if entries:
            self.manifest["last"] = entries[-1]["step"]
        for e in list(entries):
            if e["step"] not in keep_steps:
                p = self._path(e["step"])
                if os.path.exists(p):
                    shutil.rmtree(p)
                if os.path.exists(p + ".json"):
                    os.remove(p + ".json")
                entries.remove(e)

    # -- load ---------------------------------------------------------------
    def latest_step(self) -> Optional[int]:
        self.finalize()
        return self.manifest.get("last")

    def best_step(self) -> Optional[int]:
        self.finalize()
        return self.manifest.get("best")

    def load(
        self, step: int, target=None
    ) -> Tuple[Any, Dict[str, Any]]:
        path = self._path(step)
        if target is not None:
            state = self._ckptr.restore(path, target=target)
        else:
            state = self._ckptr.restore(path)
        extra = {}
        if os.path.exists(path + ".json"):
            with open(path + ".json") as f:
                extra = json.load(f)
        return state, extra

    def load_latest(self, target=None):
        step = self.latest_step()
        if step is None:
            return None, {}
        return self.load(step, target)

    def load_best(self, target=None):
        step = self.best_step()
        if step is None:
            return self.load_latest(target)
        return self.load(step, target)

    @staticmethod
    def load_path(path: str, target=None) -> Tuple[Any, Dict[str, Any]]:
        """Restore a specific checkpoint directory (possibly from another
        run's save_dir — fairseq --restore-file) plus its sidecar metadata
        (epoch/iterator position) when present."""
        ckptr = ocp.StandardCheckpointer()
        path = os.path.abspath(path)
        state = ckptr.restore(path, target=target)
        extra = {}
        if os.path.exists(path + ".json"):
            with open(path + ".json") as f:
                extra = json.load(f)
        return state, extra


def load_checkpoint_params(path: str, target=None):
    """Load a single checkpoint directory (for cross-stage composition, e.g.
    the diffusion task restoring the frozen VAE — reference
    diff_discrete.py:73-79 load_model_ensemble_and_task)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=target)


def restored_to_variables(restored):
    """Canonicalize a restored checkpoint to a flax variables dict.

    A saved TrainState (step/params/opt_state/...) becomes params with any
    frozen subtrees folded back in plus the model-state collections; a raw
    variables dict ({"params": ...}) passes through; anything else returns
    None so the caller can decide (fairseq checkpoint_utils.load_model_ensemble
    accepts either full trainer state or bare model state the same way).
    Shared by every CLI that consumes --path-style checkpoints."""
    if isinstance(restored, dict) and "params" in restored:
        if "step" in restored:  # a saved TrainState
            params = {**restored["params"],
                      **(restored.get("frozen_params") or {})}
            return {"params": params,
                    **(restored.get("model_state") or {})}
        return restored
    return None
