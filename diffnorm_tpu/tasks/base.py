"""Task base class (reference: fairseq/tasks/fairseq_task.py).

A task owns the dictionaries, datasets, model/criterion construction, and any
host-side per-batch preparation (e.g. CMLM mask injection). Everything the
jitted step functions need is produced here as plain numpy batches.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from diffnorm_tpu.config import Config
from diffnorm_tpu.data.dictionary import Dictionary
from diffnorm_tpu.registry import CRITERIONS, build_model


class Task:
    frozen_param_keys: Tuple[str, ...] = ()

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.datasets: Dict[str, Any] = {}
        self.tgt_dict: Optional[Dictionary] = None

    # ---------------------------------------------------------------- setup
    @classmethod
    def setup_task(cls, cfg: Config) -> "Task":
        return cls(cfg)

    @property
    def target_dictionary(self) -> Optional[Dictionary]:
        return self.tgt_dict

    def build_model(self):
        arch = self.cfg.get("arch")
        assert arch, "config must set 'arch'"
        return build_model(arch, self.cfg, task=self)

    def build_criterion(self):
        name = self.cfg.get("criterion")
        assert name, "config must set 'criterion'"
        return CRITERIONS.get(name)(self.cfg, task=self)

    # ---------------------------------------------------------------- data
    def _data_shards(self):
        return [p for p in str(self.cfg.get("data") or "").split(":") if p]

    def has_sharded_data(self) -> bool:
        """--data dir1:dir2:... (fairseq split_paths shard rotation)."""
        return len(self._data_shards()) > 1

    def data_path(self, epoch: int = 1) -> str:
        """The data dir for this epoch: shards rotate per epoch for train
        (fairseq/tasks/translation.py load_dataset:
        paths[(epoch - 1) % len(paths)]); non-train callers use the default
        epoch=1 = the first shard, like the reference's paths[:1]."""
        shards = self._data_shards()
        if not shards:
            return self.cfg.get("data") or ""
        return shards[(epoch - 1) % len(shards)]

    def load_dataset(self, split: str, epoch: int = 1):
        raise NotImplementedError

    def dataset(self, split: str, epoch: int = 1):
        if self.has_sharded_data() and split.startswith("train"):
            shard = (epoch - 1) % len(self._data_shards())
            loaded = getattr(self, "_loaded_shard", {})
            if loaded.get(split) != shard:
                self.datasets.pop(split, None)
                self.load_dataset(split, epoch=epoch)
                loaded[split] = shard
                self._loaded_shard = loaded
        if split not in self.datasets:
            self.load_dataset(split, epoch=epoch)
        return self.datasets[split]

    def prepare_batch(self, batch: Dict[str, np.ndarray], rng: np.random.Generator):
        """Host-side per-batch hook (e.g. CMLM mask injection)."""
        return batch

    # ------------------------------------------------------------- jit glue
    def init_variables(self, model, rng, example_batch):
        raise NotImplementedError

    def load_frozen_params(self, frozen: Dict) -> Dict:
        """Replace freshly-initialized frozen subtrees with checkpoint
        weights (cross-stage composition). Default: keep as-is."""
        return frozen

    def dummy_batch(self, batch_size: int = 2, seq_len: int = 16) -> Dict:
        raise NotImplementedError
