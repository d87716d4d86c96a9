"""Dummy benchmark tasks that synthesize batches without any data on disk
(reference: fairseq/benchmark/dummy_mt.py etc.) — used to benchmark the
trainer loop and by the smoke tests."""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np

from diffnorm_tpu.config import Config
from diffnorm_tpu.registry import register_task
from diffnorm_tpu.tasks.nar_s2ut_task import NARS2UTTask
from diffnorm_tpu.tasks.vae_task import SpeechDecoderTask


class _SyntheticDataset:
    """Iterable of identical synthetic batches."""

    def __init__(self, make_batch, num_batches: int):
        self.make_batch = make_batch
        self.num_batches = num_batches

    def __len__(self):
        return self.num_batches

    def __iter__(self) -> Iterator[Dict]:
        for _ in range(self.num_batches):
            yield self.make_batch()


@register_task("dummy_vae")
class DummyVAETask(SpeechDecoderTask):
    def load_dataset(self, split: str, epoch: int = 1):
        bsz = self.cfg.get("batch_size", 4)
        seq = self.cfg.get("tokens_per_sample", 32)
        self.datasets[split] = _SyntheticDataset(
            lambda: self.dummy_batch(bsz, seq), self.cfg.get("dataset_size", 8)
        )


@register_task("dummy_nar")
class DummyNARTask(NARS2UTTask):
    def load_dataset(self, split: str, epoch: int = 1):
        bsz = self.cfg.get("batch_size", 4)
        seq = self.cfg.get("tokens_per_sample", 96)
        self.datasets[split] = _SyntheticDataset(
            lambda: self.dummy_batch(bsz, seq), self.cfg.get("dataset_size", 8)
        )
