"""AR S2UT task ("speech_to_speech_ar" in the reference,
fairseq/tasks/ar_speech_to_speech.py): same fbank->units data as the NAR
task, but teacher-forced autoregressive training (prev_output_tokens =
eos-prepended shifted target, fairseq convention) and beam-search
generation."""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from diffnorm_tpu.config import Config
from diffnorm_tpu.registry import register_task
from diffnorm_tpu.tasks.nar_s2ut_task import NARS2UTTask

PAD, EOS = 1, 2


def shift_right(target: np.ndarray) -> np.ndarray:
    """prev_output_tokens: [eos, t0, t1, ...] per fairseq collate convention
    (move the trailing eos to the front)."""
    prev = np.full_like(target, PAD)
    prev[:, 0] = EOS
    prev[:, 1:] = target[:, :-1]
    # positions that are pad in the target stay pad in the shifted copy
    prev[target == PAD] = PAD
    return prev


@register_task("speech_to_speech_ar")
class ARS2UTTask(NARS2UTTask):
    def prepare_batch(self, batch: Dict[str, np.ndarray], rng: np.random.Generator):
        batch["prev_output_tokens"] = shift_right(batch["target"])
        return batch

    def init_variables(self, model, rng, batch):
        r_p, r_d = jax.random.split(rng)
        return model.init(
            {"params": r_p, "dropout": r_d},
            batch["src_tokens"],
            batch["src_lengths"],
            batch["prev_output_tokens"],
            deterministic=True,
        )

    def dummy_batch(self, batch_size: int = 2, seq_len: int = 48) -> Dict:
        batch = super().dummy_batch(batch_size, seq_len)
        batch.pop("prev_target", None)
        return self.prepare_batch(batch, np.random.default_rng(0))


@register_task("dummy_ar")
class DummyARTask(ARS2UTTask):
    def load_dataset(self, split: str, epoch: int = 1):
        from diffnorm_tpu.tasks.dummy import _SyntheticDataset

        bsz = self.cfg.get("batch_size", 4)
        seq = self.cfg.get("tokens_per_sample", 96)
        self.datasets[split] = _SyntheticDataset(
            lambda: self.dummy_batch(bsz, seq), self.cfg.get("dataset_size", 8)
        )
