"""SEDD tasks (reference "sedd"/"sedd_lm",
fairseq/tasks/score_entropy_diffusion_task.py): discrete-diffusion language
modeling over speech-unit sequences (the same unit manifests as the other
stages)."""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from diffnorm_tpu.config import Config
from diffnorm_tpu.data.dictionary import Dictionary
from diffnorm_tpu.registry import register_task
from diffnorm_tpu.tasks.base import Task
from diffnorm_tpu.utils.masking import lengths_to_mask


@register_task("sedd")
class SEDDTask(Task):
    def __init__(self, cfg: Config):
        super().__init__(cfg)
        self.tgt_dict = Dictionary.unit_dictionary(cfg.get("target_code_size", 1000))

    def load_dataset(self, split: str, epoch: int = 1):
        from diffnorm_tpu.data.unit_lm_dataset import UnitLMDataset

        # LM-style token blocking (reference language_modeling task flags):
        # activated by passing --sample-break-mode and/or --tokens-per-sample;
        # without them sequences stay per-utterance (previous behavior)
        block = 0
        if (self.cfg.get("sample_break_mode")
                or self.cfg.get("tokens_per_sample")):
            block = int(self.cfg.get("tokens_per_sample", 1024))
        self.datasets[split] = UnitLMDataset.from_tsv(
            root=self.data_path(epoch), split=split, tgt_dict=self.tgt_dict,
            max_positions=self.cfg.get("max_target_positions", 1024),
            block_size=block,
            break_mode=self.cfg.get("sample_break_mode") or "none",
            is_train=split.startswith("train"),
        )

    def init_variables(self, model, rng, batch):
        valid = np.asarray(
            lengths_to_mask(batch["target_lengths"], batch["target_unit"].shape[1])
        )
        r_p, r_m, r_d = jax.random.split(rng, 3)
        return model.init(
            {"params": r_p, "dropout": r_d},
            batch["target_unit"], valid, r_m, deterministic=True,
        )

    def dummy_batch(self, batch_size: int = 2, seq_len: int = 16) -> Dict:
        rng = np.random.default_rng(0)
        lengths = np.full((batch_size,), seq_len, np.int32)
        lengths[-1] = max(seq_len // 2, 2)
        units = rng.integers(
            4, 4 + self.cfg.get("target_code_size", 1000),
            size=(batch_size, seq_len),
        ).astype(np.int32)
        for i, n in enumerate(lengths):
            units[i, n:] = 0
        return {"target_unit": units, "target_lengths": lengths}


@register_task("sedd_lm")
class SEDDLMTask(SEDDTask):
    """Same capability as "sedd" with LM-style token-block batching over
    concatenated unit streams (reference sedd_lm task): sequences are
    concatenated and re-sliced into --tokens-per-sample blocks under
    --sample-break-mode (none/complete/complete_doc/eos)."""


@register_task("dummy_sedd")
class DummySEDDTask(SEDDTask):
    def load_dataset(self, split: str, epoch: int = 1):
        from diffnorm_tpu.tasks.dummy import _SyntheticDataset

        bsz = self.cfg.get("batch_size", 4)
        seq = self.cfg.get("tokens_per_sample", 32)
        self.datasets[split] = _SyntheticDataset(
            lambda: self.dummy_batch(bsz, seq), self.cfg.get("dataset_size", 8)
        )


@register_task("unit_lm")
class UnitLMTask(SEDDTask):
    """Autoregressive unit language modeling (reference transformer_lm task
    capability over speech units; pairs with criterion lm_cross_entropy and
    cli/eval_lm.py). --sample-break-mode/--tokens-per-sample re-block the
    concatenated unit stream like the reference language_modeling task."""

    def init_variables(self, model, rng, batch):
        r_p, r_d = jax.random.split(rng)
        return model.init(
            {"params": r_p, "dropout": r_d},
            batch["target_unit"], deterministic=True,
        )


@register_task("dummy_unit_lm")
class DummyUnitLMTask(UnitLMTask):
    def load_dataset(self, split: str, epoch: int = 1):
        from diffnorm_tpu.tasks.dummy import _SyntheticDataset

        bsz = self.cfg.get("batch_size", 4)
        seq = self.cfg.get("tokens_per_sample", 32)
        self.datasets[split] = _SyntheticDataset(
            lambda: self.dummy_batch(bsz, seq), self.cfg.get("dataset_size", 8)
        )
