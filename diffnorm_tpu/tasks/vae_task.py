"""Speech VAE task ("speech_decoder" in the reference,
fairseq/tasks/speech_decoder_task.py): builds the 1000+4 unit dictionary,
loads the repr->repr-unit dataset, provides init/dummy batches."""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from diffnorm_tpu.config import Config
from diffnorm_tpu.data.dictionary import Dictionary
from diffnorm_tpu.registry import register_task
from diffnorm_tpu.tasks.base import Task
from diffnorm_tpu.utils.masking import lengths_to_mask


@register_task("speech_decoder")
class SpeechDecoderTask(Task):
    def __init__(self, cfg: Config):
        super().__init__(cfg)
        self.tgt_dict = Dictionary.unit_dictionary(cfg.get("target_code_size", 1000))

    def load_dataset(self, split: str, epoch: int = 1):
        from diffnorm_tpu.data.repr_unit_dataset import ReprToReprUnitDataset

        self.datasets[split] = ReprToReprUnitDataset.from_tsv(
            root=self.data_path(epoch),
            tgt_feat_dir=self.cfg.get("tgt_feat_dir"),
            split=split,
            tgt_dict=self.tgt_dict,
            is_train=split.startswith("train"),
            max_samples=None if split.startswith("train") else 4000,
        )

    def init_variables(self, model, rng, batch):
        feature = batch["reduce_target"]
        mask = np.asarray(
            lengths_to_mask(batch["reduce_target_lengths"], feature.shape[1])
        )
        r_p, r_s = jax.random.split(rng)
        return model.init(
            {"params": r_p, "sample": r_s},
            feature,
            mask,
            r_s,
            deterministic=True,
        )

    def dummy_batch(self, batch_size: int = 2, seq_len: int = 16) -> Dict:
        rng = np.random.default_rng(0)
        dim = self.cfg.get("feature_dim", 768)
        lengths = np.full((batch_size,), seq_len, dtype=np.int32)
        lengths[-1] = max(seq_len // 2, 1)
        units = rng.integers(4, 4 + self.cfg.get("target_code_size", 1000),
                             size=(batch_size, seq_len)).astype(np.int32)
        for i, n in enumerate(lengths):
            units[i, n:] = 0
        return {
            "reduce_target": rng.normal(size=(batch_size, seq_len, dim)).astype(
                np.float32
            ),
            "reduce_target_unit": units,
            "reduce_target_lengths": lengths,
        }
