"""HuBERT pretraining task (reference fairseq/tasks/hubert_pretraining.py):
wav2vec-style audio manifest + frame-level k-means labels, span masks drawn
host-side per batch (the reference draws them inside the model's
apply_mask, hubert.py:337-358 — here the task's prepare_batch draws them
with utils.masking.compute_mask_indices, the bit-exact port, so the jitted
model stays RNG-free on the host path).

Pairs with `--arch hubert --criterion hubert` (models/hubert.py
HubertPretrainModule, criterions/hubert_loss.py).
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import numpy as np

from diffnorm_tpu.config import Config
from diffnorm_tpu.data.dictionary import Dictionary
from diffnorm_tpu.registry import register_task
from diffnorm_tpu.tasks.base import Task
from diffnorm_tpu.utils.masking import compute_mask_indices


@register_task("hubert_pretraining")
class HubertPretrainingTask(Task):
    def __init__(self, cfg: Config):
        super().__init__(cfg)
        label = cfg.get("labels", "km")
        if isinstance(label, (list, tuple)):
            label = label[0]
        self.label = label
        dict_path = None
        label_dir = cfg.get("label_dir") or cfg.get("data")
        if label_dir:
            cand = os.path.join(str(label_dir), f"dict.{label}.txt")
            if os.path.exists(cand):
                dict_path = cand
        if dict_path:
            self.tgt_dict = Dictionary.load(dict_path)
        else:
            # synthetic/dummy flows: a K-unit dictionary
            self.tgt_dict = Dictionary.unit_dictionary(
                cfg.get("target_code_size", 500))

    @property
    def target_dictionary(self):
        return self.tgt_dict

    def load_dataset(self, split: str, epoch: int = 1):
        from diffnorm_tpu.data.hubert_dataset import HubertPretrainDataset
        from diffnorm_tpu.models.hubert import _parse_conv_spec

        root = self.data_path(epoch)
        label_dir = str(self.cfg.get("label_dir") or root)
        self.datasets[split] = HubertPretrainDataset.from_manifest(
            manifest=os.path.join(root, f"{split}.tsv"),
            label_file=os.path.join(label_dir, f"{split}.{self.label}"),
            tgt_dict=self.tgt_dict,
            conv_layers=_parse_conv_spec(
                self.cfg.get("conv_feature_layers")),
            max_sample_size=self.cfg.get("max_sample_size", 250_000),
            min_sample_size=self.cfg.get("min_sample_size", 32_000),
            sample_rate=self.cfg.get("sample_rate", 16_000),
            label_rate=self.cfg.get("label_rate", 50.0),
            normalize=bool(self.cfg.get("normalize", False)),
            is_train=split.startswith("train"),
            random_crop=bool(self.cfg.get("random_crop", True)),
        )

    def prepare_batch(self, batch: Dict[str, np.ndarray], rng: np.random.Generator):
        """Draw the span mask over valid frames (reference apply_mask
        passes min_masks=2 and the frame-level padding mask)."""
        target = batch["target"]
        frames = target.shape[1]
        # frame-level padding: invalid where no label / beyond the waveform
        padding = ~(target >= 0)
        mask_indices = compute_mask_indices(
            (target.shape[0], frames),
            padding,
            mask_prob=self.cfg.get("mask_prob", 0.65),
            mask_length=self.cfg.get("mask_length", 10),
            mask_type=self.cfg.get("mask_selection", "static"),
            mask_other=self.cfg.get("mask_other", 0.0),
            min_masks=2,
            no_overlap=bool(self.cfg.get("no_mask_overlap", False)),
            min_space=self.cfg.get("mask_min_space", 1),
            rng=rng,
        )
        batch["mask_indices"] = mask_indices & ~padding
        return batch

    def init_variables(self, model, rng, batch):
        r_p, r_d = jax.random.split(rng)
        return model.init(
            {"params": r_p, "dropout": r_d},
            batch["src_tokens"], batch["src_lengths"],
            batch["mask_indices"], deterministic=True,
        )

    def dummy_batch(self, batch_size: int = 2, seq_len: int = 8000) -> Dict:
        from diffnorm_tpu.data.hubert_dataset import _host_frames_for_samples
        from diffnorm_tpu.models.hubert import _parse_conv_spec

        conv = _parse_conv_spec(self.cfg.get("conv_feature_layers"))
        rng = np.random.default_rng(0)
        frames = _host_frames_for_samples(seq_len, conv)
        k = len(self.tgt_dict)
        lengths = np.full((batch_size,), seq_len, np.int32)
        lengths[-1] = max(seq_len * 3 // 4, 1)
        target = rng.integers(4, k, size=(batch_size, frames)).astype(np.int64)
        for i, n in enumerate(lengths):
            target[i, _host_frames_for_samples(int(n), conv):] = -1
        batch = {
            "src_tokens": rng.normal(
                size=(batch_size, seq_len)).astype(np.float32) * 0.1,
            "src_lengths": lengths,
            "target": target,
            "ntokens": int((target >= 0).sum()),
            "nsentences": batch_size,
        }
        return self.prepare_batch(batch, rng)


@register_task("dummy_hubert")
class DummyHubertTask(HubertPretrainingTask):
    def load_dataset(self, split: str, epoch: int = 1):
        from diffnorm_tpu.tasks.dummy import _SyntheticDataset

        bsz = self.cfg.get("batch_size", 2)
        seq = self.cfg.get("tokens_per_sample", 8000)
        self.datasets[split] = _SyntheticDataset(
            lambda: self.dummy_batch(bsz, seq), self.cfg.get("dataset_size", 4)
        )
