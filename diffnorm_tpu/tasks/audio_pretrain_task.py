"""wav2vec 2.0 audio pretraining task (reference
fairseq/tasks/audio_pretraining.py + the model-side mask/negative draws of
fairseq/models/wav2vec/wav2vec2.py apply_mask:414-485 and
sample_negatives:684-744, moved host-side for static TPU shapes).

Per batch, `prepare_batch`:
* draws the span mask with the bit-exact `compute_mask_indices` port
  (require_same_masks=True -> every row masks the same count M),
* flattens it to a FIXED-budget `masked_pos [B, M_pad]` + validity (the
  budget depends only on cfg, so the jitted train step never retraces),
* draws the reference's same-utterance negatives: for masked slot m,
  `n_negatives` uniform draws over the OTHER M-1 masked slots
  (randint(0, M-1) then +1 on >= m — exactly sample_negatives' shift),
* anneals the gumbel temperature max(max_t * decay^updates, min_t)
  (GumbelVectorQuantizer.set_num_updates) from the trainer step via
  `set_num_updates`.

Pairs with `--arch wav2vec2 --criterion wav2vec`.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import numpy as np

from diffnorm_tpu.config import Config
from diffnorm_tpu.registry import register_task
from diffnorm_tpu.tasks.base import Task
from diffnorm_tpu.utils.masking import compute_mask_indices


def _parse_temp(t):
    if isinstance(t, str):
        import ast

        t = ast.literal_eval(t)
    return tuple(float(x) for x in t)


@register_task("audio_pretraining")
class AudioPretrainingTask(Task):
    def __init__(self, cfg: Config):
        super().__init__(cfg)
        self.mask_prob = float(cfg.get("mask_prob", 0.65))
        self.mask_length = int(cfg.get("mask_length", 10))
        self.n_negatives = int(cfg.get("num_negatives", 100))
        self.max_temp, self.min_temp, self.temp_decay = _parse_temp(
            cfg.get("latent_temp", (2.0, 0.5, 0.999995)))
        self._num_updates = 0

    # the train CLI calls this with the optimizer step (resume-aware)
    def set_num_updates(self, num_updates: int):
        self._num_updates = int(num_updates)

    @property
    def gumbel_temp(self) -> float:
        return max(self.max_temp * self.temp_decay ** self._num_updates,
                   self.min_temp)

    @property
    def target_dictionary(self):
        return None

    def _conv_spec(self):
        from diffnorm_tpu.models.hubert import _parse_conv_spec

        return _parse_conv_spec(self.cfg.get("conv_feature_layers"))

    def load_dataset(self, split: str, epoch: int = 1):
        from diffnorm_tpu.data.hubert_dataset import HubertPretrainDataset

        root = self.data_path(epoch)
        self.datasets[split] = HubertPretrainDataset.from_manifest(
            manifest=os.path.join(root, f"{split}.tsv"),
            conv_layers=self._conv_spec(),
            max_sample_size=self.cfg.get("max_sample_size", 250_000),
            min_sample_size=self.cfg.get("min_sample_size", 32_000),
            sample_rate=self.cfg.get("sample_rate", 16_000),
            normalize=bool(self.cfg.get("normalize", False)),
            is_train=split.startswith("train"),
            random_crop=bool(self.cfg.get("random_crop", True)),
        )

    def mask_budget(self, n_frames: int) -> int:
        """Static upper bound on the per-row masked count: at most
        max(int(prob*F/L)+1, min_masks=2) span starts survive
        clipping/dedup, each at most L (static) / 2L (uniform) long;
        normal/poisson draw unbounded lengths so the bound is F."""
        spans = max(int(self.mask_prob * n_frames / self.mask_length) + 1, 2)
        sel = self.cfg.get("mask_selection", "static")
        if sel == "static":
            span_len = self.mask_length
        elif sel == "uniform":
            span_len = 2 * self.mask_length
        else:  # normal / poisson: unbounded draws
            return n_frames
        return min(spans * span_len, n_frames)

    def prepare_batch(self, batch: Dict[str, np.ndarray],
                      rng: np.random.Generator):
        from diffnorm_tpu.data.hubert_dataset import _host_frames_for_samples

        conv = self._conv_spec()
        bsz = batch["src_tokens"].shape[0]
        n_frames = _host_frames_for_samples(
            batch["src_tokens"].shape[1], conv)
        valid_frames = np.asarray([
            _host_frames_for_samples(int(n), conv)
            for n in batch["src_lengths"]])
        padding = np.arange(n_frames)[None, :] >= valid_frames[:, None]

        mask = compute_mask_indices(
            (bsz, n_frames), padding,
            mask_prob=self.mask_prob, mask_length=self.mask_length,
            mask_type=self.cfg.get("mask_selection", "static"),
            mask_other=self.cfg.get("mask_other", 0.0),
            min_masks=2,
            no_overlap=bool(self.cfg.get("no_mask_overlap", False)),
            min_space=self.cfg.get("mask_min_space", 1),
            require_same_masks=True,
            mask_dropout=float(self.cfg.get("mask_dropout", 0.0)),
            rng=rng,
        ) & ~padding

        m_pad = self.mask_budget(n_frames)
        counts = mask.sum(1)
        if counts.max() > m_pad:
            # defensive: the budget bound should cover every draw; if a
            # pathological config exceeds it, subsample every row to the
            # budget (preserves the equal-count invariant) rather than crash
            for b in range(bsz):
                idx = np.nonzero(mask[b])[0]
                drop = rng.choice(idx, len(idx) - m_pad, replace=False)
                mask[b, drop] = False
            counts = mask.sum(1)
        masked_pos = np.zeros((bsz, m_pad), np.int32)
        masked_valid = np.zeros((bsz, m_pad), bool)
        for b in range(bsz):
            idx = np.nonzero(mask[b])[0]
            masked_pos[b, : len(idx)] = idx
            masked_valid[b, : len(idx)] = True

        # same-utterance negatives over the masked axis (sample_negatives:
        # uniform over [0, M-1) then +1 at >= self to skip the positive)
        n = self.n_negatives
        m_act = int(counts.min()) if bsz else 0
        neg = np.zeros((bsz, m_pad, n), np.int32)
        if m_act > 1:
            draws = rng.integers(0, m_act - 1, size=(bsz, m_pad, n))
            slots = np.arange(m_pad)[None, :, None]
            draws = draws + (draws >= slots)
            neg = np.minimum(draws, m_act - 1).astype(np.int32)

        batch["mask_indices"] = mask
        batch["masked_pos"] = masked_pos
        batch["masked_valid"] = masked_valid
        batch["neg_idxs"] = neg
        batch["gumbel_temp"] = np.float32(self.gumbel_temp)
        return batch

    def init_variables(self, model, rng, batch):
        r_p, r_d = jax.random.split(rng)
        return model.init(
            {"params": r_p, "dropout": r_d},
            batch["src_tokens"], batch["src_lengths"],
            batch["mask_indices"], batch["masked_pos"],
            batch["masked_valid"], batch["neg_idxs"],
            temp=batch.get("gumbel_temp", 2.0), deterministic=True,
        )

    def dummy_batch(self, batch_size: int = 2, seq_len: int = 8000) -> Dict:
        rng = np.random.default_rng(0)
        lengths = np.full((batch_size,), seq_len, np.int32)
        if batch_size > 1:
            lengths[-1] = max(seq_len * 3 // 4, 1)
        batch = {
            "src_tokens": rng.normal(
                size=(batch_size, seq_len)).astype(np.float32) * 0.1,
            "src_lengths": lengths,
            "nsentences": batch_size,
            "ntokens": int(lengths.sum()),
        }
        return self.prepare_batch(batch, rng)


@register_task("dummy_wav2vec2")
class DummyWav2Vec2Task(AudioPretrainingTask):
    def load_dataset(self, split: str, epoch: int = 1):
        from diffnorm_tpu.tasks.dummy import _SyntheticDataset

        bsz = self.cfg.get("batch_size", 2)
        seq = self.cfg.get("tokens_per_sample", 8000)
        self.datasets[split] = _SyntheticDataset(
            lambda: self.dummy_batch(bsz, seq), self.cfg.get("dataset_size", 4)
        )
