"""Levenshtein-transformer task ("translation_lev" capability in fairseq's
NAT family): host-side canvas construction with the native edit-path op.

Per batch (prepare_batch):
* keep-mask: each interior target token survives with prob ~ U(0.2, 1)
* prev_ins  = target with dropped tokens -> unk (word-fill canvas)
* prev_kept = left-packed kept tokens (insertion-count canvas)
* ins_target/ins_valid = #dropped tokens per adjacent kept slot
* prev_del  = target with random token substitutions; del_target marks them
  (the edit-path op recovers identical supervision for arbitrary canvases —
  see models/levenshtein.py edit_path_targets)
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from diffnorm_tpu.config import Config
from diffnorm_tpu.registry import register_task
from diffnorm_tpu.tasks.cmlm_cg_task import CMLMCGTask

PAD, BOS, EOS, UNK = 1, 0, 2, 3


@register_task("translation_lev")
class LevenshteinTask(CMLMCGTask):
    def prepare_batch(self, batch: Dict[str, np.ndarray], rng: np.random.Generator):
        target = batch["target"]
        b, t = target.shape
        special = (target == PAD) | (target == BOS) | (target == EOS)

        # ---- insertion/word canvases from random deletion ----------------
        # keep_prob reaches 0 so the empty [bos, eos] canvas — the decoding
        # start state — stays in-distribution (reference random-delete noise)
        keep_prob = rng.uniform(0.0, 1.0, size=(b, 1))
        keep = (rng.random(target.shape) < keep_prob) | special
        prev_ins = np.where(keep, target, UNK).astype(np.int32)

        prev_kept = np.full_like(target, PAD)
        ins_target = np.zeros((b, t + 1), np.int32)
        ins_valid = np.zeros((b, t + 1), bool)
        for i in range(b):
            kept_idx = np.nonzero(keep[i] & (target[i] != PAD))[0]
            prev_kept[i, : len(kept_idx)] = target[i, kept_idx]
            for slot in range(len(kept_idx) - 1):
                gap = kept_idx[slot + 1] - kept_idx[slot] - 1
                ins_target[i, slot] = gap
                ins_valid[i, slot] = True

        # ---- deletion canvas from random substitution --------------------
        sub_prob = rng.uniform(0.0, 0.3, size=(b, 1))
        sub = (rng.random(target.shape) < sub_prob) & ~special
        noise = rng.integers(4, len(self.tgt_dict), size=target.shape)
        prev_del = np.where(sub, noise, target).astype(np.int32)
        del_target = sub.astype(np.int32)

        batch.update(
            prev_ins=prev_ins,
            prev_kept=prev_kept,
            ins_target=ins_target,
            ins_valid=ins_valid,
            prev_del=prev_del,
            del_target=del_target,
        )
        return batch

    def init_variables(self, model, rng, batch):
        r_p, r_d = jax.random.split(rng)
        return model.init(
            {"params": r_p, "dropout": r_d},
            batch["src_tokens"], batch["src_lengths"],
            batch["prev_del"], batch["prev_kept"], batch["prev_ins"],
            deterministic=True,
        )

    def dummy_batch(self, batch_size: int = 2, seq_len: int = 12) -> Dict:
        rng = np.random.default_rng(0)
        src = rng.integers(4, len(self.src_dict),
                           size=(batch_size, seq_len)).astype(np.int32)
        tgt = rng.integers(4, len(self.tgt_dict),
                           size=(batch_size, seq_len)).astype(np.int32)
        tgt[:, 0] = BOS
        tgt[:, -1] = EOS
        batch = {
            "src_tokens": src,
            "src_lengths": np.full((batch_size,), seq_len, np.int32),
            "target": tgt,
        }
        return self.prepare_batch(batch, rng)


@register_task("dummy_lev")
class DummyLevenshteinTask(LevenshteinTask):
    def load_dataset(self, split: str, epoch: int = 1):
        from diffnorm_tpu.tasks.dummy import _SyntheticDataset

        bsz = self.cfg.get("batch_size", 4)
        seq = self.cfg.get("tokens_per_sample", 12)
        self.datasets[split] = _SyntheticDataset(
            lambda: self.dummy_batch(bsz, seq), self.cfg.get("dataset_size", 8)
        )
