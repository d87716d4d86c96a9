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
OFFSET = 4  # specials


def stack_target(target: np.ndarray, vocab_size: int, k: int):
    """Pack a full-rate unit target for n_frames_per_step=k training
    (reference fairseq/tasks/speech_to_speech.py stacked-unit data path).

    target: [B, L] left-aligned rows of unit ids (>= 4), one EOS, then PAD.
    Returns (packed [B, T], sub [B, T, k]): k consecutive units collapse into
    one packed dictionary id (base-V above the specials) for the decoder
    input side; `sub` keeps the per-sub-frame ids for the [B, T, k, V] loss,
    with the EOS step broadcast to every sub-frame (matching
    stack_unit_generate's any-sub-frame-EOS stop) and PAD elsewhere. Rows
    whose unit count is not a multiple of k repeat the last unit to fill the
    final frame.
    """
    b, L = target.shape
    m = (target >= OFFSET).sum(axis=1)  # real units per row
    n_steps = -(-m // k)  # ceil
    t = int(n_steps.max()) + 1  # +1 for the EOS step
    w = (t - 1) * k

    rows = np.arange(b)[:, None]
    idx = np.minimum(np.arange(w)[None, :], np.maximum(m - 1, 0)[:, None])
    gathered = target[rows, idx]  # last unit repeats past m
    in_frame = np.arange(w)[None, :] < (n_steps * k)[:, None]
    sub_raw = np.where(in_frame, gathered - OFFSET, 0).reshape(b, t - 1, k)

    scale = np.array([vocab_size ** (k - 1 - i) for i in range(k)])
    frame_valid = np.arange(t - 1)[None, :] < n_steps[:, None]
    packed = np.full((b, t), PAD, dtype=target.dtype)
    packed[:, :-1] = np.where(
        frame_valid, (sub_raw * scale).sum(-1) + OFFSET, PAD
    )
    packed[np.arange(b), n_steps] = EOS

    sub = np.full((b, t, k), PAD, dtype=target.dtype)
    sub[:, :-1] = np.where(frame_valid[..., None], sub_raw + OFFSET, PAD)
    sub[np.arange(b), n_steps] = EOS
    return packed, sub


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
        k = int(self.cfg.get("n_frames_per_step", 1))
        if k > 1 and batch["target"].ndim == 2:
            packed, sub = stack_target(
                batch["target"], self.cfg.get("target_code_size", 1000), k
            )
            batch["target"] = sub  # [B, T, k] sub-frame loss targets
            batch["target_packed"] = packed
            batch["prev_output_tokens"] = shift_right(packed)
        elif batch["target"].ndim == 2:
            batch["prev_output_tokens"] = shift_right(batch["target"])
        self.inject_loss_weights(batch)
        return batch

    def init_variables(self, model, rng, batch):
        r_p, r_d = jax.random.split(rng)
        if "prev_output_tokens" not in batch and batch["target"].ndim == 2:
            # generation-time init: the CLI hands a raw collated batch
            # (prepare_batch only runs in the train loop)
            batch = {**batch,
                     "prev_output_tokens": shift_right(batch["target"])}
        kwargs = {}
        if self.multitask_tasks:
            # initialize the aux head params too (speech_to_unit criterion)
            kwargs = dict(
                tgt_tokens=batch["target"],
                multitask_prev=self.multitask_prev(batch),
            )
        if getattr(model.module, "mt_task_name", "") and hasattr(
                model.module, "decode_mt_step"):
            # UnitY two-pass: the forward needs the first-pass prev tokens
            kwargs["prev_tokens_mt"] = self.first_pass_prev_tokens(batch)
            kwargs.setdefault("tgt_tokens", batch["target"])
        if batch.get("tgt_speaker") is not None:
            # --target-speaker-embed: trace spk_emb_proj at init (the
            # criterion passes tgt_speaker on every train/valid step)
            kwargs["tgt_speaker"] = batch["tgt_speaker"]
        return model.init(
            {"params": r_p, "dropout": r_d},
            batch["src_tokens"],
            batch["src_lengths"],
            batch["prev_output_tokens"],
            deterministic=True,
            **kwargs,
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
