"""NAR S2UT task ("speech_to_speech_fasttranslate" in the reference,
fairseq/tasks/nat_s2s_task.py): CMLM mask injection per batch — uniform-count
random masking (:79-99) and the optional Gaussian "bowl" side-mask (:36-77) —
plus fbank source / unit target dataset loading."""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from diffnorm_tpu.config import Config
from diffnorm_tpu.data.dictionary import Dictionary
from diffnorm_tpu.registry import register_task
from diffnorm_tpu.tasks.base import Task
from diffnorm_tpu.tasks.multitask_mixin import MultitaskTaskMixin

PAD, BOS, EOS, UNK = 1, 0, 2, 3


def random_mask(target: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Uniform-count masking (nat_s2s_task.py:79-99): draw a per-sequence
    masked-token budget ~ U(0,1)*len + 1, mask the budget-lowest random
    scores."""
    masks = (target != PAD) & (target != BOS) & (target != EOS)
    score = rng.random(target.shape)
    score[~masks] = 2.0
    lengths = masks.sum(axis=1).astype(np.float64)
    budget = (lengths * rng.random(lengths.shape) + 1).astype(np.int64)
    rank = np.argsort(score, axis=1)
    cutoff = np.zeros_like(masks)
    rows = np.arange(target.shape[0])[:, None]
    take = np.arange(target.shape[1])[None, :] < budget[:, None]
    cutoff[rows, rank] = take
    out = target.copy()
    out[cutoff] = UNK
    return out


def side_mask(target: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Gaussian "bowl" masking (nat_s2s_task.py:36-77): mask probability is a
    randomly-shifted/scaled Gaussian over positions, peaked mid-sequence.

    Exact reference draw semantics: the shift upper bound is the INTEGER
    division ``target_lens // 6`` (torch long tensor, nat_s2s_task.py:41) and
    the peak normalization divides by the GLOBAL ``probs.max()`` over the
    whole batch, not per row (:55). Pinned against the verbatim reference in
    tests/test_reference_parity.py."""
    masks = (target != PAD) & (target != BOS) & (target != EOS)
    int_lengths = masks.sum(axis=1)
    lengths = int_lengths.astype(np.float64)
    bz, max_len = target.shape
    shift = rng.random(bz) * (int_lengths // 6).astype(np.float64)
    scale = rng.random(bz) * 6 + 2
    mean = lengths / 2 - shift
    std = np.maximum(lengths / scale, 1e-6)
    idx = np.arange(max_len)[None, :]
    probs = np.exp(-0.5 * ((idx - mean[:, None]) / std[:, None]) ** 2)
    probs = probs / np.maximum(probs.max(), 1e-9)
    probs = np.clip(probs * (rng.random((bz, 1)) + 0.5), 0, 1)
    drawn = rng.random(target.shape) < probs
    drawn &= masks
    out = target.copy()
    out[drawn] = UNK
    return out


@register_task("speech_to_speech_fasttranslate")
class NARS2UTTask(MultitaskTaskMixin, Task):
    def __init__(self, cfg: Config):
        super().__init__(cfg)
        self.tgt_dict = Dictionary.unit_dictionary(cfg.get("target_code_size", 1000))
        self.use_side = bool(cfg.get("use_side", False))
        # --multitask-config-yaml (reference speech_to_speech.py:229-245):
        # aux text-decoder tasks tapping the main model's encoder/decoder
        self._init_multitask(cfg)

    def load_dataset(self, split: str, epoch: int = 1):
        from diffnorm_tpu.data.s2s_dataset import SpeechToUnitDataset

        ds = SpeechToUnitDataset.from_tsv(
            root=self.data_path(epoch),
            split=split,
            tgt_dict=self.tgt_dict,
            # --dummy-config: the reference tasks' alias for loading the
            # data YAML from an arbitrary path (speech_decoder_task.py:100-123)
            config_yaml=self.cfg.get(
                "config_yaml", self.cfg.get("dummy_config", "config.yaml")),
            is_train=split.startswith("train"),
        )
        self.attach_multitask(ds, split)
        self.datasets[split] = ds

    def prepare_batch(self, batch: Dict[str, np.ndarray], rng: np.random.Generator):
        """Inject CMLM noise: prev_target = masked target (reference
        train_step :141-157 / valid_step). With n_frames_per_step>1 the
        canvas is the packed-id sequence and the loss target keeps the
        per-sub-frame view (see tasks/ar_s2ut_task.stack_target)."""
        k = int(self.cfg.get("n_frames_per_step", 1))
        target = batch["target"]
        if k > 1 and target.ndim == 2:
            from diffnorm_tpu.tasks.ar_s2ut_task import stack_target

            packed, sub = stack_target(
                target, self.cfg.get("target_code_size", 1000), k
            )
            batch["target"] = sub
            batch["target_packed"] = packed
            target = packed
        elif target.ndim == 3:
            target = batch["target_packed"]
        if self.use_side and rng.random() > 0.5:
            batch["prev_target"] = side_mask(target, rng)
        else:
            batch["prev_target"] = random_mask(target, rng)
        self.inject_loss_weights(batch)
        return batch

    def init_variables(self, model, rng, batch):
        r_p, r_d, r_cg = jax.random.split(rng, 3)
        kwargs = {}
        if batch.get("tgt_speaker") is not None:
            # --target-speaker-embed: the spk_emb_proj Dense must be traced
            # at init or the first train step (which does pass tgt_speaker
            # via the criterion) hits ScopeParamNotFoundError
            kwargs["tgt_speaker"] = batch["tgt_speaker"]
        return model.init(
            {"params": r_p, "dropout": r_d, "cg": r_cg},
            batch["src_tokens"],
            batch["src_lengths"],
            batch["prev_target"],
            tgt_tokens=batch["target"],
            deterministic=True,
            multitask_prev=self.multitask_prev(batch),
            **kwargs,
        )

    def dummy_batch(self, batch_size: int = 2, seq_len: int = 48) -> Dict:
        rng = np.random.default_rng(0)
        tgt_len = max(seq_len // 4, 4)
        src_lengths = np.full((batch_size,), seq_len, dtype=np.int32)
        src_lengths[-1] = max(seq_len // 2, 9)
        target = rng.integers(
            4, 4 + self.cfg.get("target_code_size", 1000),
            size=(batch_size, tgt_len),
        ).astype(np.int32)
        target[:, -1] = EOS
        # short row: keep a terminating EOS before the pad tail (an EOS-less
        # row teaches an AR model never to stop on that source)
        target[-1, tgt_len // 2:] = PAD
        target[-1, tgt_len // 2] = EOS
        batch = {
            "src_tokens": rng.normal(size=(batch_size, seq_len, 80)).astype(
                np.float32
            ),
            "src_lengths": src_lengths,
            "target": target,
        }
        return self.prepare_batch(batch, rng)
