"""Speech-to-text task (ASR / speech translation).

Capability parity with fairseq/tasks/speech_to_text.py ("speech_to_text"):
target dictionary loaded from the data config's `vocab_filename` (default
dict.txt under the manifest root), S2T TSV manifests, teacher-forced AR
training with eos-shifted prev_output_tokens, beam generation through the
AR path of cli/generate.py. Pairs with --arch s2t_transformer* /
s2t_conformer and --criterion label_smoothed_cross_entropy.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import numpy as np

from diffnorm_tpu.config import Config
from diffnorm_tpu.data.dictionary import Dictionary
from diffnorm_tpu.registry import register_task
from diffnorm_tpu.tasks.ar_s2ut_task import shift_right
from diffnorm_tpu.tasks.base import Task

PAD, EOS = 1, 2


@register_task("speech_to_text")
class S2TTask(Task):
    # cli/generate.py dispatches AR beam decoding on this marker
    ar_generation = True

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        self.tgt_dict = self._load_dict(cfg)

    def _load_dict(self, cfg: Config) -> Dictionary:
        root = self.data_path(1) if cfg.get("data") else None
        if root:
            from diffnorm_tpu.data.s2t_dataset import load_s2t_data_cfg

            data_cfg = load_s2t_data_cfg(
                root, cfg.get("config_yaml", "config.yaml"))
            vocab = data_cfg.get("vocab_filename", "dict.txt")
            path = vocab if os.path.isabs(vocab) else os.path.join(root, vocab)
            if os.path.exists(path):
                return Dictionary.load(path)
        # synthetic/dummy runs: a flat unit-style vocab
        return Dictionary.unit_dictionary(cfg.get("target_code_size", 100))

    def load_dataset(self, split: str, epoch: int = 1):
        from diffnorm_tpu.data.s2t_dataset import SpeechToTextDataset

        self.datasets[split] = SpeechToTextDataset.from_tsv(
            root=self.data_path(epoch),
            split=split,
            tgt_dict=self.tgt_dict,
            config_yaml=self.cfg.get("config_yaml", "config.yaml"),
            is_train=split.startswith("train"),
        )

    def prepare_batch(self, batch: Dict[str, np.ndarray],
                      rng: np.random.Generator):
        if "prev_output_tokens" not in batch:
            batch["prev_output_tokens"] = shift_right(batch["target"])
        return batch

    def init_variables(self, model, rng, batch):
        prev = batch.get("prev_output_tokens")
        if prev is None:
            prev = shift_right(batch["target"])
        r_p, r_d = jax.random.split(rng)
        return model.init(
            {"params": r_p, "dropout": r_d},
            batch["src_tokens"], batch["src_lengths"],
            prev, deterministic=True,
        )

    def dummy_batch(self, batch_size: int = 2, seq_len: int = 48) -> Dict:
        rng = np.random.default_rng(0)
        feat_dim = self.cfg.get("input_feat_per_channel", 80)
        tgt_len = max(seq_len // 8, 4)
        src = rng.normal(size=(batch_size, seq_len, feat_dim)).astype(
            np.float32)
        tgt = rng.integers(4, len(self.tgt_dict),
                           size=(batch_size, tgt_len)).astype(np.int32)
        tgt[:, -1] = EOS
        batch = {
            "src_tokens": src,
            "src_lengths": np.full((batch_size,), seq_len, np.int32),
            "target": tgt,
            "target_lengths": np.full((batch_size,), tgt_len, np.int32),
            "ntokens": int(batch_size * tgt_len),
            "nsentences": batch_size,
        }
        return self.prepare_batch(batch, rng)


@register_task("dummy_s2t")
class DummyS2TTask(S2TTask):
    def load_dataset(self, split: str, epoch: int = 1):
        from diffnorm_tpu.tasks.dummy import _SyntheticDataset

        bsz = self.cfg.get("batch_size", 4)
        seq = self.cfg.get("tokens_per_sample", 48)
        self.datasets[split] = _SyntheticDataset(
            lambda: self.dummy_batch(bsz, seq), self.cfg.get("dataset_size", 8)
        )


@register_task("audio_finetuning")
class AudioFinetuningTask(S2TTask):
    """CTC ASR fine-tune (reference fairseq/tasks/audio_finetuning.py):
    raw-waveform inputs (data config `use_audio_input: true`), letter/char
    targets from the vocab file, `ctc` criterion over hubert_ctc frame
    logits. cli/generate.py dispatches greedy best-path CTC decoding on
    the ctc_generation marker."""

    ar_generation = False
    ctc_generation = True

    def prepare_batch(self, batch, rng):
        # SpecAugment-style fine-tune masking (reference hubert_asr /
        # wav2vec2 apply_mask :414-485): time-span mask over conv frames +
        # channel mask over embedding dims, drawn host-side; the model
        # applies them only at train time (deterministic=False)
        if not self.cfg.get("apply_mask"):
            return batch
        from diffnorm_tpu.models.hubert import _parse_conv_spec
        from diffnorm_tpu.utils.masking import compute_mask_indices

        conv = _parse_conv_spec(self.cfg.get("conv_feature_layers"))
        from diffnorm_tpu.data.hubert_dataset import _host_frames_for_samples

        bsz = batch["src_tokens"].shape[0]
        n_frames = _host_frames_for_samples(
            batch["src_tokens"].shape[1], conv)
        valid = np.asarray([
            _host_frames_for_samples(int(n), conv)
            for n in batch["src_lengths"]])
        padding = np.arange(n_frames)[None, :] >= valid[:, None]
        mask_prob = float(self.cfg.get("mask_prob", 0.65))
        if mask_prob > 0:
            batch["mask_indices"] = compute_mask_indices(
                (bsz, n_frames), padding, mask_prob=mask_prob,
                mask_length=int(self.cfg.get("mask_length", 10)),
                mask_type=self.cfg.get("mask_selection", "static"),
                mask_other=self.cfg.get("mask_other", 0.0),
                min_masks=2,
                no_overlap=bool(self.cfg.get("no_mask_overlap", False)),
                min_space=self.cfg.get("mask_min_space", 1),
                rng=rng,
            ) & ~padding
        ch_prob = float(self.cfg.get("mask_channel_prob", 0.0))
        if ch_prob > 0:
            dim = int(self.cfg.get("encoder_embed_dim", 768))
            batch["channel_mask"] = compute_mask_indices(
                (bsz, dim), None, mask_prob=ch_prob,
                mask_length=int(self.cfg.get("mask_channel_length", 10)),
                mask_type=self.cfg.get("mask_channel_selection", "static"),
                mask_other=self.cfg.get("mask_channel_other", 0.0),
                no_overlap=bool(
                    self.cfg.get("no_mask_channel_overlap", False)),
                min_space=self.cfg.get("mask_channel_min_space", 1),
                rng=rng,
            )
        return batch

    def init_variables(self, model, rng, batch):
        r_p, r_d = jax.random.split(rng)
        variables = model.init(
            {"params": r_p, "dropout": r_d},
            batch["src_tokens"], batch["src_lengths"],
            deterministic=True,
        )
        w2v = self.cfg.get("w2v_path")
        if w2v:
            # fairseq --w2v-path: warm-start the backbone (and mask_emb)
            # from a pretraining checkpoint (hubert_asr.py:334-368) — ours
            # (orbax dir from hubert_pretraining / audio_pretraining) or a
            # torch .pt. The train CLI clears w2v_path when it is about to
            # resume from its own checkpoint (the restore would overwrite
            # the graft, and the pretraining file may be long gone).
            from diffnorm_tpu.utils.convert_weights import (
                graft_encoder_params,
                load_pretrained_encoder,
            )

            enc, mask_emb = load_pretrained_encoder(
                str(w2v), layers=self.cfg.get("encoder_layers", 12))
            variables = graft_encoder_params(variables, enc,
                                             mask_emb=mask_emb)
        return variables

    def dummy_batch(self, batch_size: int = 2, seq_len: int = 2000) -> Dict:
        rng = np.random.default_rng(0)
        tgt_len = 4
        src = rng.normal(size=(batch_size, seq_len, 1)).astype(np.float32)
        tgt = rng.integers(4, len(self.tgt_dict),
                           size=(batch_size, tgt_len)).astype(np.int32)
        return {
            "src_tokens": src,
            "src_lengths": np.full((batch_size,), seq_len, np.int32),
            "target": tgt,
            "target_lengths": np.full((batch_size,), tgt_len, np.int32),
            "ntokens": int(batch_size * tgt_len),
            "nsentences": batch_size,
        }


@register_task("dummy_ctc")
class DummyCTCTask(AudioFinetuningTask):
    def load_dataset(self, split: str, epoch: int = 1):
        from diffnorm_tpu.tasks.dummy import _SyntheticDataset

        bsz = self.cfg.get("batch_size", 2)
        seq = self.cfg.get("tokens_per_sample", 2000)
        self.datasets[split] = _SyntheticDataset(
            lambda: self.dummy_batch(bsz, seq), self.cfg.get("dataset_size", 4)
        )
