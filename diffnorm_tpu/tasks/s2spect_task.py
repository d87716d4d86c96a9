"""Speech-to-spectrogram S2ST task (the reference speech_to_speech task
WITHOUT --target-is-code, fairseq/tasks/speech_to_speech.py:140-447 +
SpeechToSpeechDataset target_is_code=False): fbank source, mel-spectrogram
target from the target-side audio, teacher-forced AR training with
zero-frame-fronted prev_feats, Tacotron2-style loss, AR spectrogram
generation (+ optional vocoder) through the generate CLI's TTS branch."""

from __future__ import annotations

import os
from typing import Dict, List

import jax
import numpy as np

from diffnorm_tpu.config import Config
from diffnorm_tpu.registry import register_task
from diffnorm_tpu.tasks.base import Task
from diffnorm_tpu.tasks.multitask_mixin import MultitaskTaskMixin

PAD = 1


class SpeechToSpectrogramDataset:
    """S2S translation manifest rows where BOTH sides are audio/features:
    `tgt_audio` holds a path (npy features or wav -> fbank)."""

    def __init__(self, rows: List[Dict], root: str, data_cfg: Dict,
                 is_train: bool = True, seed: int = 1):
        self.rows = rows
        self.root = root
        self.data_cfg = data_cfg
        self.shuffle = is_train
        self.seed = seed
        self._sizes = np.asarray(
            [int(r.get("src_n_frames", 0) or 0) for r in rows], np.int64)
        # --multitask-config-yaml aux text targets, keyed by task name
        # (reference SpeechToSpeechMultitaskDataset,
        # speech_to_speech_dataset.py:333-387)
        self.multitask_data: Dict[str, Dict] = {}

    def add_multitask(self, name: str, text_data, decoder_type: str):
        """Attach one aux task's per-sample text targets (TextTargetData)."""
        self.multitask_data[name] = {
            "data": text_data,
            "with_prev": decoder_type != "ctc",
        }

    @classmethod
    def from_tsv(cls, root: str, split: str, config_yaml: str = "config.yaml",
                 is_train: bool = True, seed: int = 1):
        from diffnorm_tpu.data.manifest import read_translation_manifest
        from diffnorm_tpu.data.s2t_dataset import load_s2t_data_cfg

        rows = read_translation_manifest(os.path.join(root, f"{split}.tsv"))
        return cls(rows, root, load_s2t_data_cfg(root, config_yaml),
                   is_train=is_train, seed=seed)

    def __len__(self):
        return len(self.rows)

    def num_tokens(self, i):
        return int(self._sizes[i])

    @property
    def sizes(self):
        return self._sizes

    def ordered_indices(self):
        if self.shuffle:
            order = np.random.default_rng(self.seed).permutation(len(self))
        else:
            order = np.arange(len(self))
        return np.lexsort((order, -self._sizes))

    def _load(self, path: str):
        from diffnorm_tpu.data.audio import get_features_or_waveform

        p = path if os.path.isabs(path) else os.path.join(
            self.data_cfg.get("audio_root", self.root), path)
        return np.asarray(get_features_or_waveform(p), np.float32)

    def __getitem__(self, i):
        r = self.rows[i]
        sample = {
            "index": i,
            "source": self._load(r["src_audio"]),
            "feat": self._load(r["tgt_audio"]),
        }
        if self.multitask_data:
            sample["multitask"] = {}
            for name, mt in self.multitask_data.items():
                enc = mt["data"].get(r["id"])
                if enc is None:  # reference warns and uses an empty target
                    enc = np.zeros((0,), np.int32)
                sample["multitask"][name] = enc
        return sample

    def collater(self, samples: List[Dict]) -> Dict:
        if not samples:
            return {}
        samples = sorted(samples, key=lambda s: s["source"].shape[0],
                         reverse=True)
        s_lens = np.asarray([s["source"].shape[0] for s in samples], np.int32)
        t_lens = np.asarray([s["feat"].shape[0] for s in samples], np.int32)
        smax, tmax = int(s_lens.max()), int(t_lens.max())
        src = np.zeros((len(samples), smax, samples[0]["source"].shape[1]),
                       np.float32)
        feat = np.zeros((len(samples), tmax, samples[0]["feat"].shape[1]),
                        np.float32)
        for i, s in enumerate(samples):
            src[i, : s_lens[i]] = s["source"]
            feat[i, : t_lens[i]] = s["feat"]
        prev = np.zeros_like(feat)
        prev[:, 1:] = feat[:, :-1]
        batch = {
            "id": np.asarray([s["index"] for s in samples], np.int64),
            "src_tokens": src,
            "src_lengths": s_lens,
            "feat_tgt": feat,
            "tgt_lengths": t_lens,
            "prev_feats": prev,
            "tgt_mask": np.arange(tmax)[None, :] < t_lens[:, None],
            "ntokens": int(t_lens.sum()),
            "nsentences": len(samples),
        }
        if self.multitask_data:
            from diffnorm_tpu.data.multitask import collate_text_targets

            batch["multitask"] = {}
            for name, mt in self.multitask_data.items():
                targets = [s["multitask"][name] for s in samples]
                pad_to = max(1, max(len(t) for t in targets))
                batch["multitask"][name] = collate_text_targets(
                    targets, with_prev=mt["with_prev"], pad_to=pad_to
                )
        return batch


@register_task("speech_to_speech_spect")
class S2SpectTask(MultitaskTaskMixin, Task):
    # cli/generate.py dispatches the TTS/spectrogram synthesis branch
    tts_generation = True

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        self._init_multitask(cfg)

    def load_dataset(self, split: str, epoch: int = 1):
        ds = SpeechToSpectrogramDataset.from_tsv(
            root=self.data_path(epoch), split=split,
            config_yaml=self.cfg.get("config_yaml", "config.yaml"),
            is_train=split.startswith("train"),
        )
        self.attach_multitask(ds, split)
        self.datasets[split] = ds

    def prepare_batch(self, batch: Dict[str, np.ndarray],
                      rng: np.random.Generator):
        self.inject_loss_weights(batch)
        return batch

    def init_variables(self, model, rng, batch):
        r_p, r_d = jax.random.split(rng)
        kwargs = {}
        if self.multitask_tasks and hasattr(model.module, "multitask"):
            kwargs = dict(tgt_tokens=batch["feat_tgt"],
                          multitask_prev=self.multitask_prev(batch))
        if getattr(model.module, "mt_task_name", "") and hasattr(
                model.module, "decode_mt_step"):
            # Translatotron2 two-pass: the forward needs first-pass prevs
            kwargs["prev_tokens_mt"] = self.first_pass_prev_tokens(batch)
            kwargs.setdefault("tgt_tokens", batch["feat_tgt"])
        return model.init(
            {"params": r_p, "dropout": r_d},
            jax.numpy.asarray(batch["src_tokens"]),
            jax.numpy.asarray(batch["src_lengths"]),
            jax.numpy.asarray(batch["prev_feats"]),
            jax.numpy.asarray(batch["tgt_mask"]),
            deterministic=True,
            **kwargs,
        )

    def dummy_batch(self, batch_size: int = 2, seq_len: int = 48) -> Dict:
        rng = np.random.default_rng(0)
        feat_dim = self.cfg.get("input_feat_per_channel", 80)
        out_dim = self.cfg.get("output_frame_dim", 80)
        t = max(seq_len // 4, 8)
        feat = rng.normal(size=(batch_size, t, out_dim)).astype(np.float32)
        prev = np.zeros_like(feat)
        prev[:, 1:] = feat[:, :-1]
        t_lens = np.full((batch_size,), t, np.int32)
        return {
            "src_tokens": rng.normal(
                size=(batch_size, seq_len, feat_dim)).astype(np.float32),
            "src_lengths": np.full((batch_size,), seq_len, np.int32),
            "feat_tgt": feat, "tgt_lengths": t_lens, "prev_feats": prev,
            "tgt_mask": np.arange(t)[None, :] < t_lens[:, None],
            "ntokens": int(t_lens.sum()), "nsentences": batch_size,
        }


@register_task("dummy_s2spect")
class DummyS2SpectTask(S2SpectTask):
    def load_dataset(self, split: str, epoch: int = 1):
        from diffnorm_tpu.tasks.dummy import _SyntheticDataset

        bsz = self.cfg.get("batch_size", 2)
        seq = self.cfg.get("tokens_per_sample", 48)
        self.datasets[split] = _SyntheticDataset(
            lambda: self.dummy_batch(bsz, seq), self.cfg.get("dataset_size", 4)
        )
