"""Text-to-speech task (reference: fairseq/tasks/text_to_speech.py).

Drives the AR tts_transformer (criterion tacotron2_loss) and FastSpeech2
(criterion fastspeech2_loss) through the standard train/validate CLIs.

Data: an S2T-style TSV manifest `{split}.tsv` with header columns
  id, audio, n_frames, tgt_text[, duration, pitch, energy]
where `audio` points at a per-utterance mel/feature dump (`.npy`, [T, D] —
the same format the prepare CLI emits), `tgt_text` is the INPUT text (the
reference keeps S2T column names for TTS, where text is the source), and
the optional `duration` column holds per-token integer alignments for
FastSpeech2 ("12 7 3 ..."); `pitch`/`energy` point at per-token `.npy`
files. The text dictionary loads `{data}/dict.txt` when present, otherwise
it is built from the train split's text.
"""

from __future__ import annotations

import os
from typing import Dict, List

import jax
import numpy as np

from diffnorm_tpu.config import Config
from diffnorm_tpu.data.dictionary import Dictionary
from diffnorm_tpu.data.manifest import read_translation_manifest
from diffnorm_tpu.registry import register_task
from diffnorm_tpu.tasks.base import Task

PAD = 1


class TextToSpeechDataset:
    """text tokens -> mel frames (+ optional FastSpeech2 variances)."""

    def __init__(self, rows: List[Dict], src_dict: Dictionary,
                 is_train: bool = True, seed: int = 1):
        self.rows = rows
        self.src_dict = src_dict
        self.shuffle = is_train
        self.seed = seed
        self._sizes = np.asarray(
            [int(r.get("n_frames", 0) or 0) for r in rows], np.int64)

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

    def __getitem__(self, i):
        r = self.rows[i]
        feat = np.load(r["audio"]).astype(np.float32)
        tokens = self.src_dict.encode_line(
            r["tgt_text"], append_eos=True, add_if_not_exist=False
        ).astype(np.int32)
        item = {"index": i, "tokens": tokens, "feat": feat}
        if r.get("duration"):
            item["duration"] = np.asarray(
                [int(x) for x in r["duration"].split()], np.int32)
        for key in ("pitch", "energy"):
            if r.get(key):
                item[key] = np.load(r[key]).astype(np.float32)
        return item

    def collater(self, samples: List[Dict]) -> Dict:
        s_lens = np.asarray([len(s["tokens"]) for s in samples], np.int32)
        t_lens = np.asarray([s["feat"].shape[0] for s in samples], np.int32)
        smax, tmax = int(s_lens.max()), int(t_lens.max())
        d = samples[0]["feat"].shape[1]
        src = np.full((len(samples), smax), PAD, np.int32)
        feat = np.zeros((len(samples), tmax, d), np.float32)
        for i, s in enumerate(samples):
            src[i, : s_lens[i]] = s["tokens"]
            feat[i, : t_lens[i]] = s["feat"]
        batch = {
            "id": np.asarray([s["index"] for s in samples], np.int64),
            "src_tokens": src,
            "src_lengths": s_lens,
            "feat_tgt": feat,
            "tgt_lengths": t_lens,
            "ntokens": int(t_lens.sum()),
            "nsentences": len(samples),
        }
        # teacher-forced AR inputs: zero frame, then shifted target
        prev = np.zeros_like(feat)
        prev[:, 1:] = feat[:, :-1]
        batch["prev_feats"] = prev
        batch["tgt_mask"] = np.arange(tmax)[None, :] < t_lens[:, None]
        if "duration" in samples[0]:
            dur = np.zeros((len(samples), smax), np.int32)
            for i, s in enumerate(samples):
                dur[i, : len(s["duration"])] = s["duration"][:smax]
            batch["durations"] = dur
        for key, out in (("pitch", "pitches"), ("energy", "energies")):
            if key in samples[0]:
                arr = np.zeros((len(samples), smax), np.float32)
                for i, s in enumerate(samples):
                    n = min(len(s[key]), smax)
                    arr[i, :n] = s[key][:n]
                batch[out] = arr
        return batch


@register_task("text_to_speech")
class TextToSpeechTask(Task):
    def __init__(self, cfg: Config):
        super().__init__(cfg)
        self.src_dict = self._build_dict()
        self.tgt_dict = self.src_dict  # generation reports text ids back

    @property
    def source_dictionary(self):
        return self.src_dict

    def _build_dict(self) -> Dictionary:
        root = self.cfg.get("data", "")
        dict_path = os.path.join(root, "dict.txt") if root else ""
        if dict_path and os.path.exists(dict_path):
            return Dictionary.load(dict_path)
        d = Dictionary()
        train_tsv = os.path.join(root, "train.tsv") if root else ""
        if train_tsv and os.path.exists(train_tsv):
            for r in read_translation_manifest(train_tsv):
                for tok in r.get("tgt_text", "").split():
                    d.add_symbol(tok)
        else:  # synthetic/dummy configs size the embedding explicitly
            for i in range(self.cfg.get("vocab_size", 100) - 4):
                d.add_symbol(str(i))
        return d

    def load_dataset(self, split: str, epoch: int = 1):
        rows = read_translation_manifest(
            os.path.join(self.data_path(epoch), f"{split}.tsv"))
        self.datasets[split] = TextToSpeechDataset(
            rows, self.src_dict, is_train=split.startswith("train"),
            seed=self.cfg.get("seed", 1),
        )

    def _is_fastspeech(self) -> bool:
        return "fastspeech" in str(self.cfg.get("arch", ""))

    def init_variables(self, model, rng, batch):
        r_p, r_d = jax.random.split(rng)
        rngs = {"params": r_p, "dropout": r_d}
        if self._is_fastspeech():
            return model.module.init(
                rngs, jax.numpy.asarray(batch["src_tokens"]),
                durations=jax.numpy.asarray(batch["durations"]),
                pitches=jax.numpy.asarray(batch["pitches"]),
                energies=jax.numpy.asarray(batch["energies"]),
                deterministic=True,
            )
        return model.module.init(
            rngs, jax.numpy.asarray(batch["src_tokens"]),
            jax.numpy.asarray(batch["src_lengths"]),
            jax.numpy.asarray(batch["prev_feats"]),
            jax.numpy.asarray(batch["tgt_mask"]),
            deterministic=True,
        )

    def dummy_batch(self, batch_size: int = 2, seq_len: int = 16) -> Dict:
        rng = np.random.default_rng(0)
        vocab = self.cfg.get("vocab_size", 100)
        d = self.cfg.get("output_frame_dim", 80)
        s = max(seq_len // 4, 2)
        t = seq_len
        src = rng.integers(4, vocab, size=(batch_size, s)).astype(np.int32)
        feat = rng.normal(size=(batch_size, t, d)).astype(np.float32)
        t_lens = np.full((batch_size,), t, np.int32)
        t_lens[1:] = max(t - 2, 1)
        prev = np.zeros_like(feat)
        prev[:, 1:] = feat[:, :-1]
        dur = np.full((batch_size, s), t // s, np.int32)
        dur[:, -1] += t - (t // s) * s
        return {
            "src_tokens": src,
            "src_lengths": np.full((batch_size,), s, np.int32),
            "feat_tgt": feat, "tgt_lengths": t_lens,
            "prev_feats": prev,
            "tgt_mask": np.arange(t)[None, :] < t_lens[:, None],
            "durations": dur,
            "pitches": rng.normal(size=(batch_size, s)).astype(np.float32),
            "energies": rng.normal(size=(batch_size, s)).astype(np.float32),
            "ntokens": int(t_lens.sum()), "nsentences": batch_size,
        }


@register_task("dummy_tts")
class DummyTTSTask(TextToSpeechTask):
    def _build_dict(self) -> Dictionary:
        d = Dictionary()
        for i in range(self.cfg.get("vocab_size", 100) - 4):
            d.add_symbol(str(i))
        return d

    def load_dataset(self, split: str, epoch: int = 1):
        from diffnorm_tpu.tasks.dummy import _SyntheticDataset

        bsz = self.cfg.get("batch_size", 4)
        seq = self.cfg.get("tokens_per_sample", 16)
        self.datasets[split] = _SyntheticDataset(
            lambda: self.dummy_batch(bsz, seq), self.cfg.get("dataset_size", 8)
        )
