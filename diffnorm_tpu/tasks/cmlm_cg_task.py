"""Text CMLM-CG task (reference "cmlm_cg", fairseq/tasks/cmlm_cg.py):
classifier-free-guided CMLM applied to text machine translation. Reuses the
NAR task's mask-injection policies over bitext pairs."""

from __future__ import annotations

import os
from typing import Dict, List

import jax
import numpy as np

from diffnorm_tpu.config import Config
from diffnorm_tpu.data.dictionary import Dictionary
from diffnorm_tpu.registry import register_task
from diffnorm_tpu.tasks.nar_s2ut_task import NARS2UTTask, random_mask, side_mask

PAD = 1


class BitextDataset:
    """Parallel text dataset from `{split}.{src}`/`{split}.{tgt}` line files
    (simplified fairseq translation data path; no binarization required)."""

    def __init__(self, src_seqs, tgt_seqs, seed: int = 1, is_train: bool = True,
                 sizes=None):
        self.src_seqs = src_seqs
        self.tgt_seqs = tgt_seqs
        self.shuffle = is_train
        self.seed = seed
        self._sizes = (np.asarray(sizes, np.int64) if sizes is not None
                       else np.asarray([len(s) for s in src_seqs], np.int64))

    def __len__(self):
        return len(self.src_seqs)

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
        return {"index": i, "src": self.src_seqs[i], "tgt": self.tgt_seqs[i]}

    def collater(self, samples: List[Dict]) -> Dict:
        s_lens = np.asarray([len(s["src"]) for s in samples], np.int32)
        t_lens = np.asarray([len(s["tgt"]) for s in samples], np.int32)
        src = np.full((len(samples), int(s_lens.max())), PAD, np.int32)
        tgt = np.full((len(samples), int(t_lens.max())), PAD, np.int32)
        for i, s in enumerate(samples):
            src[i, : s_lens[i]] = s["src"]
            tgt[i, : t_lens[i]] = s["tgt"]
        return {
            "id": np.asarray([s["index"] for s in samples], np.int64),
            "src_tokens": src,
            "src_lengths": s_lens,
            "target": tgt,
            "target_lengths": t_lens,
            "ntokens": int(t_lens.sum()),
            "nsentences": len(samples),
        }

    @classmethod
    def from_files(cls, root, split, src_lang, tgt_lang, src_dict, tgt_dict,
                   is_train=True, seed=1):
        def read(path, d):
            seqs = []
            with open(path) as f:
                for line in f:
                    seqs.append(
                        d.encode_line(line.strip(), append_eos=True,
                                      add_if_not_exist=False).astype(np.int32)
                    )
            return seqs

        return cls(
            read(os.path.join(root, f"{split}.{src_lang}"), src_dict),
            read(os.path.join(root, f"{split}.{tgt_lang}"), tgt_dict),
            is_train=is_train, seed=seed,
        )

    @classmethod
    def from_binarized(cls, root, split, src_lang, tgt_lang,
                       is_train=True, seed=1):
        """Binarized pairs produced by cli.preprocess (fairseq-preprocess
        parity: `{split}.{src}-{tgt}.{lang}.bin/.idx` memmaps + eos already
        appended). Lazy zero-copy reads."""
        from diffnorm_tpu.data.indexed_dataset import IndexedDataset

        pair = f"{src_lang}-{tgt_lang}"
        src_ds = IndexedDataset(os.path.join(root, f"{split}.{pair}.{src_lang}"))
        tgt_ds = IndexedDataset(os.path.join(root, f"{split}.{pair}.{tgt_lang}"))
        assert len(src_ds) == len(tgt_ds)
        return cls(src_ds, tgt_ds, is_train=is_train, seed=seed,
                   sizes=src_ds.sizes)

    @staticmethod
    def binarized_prefix(root, split, src_lang, tgt_lang) -> str:
        return os.path.join(root, f"{split}.{src_lang}-{tgt_lang}.{src_lang}")


@register_task("cmlm_cg")
class CMLMCGTask(NARS2UTTask):
    def __init__(self, cfg: Config):
        super().__init__(cfg)
        # dictionaries must be identical across shards; read the first
        # (fairseq loads dicts from paths[0])
        root = (cfg.get("data") or "").split(":")[0]
        src_lang = cfg.get("source_lang", "src")
        tgt_lang = cfg.get("target_lang", "tgt")

        def _find(flag_path, lang):
            # explicit flag first, then the dict.{lang}.txt a preprocess
            # run leaves in the data dir (fairseq translation-task behavior)
            if flag_path:
                return flag_path
            p = os.path.join(root, f"dict.{lang}.txt") if root else ""
            return p if p and os.path.exists(p) else None

        src_dict_path = _find(cfg.get("src_dict"), src_lang)
        tgt_dict_path = _find(cfg.get("tgt_dict_path"), tgt_lang)
        self.src_dict = (
            Dictionary.load(src_dict_path) if src_dict_path
            else Dictionary.unit_dictionary(cfg.get("src_vocab_size", 1000) - 4)
        )
        if tgt_dict_path:
            self.tgt_dict = Dictionary.load(tgt_dict_path)

    def load_dataset(self, split: str, epoch: int = 1):
        root = self.data_path(epoch)
        src_lang = self.cfg.get("source_lang", "src")
        tgt_lang = self.cfg.get("target_lang", "tgt")
        is_train = split.startswith("train")
        if root and os.path.exists(
            BitextDataset.binarized_prefix(root, split, src_lang, tgt_lang)
            + ".idx"
        ):
            self.datasets[split] = BitextDataset.from_binarized(
                root, split, src_lang, tgt_lang, is_train=is_train)
        else:
            self.datasets[split] = BitextDataset.from_files(
                root, split, src_lang, tgt_lang,
                self.src_dict, self.tgt_dict, is_train=is_train,
            )

    def dummy_batch(self, batch_size: int = 2, seq_len: int = 16) -> Dict:
        rng = np.random.default_rng(0)
        src = rng.integers(4, len(self.src_dict),
                           size=(batch_size, seq_len)).astype(np.int32)
        tgt = rng.integers(4, len(self.tgt_dict),
                           size=(batch_size, seq_len)).astype(np.int32)
        tgt[:, -1] = 2
        batch = {
            "src_tokens": src,
            "src_lengths": np.full((batch_size,), seq_len, np.int32),
            "target": tgt,
        }
        return self.prepare_batch(batch, rng)


@register_task("dummy_cmlm_cg")
class DummyCMLMCGTask(CMLMCGTask):
    def load_dataset(self, split: str, epoch: int = 1):
        from diffnorm_tpu.tasks.dummy import _SyntheticDataset

        bsz = self.cfg.get("batch_size", 4)
        seq = self.cfg.get("tokens_per_sample", 16)
        self.datasets[split] = _SyntheticDataset(
            lambda: self.dummy_batch(bsz, seq), self.cfg.get("dataset_size", 8)
        )
