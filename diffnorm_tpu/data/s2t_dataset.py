"""Speech-to-text dataset (ASR / speech translation).

Capability parity with fairseq/data/audio/speech_to_text_dataset.py: TSV
manifests with a header row and columns `id, audio, n_frames, tgt_text`
(optional `speaker`), a data config YAML naming the target vocab file
(`vocab_filename`, default dict.txt) and the feature transforms. The
audio/fbank/transform machinery is shared with the S2UT dataset; only the
target side differs (dictionary-encoded text instead of unit strings).
"""

from __future__ import annotations

import csv
import os
from typing import Dict, List

import numpy as np

from diffnorm_tpu.data.dictionary import Dictionary
from diffnorm_tpu.data.s2s_dataset import SpeechToUnitDataset

S2T_COLUMNS = ["id", "audio", "n_frames", "tgt_text"]


def read_s2t_manifest(path: str) -> List[Dict[str, str]]:
    rows = []
    with open(path) as f:
        reader = csv.DictReader(
            f, delimiter="\t", quoting=csv.QUOTE_NONE, doublequote=False,
            lineterminator="\n",
        )
        for row in reader:
            if row.get("id"):
                rows.append(row)
    return rows


def write_s2t_manifest(path: str, rows: List[Dict[str, str]]):
    with open(path, "w") as f:
        writer = csv.DictWriter(
            f, fieldnames=S2T_COLUMNS, delimiter="\t",
            quoting=csv.QUOTE_NONE, doublequote=False, lineterminator="\n",
        )
        writer.writeheader()
        for row in rows:
            writer.writerow({k: row[k] for k in S2T_COLUMNS})


def load_s2t_data_cfg(root: str, config_yaml: str = "config.yaml") -> Dict:
    cfg_path = os.path.join(root, config_yaml)
    if not os.path.exists(cfg_path):
        return {}
    import yaml

    with open(cfg_path) as f:
        return yaml.safe_load(f) or {}


class SpeechToTextDataset(SpeechToUnitDataset):
    """Same item/collater contract as the S2UT dataset ([B, T, 80] fbank
    `src_tokens`, padded id `target`); targets come from `tgt_text`."""

    @classmethod
    def from_tsv(
        cls,
        root: str,
        split: str,
        tgt_dict: Dictionary,
        config_yaml: str = "config.yaml",
        is_train: bool = True,
        seed: int = 1,
    ) -> "SpeechToTextDataset":
        rows = read_s2t_manifest(os.path.join(root, f"{split}.tsv"))
        data_cfg = load_s2t_data_cfg(root, config_yaml)
        audio_root = data_cfg.get("audio_root", root)
        ids, paths, n_frames, targets = [], [], [], []
        for row in rows:
            ids.append(row["id"])
            p = row["audio"]
            paths.append(p if os.path.isabs(p) else os.path.join(audio_root, p))
            n_frames.append(int(row["n_frames"]))
            enc = tgt_dict.encode_line(row["tgt_text"], append_eos=True)
            targets.append(enc.astype(np.int32))
        return cls(
            ids=ids,
            src_audio_paths=paths,
            src_n_frames=n_frames,
            tgt_units=targets,
            tgt_dict=tgt_dict,
            data_cfg=data_cfg,
            is_train=is_train,
            seed=seed,
        )
