"""TSV manifest readers (reference formats).

Two formats exist in the reference pipeline:

* feature manifests `{split}.manifest.tsv`: first line is the feature
  directory, then `name.feat.npy\tlength` rows
  (written by examples/textless_nlp/gslm/speech2unit/pretrained/utils.py:105-140)
* translation manifests `{split}.tsv`: header line then
  `id\tsrc_audio\tsrc_n_frames\ttgt_audio\ttgt_n_frames` rows where
  `tgt_audio` is a space-separated unit string for target-is-code datasets
  (reference repr_to_repr_unit_dataset.py:309-369, speech_to_speech_dataset.py)
"""

from __future__ import annotations

import csv
import os
from typing import Dict, List, Tuple


def read_feature_manifest(path: str) -> Dict[str, Tuple[str, int]]:
    """-> {utt_id: (feat_path, length)}"""
    out = {}
    with open(path) as f:
        feat_dir = f.readline().strip()
        for line in f:
            line = line.strip()
            if not line:
                continue
            name, length = line.split("\t")
            utt_id = name.split(".")[0]
            out[utt_id] = (os.path.join(feat_dir, name), int(length))
    return out


def write_feature_manifest(path: str, feat_dir: str, rows: List[Tuple[str, int]]):
    with open(path, "w") as f:
        f.write(feat_dir + "\n")
        for name, length in rows:
            f.write(f"{name}\t{length}\n")


TRANSLATION_COLUMNS = ["id", "src_audio", "src_n_frames", "tgt_audio", "tgt_n_frames"]


def read_translation_manifest(path: str) -> List[Dict[str, str]]:
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


def write_translation_manifest(path: str, rows: List[Dict[str, str]]):
    with open(path, "w") as f:
        f.write("\t".join(TRANSLATION_COLUMNS) + "\n")
        for row in rows:
            f.write("\t".join(str(row[c]) for c in TRANSLATION_COLUMNS) + "\n")
