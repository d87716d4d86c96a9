"""Unit-BLEU utilities: parse generate-{split}.txt (H-/T-/D- lines) into
hyp.unit / ref.unit files and score with sacrebleu.

Capability parity with research/utils/unit_bleu.py, repr_bleu.py, and
extract_hyp_from_generate.py.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Tuple

from diffnorm_tpu.eval.bleu import corpus_bleu


def parse_generate_output(path: str) -> Tuple[Dict[int, str], Dict[int, str]]:
    """-> ({id: hyp_units}, {id: ref_units})"""
    hyps, refs = {}, {}
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith("H-"):
                parts = line.split("\t")
                sid = int(parts[0][2:])
                hyps[sid] = parts[2] if len(parts) > 2 else ""
            elif line.startswith("T-"):
                sid, text = line.split("\t", 1)
                refs[int(sid[2:])] = text
    return hyps, refs


def extract_unit_files(generate_path: str, out_dir: str) -> Tuple[str, str]:
    """Write hyp.unit / ref.unit sorted by sentence id."""
    hyps, refs = parse_generate_output(generate_path)
    os.makedirs(out_dir, exist_ok=True)
    hyp_path = os.path.join(out_dir, "hyp.unit")
    ref_path = os.path.join(out_dir, "ref.unit")
    ids = sorted(set(hyps) & set(refs))
    with open(hyp_path, "w") as hf, open(ref_path, "w") as rf:
        for i in ids:
            hf.write(f"{i}\t{hyps[i]}\n")
            rf.write(f"{i}\t{refs[i]}\n")
    return hyp_path, ref_path


def unit_bleu(generate_path: str) -> float:
    hyps, refs = parse_generate_output(generate_path)
    ids = sorted(set(hyps) & set(refs))
    return corpus_bleu([refs[i] for i in ids], [hyps[i] for i in ids])


def main():
    import sys

    path = sys.argv[1]
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.dirname(path)
    extract_unit_files(path, out_dir)
    print(f"unit BLEU: {unit_bleu(path):.2f}")


if __name__ == "__main__":
    main()
