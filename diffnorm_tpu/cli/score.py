"""Scoring CLI (reference: fairseq_cli/score.py + fairseq.libbleu): corpus
BLEU between a hypothesis file and a reference file (one sentence per line,
tab-prefixed ids tolerated)."""

from __future__ import annotations

import argparse
import sys


def _read(path: str):
    out = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if "\t" in line:
                line = line.split("\t", 1)[1]
            out.append(line)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sys", "-s", required=True, help="system output file")
    p.add_argument("--ref", "-r", required=True, help="reference file")
    p.add_argument("--sacrebleu", action="store_true")
    args = p.parse_args(argv)

    hyps, refs = _read(args.sys), _read(args.ref)
    assert len(hyps) == len(refs), f"{len(hyps)} hyps vs {len(refs)} refs"
    if args.sacrebleu:
        import sacrebleu

        print(sacrebleu.corpus_bleu(hyps, [refs]))
    else:
        from diffnorm_tpu.eval.bleu import BleuAccumulator

        acc = BleuAccumulator()
        for r, h in zip(refs, hyps):
            acc.add(r.split(), h.split())
        print(acc.result_string())
    return 0


if __name__ == "__main__":
    sys.exit(main())
