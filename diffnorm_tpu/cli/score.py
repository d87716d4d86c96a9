"""Scoring CLI (reference: fairseq_cli/score.py + fairseq.libbleu): corpus
BLEU between a hypothesis file and a reference file (one sentence per line,
tab-prefixed ids tolerated). `--sys -` reads hypotheses from stdin;
`--sentence-bleu` scores each pair on its own; `--order`/`--ignore-case`
mirror the reference flags."""

from __future__ import annotations

import argparse
import sys


def _read(path: str, lower: bool = False):
    out = []
    f = sys.stdin if path == "-" else open(path)
    try:
        for line in f:
            line = line.rstrip("\n")
            if "\t" in line:
                line = line.split("\t", 1)[1]
            out.append(line.lower() if lower else line)
    finally:
        if f is not sys.stdin:
            f.close()
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sys", "-s", default="-",
                   help="system output file ('-' = stdin)")
    p.add_argument("--ref", "-r", required=True, help="reference file")
    p.add_argument("--order", "-o", type=int, default=4,
                   help="consider ngrams up to this order")
    p.add_argument("--ignore-case", action="store_true",
                   help="case-insensitive scoring")
    p.add_argument("--sacrebleu", action="store_true")
    p.add_argument("--sentence-bleu", action="store_true",
                   help="report sentence-level BLEUs (one line per pair)")
    args = p.parse_args(argv)

    hyps = _read(args.sys, args.ignore_case)
    refs = _read(args.ref, args.ignore_case)
    assert len(hyps) == len(refs), f"{len(hyps)} hyps vs {len(refs)} refs"
    if args.sacrebleu:
        import sacrebleu

        print(sacrebleu.corpus_bleu(hyps, [refs]))
        return 0

    from diffnorm_tpu.eval.bleu import BleuAccumulator

    if args.sentence_bleu:
        for i, (r, h) in enumerate(zip(refs, hyps)):
            acc = BleuAccumulator()
            acc.add(r.split(), h.split())
            print(i, acc.result_string(args.order))
        return 0
    acc = BleuAccumulator()
    for r, h in zip(refs, hyps):
        acc.add(r.split(), h.split())
    print(acc.result_string(args.order))
    return 0


if __name__ == "__main__":
    sys.exit(main())
