"""Preprocess/binarize CLI (reference: fairseq_cli/preprocess.py): build
dictionaries from raw bitext and binarize into memory-mapped indexed
datasets.

  python -m diffnorm_tpu.cli.preprocess \
      --source-lang src --target-lang tgt \
      --trainpref data/train --validpref data/valid \
      --destdir data-bin --thresholdtgt 0 --thresholdsrc 0
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

from diffnorm_tpu.data.dictionary import Dictionary
from diffnorm_tpu.data.indexed_dataset import binarize_file

logger = logging.getLogger("diffnorm_tpu.preprocess")


def build_dictionary(paths, threshold: int = 0) -> Dictionary:
    d = Dictionary()
    counts = {}
    for path in paths:
        with open(path) as f:
            for line in f:
                for w in line.split():
                    counts[w] = counts.get(w, 0) + 1
    for w, c in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0])):
        if c >= threshold:
            d.add_symbol(w, n=c)
    return d


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, force=True)
    p = argparse.ArgumentParser()
    p.add_argument("--source-lang", "-s", required=True)
    p.add_argument("--target-lang", "-t", required=True)
    p.add_argument("--trainpref", required=True)
    p.add_argument("--validpref", default=None)
    p.add_argument("--testpref", default=None)
    p.add_argument("--destdir", required=True)
    p.add_argument("--thresholdsrc", type=int, default=0)
    p.add_argument("--thresholdtgt", type=int, default=0)
    p.add_argument("--srcdict", default=None)
    p.add_argument("--tgtdict", default=None)
    p.add_argument("--joined-dictionary", action="store_true")
    p.add_argument("--dataset-impl", default="mmap",
                   choices=["mmap", "native"],
                   help="binarized layout: mmap = fairseq-interchangeable "
                        "MMIDIDX (default), native = round-1 DNTPUIDX1")
    args = p.parse_args(argv)

    os.makedirs(args.destdir, exist_ok=True)
    src, tgt = args.source_lang, args.target_lang

    if args.srcdict:
        src_dict = Dictionary.load(args.srcdict)
    elif args.joined_dictionary:
        src_dict = build_dictionary(
            [f"{args.trainpref}.{src}", f"{args.trainpref}.{tgt}"],
            args.thresholdsrc,
        )
    else:
        src_dict = build_dictionary([f"{args.trainpref}.{src}"], args.thresholdsrc)
    if args.tgtdict:
        tgt_dict = Dictionary.load(args.tgtdict)
    elif args.joined_dictionary:
        tgt_dict = src_dict
    else:
        tgt_dict = build_dictionary([f"{args.trainpref}.{tgt}"], args.thresholdtgt)

    src_dict.save(os.path.join(args.destdir, f"dict.{src}.txt"))
    tgt_dict.save(os.path.join(args.destdir, f"dict.{tgt}.txt"))

    for split, pref in [("train", args.trainpref), ("valid", args.validpref),
                        ("test", args.testpref)]:
        if not pref:
            continue
        for lang, d in [(src, src_dict), (tgt, tgt_dict)]:
            n = binarize_file(
                f"{pref}.{lang}",
                os.path.join(args.destdir, f"{split}.{src}-{tgt}.{lang}"),
                d,
                impl=args.dataset_impl,
            )
            logger.info("binarized %s.%s: %d sequences", split, lang, n)
    return 0


if __name__ == "__main__":
    sys.exit(main())
