"""Wav-manifest builder (reference research/utils/get_manifest.py parity).

Indexes every `*.{ext}` under ROOT (recursively) into a wav2vec-style
manifest: first line is the root directory, then `relpath\\tn_frames` per
file — the format the vocoder-finetune datasets and ASR-BLEU tooling
consume.

  python -m diffnorm_tpu.cli.get_manifest ROOT --dest out/train.tsv --ext wav
"""

from __future__ import annotations

import argparse
import glob
import os


def wav_frames(path: str) -> int:
    try:
        import soundfile as sf

        return sf.info(path).frames
    except ImportError:
        import wave

        with wave.open(path, "rb") as w:
            return w.getnframes()


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("root", metavar="DIR")
    p.add_argument("--dest", default="train.tsv")
    p.add_argument("--ext", default="wav")
    p.add_argument("--path-must-contain", default=None)
    args = p.parse_args(argv)

    dest_dir = os.path.dirname(args.dest)
    if dest_dir and not os.path.exists(dest_dir):
        os.makedirs(dest_dir)
    root = os.path.realpath(args.root)
    n = 0
    with open(args.dest, "w") as f:
        print(root, file=f)
        for fname in sorted(
            glob.iglob(os.path.join(root, "**/*." + args.ext), recursive=True)
        ):
            path = os.path.realpath(fname)
            if args.path_must_contain and args.path_must_contain not in path:
                continue
            print(f"{os.path.relpath(path, root)}\t{wav_frames(path)}", file=f)
            n += 1
    print(f"wrote {n} entries -> {args.dest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
