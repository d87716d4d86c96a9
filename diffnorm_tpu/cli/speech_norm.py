"""Speaker-normalization CLI (TranSpeech baseline data prep).

Capability parity with research/TranSpeech/hubertCTC/gen_SN.py: for each
split under --wav, (1) estimate every utterance's median f0 and average
the medians (< 250 Hz, as the reference filters), (2) pitch-shift each
utterance so its median lands on the split mean, (3) normalize each
utterance's mean |x| to the split mean energy, writing
`{out}/{split}/result/{name}.wav`.

This is the *baseline* normalization DiffNorm replaces with its diffusion
normalizer (cli/diff_norm_synthesis.py); it is provided for completeness.

  python -m diffnorm_tpu.cli.speech_norm --wav WAV_ROOT --out OUT_ROOT \
      [--splits train,dev,test] [--sr 16000] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--wav", required=True,
                   help="root dir with {split}/*.wav")
    p.add_argument("--out", required=True)
    p.add_argument("--splits", default="train,test,dev")
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--max-voiced-median", type=float, default=250.0,
                   help="medians above this are excluded from the split "
                        "mean (gen_SN.py:27-29)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from diffnorm_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from diffnorm_tpu.cli.generate_waveform import write_wav
    from diffnorm_tpu.data.audio import read_audio
    from diffnorm_tpu.ops.speech_norm import (
        mean_abs_energy,
        normalize_energy,
        pitch_median,
        shift_to_median,
    )

    for split in args.splits.split(","):
        paths = sorted(Path(args.wav, split).glob("*.wav"))
        if not paths:
            print(f"[{split}] no wavs under {Path(args.wav, split)}",
                  file=sys.stderr)
            continue
        wavs = {}
        medians = []
        for path in paths:
            wav, sr = read_audio(str(path))
            wavs[path.stem] = (wav, sr or args.sr)
            med = pitch_median(wav, sr or args.sr)
            if 0.0 < med < args.max_voiced_median:
                medians.append(med)
        target_median = float(np.mean(medians)) if medians else 0.0
        print(f"[{split}] {len(paths)} utts, mean voiced median "
              f"{target_median:.1f} Hz")

        shifted = {}
        energies = []
        for name, (wav, sr) in wavs.items():
            out = shift_to_median(wav, sr, target_median)
            shifted[name] = (out, sr)
            energies.append(mean_abs_energy(out))
        target_energy = float(np.mean(energies)) if energies else 0.0

        result_dir = Path(args.out, split, "result")
        os.makedirs(result_dir, exist_ok=True)
        for name, (wav, sr) in shifted.items():
            write_wav(str(result_dir / f"{name}.wav"),
                      normalize_energy(wav, target_energy), sr)
        print(f"[{split}] wrote {len(shifted)} normalized wavs -> "
              f"{result_dir}")


if __name__ == "__main__":
    main()
