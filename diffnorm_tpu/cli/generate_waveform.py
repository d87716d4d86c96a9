"""Unit-to-waveform synthesis CLI.

Capability parity with examples/speech_to_speech/generate_waveform_from_code.py:
reads an `id|u1 u2 ...` (or plain unit-line) file, optional --reduce dedup
and --dur-prediction, synthesizes through code-HiFi-GAN, writes
`{i}_pred.wav` @ 16 kHz.

  python -m diffnorm_tpu.cli.generate_waveform \
      --in-code-file hyp.unit --vocoder ckpt/hifigan \
      --vocoder-cfg ckpt/hifigan/config.json \
      --results-path wavs/ --dur-prediction
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import struct
import wave

import numpy as np

logger = logging.getLogger(__name__)


def write_wav(path: str, wav: np.ndarray, sample_rate: int = 16000):
    wav = np.clip(np.asarray(wav, np.float32), -1.0, 1.0)
    pcm = (wav * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())


def parse_code_line(line: str):
    line = line.strip()
    if "|" in line:
        _, units = line.split("|", 1)
    elif "\t" in line:
        _, units = line.split("\t", 1)
    else:
        units = line

    def to_code(x: str) -> int:
        try:
            return int(x)
        except ValueError:
            return -1  # non-numeric symbols (<unk> from an undertrained
            # model) become invalid codes; the vocoder wrapper strips
            # codes < 0 like the reference (vocoder.py:229-235)

    return np.asarray([to_code(x) for x in units.split()], np.int32)


def load_vocoder(ckpt_path: str, cfg_path: str):
    from diffnorm_tpu.models.hifigan import CodeHiFiGANVocoder

    with open(cfg_path) as f:
        cfg = json.load(f)
    variables = None
    if ckpt_path and os.path.exists(ckpt_path):
        if ckpt_path.endswith((".pt", ".ckpt", ".bin")):
            from diffnorm_tpu.utils.convert_weights import (
                convert_hifigan_checkpoint,
            )

            variables = convert_hifigan_checkpoint(ckpt_path, cfg)
        else:
            from diffnorm_tpu.train.checkpoint import load_checkpoint_params

            variables = load_checkpoint_params(ckpt_path)
            if isinstance(variables, dict) and "g_params" in variables:
                # a GAN fine-tune TrainState (cli.train_vocoder output):
                # the generator subtree IS the vocoder (the reference loads
                # the "generator" key of its hifigan dicts the same way,
                # fairseq/models/text_to_speech/vocoder.py:214-243)
                variables = {"params": variables["g_params"]}
            elif isinstance(variables, dict) and "params" not in variables:
                variables = {"params": variables}
    return CodeHiFiGANVocoder.from_config(cfg, variables=variables)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--in-code-file", required=True)
    p.add_argument("--vocoder", required=True)
    p.add_argument("--vocoder-cfg", required=True)
    p.add_argument("--results-path", required=True)
    p.add_argument("--dur-prediction", action="store_true")
    p.add_argument("--reduce", action="store_true")
    p.add_argument("--sample-rate", type=int, default=16000)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from diffnorm_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    vocoder = load_vocoder(args.vocoder, args.vocoder_cfg)
    os.makedirs(args.results_path, exist_ok=True)
    with open(args.in_code_file) as f:
        lines = [l for l in f if l.strip()]
    for i, line in enumerate(lines):
        units = parse_code_line(line)
        if (units >= 0).any():
            wav = vocoder(units, dur_prediction=args.dur_prediction,
                          reduce=args.reduce)
        else:  # nothing synthesizable on this line: emit 20 ms of silence
            wav = np.zeros(args.sample_rate // 50, np.float32)
        write_wav(os.path.join(args.results_path, f"{i}_pred.wav"), wav,
                  args.sample_rate)
    logger.info("wrote %d waveforms to %s", len(lines), args.results_path)


if __name__ == "__main__":
    main()
