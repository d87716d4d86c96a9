"""ASR-BLEU evaluation: transcribe generated waveforms with a CTC ASR model
and score against reference transcripts with sacrebleu.

Capability parity with examples/speech_to_speech/asr_bleu/
(utils.py:47-299 ASRGenerator + compute_asr_bleu_custom.py:129-186): per-
language HF wav2vec2/HuBERT-CTC checkpoints, greedy CTC decode, text
normalization (lowercase, strip punctuation), corpus BLEU — the north-star
metric of the whole pipeline (SURVEY.md section 3.5).

Requires `transformers` (baked into the image); runs the ASR model on CPU
via torch — evaluation-side tooling, not the TPU compute path.
"""

from __future__ import annotations

import logging
import os
import re
import string
from typing import Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# per-language default CTC checkpoints (reference asr_bleu/asr_model_cfgs.json)
DEFAULT_ASR_MODELS = {
    "en": "facebook/wav2vec2-large-960h-lv60-self",
    "es": "jonatasgrosman/wav2vec2-large-xlsr-53-spanish",
    "fr": "jonatasgrosman/wav2vec2-large-xlsr-53-french",
}


def normalize_text(text: str) -> str:
    """Lowercase + strip punctuation (reference utils.py text post-process)."""
    text = text.lower()
    text = re.sub(rf"[{re.escape(string.punctuation)}]", " ", text)
    return " ".join(text.split())


class ASRGenerator:
    def __init__(self, lang: str = "en", model_name: Optional[str] = None,
                 device: str = "cpu"):
        from transformers import AutoModelForCTC, AutoProcessor

        name = model_name or DEFAULT_ASR_MODELS[lang]
        self.processor = AutoProcessor.from_pretrained(name)
        self.model = AutoModelForCTC.from_pretrained(name).to(device).eval()
        self.device = device

    def transcribe(self, waveform: np.ndarray, sample_rate: int = 16000) -> str:
        import torch

        inputs = self.processor(
            waveform, sampling_rate=sample_rate, return_tensors="pt"
        )
        with torch.no_grad():
            logits = self.model(inputs.input_values.to(self.device)).logits
        ids = logits.argmax(dim=-1)
        text = self.processor.batch_decode(ids)[0]
        return normalize_text(text)

    def transcribe_file(self, path: str) -> str:
        from diffnorm_tpu.data.audio import read_audio

        wav, sr = read_audio(path)
        if len(wav) < 640:
            # degenerate synthesis (e.g. an empty decoded unit stream)
            # would underflow the wav2vec2 conv extractor's receptive
            # field; score as an empty transcript instead of crashing
            logger.warning("%s: %d samples < 40 ms; scoring empty",
                           path, len(wav))
            return ""
        return self.transcribe(wav, sr)


def run_asr_bleu(
    audio_dir: str,
    reference_path: str,
    lang: str = "en",
    audio_format: str = "{i}_pred.wav",
    model_name: Optional[str] = None,
) -> Tuple[float, List[str], List[str]]:
    """Transcribe `{i}_pred.wav` files against line-per-utterance reference
    transcripts; returns (bleu, transcripts, references)."""
    from diffnorm_tpu.eval.bleu import corpus_bleu

    with open(reference_path) as f:
        refs = [normalize_text(line.strip()) for line in f if line.strip()]
    asr = ASRGenerator(lang=lang, model_name=model_name)
    paths = [os.path.join(audio_dir, audio_format.format(i=i))
             for i in range(len(refs))]
    if paths and not os.path.exists(paths[0]):
        # cli.s2st names waveforms {utt_id}_pred.wav rather than by index;
        # fall back to the lexicographically-sorted listing (reference
        # transcripts must then be in sorted utt-id order)
        import glob

        listed = sorted(glob.glob(os.path.join(audio_dir, "*_pred.wav")))
        if len(listed) == len(refs):
            logger.info("index-named wavs absent; using %d sorted "
                        "*_pred.wav files", len(listed))
            paths = listed
    hyps = []
    for path in paths:
        if not os.path.exists(path):
            logger.warning("missing %s; scoring empty", path)
            hyps.append("")
            continue
        hyps.append(asr.transcribe_file(path))
    bleu = corpus_bleu(refs, hyps)
    logger.info("ASR-BLEU: %.2f over %d utterances", bleu, len(refs))
    return bleu, hyps, refs


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--audio-dir", required=True)
    p.add_argument("--reference-path", required=True)
    p.add_argument("--lang", default="en")
    p.add_argument("--asr-model", default=None)
    p.add_argument("--transcripts-path", default=None)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO, force=True)
    bleu, hyps, refs = run_asr_bleu(
        args.audio_dir, args.reference_path, args.lang, model_name=args.asr_model
    )
    if args.transcripts_path:
        with open(args.transcripts_path, "w") as f:
            for h in hyps:
                f.write(h + "\n")
    print(f"ASR-BLEU: {bleu:.2f}")


if __name__ == "__main__":
    main()
