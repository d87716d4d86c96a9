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


def read_references(
    reference_path: str, ids_path: Optional[str] = None,
) -> Tuple[List[str], Optional[List[str]]]:
    """-> (normalized transcripts, utt ids or None).

    Two reference formats:
    * id-keyed TSV ``utt_id\\ttranscript`` (every line tabbed, ids
      space-free) -> ids come from column 1;
    * plain line-per-utterance text -> ids come from `ids_path`
      (one utt id per line, same order) when given, else None.
    """
    with open(reference_path) as f:
        lines = [line.rstrip("\n") for line in f if line.strip()]
    ids: Optional[List[str]] = None
    if lines and all("\t" in line for line in lines):
        first = [line.split("\t", 1)[0] for line in lines]
        if all(tok and " " not in tok for tok in first):
            ids = first
            lines = [line.split("\t", 1)[1] for line in lines]
    refs = [normalize_text(line) for line in lines]
    if ids_path:
        if ids is not None:
            logger.info("references are id-keyed; ignoring --ids-file")
        else:
            with open(ids_path) as f:
                ids = [line.strip() for line in f if line.strip()]
            if len(ids) != len(refs):
                raise ValueError(
                    f"{ids_path}: {len(ids)} ids vs {len(refs)} reference "
                    f"transcripts in {reference_path}")
    return refs, ids


def run_asr_bleu(
    audio_dir: str,
    reference_path: str,
    lang: str = "en",
    audio_format: str = "{i}_pred.wav",
    model_name: Optional[str] = None,
    ids_path: Optional[str] = None,
) -> Tuple[float, List[str], List[str]]:
    """Transcribe generated waveforms against reference transcripts;
    returns (bleu, transcripts, references).

    Waveform<->transcript pairing is BY UTTERANCE ID whenever ids are
    available (id-keyed `id\\ttext` references, or `ids_path` giving the
    manifest-order ids of plain-text references): the wav for transcript
    `uid` is `audio_format.format(i=uid)` (cli.s2st writes
    `{utt_id}_pred.wav`). Plain positional references without ids are only
    accepted against index-named `{0..N-1}_pred.wav` files (the
    generate_waveform_from_code convention, where output order is input
    order). Anything else fails loudly — positional pairing against a
    sorted directory listing silently mis-scores real utt ids
    (lexicographic '10' < '2' vs manifest order)."""
    from diffnorm_tpu.eval.bleu import corpus_bleu

    refs, ref_ids = read_references(reference_path, ids_path)
    if ref_ids is not None:
        paths = [os.path.join(audio_dir, audio_format.format(i=uid))
                 for uid in ref_ids]
    else:
        paths = [os.path.join(audio_dir, audio_format.format(i=i))
                 for i in range(len(refs))]
    present = [os.path.exists(p) for p in paths]
    if paths and not any(present):
        raise FileNotFoundError(
            f"none of the {len(paths)} expected waveforms exist under "
            f"{audio_dir} (first: {paths[0]}). If the waveforms are named "
            "by utterance id (cli.s2st output), the references must be "
            "joinable by id: use id-keyed `utt_id\\ttranscript` reference "
            "lines or pass --ids-file with the manifest-order utt ids. "
            "Refusing to guess a positional pairing.")
    asr = ASRGenerator(lang=lang, model_name=model_name)
    hyps = []
    for path, ok in zip(paths, present):
        if not ok:
            logger.warning("missing %s; scoring empty", path)
            hyps.append("")
            continue
        hyps.append(asr.transcribe_file(path))
    n_missing = len(present) - sum(present)
    if n_missing:
        logger.warning("%d/%d waveforms missing (scored as empty "
                       "transcripts)", n_missing, len(present))
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
    p.add_argument("--ids-file", default=None,
                   help="utt ids (one per line) pairing plain-text "
                        "reference lines with {utt_id}_pred.wav files")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO, force=True)
    bleu, hyps, refs = run_asr_bleu(
        args.audio_dir, args.reference_path, args.lang,
        model_name=args.asr_model, ids_path=args.ids_file,
    )
    if args.transcripts_path:
        with open(args.transcripts_path, "w") as f:
            for h in hyps:
                f.write(h + "\n")
    print(f"ASR-BLEU: {bleu:.2f}")


if __name__ == "__main__":
    main()
