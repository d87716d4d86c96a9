"""Shared fixtures-in-functions for the e2e tests.

The released ASR checkpoints are unreachable in this image (zero egress),
so tests materialize a tiny wav2vec2-CTC checkpoint with random weights on
disk via transformers' save_pretrained and load it through the SAME
AutoProcessor/AutoModelForCTC path ASRGenerator uses for the released
models (reference examples/speech_to_speech/asr_bleu/utils.py:47-299).
"""

import json
import os
import wave

import numpy as np

CTC_VOCAB = ["<pad>", "<s>", "</s>", "<unk>", "|", "a", "b", "c", "d", "e",
             "h", "l", "o", "t", "w"]


def make_tiny_ctc_checkpoint(d) -> str:
    """Write a loadable wav2vec2-CTC checkpoint dir (random weights) at `d`."""
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    import torch
    from transformers import (
        Wav2Vec2Config,
        Wav2Vec2CTCTokenizer,
        Wav2Vec2FeatureExtractor,
        Wav2Vec2ForCTC,
        Wav2Vec2Processor,
    )

    d = str(d)
    os.makedirs(d, exist_ok=True)
    vocab_file = os.path.join(d, "vocab.json")
    with open(vocab_file, "w") as f:
        json.dump({c: i for i, c in enumerate(CTC_VOCAB)}, f)
    tokenizer = Wav2Vec2CTCTokenizer(
        vocab_file, pad_token="<pad>", unk_token="<unk>",
        word_delimiter_token="|",
    )
    fe = Wav2Vec2FeatureExtractor(
        feature_size=1, sampling_rate=16000, padding_value=0.0,
        do_normalize=True, return_attention_mask=False,
    )
    processor = Wav2Vec2Processor(feature_extractor=fe, tokenizer=tokenizer)
    torch.manual_seed(0)
    config = Wav2Vec2Config(
        vocab_size=len(CTC_VOCAB), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
        num_feat_extract_layers=3, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )
    model = Wav2Vec2ForCTC(config)
    model.save_pretrained(d)
    processor.save_pretrained(d)
    return d


def write_wav16(path, wav, sr: int = 16000):
    """Write mono 16-bit PCM at `sr` Hz."""
    pcm = np.clip(np.asarray(wav, np.float32) * 32767.0,
                  -32768, 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
