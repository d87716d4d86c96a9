"""Translatotron2 two-pass spectrogram generation: beam-search the
first-pass MT text decoder, hand its best hypothesis to the synthesizer
text encoder, then run the AR mel rollout over the text features.

Reference: fairseq/speech_generator.py MultiDecoderSpeechGenerator.generate
(:129-320): pass-1 beam over tgt_dict_mt, host-side rebuild of
prev_output_tokens_mt from the best hypothesis (:205-216), mt_decoder
features_only re-run (:230-238), optional synthesizer_encoder (:242-258),
then the incremental Tacotron-style decode loop with per-row eos-threshold
cutoff + postnet + gcmvn denormalization (:260-306).

TPU redesign: like generate/unity.py, the inter-pass handoff is a
static-shape in-graph masked shift of the [B, L] pass-1 hypothesis buffer,
and the mel rollout is the shared `ar_rollout` scan — so the whole
two-pass pipeline (beam -> handoff -> AR mel scan -> postnet) jits into
ONE program with no host round-trip between passes.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffnorm_tpu.generate.speech_ar import ar_rollout
from diffnorm_tpu.generate.unity import _beam_pass

PAD, BOS, EOS, UNK = 1, 0, 2, 3


def translatotron2_generate(
    model,
    variables,
    src,
    src_lengths,
    beam_size_mt: int = 5,
    max_len_mt: int = 256,
    max_iter: int = 512,
    eos_prob_threshold: float = 0.5,
    min_len: int = 1,
    len_penalty_mt: float = 1.0,
    no_repeat_ngram: int = 0,
    unk_penalty: float = 0.0,
    rng=None,
    gcmvn_stats: Optional[Dict] = None,
):
    """Returns (feat [B, max_iter*k, raw_dim], out_lens [B],
    eos_prob [B, max_iter*k], mt_best [B, Lmt]). mt_best is the selected
    first-pass text hypothesis (tokens then EOS then PAD) — the reference
    prints it per sample (speech_generator.py:219-228)."""
    module = model.module
    if isinstance(variables, (list, tuple)):
        variables = variables[0]  # no ensemble support (reference likewise)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    enc, enc_mask = module.apply(
        variables, jnp.asarray(src), jnp.asarray(src_lengths),
        method="encode")
    b = enc.shape[0]

    # ---- pass 1: MT text beam ----
    mt_seqs, _ = _beam_pass(
        module, variables, "decode_mt_step", enc, enc_mask, b, beam_size_mt,
        max_len_mt, module.mt_vocab_size,
        min_len=min_len, len_penalty=len_penalty_mt,
        no_repeat_ngram=no_repeat_ngram, unk_penalty=unk_penalty,
    )
    best_mt = mt_seqs[:, 0]  # [B, Lmt]: tokens, EOS, then PAD

    # prev_output_tokens_mt = [EOS, t0..t_{m-1}, PAD...] (reference
    # :205-216 moves the terminating eos to the front)
    shifted = jnp.concatenate(
        [jnp.full((b, 1), EOS, best_mt.dtype), best_mt[:, :-1]], axis=1)
    prev_mt = jnp.where(best_mt == PAD, PAD, shifted)

    # ---- handoff: teacher-forced first-pass features + synthesizer ----
    feats = module.apply(variables, prev_mt, enc, enc_mask,
                         method="mt_features")
    ctx, ctx_mask = module.apply(variables, feats, prev_mt != PAD,
                                 method="synthesize")

    # ---- pass 2: AR mel rollout over the text features ----
    feat, out_lens, eos_prob = ar_rollout(
        module, variables, ctx, ctx_mask, max_iter=max_iter,
        eos_prob_threshold=eos_prob_threshold, rng=rng,
        gcmvn_stats=gcmvn_stats,
    )
    return feat, out_lens, eos_prob, best_mt


class Translatotron2SpeechGenerator:
    """Host-side wrapper mirroring MultiDecoderSpeechGenerator: one jitted
    two-pass program + per-sentence cutoff + optional vocoder. Each
    finalized entry carries "feature"/"eos_prob" (like ARSpeechGenerator)
    plus "mt_tokens", the first-pass text hypothesis without EOS/PAD."""

    def __init__(self, model, variables, vocoder=None, gcmvn_stats=None,
                 max_iter: int = 512, eos_prob_threshold: float = 0.5,
                 beam_size_mt: int = 5, max_len_mt: int = 256,
                 len_penalty_mt: float = 1.0, no_repeat_ngram: int = 0):
        self.model = model
        self.variables = (variables[0] if isinstance(variables, (list, tuple))
                          else variables)
        self.vocoder = vocoder
        self._fn = jax.jit(
            lambda v, toks, lens, rng: translatotron2_generate(
                model, v, toks, lens,
                beam_size_mt=beam_size_mt, max_len_mt=max_len_mt,
                max_iter=max_iter, eos_prob_threshold=eos_prob_threshold,
                len_penalty_mt=len_penalty_mt,
                no_repeat_ngram=no_repeat_ngram,
                rng=rng, gcmvn_stats=gcmvn_stats,
            )
        )

    def generate(self, src_tokens, src_lengths, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        feats, out_lens, eos_prob, mt_best = self._fn(
            self.variables, jnp.asarray(src_tokens),
            jnp.asarray(src_lengths), rng)
        feats, out_lens = np.asarray(feats), np.asarray(out_lens)
        eos_prob, mt_best = np.asarray(eos_prob), np.asarray(mt_best)
        finalized = []
        for i in range(feats.shape[0]):
            n = int(out_lens[i])
            mt = mt_best[i]
            entry = {
                "feature": feats[i, :n],
                "eos_prob": eos_prob[i, :n],
                "mt_tokens": mt[(mt != PAD) & (mt != EOS)],
            }
            if self.vocoder is not None:
                entry["waveform"] = self.vocoder(feats[i, :n])
            finalized.append(entry)
        return finalized
