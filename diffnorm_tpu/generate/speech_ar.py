"""Autoregressive spectrogram generation (AR speech generator).

Capability parity with fairseq/speech_generator.py
AutoRegressiveSpeechGenerator:36-127, redesigned for TPU: the reference
runs a Python loop over incremental torch state with an early `break`;
here the whole rollout is ONE jitted lax.scan over a KV cache with a
per-row eos freeze (XLA-static shapes), followed by one full-sequence
postnet pass and global-CMVN denormalization. The Tacotron prenet's
always-on dropout (the source of AR-TTS sampling variation) is driven by
the passed rng.

Known deviation (loop parity pinned in tests/test_speechgen_loop_parity.py
against the verbatim reference): the reference breaks out of the rollout
once every row has fired and applies the postnet to only the collected
prefix, while this scan always collects max_iter frames. With the
convolutional postnet the last kernel//2 frames of the LONGEST row see
real future frames here but zero padding there — a boundary-numerics
difference on up to 2 frames; everything else is exact.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def ar_rollout(
    module,
    variables,
    enc,
    enc_mask,
    max_iter: int = 512,
    eos_prob_threshold: float = 0.5,
    rng=None,
    gcmvn_stats: Optional[Dict] = None,
):
    """The jitted AR mel rollout over an already-computed cross-attention
    context: one lax.scan over the KV cache with per-row eos freeze, one
    full-sequence postnet pass, optional gcmvn denormalization. Returns
    (feat [B, max_iter*k, raw_dim], out_lens [B], eos_prob [B, max_iter*k]).
    Shared by the single-pass speech/text generators (context = source
    encoder output) and the Translatotron2 two-pass generator (context =
    synthesizer output over first-pass text features)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    out_dim = module.out_dim
    k = module.n_frames_per_step
    raw_dim = out_dim // k
    b = enc.shape[0]

    # trace one step to shape the cache, then zero it
    _, cache_vars = module.apply(
        variables, jnp.zeros((b, 1, out_dim)), enc, enc_mask, 0, max_iter,
        method="decode_step", mutable=["cache"],
        rngs={"dropout": jax.random.fold_in(rng, 1)},
    )
    cache0 = jax.tree_util.tree_map(jnp.zeros_like, cache_vars["cache"])
    params_only = {key: v for key, v in variables.items() if key != "cache"}

    def step_fn(carry, step):
        prev_feat, cache, finished, out_lens = carry
        (feat, eos_logit), mutated = module.apply(
            {**params_only, "cache": cache},
            prev_feat[:, None], enc, enc_mask, step, max_iter,
            method="decode_step", mutable=["cache"],
            rngs={"dropout": jax.random.fold_in(rng, 2 + step)},
        )
        eos_prob = jax.nn.sigmoid(eos_logit.astype(jnp.float32))
        cur_fin = eos_prob > eos_prob_threshold
        out_lens = jnp.where(~finished & cur_fin, step + 1, out_lens)
        finished = finished | cur_fin
        return (feat, mutated["cache"], finished, out_lens), (feat, eos_prob)

    init = (
        jnp.zeros((b, out_dim)),
        cache0,
        jnp.zeros((b,), bool),
        jnp.full((b,), max_iter, jnp.int32),
    )
    (_, _, _, out_lens), (feats, eos_prob) = jax.lax.scan(
        step_fn, init, jnp.arange(max_iter)
    )
    feats = jnp.transpose(feats, (1, 0, 2))  # [B, S, out_dim]
    eos_prob = jnp.transpose(eos_prob, (1, 0))

    # one full-sequence postnet pass over the collected frames (reference
    # applies postnet after the loop, speech_generator.py:95-96)
    feats = module.apply(
        variables, feats, method="apply_postnet",
        rngs={"dropout": jax.random.fold_in(rng, 10**6)},
    )

    feats = feats.reshape(b, max_iter * k, raw_dim)
    eos_prob = jnp.repeat(eos_prob, k, axis=1)
    out_lens = out_lens * k

    if gcmvn_stats is not None:
        mean = jnp.asarray(np.asarray(gcmvn_stats["mean"]), feats.dtype)
        std = jnp.asarray(np.asarray(gcmvn_stats["std"]), feats.dtype)
        feats = feats * std[None, None, :] + mean[None, None, :]
    return feats, out_lens, eos_prob


def ar_speech_generate(
    model,
    variables,
    src_tokens,
    max_iter: int = 512,
    eos_prob_threshold: float = 0.5,
    rng=None,
    gcmvn_stats: Optional[Dict] = None,
    src_lengths=None,
):
    """Returns (feat [B, max_iter*k, raw_dim], out_lens [B], eos_prob
    [B, max_iter*k]) with feat already postnet-refined and gcmvn-denormalized
    (reference generate():49-116). k = n_frames_per_step.

    Rows keep decoding after their eos fires (shape-static scan) but their
    reported length freezes at the firing step, matching the reference's
    per-sentence cutoffs.
    """
    module = model.module
    if rng is None:
        rng = jax.random.PRNGKey(0)

    # speech-input encoders (s2spect, encode_needs_lengths=True) take the
    # true source lengths; the text-input TTS encoder derives its mask from
    # the pad id and must NOT receive a lengths positional (it would land
    # in `deterministic`)
    enc_args = (jnp.asarray(src_tokens),)
    if getattr(module, "encode_needs_lengths", False):
        assert src_lengths is not None, "this encoder needs src_lengths"
        enc_args = enc_args + (jnp.asarray(src_lengths),)
    enc, enc_mask = module.apply(
        variables, *enc_args, method="encode",
        rngs={"dropout": jax.random.fold_in(rng, 0)},
    )
    return ar_rollout(module, variables, enc, enc_mask, max_iter=max_iter,
                      eos_prob_threshold=eos_prob_threshold, rng=rng,
                      gcmvn_stats=gcmvn_stats)


class ARSpeechGenerator:
    """Host-side wrapper mirroring AutoRegressiveSpeechGenerator: jitted
    rollout + per-sentence cutoff + optional vocoder (unit/mel -> wav)."""

    def __init__(self, model, variables, vocoder=None, gcmvn_stats=None,
                 max_iter: int = 512, eos_prob_threshold: float = 0.5):
        self.model = model
        self.variables = variables
        self.vocoder = vocoder
        self.gcmvn_stats = gcmvn_stats
        self._fn = jax.jit(
            lambda v, toks, rng, lens=None: ar_speech_generate(
                model, v, toks, max_iter=max_iter,
                eos_prob_threshold=eos_prob_threshold, rng=rng,
                gcmvn_stats=gcmvn_stats, src_lengths=lens,
            )
        )

    def generate(self, src_tokens, rng=None, src_lengths=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        args = (jnp.asarray(src_tokens), rng)
        if src_lengths is not None:
            args = args + (jnp.asarray(src_lengths),)
        feats, out_lens, eos_prob = self._fn(self.variables, *args)
        feats, out_lens = np.asarray(feats), np.asarray(out_lens)
        eos_prob = np.asarray(eos_prob)
        finalized = []
        for i in range(feats.shape[0]):
            n = int(out_lens[i])
            entry = {"feature": feats[i, :n], "eos_prob": eos_prob[i, :n]}
            if self.vocoder is not None:
                entry["waveform"] = self.vocoder(feats[i, :n])
            finalized.append(entry)
        return finalized
