"""Jitted beam-search sequence generator for the AR unit decoder.

Capability parity with fairseq/sequence_generator.py (beam search, length
penalty, min/max length, ngram-repeat blocking — the CUDA op
fairseq/clib/cuda/ngram_repeat_block* becomes a vectorized jnp mask inside
the jitted loop) redesigned as one lax.while_loop over decode steps with a
flax "cache" pytree threaded through the carry and gather-reordered on beam
selection.

Layout: sequences are [B*K, L]; beams of a sentence are contiguous.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PAD, BOS, EOS, UNK = 1, 0, 2, 3
NEG_INF = -1.0e7


def ngram_blocking_mask(seqs, step, vocab_size: int, ngram: int):
    """Ban tokens that would complete an already-seen n-gram.

    seqs: [N, L] generated so far (positions < step valid).
    Returns additive mask [N, V] (0 or NEG_INF).
    """
    n, l = seqs.shape
    if ngram <= 0:
        return jnp.zeros((n, vocab_size), jnp.float32)

    # suffix = last (ngram-1) tokens ending at step-1
    def suffix_at(offset):
        return jax.lax.dynamic_index_in_dim(
            seqs, jnp.maximum(step - (ngram - 1) + offset, 0), axis=1,
            keepdims=False,
        )

    suffix = jnp.stack([suffix_at(o) for o in range(ngram - 1)], axis=1)  # [N, n-1]

    pos = jnp.arange(l)
    banned = jnp.zeros((n, vocab_size), jnp.float32)

    def body(i, banned):
        # window seqs[:, i:i+ngram-1] followed by seqs[:, i+ngram-1]
        window = jax.lax.dynamic_slice_in_dim(seqs, i, ngram - 1, axis=1)
        nxt = jax.lax.dynamic_index_in_dim(
            seqs, i + (ngram - 1), axis=1, keepdims=False
        )
        valid = (i + ngram - 1) < step  # whole window observed
        match = jnp.all(window == suffix, axis=1) & valid
        upd = jnp.where(match, NEG_INF, 0.0)
        return banned.at[jnp.arange(n), nxt].add(upd)

    max_windows = l - ngram + 1
    banned = jax.lax.fori_loop(0, jnp.maximum(jnp.minimum(max_windows, step), 0),
                               body, banned)
    return jnp.maximum(banned, NEG_INF)  # collapse repeated adds


def beam_search(
    decode_step,
    init_cache,
    batch_size: int,
    beam_size: int,
    max_len: int,
    vocab_size: int,
    min_len: int = 1,
    len_penalty: float = 1.0,
    no_repeat_ngram: int = 0,
    unk_penalty: float = 0.0,
    prefix_tokens=None,
):
    """Generic AR beam search.

    decode_step(cache, tokens [N,1], positions [N]) -> (log_probs [N,V],
    new_cache) where N = batch*beam. Returns (seqs [B, K, L], scores [B, K])
    sorted best-first.

    prefix_tokens: optional [B, P] int32 — force the first P target tokens
    per sentence (fairseq sequence_generator._prefix_tokens: every
    non-prefix continuation is masked to -inf, the forced token keeps its
    model log-prob; PAD positions in the prefix are unconstrained).
    """
    n = batch_size * beam_size

    seqs = jnp.full((n, max_len), PAD, jnp.int32)
    prev = jnp.full((n, 1), EOS, jnp.int32)  # fairseq starts with eos
    # only beam 0 of each sentence live at step 0
    scores = jnp.tile(
        jnp.asarray([0.0] + [NEG_INF] * (beam_size - 1), jnp.float32),
        (batch_size,),
    )
    finished = jnp.zeros((n,), bool)

    def cond(state):
        step, _, _, _, _, finished = state
        return (step < max_len) & ~jnp.all(finished)

    def body(state):
        step, seqs, prev, scores, cache, finished = state
        lp, new_cache = decode_step(cache, prev, jnp.full((n,), step))
        lp = jax.nn.log_softmax(lp.astype(jnp.float32), axis=-1)
        lp = lp.at[:, PAD].set(NEG_INF)
        lp = lp.at[:, BOS].set(NEG_INF)
        lp = lp.at[:, UNK].add(-unk_penalty)
        lp = jnp.where(step < min_len, lp.at[:, EOS].set(NEG_INF), lp)
        if prefix_tokens is not None and prefix_tokens.shape[1] > 0:
            p_len = prefix_tokens.shape[1]
            forced = jax.lax.dynamic_index_in_dim(
                prefix_tokens, jnp.minimum(step, p_len - 1), axis=1,
                keepdims=False,
            )  # [B]
            forced = jnp.repeat(forced, beam_size, axis=0)  # [N]
            use = (step < p_len) & (forced != PAD) & ~finished
            keep = jnp.zeros((n, vocab_size), bool).at[
                jnp.arange(n), forced].set(True)
            lp = jnp.where(use[:, None] & ~keep, NEG_INF, lp)
        if no_repeat_ngram > 0:
            lp = lp + ngram_blocking_mask(seqs, step, vocab_size,
                                          no_repeat_ngram)
        # finished rows: only extend with pad at zero cost
        fin_row = jnp.full((vocab_size,), NEG_INF).at[PAD].set(0.0)
        lp = jnp.where(finished[:, None], fin_row[None, :], lp)

        cand = scores[:, None] + lp  # [N, V]
        cand = cand.reshape(batch_size, beam_size * vocab_size)
        top_scores, top_idx = jax.lax.top_k(cand, beam_size)  # [B, K]
        beam_idx = top_idx // vocab_size  # source beam within sentence
        token_idx = (top_idx % vocab_size).astype(jnp.int32)

        flat_src = (
            jnp.arange(batch_size)[:, None] * beam_size + beam_idx
        ).reshape(-1)
        new_seqs = seqs[flat_src].at[:, step].set(token_idx.reshape(-1))
        new_scores = top_scores.reshape(-1)
        new_prev = token_idx.reshape(-1, 1)
        new_finished = finished[flat_src] | (new_prev[:, 0] == EOS)
        new_cache = jax.tree_util.tree_map(
            lambda c: c[flat_src] if (hasattr(c, "ndim") and c.ndim > 0 and
                                      c.shape[0] == n) else c,
            new_cache,
        )
        return (step + 1, new_seqs, new_prev, new_scores, new_cache,
                new_finished)

    state = (jnp.zeros((), jnp.int32), seqs, prev, scores, init_cache, finished)
    step, seqs, _, scores, _, finished = jax.lax.while_loop(cond, body, state)

    lengths = jnp.sum((seqs != PAD), axis=1)
    norm = scores / jnp.maximum(lengths.astype(jnp.float32), 1.0) ** len_penalty
    seqs = seqs.reshape(batch_size, beam_size, max_len)
    norm = norm.reshape(batch_size, beam_size)
    order = jnp.argsort(-norm, axis=1)
    b_idx = jnp.arange(batch_size)[:, None]
    return seqs[b_idx, order], norm[b_idx, order]


def sample_generate(
    decode_step,
    init_cache,
    batch_size: int,
    max_len: int,
    vocab_size: int,
    rng,
    temperature: float = 1.0,
    sampling_topk: int = 0,
    sampling_topp: float = 0.0,
    min_len: int = 1,
    unk_penalty: float = 0.0,
    no_repeat_ngram: int = 0,
    prefix_tokens=None,
):
    """Ancestral sampling decode (fairseq search.Sampling parity:
    --sampling [--sampling-topk K | --sampling-topp P] [--temperature T]).

    Per step each row samples from the temperature-scaled distribution,
    optionally truncated to the top-K tokens or the smallest nucleus whose
    cumulative probability exceeds P (at least one token survives).
    decode_step has the beam_search contract with N = batch_size.
    Returns (seqs [B, L], scores [B] sum of sampled log-probs).

    prefix_tokens: optional [N, P] int32 forced prefix per ROW (callers with
    replicated sample rows pre-repeat it). fairseq applies _prefix_tokens
    and ngram repeat blocking before search.step for every strategy
    including Sampling, so the constraints run BEFORE top-k/top-p
    truncation — a forced token is then the row max and always survives.
    """
    n = batch_size
    seqs = jnp.full((n, max_len), PAD, jnp.int32)
    prev = jnp.full((n, 1), EOS, jnp.int32)

    def body(carry, step):
        seqs, prev, scores, cache, finished, key = carry
        key, sub = jax.random.split(key)
        lp, cache = decode_step(cache, prev, jnp.full((n,), step))
        lp = jax.nn.log_softmax(lp.astype(jnp.float32) / temperature, axis=-1)
        lp = lp.at[:, PAD].set(NEG_INF)
        lp = lp.at[:, BOS].set(NEG_INF)
        lp = lp.at[:, UNK].add(-unk_penalty)
        lp = jnp.where(step < min_len, lp.at[:, EOS].set(NEG_INF), lp)
        if prefix_tokens is not None and prefix_tokens.shape[1] > 0:
            p_len = prefix_tokens.shape[1]
            forced = jax.lax.dynamic_index_in_dim(
                prefix_tokens, jnp.minimum(step, p_len - 1), axis=1,
                keepdims=False,
            )  # [N]
            use = (step < p_len) & (forced != PAD) & ~finished
            keep = jnp.zeros((n, vocab_size), bool).at[
                jnp.arange(n), forced].set(True)
            lp = jnp.where(use[:, None] & ~keep, NEG_INF, lp)
        if no_repeat_ngram > 0:
            lp = lp + ngram_blocking_mask(seqs, step, vocab_size,
                                          no_repeat_ngram)
        if sampling_topk > 0:
            kth = jax.lax.top_k(lp, sampling_topk)[0][:, -1:]
            lp = jnp.where(lp < kth, NEG_INF, lp)
        if sampling_topp > 0.0:
            sorted_lp = jnp.sort(lp, axis=-1)[:, ::-1]
            cum = jnp.cumsum(jnp.exp(sorted_lp), axis=-1)
            # keep tokens strictly inside the nucleus plus the one that
            # crosses P (fairseq keeps the crossing token)
            inside = cum - jnp.exp(sorted_lp) < sampling_topp
            cutoff = jnp.min(
                jnp.where(inside, sorted_lp, jnp.inf), axis=-1, keepdims=True
            )
            lp = jnp.where(lp < cutoff, NEG_INF, lp)
        tok = jax.random.categorical(sub, lp, axis=-1).astype(jnp.int32)
        tok = jnp.where(finished, PAD, tok)
        tok_lp = jnp.take_along_axis(lp, tok[:, None], axis=-1)[:, 0]
        scores = scores + jnp.where(finished, 0.0, tok_lp)
        seqs = seqs.at[:, step].set(tok)
        finished = finished | (tok == EOS)
        return (seqs, tok[:, None], scores, cache, finished, key), ()

    carry0 = (seqs, prev, jnp.zeros((n,), jnp.float32), init_cache,
              jnp.zeros((n,), bool), rng)
    (seqs, _, scores, _, _, _), _ = jax.lax.scan(
        body, carry0, jnp.arange(max_len))
    return seqs, scores


def ar_generate(
    model,
    variables,
    src,
    src_lengths,
    beam_size: int = 5,
    max_len: int = 256,
    min_len: int = 1,
    len_penalty: float = 1.0,
    no_repeat_ngram: int = 0,
    unk_penalty: float = 0.0,
    prefix_tokens=None,
    sampling: bool = False,
    sampling_topk: int = 0,
    sampling_topp: float = 0.0,
    temperature: float = 1.0,
    rng=None,
):
    """End-to-end AR generation for ARS2UTModule (encode once, replicate
    encoder states across beams, run the jitted beam loop).

    `variables` may be a LIST of parameter trees (same architecture):
    per-step probabilities are averaged across models inside the jitted
    loop (fairseq sequence_generator EnsembleModel parity — logsumexp of
    per-model log-probs - log M). Each model keeps its own KV cache; the
    caches live in a tuple pytree whose leaves keep the [batch*beam, ...]
    leading dim, so beam reordering applies transparently."""
    from diffnorm_tpu.models.ar_transformer import ARS2UTModule

    module = model.module
    vlist = (list(variables) if isinstance(variables, (list, tuple))
             else [variables])
    n_models = len(vlist)

    pairs = [module.apply(v, src, src_lengths, method=ARS2UTModule.encode)
             for v in vlist]
    b = pairs[0][0].shape[0]
    enc_reps = [jnp.repeat(e, beam_size, axis=0) for e, _ in pairs]
    mask_rep = jnp.repeat(pairs[0][1], beam_size, axis=0)

    # init each model's cache by tracing one step with zero tokens
    caches0 = []
    params_only = []
    for v, enc_rep in zip(vlist, enc_reps):
        _, cache_vars = module.apply(
            {**v},
            jnp.full((b * beam_size, 1), EOS, jnp.int32),
            enc_rep, mask_rep, jnp.zeros((b * beam_size,), jnp.int32),
            max_len,
            method=ARS2UTModule.decode_step, mutable=["cache"],
        )
        # reset the cache index/content to zero (the probe wrote one step)
        caches0.append(jax.tree_util.tree_map(jnp.zeros_like,
                                              cache_vars["cache"]))
        params_only.append({k: p for k, p in v.items() if k != "cache"})

    def decode_step(caches, tokens, positions):
        lps, new_caches = [], []
        for p, cache, enc_rep in zip(params_only, caches, enc_reps):
            logits, mutated = module.apply(
                {**p, "cache": cache},
                tokens, enc_rep, mask_rep, positions, max_len,
                method=ARS2UTModule.decode_step, mutable=["cache"],
            )
            lps.append(jax.nn.log_softmax(
                logits.astype(jnp.float32), axis=-1))
            new_caches.append(mutated["cache"])
        if n_models == 1:
            avg = lps[0]
        else:
            avg = jax.nn.logsumexp(jnp.stack(lps), axis=0) - jnp.log(
                float(n_models))
        return avg, tuple(new_caches)

    vocab = module.vocab_size
    if sampling:
        # beam_size independent samples per sentence (fairseq --sampling
        # draws beam hypotheses); rows are already replicated beam_size-fold
        key = rng if rng is not None else jax.random.PRNGKey(0)
        seqs, scores = sample_generate(
            decode_step, tuple(caches0), b * beam_size, max_len, vocab, key,
            temperature=temperature, sampling_topk=sampling_topk,
            sampling_topp=sampling_topp, min_len=min_len,
            unk_penalty=unk_penalty, no_repeat_ngram=no_repeat_ngram,
            prefix_tokens=(jnp.repeat(prefix_tokens, beam_size, axis=0)
                           if prefix_tokens is not None else None),
        )
        lengths = jnp.sum(seqs != PAD, axis=1)
        norm = scores / jnp.maximum(
            lengths.astype(jnp.float32), 1.0) ** len_penalty
        seqs = seqs.reshape(b, beam_size, max_len)
        norm = norm.reshape(b, beam_size)
        order = jnp.argsort(-norm, axis=1)
        b_idx = jnp.arange(b)[:, None]
        return seqs[b_idx, order], norm[b_idx, order]
    return beam_search(
        decode_step, tuple(caches0), b, beam_size, max_len, vocab,
        min_len=min_len, len_penalty=len_penalty,
        no_repeat_ngram=no_repeat_ngram, unk_penalty=unk_penalty,
        prefix_tokens=prefix_tokens,
    )


def ar_generate_stacked(model, variables, src, src_lengths,
                        max_len: int = 256):
    """Greedy stacked-unit generation for an n_frames_per_step>1 AR decoder
    (reference StackUnitSequenceGenerator, fairseq/tasks/speech_to_speech.py
    :31-137): encode once, then one packed token per step whose [B, k, V]
    sub-frame logits are argmax-decoded and re-packed. The KV cache threads
    through the scan carry. Returns (packed [B, max_len], sub [B, max_len, k])
    — `sub` is the full-rate unit stream (specials pass through all slots).
    """
    from diffnorm_tpu.models.ar_transformer import ARS2UTModule
    from diffnorm_tpu.models.stacked import stack_unit_generate

    module = model.module
    k = module.n_frames_per_step  # setup() attrs are apply-scoped in flax
    enc, enc_mask = module.apply(
        variables, src, src_lengths, method=ARS2UTModule.encode
    )
    b = enc.shape[0]
    _, cache_vars = module.apply(
        variables, jnp.full((b, 1), EOS, jnp.int32), enc, enc_mask,
        jnp.zeros((b,), jnp.int32), max_len,
        method=ARS2UTModule.decode_step, mutable=["cache"],
    )
    cache0 = jax.tree_util.tree_map(jnp.zeros_like, cache_vars["cache"])
    params_only = {key: v for key, v in variables.items() if key != "cache"}

    def decode_step(cache, prev, positions):
        logits, mutated = module.apply(
            {**params_only, "cache": cache}, prev[:, None], enc, enc_mask,
            positions, max_len, method=ARS2UTModule.decode_step,
            mutable=["cache"],
        )
        return logits, mutated["cache"]  # logits [B, k, V]

    vocab = module.vocab_size - 4
    return stack_unit_generate(
        decode_step, b, vocab, k, max_len=max_len, init_state=cache0
    )
