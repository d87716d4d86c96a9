"""Jitted beam-search sequence generator for the AR unit decoder.

EXACT semantic parity with fairseq/sequence_generator.py (2*beam candidate
selection via search.BeamSearch, eos finalization that frees the beam slot
for the next-best continuation, cands_to_ignore, length-normalized scores,
min/max length, unk penalty, prefix forcing, ngram-repeat blocking — the
CUDA op fairseq/clib/cuda/ngram_repeat_block* becomes a vectorized jnp
mask) redesigned as one lax.while_loop over decode steps with a flax
"cache" pytree threaded through the carry and gather-reordered on beam
selection; finalized hypotheses accumulate in static [B, K, L] buffers
instead of fairseq's dynamic per-sentence lists/batch shrinking.
Hypothesis-for-hypothesis parity vs the verbatim-loaded reference loop:
tests/test_beam_reference_parity.py.

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
    normalize_scores: bool = True,
):
    """Generic AR beam search with EXACT fairseq semantics
    (sequence_generator.py _generate :191-660 + search.BeamSearch.step):
    2*K candidates per step, EOS candidates among the top K finalize and
    LEAVE the beam (the next-best continuations take their slots), ignored
    slots via the cands_to_ignore mask, min/max-length constraints with the
    model's own EOS log-prob kept on the forced final step, and per-
    sentence termination once K hypotheses are finalized. Verified
    hypothesis-for-hypothesis against the verbatim-loaded reference
    generator in tests/test_beam_reference_parity.py.

    decode_step(cache, tokens [N,1], positions [N]) -> (log_probs [N,V],
    new_cache) where N = batch*beam. Returns (seqs [B, K, L], scores [B, K])
    sorted best-first; scores are normalized by length**len_penalty when
    normalize_scores (fairseq finalize_hypos).

    `max_len` counts the full emitted sequence INCLUDING its final EOS
    (fairseq's max_len excludes it — internal F = max_len - 1).

    prefix_tokens: optional [B, P] int32 — force the first P target tokens
    per sentence (fairseq _prefix_tokens: every non-prefix continuation is
    masked to -inf, the forced token keeps its model log-prob; PAD prefix
    positions are unconstrained; the eos-in-prefix beam-replication edge
    case is not supported).
    """
    n = batch_size * beam_size
    k, cand_size = beam_size, 2 * beam_size
    assert cand_size <= vocab_size - 1, (
        "fairseq takes min(2*beam, vocab-1) candidates; use a larger vocab"
    )
    f_max = max_len - 1  # fairseq max_len excludes the final eos
    neg_inf = -jnp.inf
    b_idx = jnp.arange(batch_size)[:, None]

    tokens = jnp.full((n, max_len), PAD, jnp.int32)
    scores_buf = jnp.zeros((n, max_len), jnp.float32)  # cumulative per step
    prev = jnp.full((n, 1), EOS, jnp.int32)  # fairseq starts with eos
    ignore = jnp.zeros((batch_size, k), bool)  # cands_to_ignore
    fin_tok = jnp.full((batch_size, k, max_len), PAD, jnp.int32)
    fin_score = jnp.full((batch_size, k), neg_inf, jnp.float32)
    fin_count = jnp.zeros((batch_size,), jnp.int32)
    finished = jnp.zeros((batch_size,), bool)

    def cond(state):
        return (state[0] <= f_max) & ~jnp.all(state[9])

    def body(state):
        (step, tokens, scores_buf, prev, cache, ignore,
         fin_tok, fin_score, fin_count, finished) = state
        lp, new_cache = decode_step(cache, prev, jnp.full((n,), step))
        lp = jax.nn.log_softmax(lp.astype(jnp.float32), axis=-1)
        lp = jnp.nan_to_num(lp, nan=neg_inf, neginf=neg_inf)
        lp = lp.at[:, PAD].set(neg_inf)  # never select pad
        lp = lp.at[:, UNK].add(-unk_penalty)
        # max-length: force eos, KEEPING the model's eos log-prob
        is_eos_col = jnp.arange(vocab_size)[None, :] == EOS
        lp = jnp.where((step >= f_max) & ~is_eos_col, neg_inf, lp)
        prefix_active = jnp.zeros((), bool)
        if prefix_tokens is not None and prefix_tokens.shape[1] > 0:
            p_len = prefix_tokens.shape[1]
            forced = jax.lax.dynamic_index_in_dim(
                prefix_tokens, jnp.minimum(step, p_len - 1), axis=1,
                keepdims=False,
            )  # [B]
            forced = jnp.repeat(forced, beam_size, axis=0)  # [N]
            use = (step < p_len) & (step < f_max) & (forced != PAD)
            keep = jnp.zeros((n, vocab_size), bool).at[
                jnp.arange(n), forced].set(True)
            lp = jnp.where(use[:, None] & ~keep, neg_inf, lp)
            # fairseq applies min_len only when the prefix branch did not
            # run this step (if/elif at sequence_generator.py :369-378)
            prefix_active = (step < p_len) & (step < f_max)
        lp = jnp.where(~prefix_active & (step < min_len),
                       lp.at[:, EOS].set(neg_inf), lp)
        if no_repeat_ngram > 0:
            # fairseq bans with exact -inf (a banned EOS must not finalize)
            blk = ngram_blocking_mask(tokens, step, vocab_size,
                                      no_repeat_ngram)
            lp = jnp.where(blk < 0, neg_inf, lp)

        # --- search.BeamSearch.step: cumulative scores, top 2K candidates
        cum_prev = jnp.where(
            step > 0,
            jax.lax.dynamic_index_in_dim(
                scores_buf, jnp.maximum(step - 1, 0), axis=1, keepdims=False
            ),
            0.0,
        )  # [N]
        cand = (lp + cum_prev[:, None]).reshape(batch_size, k, vocab_size)
        # step 0: all beams identical — use only beam 0 (fairseq slices)
        beam0_only = jnp.where(jnp.arange(k)[None, :, None] == 0, 0.0,
                               neg_inf)
        cand = jnp.where(step == 0, cand + beam0_only, cand)
        cand_scores, cand_idx = jax.lax.top_k(
            cand.reshape(batch_size, -1), cand_size
        )  # [B, 2K]
        cand_beams = cand_idx // vocab_size
        cand_toks = (cand_idx % vocab_size).astype(jnp.int32)
        cand_bbsz = cand_beams + b_idx * beam_size  # rows into [N]

        # --- finalize eos candidates among the top K slots
        eos_mask = (cand_toks == EOS) & jnp.isfinite(cand_scores)  # [B, 2K]
        top_slots = jnp.arange(cand_size)[None, :] < k
        eos_mask = eos_mask & (
            ~jnp.pad(ignore, ((0, 0), (0, k))) | ~top_slots
        )
        fin_this = eos_mask & top_slots & ~finished[:, None]  # [B, 2K]
        rank = fin_count[:, None] + jnp.cumsum(fin_this, axis=1) - 1
        write = fin_this & (rank < k)
        tgt = jnp.where(write, rank, k)  # k = dropped (out of range)
        # hypothesis rows: tokens of the SOURCE beam + eos at `step`
        hyp_tok = tokens[cand_bbsz.reshape(-1)].at[:, step].set(EOS)
        hyp_tok = hyp_tok.reshape(batch_size, cand_size, max_len)
        if normalize_scores:
            norm = (step + 1).astype(jnp.float32) ** len_penalty
            hyp_score = cand_scores / norm
        else:
            hyp_score = cand_scores
        fin_tok = fin_tok.at[b_idx, tgt].set(
            hyp_tok, mode="drop"
        )
        fin_score = fin_score.at[b_idx, tgt].set(hyp_score, mode="drop")
        fin_count = fin_count + jnp.sum(write, axis=1)
        finished = finished | (fin_count >= k) | (step >= f_max)

        # --- pick the K lowest of (eos? 2K : 0) + slot: non-eos first,
        # in candidate order (fairseq active_mask / active_hypos)
        active_mask = (eos_mask.astype(jnp.int32) * cand_size
                       + jnp.arange(cand_size)[None, :])
        neg_top, active_hypos = jax.lax.top_k(-active_mask, k)  # [B, K]
        new_ignore = (-neg_top) >= cand_size
        active_bbsz = jnp.take_along_axis(cand_bbsz, active_hypos, axis=1)
        active_scores = jnp.take_along_axis(cand_scores, active_hypos, axis=1)
        active_toks = jnp.take_along_axis(cand_toks, active_hypos, axis=1)

        flat_src = active_bbsz.reshape(-1)
        new_tokens = tokens[flat_src].at[:, step].set(active_toks.reshape(-1))
        new_scores_buf = scores_buf[flat_src].at[:, step].set(
            jnp.nan_to_num(active_scores.reshape(-1), nan=NEG_INF,
                           neginf=NEG_INF)
        )
        new_prev = active_toks.reshape(-1, 1)
        new_cache = jax.tree_util.tree_map(
            lambda c: c[flat_src] if (hasattr(c, "ndim") and c.ndim > 0 and
                                      c.shape[0] == n) else c,
            new_cache,
        )
        return (step + 1, new_tokens, new_scores_buf, new_prev, new_cache,
                new_ignore, fin_tok, fin_score, fin_count, finished)

    state = (jnp.zeros((), jnp.int32), tokens, scores_buf, prev, init_cache,
             ignore, fin_tok, fin_score, fin_count, finished)
    state = jax.lax.while_loop(cond, body, state)
    fin_tok, fin_score = state[6], state[7]

    order = jnp.argsort(-fin_score, axis=1)
    return fin_tok[b_idx, order], fin_score[b_idx, order]


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
    tgt_speaker=None,
):
    """End-to-end AR generation for encode/decode_step modules (encode once, replicate
    encoder states across beams, run the jitted beam loop).

    `variables` may be a LIST of parameter trees (same architecture):
    per-step probabilities are averaged across models inside the jitted
    loop (fairseq sequence_generator EnsembleModel parity — logsumexp of
    per-model log-probs - log M). Each model keeps its own KV cache; the
    caches live in a tuple pytree whose leaves keep the [batch*beam, ...]
    leading dim, so beam reordering applies transparently."""
    module = model.module
    vlist = (list(variables) if isinstance(variables, (list, tuple))
             else [variables])
    n_models = len(vlist)

    # --target-speaker-embed conditioning at inference (only passed when
    # supplied; keeps duck-typed encode signatures of other families intact)
    enc_kw = {} if tgt_speaker is None else {"tgt_speaker": tgt_speaker}
    pairs = [module.apply(v, src, src_lengths, method="encode", **enc_kw)
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
            method="decode_step", mutable=["cache"],
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
                method="decode_step", mutable=["cache"],
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

    # target vocab: the S2UT module exposes vocab_size; text
    # enc-dec modules expose tgt_vocab_size
    vocab = getattr(module, "vocab_size", None) or module.tgt_vocab_size
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
                        max_len: int = 256, tgt_speaker=None):
    """Greedy stacked-unit generation for an n_frames_per_step>1 AR decoder
    (reference StackUnitSequenceGenerator, fairseq/tasks/speech_to_speech.py
    :31-137): encode once, then one packed token per step whose [B, k, V]
    sub-frame logits are argmax-decoded and re-packed. The KV cache threads
    through the scan carry. Returns (packed [B, max_len], sub [B, max_len, k])
    — `sub` is the full-rate unit stream (specials pass through all slots).
    """
    from diffnorm_tpu.models.stacked import stack_unit_generate

    module = model.module
    k = module.n_frames_per_step  # setup() attrs are apply-scoped in flax
    # --target-speaker-embed conditioning (reference StackUnitSequenceGenerator
    # passes speaker to forward_encoder, tasks/speech_to_speech.py:71-73)
    enc_kw = {} if tgt_speaker is None else {"tgt_speaker": tgt_speaker}
    enc, enc_mask = module.apply(
        variables, src, src_lengths, method="encode", **enc_kw
    )
    b = enc.shape[0]
    _, cache_vars = module.apply(
        variables, jnp.full((b, 1), EOS, jnp.int32), enc, enc_mask,
        jnp.zeros((b,), jnp.int32), max_len,
        method="decode_step", mutable=["cache"],
    )
    cache0 = jax.tree_util.tree_map(jnp.zeros_like, cache_vars["cache"])
    params_only = {key: v for key, v in variables.items() if key != "cache"}

    def decode_step(cache, prev, positions):
        logits, mutated = module.apply(
            {**params_only, "cache": cache}, prev[:, None], enc, enc_mask,
            positions, max_len, method="decode_step",
            mutable=["cache"],
        )
        return logits, mutated["cache"]  # logits [B, k, V]

    vocab = module.vocab_size - 4
    return stack_unit_generate(
        decode_step, b, vocab, k, max_len=max_len, init_state=cache0
    )
