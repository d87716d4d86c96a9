"""Mask-predict iterative refinement decoding, fully jitted.

Capability parity with the reference decode loop
(research/TranSpeech/iterative_refinement_generator.py:101-314 +
nar_transformer.py forward_decoder :791-841 / initialize_output_tokens
:844-885 / _skeptical_unmasking fairseq/models/nat/cmlm_transformer.py:19-25
+ classifier-free guidance nat_gen.py:216-236):

* canvas init from the 256-way length prediction (clamp min 2), all-unk
* per step: fill masked positions with argmax log-probs, optionally with CG
  (lp = uncond + scale * (cond - uncond)), then skeptically re-mask the
  (1 - (step+1)/max_step) * (len - 2) lowest-scoring positions
* adaptive early exit (loop detection) becomes a per-row `done` freeze inside
  one lax.scan — XLA-static shapes, no per-sentence dynamic batching
* length-beam decoding replicates rows with lengths l-b/2..l+b/2 and picks
  the best mean-score hypothesis per sentence

The whole loop jits into a single program of max_iter+1 decoder forwards.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

PAD, BOS, EOS, UNK = 1, 0, 2, 3


def skeptical_mask(scores, non_pad, p):
    """Re-mask the floor((count-2)*p) lowest-scoring positions per row.
    scores: [B, T] (log-probs <= 0; pads carry 0 and sort last)."""
    boundary = ((jnp.sum(non_pad, axis=1, keepdims=True) - 2) * p).astype(jnp.int32)
    order = jnp.argsort(scores, axis=1)  # ascending
    rank = jnp.argsort(order, axis=1)
    return rank < boundary


def fill_and_remask(tokens, scores, new_tokens, new_scores, step, max_step):
    """One CMLM iteration's canvas update given the argmax fill (reference
    forward_decoder research/TranSpeech/nar_transformer.py:791-841 +
    _skeptical_unmasking fairseq/models/nat/cmlm_transformer.py:19-25):
    fill unk positions, then re-mask the floor((len-2)*(1-(step+1)/max_step))
    lowest-scoring positions unless this was the final step.

    Returns (filled_tokens, filled_scores, out_tokens, out_scores) — the
    filled canvas (what the reference appends to history / returns on the
    last step) and the re-masked canvas fed to the next iteration.
    Parity-tested against the real reference modules in
    tests/test_reference_parity.py."""
    masks = tokens == UNK
    filled_tokens = jnp.where(masks, new_tokens, tokens)
    filled_scores = jnp.where(masks, new_scores, scores)
    # p as ONE correctly-rounded float32 division. The reference computes
    # 1-(step+1)/max_step in python float64 and multiplies it into a float32
    # tensor; evaluating the same expression natively in float32
    # (1.0f - 1/3f) lands one ulp BELOW 2/3, and floor((len-2)*p) then
    # re-masks one position fewer (caught by
    # tests/test_reference_parity.py::test_mask_predict_iteration_matches_reference)
    p = jnp.asarray(max_step - 1 - step, jnp.float32) / max_step
    do_remask = (step + 1) < max_step
    smask = skeptical_mask(filled_scores, filled_tokens != PAD, p) & do_remask
    out_tokens = jnp.where(smask, UNK, filled_tokens)
    out_scores = jnp.where(smask, 0.0, filled_scores)
    return filled_tokens, filled_scores, out_tokens, out_scores


def ar_rerank_scores(ar_model, ar_variables, src, src_lengths, cand_tokens):
    """Mean per-token log-prob of each candidate under an AR model
    (reference rerank, iterative_refinement_generator.py:316-361): position
    0 is overwritten with EOS (the AR decoder's start symbol), the decoder
    is teacher-forced on tokens[:-1], and the log-probs of tokens[1:] are
    mean-pooled over non-pad positions. One batched forward, jit-safe.

    cand_tokens [N, T]; src/src_lengths already repeated to N rows."""
    toks = cand_tokens.at[:, 0].set(EOS)
    out = ar_model.module.apply(
        ar_variables, src, src_lengths, toks[:, :-1]
    )
    logits = out["logits"] if isinstance(out, dict) else out
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = toks[:, 1:]
    tok_lp = jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
    m = (tgt != PAD).astype(jnp.float32)
    return jnp.sum(tok_lp * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


def init_canvas(length_tgt, max_len: int, place_eos: bool = True):
    """[B] lengths -> (tokens [B, max_len] unk/eos/pad, scores zeros).

    With place_eos (our default) EOS sits unmasked at position len-1: our
    training masking never touches eos (tasks/nar_s2ut_task.py), so an
    all-unk canvas would ask the model for a prediction it was never
    trained to make. place_eos=False reproduces the reference research
    initialize_output_tokens (nar_transformer.py:844-885) exactly — it
    comments OUT the fairseq-core bos/eos placement and starts all-unk
    (used by the full-loop parity test against the real generator)."""
    length_tgt = jnp.maximum(length_tgt, 2)
    pos = jnp.arange(max_len)[None, :]
    tokens = jnp.where(pos < length_tgt[:, None], UNK, PAD).astype(jnp.int32)
    if place_eos:
        tokens = jnp.where(pos == (length_tgt - 1)[:, None], EOS, tokens)
    return tokens, jnp.zeros(tokens.shape, jnp.float32)


def mask_predict_decode(
    model,
    variables,
    src,
    src_lengths,
    max_iter: int = 15,
    max_len: int = 256,
    cond_scale: float = 1.0,
    true_length=None,
    length_beam: int = 1,
    n_frames_per_step: int = 1,
    reranker=None,
    retain_history: bool = False,
    place_eos: bool = True,
    adaptive: bool = True,
    early_exit: bool = True,
    tgt_speaker=None,
):
    """Returns (tokens [B', T], scores [B', T], n_steps), plus a history
    array [max_iter+1, B', T] as a 4th element when retain_history=True.

    With length_beam > 1, B' = B and the best-scoring beam per sentence is
    selected (regenerate_length_beam parity: lengths l + k - beam//2).
    `reranker` = (ar_model, ar_variables) replaces the mean-score beam
    selection with AR teacher-forced log-prob scoring (reference
    iterative_refinement_generator.py:294-361, --iter-decode-with-external-reranker).
    `retain_history` keeps each step's FILLED canvas (reference
    --retain-iter-history; rows frozen by adaptive exit repeat their final
    canvas). With n_frames_per_step > 1 the canvas holds packed ids; each
    fill takes the per-sub-frame argmax of the [B, T, k, V] logits,
    re-packs, and the returned tokens are the flattened full-rate unit
    stream [B', T*k].
    """
    module = model.module
    kf = n_frames_per_step
    sub_vocab = module.vocab_size - 4 if kf > 1 else 0

    # `variables` may be a LIST of parameter trees (same architecture):
    # decode probabilities are averaged per iteration, fairseq-ensemble
    # style (nonautoregressive_ensembles.py / sequence_generator
    # EnsembleModel: logsumexp of per-model log-probs - log M)
    vlist = (list(variables) if isinstance(variables, (list, tuple))
             else [variables])
    n_models = len(vlist)

    # --target-speaker-embed conditioning at inference: forwarded to the
    # S2UT encode only when supplied (other families' duck-typed encode
    # signatures are untouched)
    enc_kw = {} if tgt_speaker is None else {"tgt_speaker": tgt_speaker}
    pairs = [module.apply(v, src, src_lengths, method="encode", **enc_kw)
             for v in vlist]
    encs = [p[0] for p in pairs]
    enc_mask = pairs[0][1]

    def _avg_lp(lps):
        if len(lps) == 1:
            return lps[0]
        return jax.nn.logsumexp(jnp.stack(lps), axis=0) - jnp.log(
            float(len(lps)))

    length_lp = _avg_lp([
        jax.nn.log_softmax(
            module.apply(v, e, enc_mask, method="forward_length")
            .astype(jnp.float32), axis=-1)
        for v, e in zip(vlist, encs)
    ])
    if true_length is not None:
        length_tgt = jnp.asarray(true_length)
    else:
        length_tgt = jnp.argmax(length_lp, axis=-1)

    use_cg = cond_scale != 1.0

    if length_beam > 1:
        # the reference clamps lengths to >= 2 in initialize_output_tokens
        # BEFORE regenerate_length_beam offsets them (nar_transformer.py
        # :858,:898) — clamping only after offsetting would shift every
        # beam of a <2-length prediction
        length_tgt = jnp.maximum(length_tgt, 2)
        offsets = jnp.arange(length_beam) - length_beam // 2
        length_tgt = (length_tgt[:, None] + offsets[None, :]).reshape(-1)
        encs = [jnp.repeat(e, length_beam, axis=0) for e in encs]
        enc_mask = jnp.repeat(enc_mask, length_beam, axis=0)

    tokens, scores = init_canvas(length_tgt, max_len, place_eos=place_eos)

    null_pairs = [None] * n_models
    if use_cg:
        drop = jnp.ones((encs[0].shape[0],), bool)
        null_pairs = [
            module.apply(v, e, enc_mask, drop, method="apply_cg_drop")
            for v, e in zip(vlist, encs)
        ]

    def decode_lprobs(tok):
        lps = []
        for v, e, null_pair in zip(vlist, encs, null_pairs):
            logits = module.apply(v, tok, e, enc_mask, method="decode")
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            if use_cg:
                null_enc, null_mask = null_pair
                null_logits = module.apply(
                    v, tok, null_enc, null_mask, method="decode"
                )
                null_lp = jax.nn.log_softmax(
                    null_logits.astype(jnp.float32), axis=-1)
                lp = null_lp + cond_scale * (lp - null_lp)
            lps.append(lp)
        return _avg_lp(lps)

    max_step = max_iter + 1

    def step_fn(carry, step):
        tokens, scores, done, prev_tokens, res_tokens, res_scores = carry
        lp = decode_lprobs(tokens)
        if kf > 1:
            from diffnorm_tpu.models.stacked import OFFSET, pack_units

            sub_scores = jnp.max(lp, axis=-1)  # [B, T, k]
            sub_tok = jnp.argmax(lp, axis=-1).astype(jnp.int32)
            new_scores = jnp.mean(sub_scores, axis=-1)
            hit_special = jnp.any(sub_tok < OFFSET, axis=-1)
            packed = pack_units(
                jnp.maximum(sub_tok - OFFSET, 0), sub_vocab, kf
            )
            new_tokens = jnp.where(hit_special, EOS, packed)
        else:
            new_scores = jnp.max(lp, axis=-1)
            new_tokens = jnp.argmax(lp, axis=-1).astype(jnp.int32)
        filled_tokens, filled_scores, out_tokens, out_scores = fill_and_remask(
            tokens, scores, new_tokens, new_scores, step, max_step
        )

        # adaptive loop-detection on the FILLED canvas. Documented deviation:
        # the reference is_a_loop compares consecutive RE-MASKED canvases
        # (iterative_refinement_generator.py:167-176, forward_decoder output)
        # and can finalize canvases still holding <unk> placeholders; we
        # compare filled canvases so frozen rows always return real units.
        # adaptive=False (reference --iter-decode-force-max-iter) makes both
        # loops exactly step-equivalent (tests/test_generator_loop_parity.py);
        # the DEFAULT path's divergence is pinned on a constructed case where
        # the reference's loop detection fires mid-decode:
        # test_default_adaptive_exit_and_place_eos_pinned asserts ours equals
        # the reference token-for-token except that we fill its leftover
        # <unk>s with real units (and pin the terminal EOS).
        now_done = jnp.all(filled_tokens == prev_tokens, axis=1)
        if not adaptive:
            now_done = jnp.zeros_like(now_done)
        result = jnp.where(done[:, None], res_tokens, filled_tokens)
        res_sc = jnp.where(done[:, None], res_scores, filled_scores)

        out_tokens = jnp.where(done[:, None], tokens, out_tokens)
        out_scores = jnp.where(done[:, None], scores, out_scores)
        steps_used = jnp.where(done, 0, 1)
        new_done = done | now_done
        ys = (steps_used, result) if retain_history else steps_used
        return (out_tokens, out_scores, new_done, filled_tokens,
                result, res_sc), ys

    done0 = jnp.zeros((tokens.shape[0],), bool)
    history = None
    # early_exit=False keeps the fixed-trip scan (per-row freeze only) —
    # the round-3 benchmark semantics; outputs are identical either way.
    if adaptive and early_exit and not retain_history:
        # Early-exit serving path: the scan above masks frozen rows but
        # still pays every remaining decoder forward; the reference's
        # adaptive exit (iterative_refinement_generator.py:218-230) stops
        # decoding entirely once every sentence is finalized. A while_loop
        # with the SAME per-row freeze body converts that freeze into
        # wall-clock at identical outputs (the skipped iterations were
        # no-ops for every row). Parity: tests/test_generator_loop_parity.py.
        def w_cond(carry):
            step, _, _, done, _, _, _, _ = carry
            return (step < max_step) & ~jnp.all(done)

        def w_body(carry):
            step, tok, sc, done, prev, res_t, res_s, n_st = carry
            (out_t, out_s, new_done, filled, res_t, res_s), steps_used = (
                step_fn((tok, sc, done, prev, res_t, res_s), step))
            return (step + 1, out_t, out_s, new_done, filled, res_t, res_s,
                    n_st + steps_used)

        (_, _, _, done, _, tokens, scores, n_steps) = jax.lax.while_loop(
            w_cond, w_body,
            (jnp.asarray(0, jnp.int32), tokens, scores, done0, tokens,
             tokens, jnp.zeros(tokens.shape, jnp.float32),
             jnp.zeros((tokens.shape[0],), jnp.int32)),
        )
    else:
        (_, _, done, _, tokens, scores), ys = jax.lax.scan(
            step_fn,
            (tokens, scores, done0, tokens, tokens,
             jnp.zeros(tokens.shape, jnp.float32)),
            jnp.arange(max_step),
        )
        if retain_history:
            steps, history = ys  # history: [S, B*, T] filled canvas per step
        else:
            steps = ys
        n_steps = jnp.sum(steps, axis=0)

    if length_beam > 1:
        if reranker is not None:
            # AR reranking over the beam candidates: score each finalized
            # canvas by teacher-forced AR log-prob on the repeated source
            ar_model, ar_variables = reranker
            assert kf == 1, "AR reranking expects unit-level candidates"
            src_rep = jnp.repeat(src, length_beam, axis=0)
            len_rep = jnp.repeat(src_lengths, length_beam, axis=0)
            sel_score = ar_rerank_scores(
                ar_model, ar_variables, src_rep, len_rep, tokens
            )
        else:
            non_pad = tokens != PAD
            sel_score = jnp.sum(scores * non_pad, axis=1) / jnp.maximum(
                jnp.sum(non_pad, axis=1), 1
            )
        sel_score = sel_score.reshape(-1, length_beam)
        best = jnp.argmax(sel_score, axis=1)
        rows = jnp.arange(best.shape[0])
        tokens = tokens.reshape(-1, length_beam, tokens.shape[-1])[rows, best]
        scores = scores.reshape(-1, length_beam, scores.shape[-1])[rows, best]
        # keep n_steps aligned with the returned [B] rows (it was [B*beam])
        n_steps = n_steps.reshape(-1, length_beam)[rows, best]
        if history is not None:
            s = history.shape[0]
            history = history.reshape(s, -1, length_beam, history.shape[-1])[
                :, rows, best
            ]
    if kf > 1:
        from diffnorm_tpu.models.stacked import unpack_units

        sub = unpack_units(tokens, sub_vocab, kf)  # specials pass through
        tokens = sub.reshape(tokens.shape[0], -1)
        scores = jnp.repeat(scores, kf, axis=1)
        if history is not None:
            s, bh = history.shape[0], history.shape[1]
            hsub = unpack_units(history.reshape(-1, history.shape[-1]),
                                sub_vocab, kf)
            history = hsub.reshape(s, bh, -1)
    if retain_history:
        return tokens, scores, n_steps, history
    return tokens, scores, n_steps


def mask_predict_decode_chunked(model, variables, src, src_lengths, *,
                                chunk: int = 4, **kw):
    """mask_predict_decode over `chunk`-row sub-batches via lax.map.

    NEGATIVE RESULT, kept as an opt-in knob (default off at call sites):
    standalone B4 decode measures 1015 utts/s vs ~640 at B8-B32 (same
    VMEM-fusion knee as the vocoder), but the win does not survive
    composition — inside lax.map the same B4 body runs ~2x slower and
    B16 throughput drops 588 -> 526 utts/s (e2e RTF 880 -> 868). The
    vocoder's chunking (s2st._chunked_vocoder) DOES compose; the decode's
    does not (scan-carried buffer allocation differs). chunk=0 disables.
    Pads by replicating the last row, slices back to B."""
    b = src.shape[0]
    if chunk <= 0 or b <= chunk:
        return mask_predict_decode(model, variables, src, src_lengths, **kw)
    pad = (-b) % chunk

    def pad_rows(x):
        if not pad:
            return x
        return jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], 0)

    def to_chunks(x):
        n = x.shape[0] // chunk
        return x.reshape((n, chunk) + x.shape[1:])

    src = to_chunks(pad_rows(src))
    src_lengths = to_chunks(pad_rows(src_lengths))
    # per-row arrays ride the chunking alongside src (true_length canvas
    # forcing, tgt_speaker conditioning)
    row_keys = [k for k in ("true_length", "tgt_speaker")
                if kw.get(k) is not None]
    row_vals = tuple(to_chunks(pad_rows(kw.pop(k))) for k in row_keys)
    for k in ("true_length", "tgt_speaker"):
        kw.pop(k, None)
    mapped = (src, src_lengths) + row_vals
    body = lambda sl: mask_predict_decode(  # noqa: E731
        model, variables, sl[0], sl[1],
        **dict(zip(row_keys, sl[2:])), **kw
    )
    n = src.shape[0]
    outs = jax.lax.map(body, mapped)
    unchunk = lambda x: x.reshape((n * chunk,) + x.shape[2:])[:b]  # noqa: E731
    if len(outs) == 4:  # retain_history: [n, S, chunk, T] -> [S, B, T]
        hist = outs[3]
        s = hist.shape[1]
        hist = jnp.transpose(hist, (1, 0, 2, 3)).reshape(
            s, n * chunk, hist.shape[-1]
        )[:, :b]
        return unchunk(outs[0]), unchunk(outs[1]), unchunk(outs[2]), hist
    return unchunk(outs[0]), unchunk(outs[1]), unchunk(outs[2])


def jit_decoder(model, max_iter: int = 15, max_len: int = 256,
                cond_scale: float = 1.0, length_beam: int = 1):
    """Build a jitted decode fn (variables, src, src_lengths) -> outputs."""

    @functools.partial(jax.jit, static_argnames=())
    def fn(variables, src, src_lengths):
        return mask_predict_decode(
            model, variables, src, src_lengths,
            max_iter=max_iter, max_len=max_len,
            cond_scale=cond_scale, length_beam=length_beam,
        )

    return fn
