"""UnitY two-pass generation: beam-search the first-pass MT text decoder,
hand its best hypothesis to the text-to-unit encoder, then beam-search the
unit decoder.

Reference: examples/speech_to_speech/unity/sequence_generator_multi_decoder.py
(MultiDecoderSequenceGenerator._generate): pass-1 beam over tgt_dict_mt,
host-side rebuild of prev_output_tokens_mt from the best hypothesis
(:193-205), mt_decoder features_only re-run (:219-226), optional
synthesizer_encoder (:231-244), pass-2 beam over units (:256-265).

TPU redesign: the inter-pass handoff is a static-shape in-graph rewrite
(the [B, L] pass-1 hypothesis buffer becomes prev tokens by a masked
shift), so the whole two-pass pipeline jits into ONE program — no
host round-trip between passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffnorm_tpu.generate.beam_search import beam_search

PAD, BOS, EOS, UNK = 1, 0, 2, 3


def _beam_pass(module, variables, method, ctx, ctx_mask, batch_size,
               beam_size, max_len, vocab, **beam_kwargs):
    """One cached-decoder beam pass. `method` is the module's step method
    (decode_mt_step / decode_step) with signature
    (token [N,1], ctx, ctx_mask, position [N], max_decode_len)."""
    n = batch_size * beam_size
    ctx_rep = jnp.repeat(ctx, beam_size, axis=0)
    mask_rep = jnp.repeat(ctx_mask, beam_size, axis=0)
    _, cache_vars = module.apply(
        variables,
        jnp.full((n, 1), EOS, jnp.int32), ctx_rep, mask_rep,
        jnp.zeros((n,), jnp.int32), max_len,
        method=method, mutable=["cache"],
    )
    cache0 = jax.tree_util.tree_map(jnp.zeros_like, cache_vars["cache"])
    params_only = {k: v for k, v in variables.items() if k != "cache"}

    def step(cache, tokens, positions):
        logits, mutated = module.apply(
            {**params_only, "cache": cache},
            tokens, ctx_rep, mask_rep, positions, max_len,
            method=method, mutable=["cache"],
        )
        return logits, mutated["cache"]

    return beam_search(step, cache0, batch_size, beam_size, max_len, vocab,
                       **beam_kwargs)


def unity_generate(
    model,
    variables,
    src,
    src_lengths,
    beam_size: int = 5,
    beam_size_mt: int = 5,
    max_len: int = 256,
    max_len_mt: int = 256,
    min_len: int = 1,
    len_penalty: float = 1.0,
    len_penalty_mt: float = 1.0,
    no_repeat_ngram: int = 0,
    unk_penalty: float = 0.0,
    tgt_speaker=None,
):
    """Returns (unit_seqs [B, K, L], unit_scores [B, K], mt_best [B, Lmt]).
    mt_best is the selected first-pass text hypothesis (with terminating
    EOS) — the reference prints it per sample (:207-216)."""
    module = model.module
    if isinstance(variables, (list, tuple)):
        variables = variables[0]  # no ensemble support (reference likewise)

    # --target-speaker-embed conditioning at inference (reference passes
    # tgt_speaker into the encoder, s2s_conformer_unity.py:219-227)
    enc_kw = {} if tgt_speaker is None else {"tgt_speaker": tgt_speaker}
    enc, enc_mask = module.apply(variables, src, src_lengths,
                                 method="encode", **enc_kw)
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
    # :193-205 moves the terminating eos to the front)
    shifted = jnp.concatenate(
        [jnp.full((b, 1), EOS, best_mt.dtype), best_mt[:, :-1]], axis=1)
    prev_mt = jnp.where(best_mt == PAD, PAD, shifted)

    # ---- handoff: teacher-forced features + t2u encoder ----
    feats = module.apply(variables, prev_mt, enc, enc_mask,
                         method="mt_features")
    t2u, t2u_mask = module.apply(variables, feats, prev_mt != PAD,
                                 method="synthesize")

    # ---- pass 2: unit beam over the t2u context ----
    seqs, scores = _beam_pass(
        module, variables, "decode_step", t2u, t2u_mask, b, beam_size,
        max_len, module.vocab_size,
        min_len=min_len, len_penalty=len_penalty,
        no_repeat_ngram=no_repeat_ngram, unk_penalty=unk_penalty,
    )
    return seqs, scores, best_mt
