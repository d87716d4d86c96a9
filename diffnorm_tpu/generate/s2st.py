"""Fused end-to-end S2ST serving path: one XLA program per batch.

The reference pipeline (SURVEY §3.4-3.5) spans three processes and two
text-file round trips: `fairseq-generate` (NAR mask-predict decode,
research/TranSpeech/iterative_refinement_generator.py) writes unit
hypotheses, `generate_waveform_from_code.py` re-reads them and runs
code-HiFi-GAN per utterance. TPU-native, the whole chain compiles into a
single jitted program:

  conformer encode -> mask-predict lax.scan -> special-token strip +
  consecutive dedup (left-pack scatter) -> duration prediction ->
  in-jit repeat_interleave (cumsum + searchsorted gather,
  codehifigan.py:55-76 parity) -> HiFi-GAN synthesis

No host round trips between stages; ragged boundaries ride along as
masks/lengths. This is the serving-path counterpart of the offline CLIs
(cli/generate.py + cli/generate_waveform.py), which remain for recipe
parity.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from diffnorm_tpu.generate.mask_predict import mask_predict_decode_chunked
from diffnorm_tpu.ops.unit_reduce import reduce_units_padded

UNIT_OFFSET = 4  # dictionary specials bos/pad/eos/unk = 0..3


def expand_units_padded(
    units: jnp.ndarray, durations: jnp.ndarray, max_out: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Jit-able repeat_interleave: units [T], durations [T] (0 on invalid
    positions) -> (expanded [max_out], mask [max_out]). Overflow beyond
    max_out is truncated; callers size max_out from the duration cap."""
    ends = jnp.cumsum(durations.astype(jnp.int32))
    total = ends[-1]
    pos = jnp.arange(max_out, dtype=jnp.int32)
    seg = jnp.searchsorted(ends, pos, side="right")
    out = jnp.take(units, jnp.clip(seg, 0, units.shape[0] - 1), axis=0)
    mask = pos < total
    return jnp.where(mask, out, 0), mask


def strip_and_reduce_tokens(tokens: jnp.ndarray):
    """Dictionary tokens [B, T] -> (packed units [B, T], packed_valid
    [B, T], reduced units [B, T], counts [B]), all 0-based unit ids.

    Reference order (generate_waveform_from_code.py: strip invalid codes,
    THEN `--reduce` dedups consecutive duplicates in the packed stream) —
    a special-token gap does not break a run."""
    valid = tokens >= UNIT_OFFSET
    units_raw = jnp.where(valid, tokens - UNIT_OFFSET, 0).astype(jnp.int32)
    t = tokens.shape[1]
    pos = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
    idx = jnp.where(valid, pos, t)
    packed = jnp.zeros_like(units_raw)
    packed = jax.vmap(
        lambda p, i, u: p.at[i].set(u, mode="drop")
    )(packed, idx, units_raw)
    n_valid = jnp.sum(valid, axis=1)
    packed_valid = jnp.arange(t)[None, :] < n_valid[:, None]
    reduced, _keep, counts = jax.vmap(reduce_units_padded)(packed,
                                                           packed_valid)
    return packed, packed_valid, reduced, counts


def s2st_generate(
    nar_model,
    nar_variables,
    vocoder_module,
    vocoder_variables,
    src: jnp.ndarray,
    src_lengths: jnp.ndarray,
    *,
    max_iter: int = 15,
    max_len: int = 256,
    cond_scale: float = 1.0,
    length_beam: int = 1,
    dur_prediction: bool = True,
    max_duration: int = 8,
    max_wav_units: Optional[int] = None,
    spkr: Optional[jnp.ndarray] = None,
    vocoder_chunk: int = 4,
    decode_chunk: int = 0,
    tgt_speaker: Optional[jnp.ndarray] = None,
    return_steps: bool = False,
):
    """Speech (fbank) in, waveform out, fully on device.

    Returns (wav [B, max_wav_units*320], wav_lengths [B], units [B, T],
    unit_counts [B]): `units` are the reduced raw unit ids (0-based, pad 0
    past count), `wav_lengths` in samples. With dur_prediction=False the
    decoded unit stream drives the vocoder un-expanded (reference
    --dur-prediction off). `tgt_speaker` [B, D] conditions the NAR decode
    (--target-speaker-embed); `spkr` [B] selects the multi-speaker
    vocoder's speaker embedding. `return_steps` appends the per-row
    mask-predict iteration counts [B] (decode-difficulty reporting —
    bench.py states the e2e RTF's measured difficulty with it).
    """
    tokens, _scores, n_steps = mask_predict_decode_chunked(
        nar_model, nar_variables, src, src_lengths, chunk=decode_chunk,
        max_iter=max_iter, max_len=max_len, cond_scale=cond_scale,
        length_beam=length_beam, tgt_speaker=tgt_speaker,
    )
    packed, packed_valid, reduced, counts = strip_and_reduce_tokens(tokens)
    t = reduced.shape[1]
    reduced_valid = jnp.arange(t)[None, :] < counts[:, None]
    reduced = jnp.where(reduced_valid, reduced, 0)

    if dur_prediction:
        durs = vocoder_module.apply(
            vocoder_variables, reduced, method="predict_durations"
        )
        durs = jnp.clip(durs, 1, max_duration)
        code = reduced
    else:
        durs = jnp.ones_like(reduced)
        code = packed
        reduced_valid = packed_valid
    durs = jnp.where(reduced_valid, durs, 0)

    if max_wav_units is None:
        max_wav_units = code.shape[1] * (max_duration if dur_prediction else 1)
    expanded, wav_unit_mask = jax.vmap(
        lambda u, d: expand_units_padded(u, d, max_wav_units)
    )(code, durs)

    wav = _chunked_vocoder(
        vocoder_module, vocoder_variables, expanded, spkr, vocoder_chunk
    )
    upsample = wav.shape[-1] // max_wav_units
    wav_lengths = jnp.sum(wav_unit_mask, axis=-1) * upsample
    if return_steps:
        return wav, wav_lengths, reduced, counts, n_steps
    return wav, wav_lengths, reduced, counts


def _chunked_vocoder(module, variables, codes, spkr, chunk: int):
    """Run HiFi-GAN over sub-batches of `chunk` rows via lax.map.

    Measured on v5e (T=384 unit canvas): per-row synthesis cost is flat up
    to ~4 rows and then cliffs — B4 runs at RTF 2539/row-equivalent, B8 at
    1362, B16 at 1040 (the waveform-rate activations fall out of the
    VMEM-resident fusion regime). Four-row chunks inside one jitted
    program keep the whole batch in the fast regime: B16xT384 synthesis
    drops ~118 ms -> ~48 ms. chunk=0 disables chunking."""
    b = codes.shape[0]
    if chunk <= 0 or b <= chunk:
        return module.apply(variables, codes, spkr)
    pad_b = (-b) % chunk
    if pad_b:
        codes = jnp.pad(codes, ((0, pad_b), (0, 0)))
        if spkr is not None:
            spkr = jnp.pad(spkr, ((0, pad_b),) + ((0, 0),) * (spkr.ndim - 1))
    n = codes.shape[0] // chunk
    codes = codes.reshape((n, chunk) + codes.shape[1:])
    if spkr is None:
        wav = jax.lax.map(lambda c: module.apply(variables, c, None), codes)
    else:
        spkr = spkr.reshape((n, chunk) + spkr.shape[1:])
        wav = jax.lax.map(
            lambda cs: module.apply(variables, cs[0], cs[1]), (codes, spkr)
        )
    wav = wav.reshape((n * chunk,) + wav.shape[2:])
    return wav[:b]
