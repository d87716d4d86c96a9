"""Full beam-search LOOP parity against the REAL fairseq SequenceGenerator.

Drives the genuine fairseq/sequence_generator.py generate() loop (loaded
verbatim, with the real search.BeamSearch and NGramRepeatBlock) against
our jitted generate/beam_search.py on a shared deterministic toy
encoder-decoder: finalized hypotheses, their order, and their normalized
scores must match across beam sizes, length penalties, unk penalties,
min/max-length constraints, ngram blocking, and prefix forcing.

The toy decoder is a running-mean-of-embeddings model so the JAX side can
decode incrementally (cache = cumulative embedding sum) while the torch
side recomputes the full prefix each step, exactly like fairseq's
non-incremental decoder path (EnsembleModel.forward_decoder).
"""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from reference_loader import load_sequence_generator  # noqa: E402

from diffnorm_tpu.generate.beam_search import EOS, PAD, beam_search  # noqa: E402

B, S, D, H, V = 3, 6, 5, 12, 24
MAX_LEN = 10  # total emitted length incl. eos (fairseq max_len = 9)


class _ToyDict:
    def pad(self):
        return 1

    def unk(self):
        return 3

    def eos(self):
        return 2

    def bos(self):
        return 0

    def __len__(self):
        return V


def _weights(seed=0):
    r = np.random.default_rng(seed)
    w = {
        "w_e": (r.normal(size=(D, H)) / np.sqrt(D)).astype(np.float32),
        "emb": r.normal(size=(V, H)).astype(np.float32),
        "pos": r.normal(size=(MAX_LEN + 2, H)).astype(np.float32),
        "w_o": (r.normal(size=(H, V)) / np.sqrt(H)).astype(np.float32),
    }
    w["w_o"][:, :4] *= 0.2  # keep specials plausible but not dominant
    return w


class _Encoder(torch.nn.Module):
    def __init__(self, w):
        super().__init__()
        self.w = {k: torch.from_numpy(np.asarray(v)) for k, v in w.items()}

    def forward_torchscript(self, net_input):
        feats = net_input["features"]
        pad = net_input["padding_mask"]
        enc = torch.tanh(feats @ self.w["w_e"])
        valid = (~pad).float().unsqueeze(-1)
        pooled = (enc * valid).sum(1) / valid.sum(1)
        return {"pooled": [pooled]}

    def reorder_encoder_out(self, encoder_out, new_order):
        return {"pooled": [encoder_out["pooled"][0].index_select(0, new_order)]}


class _Decoder(torch.nn.Module):
    """Non-incremental toy decoder: h_t = tanh(emb(x_t) + mean(emb(x_<=t))
    + pooled + pos_t). Deliberately NOT a FairseqIncrementalDecoder so the
    real EnsembleModel takes the full-prefix re-decode path."""

    def __init__(self, w):
        super().__init__()
        self.w = {k: torch.from_numpy(np.asarray(v)) for k, v in w.items()}

    def forward(self, tokens, encoder_out=None, **kw):
        pooled = encoder_out["pooled"][0]
        e = self.w["emb"][tokens]  # [N, T, H]
        csum = torch.cumsum(e, dim=1)
        cnt = torch.arange(1, tokens.shape[1] + 1).view(1, -1, 1).float()
        h = torch.tanh(
            e + csum / cnt + pooled[:, None, :]
            + self.w["pos"][: tokens.shape[1]]
        )
        return h @ self.w["w_o"], None


class _ToyModel(torch.nn.Module):
    def __init__(self, w):
        super().__init__()
        self.encoder = _Encoder(w)
        self.decoder = _Decoder(w)

    def get_normalized_probs(self, net_output, log_probs, sample=None):
        out = net_output[0] if isinstance(net_output, tuple) else net_output
        return torch.log_softmax(out, -1) if log_probs else torch.softmax(out, -1)

    def max_decoder_positions(self):
        return 1024


def _inputs(seed=1):
    r = np.random.default_rng(seed)
    src = r.normal(size=(B, S, D)).astype(np.float32)
    lengths = np.array([S, 4, 2], np.int64)
    for i, n in enumerate(lengths):
        src[i, n:] = 0.0
    pad_mask = np.arange(S)[None, :] >= lengths[:, None]
    return src, pad_mask


def _run_reference(w, beam, **kw):
    sg_mod = load_sequence_generator()
    model = _ToyModel(w)
    gen = sg_mod.SequenceGenerator(
        [model], _ToyDict(), beam_size=beam, max_len_a=0,
        max_len_b=MAX_LEN - 1, **{k: v for k, v in kw.items()
                                  if k != "prefix_tokens"},
    )
    src, pad_mask = _inputs()
    sample = {
        "net_input": {
            "features": torch.from_numpy(src),
            "padding_mask": torch.from_numpy(pad_mask),
        }
    }
    prefix = kw.get("prefix_tokens")
    with torch.no_grad():
        return gen._generate(
            sample,
            prefix_tokens=(torch.from_numpy(prefix)
                           if prefix is not None else None),
        )


def _run_ours(w, beam, min_len=1, len_penalty=1.0, unk_penalty=0.0,
              no_repeat_ngram_size=0, prefix_tokens=None, **kw):
    src, pad_mask = _inputs()
    enc = jnp.tanh(jnp.asarray(src) @ jnp.asarray(w["w_e"]))
    valid = jnp.asarray(~pad_mask)[..., None].astype(jnp.float32)
    pooled = (enc * valid).sum(1) / valid.sum(1)
    pooled = jnp.repeat(pooled, beam, axis=0)  # [N, H]
    emb, pos, w_o = map(jnp.asarray, (w["emb"], w["pos"], w["w_o"]))
    n = B * beam

    def decode_step(cache, prev, positions):
        csum, cnt = cache
        e = emb[prev[:, 0]]  # [N, H]
        csum = csum + e
        cnt = cnt + 1.0
        h = jnp.tanh(e + csum / cnt[:, None] + pooled
                     + pos[positions[0] + 0])
        return h @ w_o, (csum, cnt)

    cache0 = (jnp.zeros((n, H), jnp.float32), jnp.zeros((n,), jnp.float32))
    return beam_search(
        decode_step, cache0, B, beam, MAX_LEN, V, min_len=min_len,
        len_penalty=len_penalty, unk_penalty=unk_penalty,
        no_repeat_ngram=no_repeat_ngram_size,
        prefix_tokens=(jnp.asarray(prefix_tokens)
                       if prefix_tokens is not None else None),
    )


def _assert_match(finalized, seqs, scores, beam):
    seqs, scores = np.asarray(seqs), np.asarray(scores)
    for i, hyps in enumerate(finalized):
        assert len(hyps) == beam
        for j, hyp in enumerate(hyps):
            ref_tok = hyp["tokens"].numpy()
            got = seqs[i, j][seqs[i, j] != PAD]
            np.testing.assert_array_equal(
                got, ref_tok, err_msg=f"sent {i} hyp {j}"
            )
            assert scores[i, j] == pytest.approx(float(hyp["score"]),
                                                 rel=1e-4), (i, j)


@pytest.mark.parametrize("beam", [1, 2, 4])
def test_beam_loop_matches_reference(beam):
    w = _weights()
    finalized = _run_reference(w, beam)
    seqs, scores = _run_ours(w, beam)
    _assert_match(finalized, seqs, scores, beam)


def test_length_and_unk_penalties_match_reference():
    w = _weights(2)
    kw = dict(len_penalty=1.7, unk_penalty=0.8, min_len=3)
    finalized = _run_reference(w, 4, **kw)
    seqs, scores = _run_ours(w, 4, **kw)
    _assert_match(finalized, seqs, scores, 4)


def test_ngram_blocking_matches_reference():
    w = _weights(3)
    kw = dict(no_repeat_ngram_size=2)
    finalized = _run_reference(w, 3, **kw)
    seqs, scores = _run_ours(w, 3, **kw)
    _assert_match(finalized, seqs, scores, 3)


def test_prefix_tokens_match_reference():
    w = _weights(4)
    prefix = np.array([[5, 6], [7, PAD], [PAD, PAD]], np.int64)
    finalized = _run_reference(w, 3, prefix_tokens=prefix)
    seqs, scores = _run_ours(w, 3, prefix_tokens=prefix.astype(np.int32))
    _assert_match(finalized, seqs, scores, 3)
