"""Levenshtein transformer (insertion/deletion NAT).

Capability parity with fairseq/models/nat/levenshtein_transformer.py +
levenshtein_utils.py (which lean on the libnat C++/CUDA edit ops): a shared
NAT decoder body with three heads —

* deletion classifier (keep/delete per token)
* placeholder classifier (how many masks to insert in each adjacent slot,
  capped at 255)
* token classifier (fill inserted unk placeholders)

Training supervision comes from the native LCS edit-path op
(csrc `edit_path_batch`, the libnat equivalent) computed host-side in the
task; the three CE losses live in criterions/levenshtein_loss.py. Decoding
iterates delete -> insert -> fill; length changes happen on the host between
jitted scoring calls (XLA-static per length bucket).
"""

from __future__ import annotations

import ctypes
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diffnorm_tpu.config import Config
from diffnorm_tpu.models.cmlm_text import TextEncoder
from diffnorm_tpu.models.nar_transformer import (
    BOS,
    EOS,
    PAD,
    UNK,
    DecoderLayer,
)
from diffnorm_tpu.models.layers import sinusoidal_positions
from diffnorm_tpu.models.vae import ModelHolder
from diffnorm_tpu.registry import register_architecture, register_model

MAX_INS = 256  # placeholder-count classes (reference embed 256)


def edit_path_targets(prev: np.ndarray, tgt: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side supervision: (del_tgt [B, P], ins_tgt [B, P+1])."""
    from diffnorm_tpu.data.batching import _load_native

    prev = np.ascontiguousarray(prev, np.int32)
    tgt = np.ascontiguousarray(tgt, np.int32)
    b, plen = prev.shape
    tlen = tgt.shape[1]
    del_tgt = np.zeros((b, plen), np.int32)
    ins_tgt = np.zeros((b, plen + 1), np.int32)
    lib = _load_native()
    if lib:
        lib.edit_path_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.edit_path_batch(
            prev.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            tgt.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            b, plen, tlen, PAD,
            del_tgt.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ins_tgt.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        return del_tgt, ins_tgt
    # numpy fallback (same LCS alignment)
    for s in range(b):
        p = prev[s][prev[s] != PAD]
        t = tgt[s][tgt[s] != PAD]
        pn, tn = len(p), len(t)
        dp = np.zeros((pn + 1, tn + 1), np.int64)
        for i in range(1, pn + 1):
            for j in range(1, tn + 1):
                dp[i, j] = (dp[i - 1, j - 1] + 1 if p[i - 1] == t[j - 1]
                            else max(dp[i - 1, j], dp[i, j - 1]))
        i, j = pn, tn
        match_t = np.full(pn, -1, np.int64)
        while i > 0 and j > 0:
            if p[i - 1] == t[j - 1] and dp[i, j] == dp[i - 1, j - 1] + 1:
                match_t[i - 1] = j - 1
                i, j = i - 1, j - 1
            elif dp[i - 1, j] >= dp[i, j - 1]:
                del_tgt[s, i - 1] = 1
                i -= 1
            else:
                j -= 1
        while i > 0:
            del_tgt[s, i - 1] = 1
            i -= 1
        slot, tj = 0, 0
        for pi in range(pn):
            if del_tgt[s, pi]:
                continue
            ins_tgt[s, slot] = match_t[pi] - tj
            tj = match_t[pi] + 1
            slot += 1
        ins_tgt[s, slot] = tn - tj
    return del_tgt, ins_tgt


class LevenshteinDecoder(nn.Module):
    vocab_size: int
    dim: int = 512
    ffn_dim: int = 2048
    layers: int = 6
    heads: int = 8
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embed_tokens = nn.Embed(
            self.vocab_size, self.dim,
            embedding_init=nn.initializers.normal(self.dim ** -0.5),
            dtype=self.dtype, name="embed_tokens",
        )
        self.dec_layers = [
            DecoderLayer(dim=self.dim, ffn_dim=self.ffn_dim, heads=self.heads,
                         dropout=self.dropout, dtype=self.dtype,
                         name=f"layer_{i}")
            for i in range(self.layers)
        ]
        self.final_norm = nn.LayerNorm(dtype=self.dtype, name="layer_norm")
        self.embed_dropout = nn.Dropout(self.dropout)
        self.del_head = nn.Dense(2, dtype=self.dtype, name="del_head")
        self.ins_head = nn.Dense(MAX_INS, dtype=self.dtype, name="ins_head")

    def features(self, tokens, enc, enc_mask, deterministic: bool = True):
        valid = tokens != PAD
        x = self.embed_tokens(tokens) * math.sqrt(self.dim)
        x = x + sinusoidal_positions(valid, self.dim, padding_idx=PAD).astype(
            x.dtype
        )
        x = self.embed_dropout(x, deterministic=deterministic)
        for layer in self.dec_layers:
            x = layer(x, valid, enc, enc_mask, deterministic=deterministic)
        return self.final_norm(x)

    def __call__(self, tokens, enc, enc_mask, deterministic: bool = True):
        """Returns (word_logits [B,T,V], del_logits [B,T,2],
        ins_logits [B,T-1,MAX_INS] over adjacent slots)."""
        feats = self.features(tokens, enc, enc_mask, deterministic)
        word_logits = self.embed_tokens.attend(feats)
        del_logits = self.del_head(feats)
        pair = jnp.concatenate([feats[:, :-1], feats[:, 1:]], axis=-1)
        ins_logits = self.ins_head(pair)
        return word_logits, del_logits, ins_logits


class LevenshteinModule(nn.Module):
    src_vocab_size: int
    tgt_vocab_size: int
    dim: int = 512
    ffn_dim: int = 2048
    encoder_layers: int = 6
    decoder_layers: int = 6
    heads: int = 8
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = TextEncoder(
            vocab_size=self.src_vocab_size, dim=self.dim, ffn_dim=self.ffn_dim,
            layers=self.encoder_layers, heads=self.heads, dropout=self.dropout,
            dtype=self.dtype, name="encoder",
        )
        self.decoder = LevenshteinDecoder(
            vocab_size=self.tgt_vocab_size, dim=self.dim, ffn_dim=self.ffn_dim,
            layers=self.decoder_layers, heads=self.heads, dropout=self.dropout,
            dtype=self.dtype, name="decoder",
        )

    def encode(self, src_tokens, src_lengths=None, deterministic: bool = True):
        return self.encoder(src_tokens, deterministic=deterministic)

    def decode(self, tokens, enc, enc_mask, deterministic: bool = True):
        return self.decoder(tokens, enc, enc_mask, deterministic=deterministic)

    def __call__(self, src_tokens, src_lengths, prev_del, prev_kept, prev_ins,
                 deterministic: bool = True):
        """Dual-policy training forward (reference LevT forward — one decoder
        pass per canvas, as in fairseq):

        prev_del : full-length corrupted canvas, scored for deletion
        prev_kept: post-deletion kept tokens (left-packed), scored for how
                   many placeholders to insert per adjacent slot
        prev_ins : canvas with unk placeholders, scored for word filling
        """
        enc, enc_mask = self.encoder(src_tokens, deterministic=deterministic)
        _, del_logits, _ = self.decoder(
            prev_del, enc, enc_mask, deterministic=deterministic
        )
        _, _, ins_logits = self.decoder(
            prev_kept, enc, enc_mask, deterministic=deterministic
        )
        word_logits, _, _ = self.decoder(
            prev_ins, enc, enc_mask, deterministic=deterministic
        )
        return dict(
            del_logits=del_logits,
            ins_logits=ins_logits,
            word_logits=word_logits,
        )


@register_model("levenshtein")
class LevenshteinModel(ModelHolder):
    @classmethod
    def build_model(cls, cfg: Config, task=None) -> "LevenshteinModel":
        src_vocab = cfg.get("src_vocab_size")
        tgt_vocab = cfg.get("vocab_size")
        if task is not None:
            if src_vocab is None and getattr(task, "src_dict", None) is not None:
                src_vocab = len(task.src_dict)
            if tgt_vocab is None and task.target_dictionary is not None:
                tgt_vocab = len(task.target_dictionary)
        module = LevenshteinModule(
            src_vocab_size=src_vocab or 32000,
            tgt_vocab_size=tgt_vocab or 32000,
            dim=cfg.get("encoder_embed_dim", 512),
            ffn_dim=cfg.get("encoder_ffn_embed_dim", 2048),
            encoder_layers=cfg.get("encoder_layers", 6),
            decoder_layers=cfg.get("decoder_layers", 6),
            heads=cfg.get("encoder_attention_heads", 8),
            dropout=cfg.get("dropout", 0.1),
            dtype=jnp.dtype(cfg.get("dtype", "float32")),
        )
        return cls(module=module, cfg=cfg)


@register_architecture("levenshtein", "levenshtein_transformer")
def levenshtein_arch(cfg: Config):
    cfg.setdefault("encoder_embed_dim", 512)
    cfg.setdefault("decoder_layers", 6)


# ------------------------------------------------------------ decoding ----

def _left_pack(tokens, keep):
    """Left-pack kept tokens into a PAD-padded row (order-preserving).
    tokens/keep: [B, L] -> [B, L]."""
    b, l = tokens.shape
    pos = jnp.cumsum(keep, axis=1) - 1  # destination of each kept token
    dest = jnp.where(keep, pos, l)  # dropped tokens scatter into overflow
    buf = jnp.full((b, l + 1), PAD, tokens.dtype)
    rows = jnp.arange(b)[:, None]
    return buf.at[rows, dest].set(tokens)[:, :l]


def apply_del_words(canvas, del_pred):
    """Delete non-special tokens where del_pred is True and left-pack
    (reference levenshtein_utils._apply_del_words:203-229 on a fixed-width
    canvas: pads count as deleted, bos/eos never delete; parity-tested vs
    the VERBATIM reference helper in tests/test_reference_parity.py)."""
    valid = canvas != PAD
    special = (canvas == BOS) | (canvas == EOS)
    keep = valid & (special | ~del_pred)
    return _left_pack(canvas, keep)


def apply_ins_masks(packed, n_ins):
    """Insert n_ins[b, j] UNK placeholders between consecutive real tokens
    j and j+1 (reference levenshtein_utils._apply_ins_masks:155-186,
    re-expressed on a fixed-width canvas: cumulative insertions clip to the
    static budget instead of growing the row; parity-tested vs the VERBATIM
    reference helper where the budget does not bind)."""
    b, l = packed.shape
    pvalid = packed != PAD
    n_tok = jnp.sum(pvalid, axis=1)
    slot_ok = pvalid[:, :-1] & pvalid[:, 1:]  # both neighbours real
    n_ins = jnp.where(slot_ok, n_ins, 0)
    budget = (l - n_tok)[:, None]
    cum = jnp.minimum(jnp.cumsum(n_ins, axis=1), budget)
    offset = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32), cum], axis=1
    )  # [B, L]: insertions strictly before token j
    new_pos = jnp.arange(l)[None, :] + offset
    new_len = n_tok + cum[:, -1]
    dest = jnp.where(pvalid, jnp.minimum(new_pos, l), l)
    buf = jnp.full((b, l + 1), UNK, jnp.int32)
    rows = jnp.arange(b)[:, None]
    expanded = buf.at[rows, dest].set(jnp.where(pvalid, packed, UNK))[:, :l]
    return jnp.where(
        jnp.arange(l)[None, :] < new_len[:, None], expanded, PAD
    )


def levenshtein_decode_jit(
    model, variables, src_tokens, src_lengths, max_iter: int = 10,
    max_len: int = 200, eos_penalty: float = 0.0,
):
    """Fully jitted LevT decoding: one lax.scan over max_iter iterations of
    delete -> (re-score) insert placeholders -> (re-score) fill, all on a
    static [B, max_len] canvas (the reference's dynamic-width host loop,
    levenshtein_transformer.py forward_decoder, re-expressed shape-statically
    so XLA compiles ONE program instead of one per canvas width).

    Three decoder passes per iteration, matching the reference's policy of
    scoring insertion on the post-deletion canvas and words on the
    post-insertion canvas. Converged rows freeze. Returns canvas [B, max_len].

    `variables` may be a LIST of parameter trees (same architecture): the
    word/delete/insert head scores are averaged across models per pass
    (reference EnsembleLevT, fairseq/models/nat/nonautoregressive_ensembles.py
    — logsumexp of per-model log-probs - log M).
    """
    module = model.module
    vlist = (list(variables) if isinstance(variables, (list, tuple))
             else [variables])
    n_models = len(vlist)
    pairs = [module.apply(v, src_tokens, src_lengths, method="encode")
             for v in vlist]
    b = src_tokens.shape[0]
    l = max_len

    canvas0 = jnp.full((b, l), PAD, jnp.int32)
    canvas0 = canvas0.at[:, 0].set(BOS).at[:, 1].set(EOS)

    def score(tokens):
        outs = [
            module.apply(v, tokens, e, m, method="decode")
            for v, (e, m) in zip(vlist, pairs)
        ]
        if n_models == 1:
            return outs[0]

        def avg(idx):
            lps = jnp.stack([
                jax.nn.log_softmax(o[idx].astype(jnp.float32), axis=-1)
                for o in outs
            ])
            return jax.nn.logsumexp(lps, axis=0) - jnp.log(float(n_models))

        return avg(0), avg(1), avg(2)

    def step(carry, _):
        canvas, finished = carry

        # -- delete --------------------------------------------------------
        _, del_logits, _ = score(canvas)
        packed = apply_del_words(canvas, jnp.argmax(del_logits, -1) == 1)

        # -- insert placeholders --------------------------------------------
        _, _, ins_logits = score(packed)  # [B, L-1, MAX_INS] per slot j,j+1
        if eos_penalty > 0.0:
            # penalize the "insert nothing" class, discouraging early
            # stopping (reference levenshtein_transformer.py:195-196)
            ins_logits = ins_logits.at[..., 0].add(-eos_penalty)
        n_ins = jnp.argmax(ins_logits, -1).astype(jnp.int32)
        expanded = apply_ins_masks(packed, n_ins)

        # -- fill ------------------------------------------------------------
        word_logits, _, _ = score(expanded)
        word_logits = word_logits.at[..., :4].set(-1e30)  # ban specials
        fill = jnp.argmax(word_logits, -1).astype(jnp.int32)
        new_canvas = jnp.where(expanded == UNK, fill, expanded)

        converged = jnp.all(new_canvas == canvas, axis=1)
        out = jnp.where(finished[:, None], canvas, new_canvas)
        return (out, finished | converged), None

    (canvas, _), _ = jax.lax.scan(
        step, (canvas0, jnp.zeros((b,), bool)), None, length=max_iter
    )
    return canvas


def levenshtein_decode(
    model, variables, src_tokens, src_lengths, max_iter: int = 10,
    max_len: int = 200,
):
    """Iterative delete -> insert -> fill decoding (host-orchestrated;
    each scoring pass is one jitted decoder call)."""
    module = model.module
    enc, enc_mask = module.apply(
        variables, src_tokens, src_lengths, method="encode"
    )
    b = src_tokens.shape[0]
    # start from [bos, eos]
    canvas = np.full((b, 2), PAD, np.int32)
    canvas[:, 0] = BOS
    canvas[:, 1] = EOS

    @jax.jit
    def score(tokens):
        return module.apply(variables, tokens, enc, enc_mask, method="decode")

    for _ in range(max_iter):
        word_logits, del_logits, ins_logits = map(
            np.asarray, score(jnp.asarray(canvas))
        )
        new_rows = []
        for i in range(b):
            toks = [t for t in canvas[i] if t != PAD]
            # delete (never bos/eos)
            keep = []
            for j, t in enumerate(toks):
                if t in (BOS, EOS) or del_logits[i, j].argmax() == 0:
                    keep.append(t)
            # insert placeholders
            out = []
            for j, t in enumerate(keep):
                out.append(t)
                if j < len(keep) - 1:
                    n_ins = int(ins_logits[i, min(j, ins_logits.shape[1] - 1)].argmax())
                    out.extend([UNK] * min(n_ins, max_len - len(out)))
            new_rows.append(out[:max_len])
        width = max(len(r) for r in new_rows)
        nxt = np.full((b, width), PAD, np.int32)
        for i, r in enumerate(new_rows):
            nxt[i, : len(r)] = r
        # fill placeholders (specials banned like sp_forward :229-233)
        word_logits, _, _ = score(jnp.asarray(nxt))
        word_logits = np.array(word_logits)
        word_logits[..., :4] = -1e30
        fill = word_logits.argmax(-1)
        filled = np.where(nxt == UNK, fill.astype(np.int32), nxt)
        if filled.shape == canvas.shape and (filled == canvas).all():
            canvas = filled
            break
        canvas = filled
    return canvas
