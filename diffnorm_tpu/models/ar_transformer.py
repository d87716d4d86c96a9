"""Autoregressive S2UT translator (the reference's AR baseline).

Capability parity with fairseq/tasks/ar_speech_to_speech.py ("speech_to_speech_ar",
S2UT transformer of https://arxiv.org/abs/2107.05604) + the fairseq
TransformerDecoder incremental-decoding path: conformer/transformer speech
encoder + causal unit decoder. TPU redesign: incremental decoding uses a
flax "cache" collection (preallocated KV ring per layer, in-place
dynamic-update-slice writes) so the whole beam-search loop jits into one
program (generate/beam_search.py).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffnorm_tpu.config import Config
from diffnorm_tpu.models.conformer import ConformerEncoder
from diffnorm_tpu.models.layers import sinusoidal_positions
from diffnorm_tpu.models.vae import ModelHolder
from diffnorm_tpu.ops.attention import masked_attention
from diffnorm_tpu.registry import register_architecture, register_model

PAD, BOS, EOS, UNK = 1, 0, 2, 3


class CachedMultiheadAttention(nn.Module):
    """MHA with optional autoregressive KV cache.

    decode=False: full-sequence attention (optionally causal).
    decode=True : x is [B, 1, D]; keys/values append into a preallocated
    cache ("cache" collection) at cache_index.
    """

    dim: int
    heads: int
    causal: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask=None, deterministic: bool = True,
                 decode: bool = False, max_decode_len: int = 256):
        h = self.heads
        d = self.dim // h
        ctx = x if context is None else context
        q = nn.Dense(self.dim, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k_proj")(ctx)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v_proj")(ctx)
        b = x.shape[0]

        def heads_of(z):
            return z.reshape(b, -1, h, d).transpose(0, 2, 1, 3)

        q, k, v = heads_of(q), heads_of(k), heads_of(v)

        causal = self.causal
        if decode and context is None:
            # self-attention single step: append to cache
            ck = self.variable(
                "cache", "cached_key",
                lambda: jnp.zeros((b, h, max_decode_len, d), k.dtype),
            )
            cv = self.variable(
                "cache", "cached_value",
                lambda: jnp.zeros((b, h, max_decode_len, d), v.dtype),
            )
            ci = self.variable(
                "cache", "cache_index", lambda: jnp.zeros((), jnp.int32)
            )
            idx = ci.value
            ck.value = jax.lax.dynamic_update_slice(
                ck.value, k, (0, 0, idx, 0)
            )
            cv.value = jax.lax.dynamic_update_slice(
                cv.value, v, (0, 0, idx, 0)
            )
            ci.value = idx + 1
            k, v = ck.value, cv.value
            # valid keys: positions <= idx
            mask = (jnp.arange(max_decode_len) <= idx)[None, :]
            mask = jnp.broadcast_to(mask, (b, max_decode_len))
            causal = False

        rng = None
        if self.dropout > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
        out = masked_attention(
            q, k, v, mask=mask, dropout=self.dropout, dropout_rng=rng,
            causal=causal,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


class ARDecoderLayer(nn.Module):
    dim: int
    ffn_dim: int
    heads: int
    dropout: float
    # --attention-dropout / --relu-dropout (fall back to dropout)
    attention_dropout: Optional[float] = None
    activation_dropout: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, self_mask, enc, enc_mask, deterministic=True,
                 decode=False, max_decode_len: int = 256):
        attn_do = (self.dropout if self.attention_dropout is None
                   else self.attention_dropout)
        act_do = (self.dropout if self.activation_dropout is None
                  else self.activation_dropout)
        res = x
        hmid = nn.LayerNorm(dtype=self.dtype, name="self_attn_layer_norm")(x)
        hmid = CachedMultiheadAttention(
            self.dim, self.heads, causal=True, dropout=attn_do,
            dtype=self.dtype, name="self_attn",
        )(hmid, mask=self_mask, deterministic=deterministic, decode=decode,
          max_decode_len=max_decode_len)
        x = res + nn.Dropout(self.dropout)(hmid, deterministic=deterministic)

        res = x
        hmid = nn.LayerNorm(dtype=self.dtype, name="encoder_attn_layer_norm")(x)
        hmid = CachedMultiheadAttention(
            self.dim, self.heads, dropout=attn_do, dtype=self.dtype,
            name="encoder_attn",
        )(hmid, context=enc, mask=enc_mask, deterministic=deterministic)
        x = res + nn.Dropout(self.dropout)(hmid, deterministic=deterministic)

        res = x
        hmid = nn.LayerNorm(dtype=self.dtype, name="final_layer_norm")(x)
        hmid = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(hmid)
        hmid = nn.relu(hmid)
        hmid = nn.Dropout(act_do)(hmid, deterministic=deterministic)
        hmid = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(hmid)
        hmid = nn.Dropout(self.dropout)(hmid, deterministic=deterministic)
        return res + hmid


class ARUnitDecoder(nn.Module):
    """Causal unit decoder. With n_frames_per_step > 1 it emits k stacked
    sub-frame unit distributions per decoder step (reference
    TransformerUnitDecoder out_proj_n_frames, nar_transformer.py:104-113 +
    StackedEmbedding input side): logits come back [B, T, k, V]."""

    vocab_size: int
    dim: int = 512
    ffn_dim: int = 2048
    layers: int = 6
    heads: int = 8
    dropout: float = 0.1
    attention_dropout: Optional[float] = None
    activation_dropout: Optional[float] = None
    share_input_output_embed: bool = True
    n_frames_per_step: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, enc, enc_mask, deterministic: bool = True,
                 decode: bool = False, decode_position=None,
                 max_decode_len: int = 256, return_inner: bool = False,
                 return_features: bool = False):
        """tokens: [B, T] (T=1 when decode; packed ids when stacked).
        Returns logits [B, T, V], or [B, T, k, V] when stacked. With
        return_inner=True (training path only) also returns the pre-final-norm
        hidden states [embed_out, after layer 1, ...] — fairseq
        TransformerDecoder inner_states, tapped by decoder-side multitask CTC
        heads (reference return_all_hiddens). With return_features=True also
        returns the post-final-norm features [B, T, D] (the UnitY first-pass
        handoff: reference s2s_conformer_unity.py:236-240 takes
        inner_states[-1] + mt_decoder.layer_norm). Extras order:
        (logits, features?, inner?)."""
        k = self.n_frames_per_step
        if k > 1:
            from diffnorm_tpu.models.stacked import StackedEmbedding

            embed = StackedEmbedding(
                num_embeddings=self.vocab_size, embed_dim=self.dim,
                num_stacked=k, dtype=self.dtype, name="embed_tokens",
            )
        else:
            embed = nn.Embed(
                self.vocab_size, self.dim,
                embedding_init=nn.initializers.normal(self.dim ** -0.5),
                dtype=self.dtype, name="embed_tokens",
            )
        x = embed(tokens) * math.sqrt(self.dim)
        if decode:
            # position for the single decoded step (pad offset +1 parity)
            pos = decode_position
            half = self.dim // 2
            inv = jnp.exp(
                jnp.arange(half, dtype=jnp.float32)
                * -(math.log(10000.0) / (half - 1))
            )
            args = (pos.astype(jnp.float32) + 1 + PAD)[:, None] * inv[None, :]
            pe = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
            x = x + pe[:, None, :].astype(x.dtype)
            self_mask = None
        else:
            valid = tokens != PAD
            x = x + sinusoidal_positions(valid, self.dim, padding_idx=PAD).astype(
                x.dtype
            )
            self_mask = valid
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        inner = [x]
        for i in range(self.layers):
            x = ARDecoderLayer(
                dim=self.dim, ffn_dim=self.ffn_dim, heads=self.heads,
                dropout=self.dropout,
                attention_dropout=self.attention_dropout,
                activation_dropout=self.activation_dropout,
                dtype=self.dtype, name=f"layer_{i}",
            )(x, self_mask, enc, enc_mask, deterministic=deterministic,
              decode=decode, max_decode_len=max_decode_len)
            if return_inner:
                inner.append(x)
        x = nn.LayerNorm(dtype=self.dtype, name="layer_norm")(x)
        if k > 1:
            b, t, _ = x.shape
            h = nn.Dense(self.dim * k, use_bias=False, dtype=self.dtype,
                         name="out_proj_n_frames")(x)
            h = h.reshape(b, t, k, self.dim)
            # sub-frame logits over the SUB-unit vocabulary (the packed-id
            # embedding cannot be attended per sub-frame; fairseq likewise
            # projects through the output layer per sub-frame)
            logits = nn.Dense(self.vocab_size, use_bias=False,
                              dtype=self.dtype, name="subframe_out")(h)
        elif self.share_input_output_embed:
            logits = embed.attend(x)
        else:
            logits = nn.Dense(self.vocab_size, use_bias=False,
                              dtype=self.dtype, name="output_proj")(x)
        out = (logits,)
        if return_features:
            out = out + (x,)
        if return_inner:
            out = out + (inner,)
        return out if len(out) > 1 else logits


class ARS2UTModule(nn.Module):
    vocab_size: int
    encoder_dim: int = 512
    encoder_ffn_dim: int = 2048
    encoder_layers: int = 12
    encoder_heads: int = 8
    decoder_dim: int = 512
    decoder_ffn_dim: int = 2048
    decoder_layers: int = 6
    decoder_heads: int = 8
    dropout: float = 0.1
    attention_dropout: Optional[float] = None
    activation_dropout: Optional[float] = None
    depthwise_kernel_size: int = 31
    # "conformer" (reference s2ut_conformer, s2s_conformer.py) or
    # "transformer" (reference s2ut_transformer, s2s_transformer.py:237-300)
    encoder_type: str = "conformer"
    conv_channels: int = 1024
    conv_kernel_sizes: tuple = (5, 5)
    n_frames_per_step: int = 1
    # --multitask-config-yaml aux tasks (AuxTaskSpec tuple; the reference's
    # S2STransformerMultitaskModelBase builds the same aux decoders onto the
    # AR S2UT model as onto the NAR one, s2s_transformer.py:171-230)
    multitask: tuple = ()
    # --target-speaker-embed (reference s2s_transformer.py:38-52)
    target_speaker_embed: bool = False
    speaker_embed_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.target_speaker_embed:
            self.spk_emb_proj = nn.Dense(
                self.encoder_dim, dtype=self.dtype, name="spk_emb_proj")
        common = dict(
            dim=self.encoder_dim, ffn_dim=self.encoder_ffn_dim,
            layers=self.encoder_layers, heads=self.encoder_heads,
            dropout=self.dropout,
            attention_dropout=self.attention_dropout,
            activation_dropout=self.activation_dropout,
            dtype=self.dtype, name="encoder",
        )
        if self.encoder_type == "conformer":
            self.encoder = ConformerEncoder(
                depthwise_kernel_size=self.depthwise_kernel_size, **common)
        else:
            from diffnorm_tpu.models.s2t_transformer import (
                S2TTransformerEncoder,
            )

            self.encoder = S2TTransformerEncoder(
                conv_channels=self.conv_channels,
                conv_kernel_sizes=tuple(self.conv_kernel_sizes), **common)
        self.decoder = ARUnitDecoder(
            vocab_size=self.vocab_size, dim=self.decoder_dim,
            ffn_dim=self.decoder_ffn_dim, layers=self.decoder_layers,
            heads=self.decoder_heads, dropout=self.dropout,
            attention_dropout=self.attention_dropout,
            activation_dropout=self.activation_dropout,
            n_frames_per_step=self.n_frames_per_step,
            dtype=self.dtype, name="decoder",
        )
        from diffnorm_tpu.models.nar_transformer import build_aux_heads

        self.mt_modules = build_aux_heads(self.multitask, self.dtype)

    def encode(self, src, src_lengths, deterministic: bool = True,
               tgt_speaker=None):
        enc, enc_mask = self.encoder(src, src_lengths,
                                     deterministic=deterministic)
        return self.apply_speaker(enc, tgt_speaker), enc_mask

    def apply_speaker(self, enc, tgt_speaker):
        """Concat the [B, D] target-speaker embedding to each encoder frame
        + Dense back to encoder_dim (reference s2s_transformer.py:44-52);
        no-op unless enabled and an embedding is supplied."""
        if not self.target_speaker_embed or tgt_speaker is None:
            return enc
        spk = jnp.broadcast_to(
            tgt_speaker[:, None, :].astype(enc.dtype),
            (enc.shape[0], enc.shape[1], tgt_speaker.shape[-1]))
        return self.spk_emb_proj(jnp.concatenate([enc, spk], axis=-1))

    def decode_step(self, token, enc, enc_mask, position,
                    max_decode_len: int = 256):
        """Single AR step: token [B, 1] -> logits [B, V] (cache-mutating)."""
        logits = self.decoder(
            token, enc, enc_mask, deterministic=True, decode=True,
            decode_position=position, max_decode_len=max_decode_len,
        )
        return logits[:, 0]

    def __call__(self, src, src_lengths, prev_tokens, tgt_tokens=None,
                 deterministic=True, multitask_prev=None, tgt_speaker=None):
        """Teacher-forced training forward. tgt_tokens only gates the aux
        heads (same convention as NARS2UTModule: aux losses run in train and
        valid steps, never in generation); multitask_prev:
        {task_name: prev_output_tokens [B, L]} for transformer aux decoders."""
        run_mt = bool(self.multitask) and tgt_tokens is not None
        if run_mt:
            from diffnorm_tpu.models.nar_transformer import aux_head_outputs

            enc, enc_mask, enc_states = self.encoder(
                src, src_lengths, deterministic=deterministic,
                return_all_layers=True)
        else:
            enc, enc_mask = self.encoder(src, src_lengths,
                                         deterministic=deterministic)
        enc = self.apply_speaker(enc, tgt_speaker)
        need_inner = run_mt and any(
            s.input_from == "decoder" for s in self.multitask)
        if need_inner:
            logits, inner = self.decoder(
                prev_tokens, enc, enc_mask, deterministic=deterministic,
                return_inner=True)
        else:
            logits = self.decoder(prev_tokens, enc, enc_mask,
                                  deterministic=deterministic)
        out = dict(logits=logits)
        if run_mt:
            out["multitask"] = aux_head_outputs(
                self.multitask, self.mt_modules, multitask_prev, enc_states,
                enc_mask, inner if need_inner else None, prev_tokens,
                deterministic)
        return out


@register_model("ar_s2ut")
class ARS2UTModel(ModelHolder):
    @classmethod
    def build_model(cls, cfg: Config, task=None) -> "ARS2UTModel":
        vocab = cfg.get("vocab_size")
        if vocab is None and task is not None and task.target_dictionary is not None:
            vocab = len(task.target_dictionary)
        module = ARS2UTModule(
            vocab_size=vocab or 1004,
            encoder_dim=cfg.get("encoder_embed_dim", 512),
            encoder_ffn_dim=cfg.get("encoder_ffn_embed_dim", 2048),
            encoder_layers=cfg.get("encoder_layers", 12),
            encoder_heads=cfg.get("encoder_attention_heads", 8),
            decoder_dim=cfg.get("decoder_embed_dim", 512),
            decoder_ffn_dim=cfg.get("decoder_ffn_embed_dim", 2048),
            decoder_layers=cfg.get("decoder_layers", 6),
            decoder_heads=cfg.get("decoder_attention_heads", 8),
            dropout=cfg.get("dropout", 0.1),
            attention_dropout=cfg.get("attention_dropout"),
            activation_dropout=cfg.get(
                "relu_dropout", cfg.get("activation_dropout")),
            depthwise_kernel_size=cfg.get("depthwise_conv_kernel_size", 31),
            encoder_type=cfg.get("encoder_type", "conformer"),
            conv_channels=cfg.get("conv_channels", 1024),
            conv_kernel_sizes=_conv_ks(cfg.get("conv_kernel_sizes", "5,5")),
            n_frames_per_step=cfg.get("n_frames_per_step", 1),
            multitask=tuple(getattr(task, "aux_task_specs", lambda: ())()),
            target_speaker_embed=bool(cfg.get("target_speaker_embed", False)),
            speaker_embed_dim=cfg.get("speaker_embed_dim", 256),
            dtype=jnp.dtype(cfg.get("dtype", "float32")),
        )
        return cls(module=module, cfg=cfg)


def _conv_ks(v):
    if isinstance(v, str):
        return tuple(int(k) for k in v.split(","))
    return tuple(v)


@register_architecture("ar_s2ut", "s2ut_conformer")
def s2ut_conformer_arch(cfg: Config):
    cfg.setdefault("encoder_embed_dim", 512)
    cfg.setdefault("encoder_ffn_embed_dim", 2048)
    cfg.setdefault("encoder_layers", 12)
    cfg.setdefault("encoder_attention_heads", 8)
    cfg.setdefault("decoder_embed_dim", 512)
    cfg.setdefault("decoder_ffn_embed_dim", 2048)
    cfg.setdefault("decoder_layers", 6)
    cfg.setdefault("decoder_attention_heads", 8)


@register_architecture("ar_s2ut", "s2ut_transformer")
def s2ut_transformer_arch(cfg: Config):
    """Reference s2ut_architecture_base (fairseq/models/speech_to_speech/
    s2s_transformer.py:644-674): S2TTransformerEncoder speech encoder +
    causal unit decoder."""
    cfg["encoder_type"] = "transformer"
    # reference: decoder dims default to the encoder's (s2s_transformer.py:
    # 650-653)
    cfg.setdefault("encoder_embed_dim", 512)
    cfg.setdefault("encoder_ffn_embed_dim", 2048)
    cfg.setdefault("decoder_embed_dim", cfg["encoder_embed_dim"])
    cfg.setdefault("decoder_ffn_embed_dim", cfg["encoder_ffn_embed_dim"])
    s2ut_conformer_arch(cfg)


@register_architecture("ar_s2ut", "s2ut_transformer_fisher")
def s2ut_transformer_fisher_arch(cfg: Config):
    """Reference s2ut_architecture_fisher (s2s_transformer.py:676-682)."""
    cfg.setdefault("encoder_embed_dim", 256)
    cfg.setdefault("encoder_attention_heads", 4)
    cfg.setdefault("dropout", 0.1)
    s2ut_transformer_arch(cfg)
