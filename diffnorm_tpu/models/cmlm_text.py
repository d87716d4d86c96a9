"""Text-to-text CMLM with classifier-free guidance.

Capability parity with the reference "cmlm_cg" task (fairseq/tasks/cmlm_cg.py
applying the TranSpeech CG idea to text translation): a token transformer
encoder + the same NAT unit decoder / length head / CG machinery as the
speech model — only the encoder differs, so mask-predict decoding
(generate/mask_predict.py) works unchanged.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffnorm_tpu.config import Config
from diffnorm_tpu.models.layers import sinusoidal_positions
from diffnorm_tpu.models.nar_transformer import (
    BOS,
    PAD,
    UNK,
    MultiheadAttention,
    NATUnitDecoder,
)
from diffnorm_tpu.models.vae import ModelHolder
from diffnorm_tpu.registry import register_architecture, register_model


class TextEncoderLayer(nn.Module):
    dim: int
    ffn_dim: int
    heads: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        res = x
        h = nn.LayerNorm(dtype=self.dtype, name="self_attn_layer_norm")(x)
        h = MultiheadAttention(
            self.dim, self.heads, self.dropout, self.dtype, name="self_attn"
        )(h, mask=mask, deterministic=deterministic)
        x = res + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        res = x
        h = nn.LayerNorm(dtype=self.dtype, name="final_layer_norm")(x)
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return res + nn.Dropout(self.dropout)(h, deterministic=deterministic)


class TextEncoder(nn.Module):
    vocab_size: int
    dim: int = 512
    ffn_dim: int = 2048
    layers: int = 6
    heads: int = 8
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, deterministic: bool = True):
        valid = tokens != PAD
        x = nn.Embed(
            self.vocab_size, self.dim,
            embedding_init=nn.initializers.normal(self.dim ** -0.5),
            dtype=self.dtype, name="embed_tokens",
        )(tokens) * math.sqrt(self.dim)
        x = x + sinusoidal_positions(valid, self.dim, padding_idx=PAD).astype(x.dtype)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        for i in range(self.layers):
            x = TextEncoderLayer(
                self.dim, self.ffn_dim, self.heads, self.dropout, self.dtype,
                name=f"layer_{i}",
            )(x, valid, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="layer_norm")(x)
        return x, valid


class TextCMLMModule(nn.Module):
    src_vocab_size: int
    tgt_vocab_size: int
    dim: int = 512
    ffn_dim: int = 2048
    encoder_layers: int = 6
    decoder_layers: int = 6
    heads: int = 8
    dropout: float = 0.1
    cg_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = TextEncoder(
            vocab_size=self.src_vocab_size, dim=self.dim, ffn_dim=self.ffn_dim,
            layers=self.encoder_layers, heads=self.heads, dropout=self.dropout,
            dtype=self.dtype, name="encoder",
        )
        self.decoder = NATUnitDecoder(
            vocab_size=self.tgt_vocab_size, dim=self.dim, ffn_dim=self.ffn_dim,
            layers=self.decoder_layers, heads=self.heads, dropout=self.dropout,
            dtype=self.dtype, name="decoder",
        )

    # mask_predict_decode expects encode(src, src_lengths)
    def encode(self, src_tokens, src_lengths=None, deterministic: bool = True):
        return self.encoder(src_tokens, deterministic=deterministic)

    def apply_cg_drop(self, enc, enc_mask, drop):
        null = self.decoder.null_context().astype(enc.dtype)
        enc = jnp.where(drop[:, None, None], null[None], enc)
        enc_mask = jnp.where(drop[:, None], True, enc_mask)
        return enc, enc_mask

    def decode(self, tokens, enc, enc_mask, deterministic: bool = True):
        return self.decoder(tokens, enc, enc_mask, deterministic=deterministic)

    def forward_length(self, enc, enc_mask):
        return self.decoder.forward_length(enc, enc_mask)

    def __call__(self, src_tokens, src_lengths, prev_tokens, tgt_tokens=None,
                 deterministic: bool = True, multitask_prev=None):
        # multitask_prev is accepted for call-surface compatibility with the
        # NAR task/criterion (MultitaskTaskMixin passes it unconditionally);
        # the text CMLM family has no aux decoders
        assert multitask_prev is None, (
            "cmlm_text has no --multitask-config-yaml aux decoders")
        enc, enc_mask = self.encoder(src_tokens, deterministic=deterministic)
        length_logits = self.decoder.forward_length(enc, enc_mask)
        if tgt_tokens is not None:
            length_tgt = jnp.clip(
                jnp.sum(tgt_tokens != PAD, axis=1), 0,
                self.decoder.max_lengths - 1,
            )
        else:
            length_tgt = jnp.argmax(length_logits, axis=-1)
        if self.cg_prob > 0.0 and not deterministic:
            drop = jax.random.bernoulli(
                self.make_rng("cg"), self.cg_prob, (enc.shape[0],)
            )
            enc, enc_mask = self.apply_cg_drop(enc, enc_mask, drop)
        logits = self.decoder(prev_tokens, enc, enc_mask,
                              deterministic=deterministic)
        return dict(
            logits=logits,
            word_ins_mask=prev_tokens == UNK,
            length_logits=length_logits,
            length_tgt=length_tgt,
        )


@register_model("cmlm_text")
class TextCMLMModel(ModelHolder):
    @classmethod
    def build_model(cls, cfg: Config, task=None) -> "TextCMLMModel":
        src_vocab = cfg.get("src_vocab_size")
        tgt_vocab = cfg.get("vocab_size")
        if task is not None:
            if src_vocab is None and getattr(task, "src_dict", None) is not None:
                src_vocab = len(task.src_dict)
            if tgt_vocab is None and task.target_dictionary is not None:
                tgt_vocab = len(task.target_dictionary)
        module = TextCMLMModule(
            src_vocab_size=src_vocab or 32000,
            tgt_vocab_size=tgt_vocab or 32000,
            dim=cfg.get("encoder_embed_dim", 512),
            ffn_dim=cfg.get("encoder_ffn_embed_dim", 2048),
            encoder_layers=cfg.get("encoder_layers", 6),
            decoder_layers=cfg.get("decoder_layers", 6),
            heads=cfg.get("encoder_attention_heads", 8),
            dropout=cfg.get("dropout", 0.1),
            cg_prob=cfg.get("cg_prob", 0.0),
            dtype=jnp.dtype(cfg.get("dtype", "float32")),
        )
        return cls(module=module, cfg=cfg)


@register_architecture("cmlm_text", "cmlm_transformer")
def cmlm_transformer_arch(cfg: Config):
    cfg.setdefault("encoder_embed_dim", 512)
    cfg.setdefault("encoder_ffn_embed_dim", 2048)
    cfg.setdefault("encoder_layers", 6)
    cfg.setdefault("decoder_layers", 6)
