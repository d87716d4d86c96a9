"""Decoder-only autoregressive unit language model + eval-LM capability
(reference: fairseq transformer_lm family + fairseq_cli/eval_lm.py, the
LM side of the sedd_lm comparisons)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffnorm_tpu.config import Config
from diffnorm_tpu.models.layers import sinusoidal_positions
from diffnorm_tpu.models.nar_transformer import MultiheadAttention
from diffnorm_tpu.models.vae import ModelHolder
from diffnorm_tpu.registry import register_architecture, register_model

PAD = 1


class CausalLMLayer(nn.Module):
    dim: int
    ffn_dim: int
    heads: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        from diffnorm_tpu.ops.attention import masked_attention

        res = x
        h = nn.LayerNorm(dtype=self.dtype, name="self_attn_layer_norm")(x)
        hd = self.dim // self.heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v_proj")(h)
        b, t, _ = x.shape

        def heads_of(z):
            return z.reshape(b, t, self.heads, hd).transpose(0, 2, 1, 3)

        att = masked_attention(
            heads_of(q), heads_of(k), heads_of(v), mask=mask, causal=True
        )
        att = att.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
        att = nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(att)
        x = res + nn.Dropout(self.dropout)(att, deterministic=deterministic)
        res = x
        h = nn.LayerNorm(dtype=self.dtype, name="final_layer_norm")(x)
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(h)
        h = nn.relu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return res + nn.Dropout(self.dropout)(h, deterministic=deterministic)


class UnitLMModule(nn.Module):
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
        embed = nn.Embed(
            self.vocab_size, self.dim,
            embedding_init=nn.initializers.normal(self.dim ** -0.5),
            dtype=self.dtype, name="embed_tokens",
        )
        x = embed(tokens) * math.sqrt(self.dim)
        x = x + sinusoidal_positions(valid, self.dim, padding_idx=PAD).astype(x.dtype)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        for i in range(self.layers):
            x = CausalLMLayer(self.dim, self.ffn_dim, self.heads, self.dropout,
                              self.dtype, name=f"layer_{i}")(
                x, valid, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="layer_norm")(x)
        return embed.attend(x)


@register_model("unit_lm")
class UnitLMModel(ModelHolder):
    @classmethod
    def build_model(cls, cfg: Config, task=None) -> "UnitLMModel":
        vocab = cfg.get("vocab_size")
        if vocab is None and task is not None and task.target_dictionary is not None:
            vocab = len(task.target_dictionary)
        module = UnitLMModule(
            vocab_size=vocab or 1004,
            dim=cfg.get("decoder_embed_dim", 512),
            ffn_dim=cfg.get("decoder_ffn_embed_dim", 2048),
            layers=cfg.get("decoder_layers", 6),
            heads=cfg.get("decoder_attention_heads", 8),
            dropout=cfg.get("dropout", 0.1),
            dtype=jnp.dtype(cfg.get("dtype", "float32")),
        )
        return cls(module=module, cfg=cfg)


@register_architecture("unit_lm", "transformer_lm")
def transformer_lm_arch(cfg: Config):
    cfg.setdefault("decoder_embed_dim", 512)
    cfg.setdefault("decoder_layers", 6)
