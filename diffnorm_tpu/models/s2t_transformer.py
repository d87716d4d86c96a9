"""Speech-to-text transformer — the fairseq S2T (ASR / speech translation)
model family.

Capability parity with fairseq/models/speech_to_text/s2t_transformer.py
(`s2t_transformer` archs: Conv1dSubsampler 4x downsample -> pre-LN
transformer encoder with absolute sinusoidal positions -> causal text
decoder) and s2t_conformer.py (`s2t_conformer`: the conformer encoder
stack instead). Pairs with task `speech_to_text` (tasks/s2t_task.py),
criterion label_smoothed_cross_entropy, and beam decoding through
generate/beam_search.py.

TPU design: the decoder is the same KV-cached causal decoder the AR S2UT
model uses (models/ar_transformer.py), so the whole beam loop jits into
one program; the encoder is shape-static [B, T, C] fbank in, masked.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from diffnorm_tpu.config import Config
from diffnorm_tpu.models.ar_transformer import (
    ARUnitDecoder,
    CachedMultiheadAttention,
)
from diffnorm_tpu.models.conformer import Conv1dSubsampler, ConformerEncoder
from diffnorm_tpu.models.layers import sinusoidal_positions
from diffnorm_tpu.models.vae import ModelHolder
from diffnorm_tpu.registry import register_architecture, register_model

PAD = 1


class S2TEncoderLayer(nn.Module):
    """Pre-LN transformer encoder layer (reference TransformerEncoderLayer
    with encoder_normalize_before=True, the s2t_transformer default)."""

    dim: int
    ffn_dim: int
    heads: int
    dropout: float
    attention_dropout: Optional[float] = None
    activation_dropout: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        attn_do = (self.dropout if self.attention_dropout is None
                   else self.attention_dropout)
        act_do = (self.dropout if self.activation_dropout is None
                  else self.activation_dropout)
        res = x
        h = nn.LayerNorm(dtype=self.dtype, name="self_attn_layer_norm")(x)
        h = CachedMultiheadAttention(
            self.dim, self.heads, dropout=attn_do, dtype=self.dtype,
            name="self_attn",
        )(h, mask=mask, deterministic=deterministic)
        x = res + nn.Dropout(self.dropout)(h, deterministic=deterministic)

        res = x
        h = nn.LayerNorm(dtype=self.dtype, name="final_layer_norm")(x)
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(h)
        h = nn.relu(h)
        h = nn.Dropout(act_do)(h, deterministic=deterministic)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return res + h


class S2TTransformerEncoder(nn.Module):
    """Subsample -> scale -> abs sinusoidal positions -> pre-LN layers ->
    final LayerNorm (reference S2TTransformerEncoder._forward,
    s2t_transformer.py:285-320). Returns (features, mask True=valid)."""

    dim: int = 512
    ffn_dim: int = 2048
    layers: int = 12
    heads: int = 8
    dropout: float = 0.1
    conv_channels: int = 1024
    conv_kernel_sizes: tuple = (5, 5)
    no_scale_embedding: bool = False
    attention_dropout: Optional[float] = None
    activation_dropout: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, src_lengths, deterministic: bool = True,
                 return_all_layers: bool = False):
        x, out_lengths = Conv1dSubsampler(
            mid_channels=self.conv_channels,
            out_channels=self.dim,
            kernel_sizes=tuple(self.conv_kernel_sizes),
            dtype=self.dtype,
            name="subsample",
        )(src, src_lengths)
        mask = jnp.arange(x.shape[1])[None, :] < out_lengths[:, None]
        if not self.no_scale_embedding:
            x = x * math.sqrt(self.dim)
        x = x + sinusoidal_positions(mask, self.dim, padding_idx=PAD).astype(
            x.dtype
        )
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        states = []
        for i in range(self.layers):
            x = S2TEncoderLayer(
                dim=self.dim, ffn_dim=self.ffn_dim, heads=self.heads,
                dropout=self.dropout,
                attention_dropout=self.attention_dropout,
                activation_dropout=self.activation_dropout,
                dtype=self.dtype, name=f"layer_{i}",
            )(x, mask=mask, deterministic=deterministic)
            if return_all_layers:
                states.append(x)
        x = nn.LayerNorm(dtype=self.dtype, name="layer_norm")(x)
        if return_all_layers:
            # reference return_all_hiddens encoder_states (pre-final-LN,
            # post-layer) — multitask aux heads tap these by index
            return x, mask, states
        return x, mask


class S2TModule(nn.Module):
    """Speech encoder + causal text decoder; encode/decode_step duck-type
    the AR S2UT module so generate/beam_search.ar_generate drives it."""

    vocab_size: int
    encoder_type: str = "transformer"  # or "conformer"
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
    conv_channels: int = 1024
    conv_kernel_sizes: tuple = (5, 5)
    depthwise_kernel_size: int = 31
    no_scale_embedding: bool = False
    share_decoder_input_output_embed: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        common = dict(
            dim=self.encoder_dim, ffn_dim=self.encoder_ffn_dim,
            layers=self.encoder_layers, heads=self.encoder_heads,
            dropout=self.dropout,
            attention_dropout=self.attention_dropout,
            activation_dropout=self.activation_dropout,
            conv_channels=self.conv_channels,
            conv_kernel_sizes=tuple(self.conv_kernel_sizes),
            dtype=self.dtype, name="encoder",
        )
        if self.encoder_type == "conformer":
            self.encoder = ConformerEncoder(
                depthwise_kernel_size=self.depthwise_kernel_size,
                no_scale_embedding=self.no_scale_embedding, **common,
            )
        else:
            self.encoder = S2TTransformerEncoder(
                no_scale_embedding=self.no_scale_embedding, **common,
            )
        self.decoder = ARUnitDecoder(
            vocab_size=self.vocab_size, dim=self.decoder_dim,
            ffn_dim=self.decoder_ffn_dim, layers=self.decoder_layers,
            heads=self.decoder_heads, dropout=self.dropout,
            attention_dropout=self.attention_dropout,
            activation_dropout=self.activation_dropout,
            share_input_output_embed=self.share_decoder_input_output_embed,
            dtype=self.dtype, name="decoder",
        )

    def encode(self, src, src_lengths, deterministic: bool = True):
        return self.encoder(src, src_lengths, deterministic=deterministic)

    def decode_step(self, token, enc, enc_mask, position,
                    max_decode_len: int = 256):
        logits = self.decoder(
            token, enc, enc_mask, deterministic=True, decode=True,
            decode_position=position, max_decode_len=max_decode_len,
        )
        return logits[:, 0]

    def __call__(self, src, src_lengths, prev_tokens, deterministic=True):
        enc, enc_mask = self.encoder(src, src_lengths,
                                     deterministic=deterministic)
        logits = self.decoder(prev_tokens, enc, enc_mask,
                              deterministic=deterministic)
        return dict(logits=logits)


@register_model("s2t")
class S2TModel(ModelHolder):
    @classmethod
    def build_model(cls, cfg: Config, task=None) -> "S2TModel":
        vocab = cfg.get("vocab_size")
        if vocab is None and task is not None and task.target_dictionary is not None:
            vocab = len(task.target_dictionary)
        conv_ks = cfg.get("conv_kernel_sizes", "5,5")
        if isinstance(conv_ks, str):
            conv_ks = tuple(int(k) for k in conv_ks.split(","))
        module = S2TModule(
            vocab_size=vocab or 1000,
            encoder_type=cfg.get("encoder_type", "transformer"),
            encoder_dim=cfg.get("encoder_embed_dim", 512),
            encoder_ffn_dim=cfg.get("encoder_ffn_embed_dim", 2048),
            encoder_layers=cfg.get("encoder_layers", 12),
            encoder_heads=cfg.get("encoder_attention_heads", 8),
            decoder_dim=cfg.get("decoder_embed_dim",
                                cfg.get("encoder_embed_dim", 512)),
            decoder_ffn_dim=cfg.get("decoder_ffn_embed_dim",
                                    cfg.get("encoder_ffn_embed_dim", 2048)),
            decoder_layers=cfg.get("decoder_layers", 6),
            decoder_heads=cfg.get("decoder_attention_heads", 8),
            dropout=cfg.get("dropout", 0.1),
            attention_dropout=cfg.get("attention_dropout"),
            activation_dropout=cfg.get(
                "relu_dropout", cfg.get("activation_dropout")),
            conv_channels=cfg.get("conv_channels", 1024),
            conv_kernel_sizes=conv_ks,
            depthwise_kernel_size=cfg.get("depthwise_conv_kernel_size", 31),
            no_scale_embedding=bool(cfg.get("no_scale_embedding", False)),
            share_decoder_input_output_embed=bool(
                cfg.get("share_decoder_input_output_embed", False)),
            dtype=jnp.dtype(cfg.get("dtype", "float32")),
        )
        return cls(module=module, cfg=cfg)


@register_architecture("s2t", "s2t_transformer")
def s2t_transformer_arch(cfg: Config):
    """Reference base_architecture (s2t_transformer.py:459-495)."""
    cfg.setdefault("encoder_embed_dim", 512)
    cfg.setdefault("encoder_ffn_embed_dim", 2048)
    cfg.setdefault("encoder_layers", 12)
    cfg.setdefault("encoder_attention_heads", 8)
    cfg.setdefault("decoder_embed_dim", cfg.get("encoder_embed_dim"))
    cfg.setdefault("decoder_ffn_embed_dim", cfg.get("encoder_ffn_embed_dim"))
    cfg.setdefault("decoder_layers", 6)
    cfg.setdefault("decoder_attention_heads", 8)
    cfg.setdefault("dropout", 0.1)


@register_architecture("s2t", "s2t_transformer_s")
def s2t_transformer_s_arch(cfg: Config):
    """Reference s2t_transformer_s (s2t_transformer.py:498-505)."""
    cfg.setdefault("encoder_embed_dim", 256)
    cfg.setdefault("encoder_ffn_embed_dim", 256 * 8)
    cfg.setdefault("encoder_attention_heads", 4)
    cfg.setdefault("decoder_attention_heads", 4)
    s2t_transformer_arch(cfg)


@register_architecture("s2t", "s2t_transformer_xs")
def s2t_transformer_xs_arch(cfg: Config):
    """Reference s2t_transformer_xs (s2t_transformer.py:508-514)."""
    cfg.setdefault("encoder_layers", 6)
    cfg.setdefault("decoder_layers", 3)
    cfg.setdefault("encoder_ffn_embed_dim", 256 * 4)
    s2t_transformer_s_arch(cfg)


@register_architecture("s2t", "s2t_conformer")
def s2t_conformer_arch(cfg: Config):
    """Reference s2t_conformer.py base arch: conformer encoder stack."""
    cfg.encoder_type = "conformer"
    cfg.setdefault("encoder_embed_dim", 256)
    cfg.setdefault("encoder_ffn_embed_dim", 2048)
    cfg.setdefault("encoder_layers", 16)
    cfg.setdefault("encoder_attention_heads", 4)
    cfg.setdefault("decoder_embed_dim", 256)
    cfg.setdefault("decoder_ffn_embed_dim", 2048)
    cfg.setdefault("decoder_layers", 6)
    cfg.setdefault("decoder_attention_heads", 8)
    cfg.setdefault("depthwise_conv_kernel_size", 31)
    cfg.setdefault("dropout", 0.1)
