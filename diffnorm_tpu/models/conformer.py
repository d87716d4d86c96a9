"""Conformer speech encoder with ESPNet-style relative-position attention.

Capability parity with the reference S2T/S2S conformer stack
(fairseq/models/speech_to_text/s2t_conformer.py:32-161,
fairseq/modules/conformer_layer.py:19-286,
fairseq/modules/espnet_multihead_attention.py:109-198,
fairseq/models/speech_to_text/modules/convolution.py Conv1dSubsampler):

* Conv1dSubsampler: two stride-2 GLU convs (4x temporal downsample)
* per layer: 0.5*macaron FFN -> rel-pos MHA -> depthwise conv module
  (GLU pointwise, k=31 depthwise, batch-norm, swish) -> 0.5*FFN -> LayerNorm
* Transformer-XL relative position scores (pos_bias_u/pos_bias_v + rel-shift)

Batch-first [B, T, C]; the rel-shift uses the pad-reshape trick which lowers
to cheap reshapes in XLA rather than a T^2 gather.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def subsampled_lengths(lengths, n_layers: int = 2):
    """floor((len - 1) / 2 + 1) per stride-2 conv layer."""
    out = lengths
    for _ in range(n_layers):
        out = jnp.floor((out.astype(jnp.float32) - 1) / 2 + 1).astype(jnp.int32)
    return out


class Conv1dSubsampler(nn.Module):
    mid_channels: int = 1024
    out_channels: int = 512
    kernel_sizes: Sequence[int] = (5, 5)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths):
        """x: [B, T, C_in] -> ([B, T//4, out], new_lengths)."""
        n = len(self.kernel_sizes)
        for i, k in enumerate(self.kernel_sizes):
            out_ch = self.mid_channels if i < n - 1 else self.out_channels * 2
            x = nn.Conv(
                out_ch,
                kernel_size=(k,),
                strides=(2,),
                padding=[(k // 2, k // 2)],
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            a, b = jnp.split(x, 2, axis=-1)
            x = a * nn.sigmoid(b)  # GLU over channel halves
        return x, subsampled_lengths(lengths, n)


def rel_positional_encoding(max_t: int, dim: int) -> np.ndarray:
    """[2*max_t - 1, dim] table; row i holds relative position (max_t-1 - i),
    i.e. positives first (descending) then negatives, ESPNet layout
    (fairseq/modules/positional_encoding.py:66-118)."""
    pos = np.arange(max_t, dtype=np.float32)[:, None]
    div = np.exp(
        np.arange(0, dim, 2, dtype=np.float32) * -(math.log(10000.0) / dim)
    )
    pe_pos = np.zeros((max_t, dim), dtype=np.float32)
    pe_pos[:, 0::2] = np.sin(pos * div)
    pe_pos[:, 1::2] = np.cos(pos * div)
    pe_neg = np.zeros((max_t, dim), dtype=np.float32)
    pe_neg[:, 0::2] = np.sin(-pos * div)
    pe_neg[:, 1::2] = np.cos(-pos * div)
    return np.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0)


def rel_shift(x):
    """[B, H, T, 2T-1] -> [B, H, T, T]: out[i, j] = x[i, j - i + T - 1]."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, 2 * t, t)[:, :, 1:, :]
    x = x.reshape(b, h, t, 2 * t - 1)
    return x[..., :t]


class RelPosSelfAttention(nn.Module):
    """Transformer-XL style self-attention (RelPositionMultiHeadedAttention
    parity: espnet_multihead_attention.py:109-198)."""

    dim: int
    heads: int
    dropout: float = 0.0
    quant: bool = False  # int8 W8A8 projections (inference only)
    sp_axis: Optional[str] = None  # sequence-parallel mesh axis (shard_map)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, mask=None, deterministic: bool = True):
        from diffnorm_tpu.models.layers import QDense

        h = self.heads
        d = self.dim // h
        q = QDense(self.dim, quant=self.quant, dtype=self.dtype,
                   name="linear_q")(x)
        k = QDense(self.dim, quant=self.quant, dtype=self.dtype,
                   name="linear_k")(x)
        v = QDense(self.dim, quant=self.quant, dtype=self.dtype,
                   name="linear_v")(x)
        p = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="linear_pos")(
            pos_emb
        )  # [2T-1, dim]

        b, t, _ = x.shape

        def heads_of(z):
            return z.reshape(b, -1, h, d).transpose(0, 2, 1, 3)

        q, k, v = heads_of(q), heads_of(k), heads_of(v)
        p = p.reshape(-1, h, d).transpose(1, 0, 2)  # [H, 2T-1, d]

        bias_u = self.param(
            "pos_bias_u", nn.initializers.xavier_uniform(), (h, d), jnp.float32
        ).astype(q.dtype)
        bias_v = self.param(
            "pos_bias_v", nn.initializers.xavier_uniform(), (h, d), jnp.float32
        ).astype(q.dtype)

        if self.sp_axis is not None:
            # sequence-parallel: x/mask are local time-shards inside a
            # shard_map, pos_emb is the GLOBAL table; attention runs as an
            # online-softmax K/V ring (parallel/sequence.py)
            from diffnorm_tpu.parallel.sequence import ring_rel_pos_attention

            assert deterministic or self.dropout == 0.0, (
                "attention dropout is not supported under sequence parallelism"
            )
            out = ring_rel_pos_attention(
                q + bias_u[None, :, None, :], q + bias_v[None, :, None, :],
                k, v, p, mask=mask, axis=self.sp_axis,
            )
            out = out.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
            return QDense(self.dim, quant=self.quant, dtype=self.dtype,
                          name="linear_out")(out)

        ac = jnp.einsum(
            "bhtd,bhsd->bhts", q + bias_u[None, :, None, :], k,
            preferred_element_type=jnp.float32,
        )
        bd = jnp.einsum(
            "bhtd,hsd->bhts", q + bias_v[None, :, None, :], p,
            preferred_element_type=jnp.float32,
        )
        scores = (ac + rel_shift(bd)) / math.sqrt(d)
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :], scores, jnp.finfo(jnp.float32).min)
        attn = jax.nn.softmax(scores, axis=-1)
        if self.dropout > 0.0 and not deterministic:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - self.dropout, attn.shape
            )
            attn = jnp.where(keep, attn / (1.0 - self.dropout), 0.0)
        out = jnp.einsum(
            "bhts,bhsd->bhtd", attn, v.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
        return QDense(self.dim, quant=self.quant, dtype=self.dtype,
                      name="linear_out")(out)


class ConformerFFN(nn.Module):
    dim: int
    ffn_dim: int
    dropout: float
    quant: bool = False
    # fairseq --activation-dropout/--relu-dropout: rate on the hidden
    # activation; falls back to `dropout` when unset (conformer_layer.py
    # FeedForwardModule activation_dropout)
    activation_dropout: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from diffnorm_tpu.models.layers import QDense

        act_do = (self.dropout if self.activation_dropout is None
                  else self.activation_dropout)
        x = nn.LayerNorm(dtype=self.dtype, name="layer_norm")(x)
        x = QDense(self.ffn_dim, quant=self.quant, dtype=self.dtype,
                   name="w_1")(x)
        x = nn.silu(x)
        x = nn.Dropout(act_do)(x, deterministic=deterministic)
        x = QDense(self.dim, quant=self.quant, dtype=self.dtype,
                   name="w_2")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class ConvModule(nn.Module):
    dim: int
    kernel_size: int = 31
    dropout: float = 0.0
    sp_axis: Optional[str] = None  # sequence-parallel mesh axis (shard_map)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, conv_keep=None):
        x = nn.LayerNorm(dtype=self.dtype, name="layer_norm")(x)
        x = nn.Conv(
            2 * self.dim, kernel_size=(1,), use_bias=False, dtype=self.dtype,
            name="pointwise_conv1",
        )(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * nn.sigmoid(b)  # GLU
        pad = (self.kernel_size - 1) // 2
        if conv_keep is not None:
            # zero SP-introduced pad frames so the depthwise conv at the last
            # real frame sees the same zeros the unsharded conv's edge
            # padding provides (batch-pad frames inside T' keep their values
            # — reference semantics)
            x = x * conv_keep[:, :, None].astype(x.dtype)
        if self.sp_axis is not None:
            # time-sharded: fetch k//2 edge frames from ring neighbors so
            # the depthwise conv sees the same neighborhood as unsharded
            from diffnorm_tpu.parallel.sequence import halo_pad

            x = halo_pad(x, pad, pad, axis=self.sp_axis)
            conv_padding = "VALID"
        else:
            conv_padding = [(pad, pad)]
        x = nn.Conv(
            self.dim,
            kernel_size=(self.kernel_size,),
            padding=conv_padding,
            feature_group_count=self.dim,
            use_bias=False,
            dtype=self.dtype,
            name="depthwise_conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
            axis_name=self.sp_axis,  # cross-shard batch stats when training
            dtype=self.dtype, name="batch_norm",
        )(x)
        x = nn.silu(x)
        x = nn.Conv(
            self.dim, kernel_size=(1,), use_bias=False, dtype=self.dtype,
            name="pointwise_conv2",
        )(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class ConformerLayer(nn.Module):
    dim: int
    ffn_dim: int
    heads: int
    dropout: float
    depthwise_kernel_size: int = 31
    quant: bool = False
    sp_axis: Optional[str] = None  # sequence-parallel mesh axis (shard_map)
    # fairseq --attention-dropout / --activation-dropout (aka --relu-dropout):
    # separate rates on the attention probabilities and the FF hidden
    # activation; both fall back to `dropout` when unset
    attention_dropout: Optional[float] = None
    activation_dropout: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, mask=None, deterministic: bool = True,
                 conv_keep=None):
        attn_do = (self.dropout if self.attention_dropout is None
                   else self.attention_dropout)
        x = x + 0.5 * ConformerFFN(
            self.dim, self.ffn_dim, self.dropout, self.quant,
            activation_dropout=self.activation_dropout, dtype=self.dtype,
            name="ffn1",
        )(x, deterministic)
        res = x
        h = nn.LayerNorm(dtype=self.dtype, name="self_attn_layer_norm")(x)
        h = RelPosSelfAttention(
            self.dim, self.heads, attn_do, self.quant,
            sp_axis=self.sp_axis, dtype=self.dtype,
            name="self_attn",
        )(h, pos_emb, mask=mask, deterministic=deterministic)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = res + h
        x = x + ConvModule(
            self.dim, self.depthwise_kernel_size, self.dropout,
            sp_axis=self.sp_axis, dtype=self.dtype,
            name="conv_module",
        )(x, deterministic, conv_keep)
        x = x + 0.5 * ConformerFFN(
            self.dim, self.ffn_dim, self.dropout, self.quant,
            activation_dropout=self.activation_dropout, dtype=self.dtype,
            name="ffn2",
        )(x, deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="final_layer_norm")(x)


class ConformerEncoder(nn.Module):
    """Full conformer encoder: subsample -> scale -> linear -> layers.

    Returns (features [B, T', C], mask [B, T'] True=valid).
    """

    dim: int = 512
    ffn_dim: int = 2048
    layers: int = 12
    heads: int = 8
    dropout: float = 0.1
    depthwise_kernel_size: int = 31
    conv_channels: int = 1024
    conv_kernel_sizes: Sequence[int] = (5, 5)
    no_scale_embedding: bool = False
    # rematerialize each conformer layer in the backward pass (jax.checkpoint)
    # — trades ~30% extra fwd FLOPs for O(layers) less activation memory on
    # long-utterance training batches (max_source_positions up to 6000)
    remat: bool = False
    quant: bool = False  # int8 W8A8 inference matmuls
    # sequence-parallel mesh axis: set (via .copy(sp_axis=...)) when
    # run_layers executes inside a shard_map with time-sharded activations
    # (parallel/sequence.py conformer_encode_sp)
    sp_axis: Optional[str] = None
    # --attention-dropout / --activation-dropout (fall back to dropout)
    attention_dropout: Optional[float] = None
    activation_dropout: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.subsample = Conv1dSubsampler(
            mid_channels=self.conv_channels,
            out_channels=self.dim,
            kernel_sizes=tuple(self.conv_kernel_sizes),
            dtype=self.dtype,
            name="subsample",
        )
        self.linear = nn.Dense(self.dim, dtype=self.dtype, name="linear")
        self.input_dropout = nn.Dropout(self.dropout)
        layer_cls = ConformerLayer
        if self.remat:
            layer_cls = nn.remat(
                ConformerLayer, static_argnums=(4,)  # deterministic
            )
        self.conformer_layers = [
            layer_cls(
                dim=self.dim,
                ffn_dim=self.ffn_dim,
                heads=self.heads,
                dropout=self.dropout,
                depthwise_kernel_size=self.depthwise_kernel_size,
                quant=self.quant,
                sp_axis=self.sp_axis,
                attention_dropout=self.attention_dropout,
                activation_dropout=self.activation_dropout,
                dtype=self.dtype,
                name=f"layer_{i}",
            )
            for i in range(self.layers)
        ]

    def embed(self, src, src_lengths, deterministic: bool = True):
        """Subsample + scale + input projection (replicated under SP).
        Returns (x [B, T', C], mask [B, T'], pos_table [2T'-1, C])."""
        x, out_lengths = self.subsample(src, src_lengths)
        mask = jnp.arange(x.shape[1])[None, :] < out_lengths[:, None]
        scale = 1.0 if self.no_scale_embedding else math.sqrt(self.dim)
        x = x * scale
        pos_table = jnp.asarray(
            rel_positional_encoding(x.shape[1], self.dim), dtype=self.dtype
        )
        x = self.linear(x)
        x = self.input_dropout(x, deterministic=deterministic)
        return x, mask, pos_table

    def run_layers(self, x, pos_table, mask, deterministic: bool = True,
                   conv_keep=None, collect: bool = False):
        """The conformer layer stack. Under SP, x/mask are local
        time-shards, pos_table is the global table, and conv_keep marks
        real (non-SP-pad) frames for the depthwise conv. With collect=True
        also returns the per-layer outputs (reference return_all_hiddens
        encoder_states — multitask aux heads tap these)."""
        states = []
        for layer in self.conformer_layers:
            x = layer(x, pos_table, mask, deterministic, conv_keep)
            if collect:
                states.append(x)
        return (x, states) if collect else x

    def __call__(self, src, src_lengths, deterministic: bool = True,
                 return_all_layers: bool = False):
        x, mask, pos_table = self.embed(src, src_lengths, deterministic)
        if return_all_layers:
            x, states = self.run_layers(
                x, pos_table, mask, deterministic, collect=True)
            return x, mask, states
        x = self.run_layers(x, pos_table, mask, deterministic)
        return x, mask
