"""AR text-to-spectrogram transformer (TTS-Transformer).

Capability parity with fairseq/models/text_to_speech/tts_transformer.py
(TTSTransformerEncoder :45-131, TTSTransformerDecoder :139-315) and the
Tacotron2 Prenet/Postnet it imports (tacotron2.py:96-141), redesigned for
TPU: the decoder reuses the KV-cached ARDecoderLayer so autoregressive
spectrogram generation runs as one jitted lax.scan with per-row eos-freeze
(generate/speech_ar.py) instead of a Python loop over incremental state.

Training forward is teacher-forced full-sequence causal attention; the
Tacotron prenet applies dropout unconditionally (its defining trick, kept
active at inference — callers must supply a "dropout" rng even when
deterministic).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffnorm_tpu.config import Config
from diffnorm_tpu.models.ar_transformer import ARDecoderLayer
from diffnorm_tpu.models.cmlm_text import TextEncoderLayer
from diffnorm_tpu.models.layers import sinusoidal_positions
from diffnorm_tpu.models.vae import ModelHolder
from diffnorm_tpu.registry import register_architecture, register_model

PAD = 1


def sinusoidal_position_at(index, dim: int, padding_idx: int = PAD):
    """One sinusoidal embedding row for absolute position `index` (0-based
    step), matching sinusoidal_positions' padding_idx offset. [*, dim]."""
    pos = jnp.asarray(index, jnp.float32) + 1.0 + padding_idx
    half = dim // 2
    inv = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1))
    )
    args = pos[..., None] * inv
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


class TacotronPrenet(nn.Module):
    """Linear/ReLU stack with ALWAYS-ON dropout (tacotron2.py:96-108: the
    dropout is applied unconditionally, including at inference — it is the
    source of AR-TTS output variation)."""

    n_layers: int = 2
    n_units: int = 256
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_layers):
            x = nn.relu(nn.Dense(self.n_units, dtype=self.dtype,
                                 name=f"fc_{i}")(x))
            x = nn.Dropout(self.dropout)(x, deterministic=False)
        return x


class TacotronPostnet(nn.Module):
    """Conv(+BN+tanh) refinement stack over the predicted mels
    (tacotron2.py:111-141); the caller adds the residual."""

    out_dim: int
    channels: int = 512
    kernel: int = 5
    n_layers: int = 5
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.n_layers):
            last = i == self.n_layers - 1
            x = nn.Conv(
                self.out_dim if last else self.channels,
                kernel_size=(self.kernel,), padding="SAME",
                dtype=self.dtype, name=f"conv_{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=deterministic, dtype=self.dtype,
                name=f"bn_{i}",
            )(x)
            if not last:
                x = jnp.tanh(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


def _setup_tts_decoder(mod):
    """Create the Tacotron-style AR spectrogram-decoder fields on `mod`
    (called inside setup; attribute/param names are shared between the
    text-input TTS transformer and the speech-input s2spect model)."""
    mod.dec_dropout = nn.Dropout(mod.dropout)
    mod.dec_prenet = TacotronPrenet(
        n_layers=mod.prenet_layers, n_units=mod.prenet_dim,
        dropout=mod.prenet_dropout, dtype=mod.dtype, name="dec_prenet",
    )
    mod.dec_prenet_proj = nn.Dense(mod.dim, dtype=mod.dtype,
                                   name="dec_prenet_proj")
    mod.dec_pos_alpha = mod.param(
        "dec_pos_alpha", nn.initializers.ones, (1,)
    )
    mod.dec_layers = [
        # keyword dtype: ARDecoderLayer grew attention_dropout/
        # activation_dropout fields ahead of dtype (a positional dtype
        # would land in attention_dropout and crash the dropout check)
        ARDecoderLayer(mod.dim, mod.ffn_dim, mod.heads, mod.dropout,
                       dtype=mod.dtype, name=f"dec_layer_{i}")
        for i in range(mod.decoder_layers)
    ]
    mod.dec_norm = nn.LayerNorm(dtype=mod.dtype, name="dec_norm")
    mod.feat_proj = nn.Dense(mod.out_dim, dtype=mod.dtype,
                             name="feat_proj")
    mod.eos_proj = nn.Dense(1, dtype=mod.dtype, name="eos_proj")
    mod.postnet = TacotronPostnet(
        out_dim=mod.out_dim, channels=mod.postnet_dim,
        kernel=mod.postnet_kernel, n_layers=mod.postnet_layers,
        dropout=mod.postnet_dropout, dtype=mod.dtype, name="postnet",
    )


class TTSTransformerModule(nn.Module):
    vocab_size: int
    dim: int = 512
    ffn_dim: int = 2048
    encoder_layers: int = 6
    decoder_layers: int = 6
    heads: int = 4
    dropout: float = 0.1
    out_dim: int = 80  # output_frame_dim * n_frames_per_step
    n_frames_per_step: int = 1
    conv_layers: int = 3
    conv_kernel: int = 5
    conv_dropout: float = 0.5
    prenet_layers: int = 2
    prenet_dim: int = 256
    prenet_dropout: float = 0.5
    postnet_layers: int = 5
    postnet_dim: int = 512
    postnet_kernel: int = 5
    postnet_dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embed_tokens = nn.Embed(
            self.vocab_size, self.dim,
            embedding_init=nn.initializers.normal(self.dim ** -0.5),
            dtype=self.dtype, name="embed_tokens",
        )
        self.enc_convs = [
            nn.Conv(self.dim, kernel_size=(self.conv_kernel,), padding="SAME",
                    dtype=self.dtype, name=f"enc_conv_{i}")
            for i in range(self.conv_layers)
        ]
        self.enc_bns = [
            nn.BatchNorm(dtype=self.dtype, name=f"enc_bn_{i}")
            for i in range(self.conv_layers)
        ]
        self.prenet_proj = nn.Dense(self.dim, dtype=self.dtype,
                                    name="prenet_proj")
        self.enc_layers = [
            TextEncoderLayer(self.dim, self.ffn_dim, self.heads, self.dropout,
                             self.dtype, name=f"enc_layer_{i}")
            for i in range(self.encoder_layers)
        ]
        self.enc_norm = nn.LayerNorm(dtype=self.dtype, name="enc_norm")
        self.enc_pos_alpha = self.param(
            "enc_pos_alpha", nn.initializers.ones, (1,)
        )
        self.enc_conv_dropout = nn.Dropout(self.conv_dropout)
        self.enc_dropout = nn.Dropout(self.dropout)
        _setup_tts_decoder(self)

    # ------------------------------------------------------------- encoder
    def encode(self, src_tokens, deterministic: bool = True):
        """(enc [B, S, D], enc_mask [B, S] True=valid). Conv prenet + proj +
        scaled sinusoidal positions + transformer stack (reference :94-131)."""
        valid = src_tokens != PAD
        x = self.embed_tokens(src_tokens)
        for conv, bn in zip(self.enc_convs, self.enc_bns):
            x = self.enc_conv_dropout(
                nn.relu(bn(conv(x), use_running_average=deterministic)),
                deterministic=deterministic,
            )
        x = self.prenet_proj(x)
        x = x + self.enc_pos_alpha * sinusoidal_positions(
            valid, self.dim, padding_idx=PAD
        ).astype(x.dtype)
        x = self.enc_dropout(x, deterministic=deterministic)
        for layer in self.enc_layers:
            x = layer(x, valid, deterministic=deterministic)
        return self.enc_norm(x), valid

    # ------------------------------------------------------------- decoder
    def _dec_input(self, prev_feats, positions):
        x = self.dec_prenet_proj(self.dec_prenet(prev_feats))
        return x + self.dec_pos_alpha * sinusoidal_position_at(
            positions, self.dim
        ).astype(x.dtype)

    def decode_full(self, prev_feats, tgt_mask, enc, enc_mask,
                    deterministic: bool = True, return_inner: bool = False):
        """Teacher-forced full-sequence decode (training).

        prev_feats [B, T, out_dim] (shifted-right targets, zeros first),
        tgt_mask [B, T] True=valid. Returns (post_feat, feat, eos_logits).
        With return_inner=True also returns the pre-final-norm hidden states
        [embed_out, after layer 1, ...] (fairseq inner_states via
        return_all_hiddens) for decoder-tapped multitask CTC heads.
        """
        t = prev_feats.shape[1]
        x = self._dec_input(prev_feats, jnp.arange(t)[None, :])
        x = self.dec_dropout(x, deterministic=deterministic)
        inner = [x]
        for layer in self.dec_layers:
            x = layer(x, tgt_mask, enc, enc_mask,
                      deterministic=deterministic)
            inner.append(x)
        x = self.dec_norm(x)
        feat = self.feat_proj(x)
        eos_logits = self.eos_proj(x)[..., 0]
        post = feat + self.postnet(feat, deterministic=deterministic)
        if return_inner:
            return post, feat, eos_logits, inner
        return post, feat, eos_logits

    def decode_step(self, prev_feat, enc, enc_mask, position,
                    max_decode_len: int = 2048):
        """One cached AR step: prev_feat [B, 1, out_dim] -> (feat [B,
        out_dim], eos_logit [B]). Postnet is NOT applied here — the
        reference applies it once over the full collected sequence
        (speech_generator.py:95-96)."""
        x = self._dec_input(prev_feat, jnp.full((1, 1), position))
        for layer in self.dec_layers:
            x = layer(x, None, enc, enc_mask, deterministic=True,
                      decode=True, max_decode_len=max_decode_len)
        x = self.dec_norm(x)
        return self.feat_proj(x)[:, 0], self.eos_proj(x)[:, 0, 0]

    def apply_postnet(self, feat, deterministic: bool = True):
        return feat + self.postnet(feat, deterministic=deterministic)

    def __call__(self, src_tokens, src_lengths, prev_feats, tgt_mask,
                 deterministic: bool = True):
        enc, enc_mask = self.encode(src_tokens,
                                    deterministic=deterministic)
        post, feat, eos_logits = self.decode_full(
            prev_feats, tgt_mask, enc, enc_mask, deterministic=deterministic
        )
        return {"post_feat": post, "feat": feat, "eos_logits": eos_logits}


def tts_loss(out, feat_tgt, tgt_lengths, bce_pos_weight: float = 1.0):
    """Tacotron2Criterion parity (fairseq/criterions/tacotron2_loss.py
    :168-199): masked L1 + MSE on BOTH pre- and post-net features, BCE with
    logits on the eos head (positive exactly at the last valid frame).
    Returns (loss, metrics dict) with mean reductions over valid frames."""
    b, t, d = feat_tgt.shape
    mask = jnp.arange(t)[None, :] < tgt_lengths[:, None]
    eos_tgt = (jnp.arange(t)[None, :] == (tgt_lengths - 1)[:, None])
    denom = jnp.maximum(jnp.sum(mask), 1)

    def masked_mean(x):
        return jnp.sum(jnp.where(mask[..., None], x, 0.0)) / (denom * d)

    l1 = masked_mean(jnp.abs(out["feat"] - feat_tgt)) + masked_mean(
        jnp.abs(out["post_feat"] - feat_tgt)
    )
    mse = masked_mean(jnp.square(out["feat"] - feat_tgt)) + masked_mean(
        jnp.square(out["post_feat"] - feat_tgt)
    )
    z = out["eos_logits"].astype(jnp.float32)
    # BCEWithLogits with pos_weight: -[w*y*log(sig) + (1-y)*log(1-sig)]
    per = jnp.maximum(z, 0.0) - z * eos_tgt + jnp.log1p(jnp.exp(-jnp.abs(z)))
    per = per + (bce_pos_weight - 1.0) * eos_tgt * (
        jnp.log1p(jnp.exp(-jnp.abs(z))) + jnp.maximum(-z, 0.0)
    )
    eos_loss = jnp.sum(jnp.where(mask, per, 0.0)) / denom
    loss = l1 + mse + eos_loss
    return loss, {"loss": loss, "l1_loss": l1, "mse_loss": mse,
                  "eos_loss": eos_loss}


@register_model("tts_transformer")
class TTSTransformerModel(ModelHolder):
    @classmethod
    def build_model(cls, cfg: Config, task=None) -> "TTSTransformerModel":
        vocab = cfg.get("vocab_size")
        if vocab is None and task is not None and \
                getattr(task, "source_dictionary", None) is not None:
            vocab = len(task.source_dictionary)
        nfs = cfg.get("n_frames_per_step", 1)
        module = TTSTransformerModule(
            vocab_size=vocab or 100,
            dim=cfg.get("encoder_embed_dim", 512),
            ffn_dim=cfg.get("encoder_ffn_embed_dim", 2048),
            encoder_layers=cfg.get("encoder_transformer_layers", 6),
            decoder_layers=cfg.get("decoder_transformer_layers", 6),
            heads=cfg.get("encoder_attention_heads", 4),
            dropout=cfg.get("dropout", 0.1),
            out_dim=cfg.get("output_frame_dim", 80) * nfs,
            n_frames_per_step=nfs,
            conv_layers=cfg.get("encoder_conv_layers", 3),
            conv_kernel=cfg.get("encoder_conv_kernel_size", 5),
            conv_dropout=cfg.get("encoder_dropout", 0.5),
            prenet_layers=cfg.get("prenet_layers", 2),
            prenet_dim=cfg.get("prenet_dim", 256),
            prenet_dropout=cfg.get("prenet_dropout", 0.5),
            postnet_layers=cfg.get("postnet_layers", 5),
            postnet_dim=cfg.get("postnet_conv_dim", 512),
            postnet_kernel=cfg.get("postnet_conv_kernel_size", 5),
            postnet_dropout=cfg.get("postnet_dropout", 0.5),
            dtype=jnp.dtype(cfg.get("dtype", "float32")),
        )
        return cls(module=module, cfg=cfg)


@register_architecture("tts_transformer", "tts_transformer_base")
def tts_transformer_base(cfg: Config):
    cfg.setdefault("encoder_embed_dim", 512)
    cfg.setdefault("encoder_ffn_embed_dim", 2048)
    cfg.setdefault("encoder_transformer_layers", 6)
    cfg.setdefault("decoder_transformer_layers", 6)
    cfg.setdefault("encoder_attention_heads", 4)
    cfg.setdefault("dropout", 0.1)
    cfg.setdefault("output_frame_dim", 80)
    cfg.setdefault("prenet_dim", 256)
    cfg.setdefault("postnet_conv_dim", 512)
