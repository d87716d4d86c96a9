"""AR text translation transformer — the "transformer" model family of
fairseq (fairseq/models/transformer/transformer_legacy.py + the
registered arch presets fairseq/models/transformer/transformer_legacy.py:
transformer, transformer_iwslt_de_en, transformer_wmt_en_de_big).

TPU shape: reuses the pre-LN TextEncoder (token embeddings + sinusoidal
positions, models/cmlm_text.py) and the causal KV-cache ARUnitDecoder
(models/ar_transformer.py); decoding goes through generate/beam_search.py,
whose loop is hypothesis-for-hypothesis parity-tested against the verbatim
reference sequence_generator.py. Trains with --criterion
label_smoothed_cross_entropy on --task translation bitext (plain line
files or fairseq-preprocess binarized pairs).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from diffnorm_tpu.config import Config
from diffnorm_tpu.models.ar_transformer import ARUnitDecoder
from diffnorm_tpu.models.cmlm_text import TextEncoder
from diffnorm_tpu.models.vae import ModelHolder
from diffnorm_tpu.registry import register_architecture, register_model


class TextTransformerModule(nn.Module):
    src_vocab_size: int
    tgt_vocab_size: int
    encoder_dim: int = 512
    encoder_ffn_dim: int = 2048
    encoder_layers: int = 6
    encoder_heads: int = 8
    decoder_dim: int = 512
    decoder_ffn_dim: int = 2048
    decoder_layers: int = 6
    decoder_heads: int = 8
    dropout: float = 0.1
    attention_dropout: float | None = None
    activation_dropout: float | None = None
    share_decoder_input_output_embed: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = TextEncoder(
            vocab_size=self.src_vocab_size, dim=self.encoder_dim,
            ffn_dim=self.encoder_ffn_dim, layers=self.encoder_layers,
            heads=self.encoder_heads, dropout=self.dropout,
            dtype=self.dtype, name="encoder",
        )
        self.decoder = ARUnitDecoder(
            vocab_size=self.tgt_vocab_size, dim=self.decoder_dim,
            ffn_dim=self.decoder_ffn_dim, layers=self.decoder_layers,
            heads=self.decoder_heads, dropout=self.dropout,
            attention_dropout=self.attention_dropout,
            activation_dropout=self.activation_dropout,
            share_input_output_embed=self.share_decoder_input_output_embed,
            dtype=self.dtype, name="decoder",
        )

    # beam_search.ar_generate drives encode/decode_step by name
    def encode(self, src_tokens, src_lengths=None, deterministic: bool = True):
        del src_lengths  # the pad mask is derived from the tokens
        return self.encoder(src_tokens, deterministic=deterministic)

    def decode_step(self, token, enc, enc_mask, position,
                    max_decode_len: int = 256):
        """Single AR step: token [B, 1] -> logits [B, V] (cache-mutating)."""
        logits = self.decoder(
            token, enc, enc_mask, deterministic=True, decode=True,
            decode_position=position, max_decode_len=max_decode_len,
        )
        return logits[:, 0]

    def __call__(self, src_tokens, src_lengths, prev_tokens,
                 deterministic: bool = True):
        enc, enc_mask = self.encoder(src_tokens, deterministic=deterministic)
        logits = self.decoder(prev_tokens, enc, enc_mask,
                              deterministic=deterministic)
        return dict(logits=logits)


@register_model("transformer")
class TextTransformerModel(ModelHolder):
    @classmethod
    def build_model(cls, cfg: Config, task=None) -> "TextTransformerModel":
        if cfg.get("share_all_embeddings"):
            raise ValueError(
                "--share-all-embeddings is not supported (encoder/decoder "
                "embeddings are separate tables here); use "
                "--share-decoder-input-output-embed")
        src_vocab = cfg.get("src_vocab_size")
        tgt_vocab = cfg.get("vocab_size")
        if task is not None:
            if src_vocab is None and getattr(task, "src_dict", None) is not None:
                src_vocab = len(task.src_dict)
            if tgt_vocab is None and task.target_dictionary is not None:
                tgt_vocab = len(task.target_dictionary)
        module = TextTransformerModule(
            src_vocab_size=src_vocab or 1004,
            tgt_vocab_size=tgt_vocab or 1004,
            encoder_dim=cfg.get("encoder_embed_dim", 512),
            encoder_ffn_dim=cfg.get("encoder_ffn_embed_dim", 2048),
            encoder_layers=cfg.get("encoder_layers", 6),
            encoder_heads=cfg.get("encoder_attention_heads", 8),
            decoder_dim=cfg.get("decoder_embed_dim", 512),
            decoder_ffn_dim=cfg.get("decoder_ffn_embed_dim", 2048),
            decoder_layers=cfg.get("decoder_layers", 6),
            decoder_heads=cfg.get("decoder_attention_heads", 8),
            dropout=cfg.get("dropout", 0.1),
            attention_dropout=cfg.get("attention_dropout"),
            activation_dropout=cfg.get(
                "relu_dropout", cfg.get("activation_dropout")),
            share_decoder_input_output_embed=bool(
                cfg.get("share_decoder_input_output_embed", True)),
            dtype=jnp.dtype(cfg.get("dtype", "float32")),
        )
        return cls(module=module, cfg=cfg)


@register_architecture("transformer", "transformer")
def transformer_base_arch(cfg: Config):
    cfg.setdefault("encoder_embed_dim", 512)
    cfg.setdefault("encoder_ffn_embed_dim", 2048)
    cfg.setdefault("encoder_layers", 6)
    cfg.setdefault("encoder_attention_heads", 8)
    cfg.setdefault("decoder_embed_dim", 512)
    cfg.setdefault("decoder_ffn_embed_dim", 2048)
    cfg.setdefault("decoder_layers", 6)
    cfg.setdefault("decoder_attention_heads", 8)
    cfg.setdefault("dropout", 0.1)


@register_architecture("transformer", "transformer_iwslt_de_en")
def transformer_iwslt_arch(cfg: Config):
    cfg.setdefault("encoder_embed_dim", 512)
    cfg.setdefault("encoder_ffn_embed_dim", 1024)
    cfg.setdefault("encoder_layers", 6)
    cfg.setdefault("encoder_attention_heads", 4)
    cfg.setdefault("decoder_embed_dim", 512)
    cfg.setdefault("decoder_ffn_embed_dim", 1024)
    cfg.setdefault("decoder_layers", 6)
    cfg.setdefault("decoder_attention_heads", 4)
    transformer_base_arch(cfg)


@register_architecture("transformer", "transformer_wmt_en_de_big")
def transformer_big_arch(cfg: Config):
    cfg.setdefault("encoder_embed_dim", 1024)
    cfg.setdefault("encoder_ffn_embed_dim", 4096)
    cfg.setdefault("encoder_attention_heads", 16)
    cfg.setdefault("decoder_embed_dim", 1024)
    cfg.setdefault("decoder_ffn_embed_dim", 4096)
    cfg.setdefault("decoder_attention_heads", 16)
    cfg.setdefault("dropout", 0.3)
    transformer_base_arch(cfg)
