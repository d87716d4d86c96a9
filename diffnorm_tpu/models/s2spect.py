"""Speech-to-spectrogram S2ST (the reference's second S2ST modality).

Capability parity with fairseq/models/speech_to_speech/s2s_transformer.py
`S2SpecTTransformerModel` (:426-580): S2T transformer speech encoder + the
TTS transformer spectrogram decoder (Tacotron prenet/postnet, eos head),
trained with the Tacotron2-style criterion
(fairseq/criterions/speech_to_speech_criterion.py:333
SpeechToSpectrogramMultitaskTaskCriterion) and decoded by the AR
spectrogram rollout (generate/speech_ar.py).

TPU design: inherits the decode_full / KV-cached decode_step machinery
from TTSTransformerModule (models/tts_transformer.py) so the AR rollout
jits into one scan; only the encoder differs (fbank in, masked).
"""

from __future__ import annotations

import jax.numpy as jnp

from diffnorm_tpu.config import Config
from diffnorm_tpu.models.conformer import ConformerEncoder
from diffnorm_tpu.models.s2t_transformer import S2TTransformerEncoder
from diffnorm_tpu.models.tts_transformer import (
    TTSTransformerModule,
    _setup_tts_decoder,
)
from diffnorm_tpu.models.vae import ModelHolder
from diffnorm_tpu.registry import register_architecture, register_model


class S2SpecTModule(TTSTransformerModule):
    """Speech encoder + inherited TTS spectrogram decoder.

    `dim`/`ffn_dim`/`decoder_layers`/`heads` configure the decoder (the
    cross-attention projections handle an encoder width different from
    `dim`); `enc_*` fields configure the speech encoder."""

    enc_dim: int = 512
    enc_ffn_dim: int = 2048
    enc_layers: int = 12
    enc_heads: int = 8
    encoder_type: str = "transformer"  # or "conformer"
    conv_channels: int = 1024
    conv_kernel_sizes: tuple = (5, 5)
    depthwise_kernel_size: int = 31
    # generate/speech_ar.py passes src_lengths to encode on this marker
    encode_needs_lengths: bool = True

    def setup(self):
        common = dict(
            dim=self.enc_dim, ffn_dim=self.enc_ffn_dim,
            layers=self.enc_layers, heads=self.enc_heads,
            dropout=self.dropout,
            conv_channels=self.conv_channels,
            conv_kernel_sizes=tuple(self.conv_kernel_sizes),
            dtype=self.dtype, name="encoder",
        )
        if self.encoder_type == "conformer":
            self.encoder = ConformerEncoder(
                depthwise_kernel_size=self.depthwise_kernel_size, **common)
        else:
            self.encoder = S2TTransformerEncoder(**common)
        _setup_tts_decoder(self)

    def encode(self, src_tokens, src_lengths=None, deterministic: bool = True):
        assert src_lengths is not None, "s2spect encode needs src_lengths"
        return self.encoder(src_tokens, src_lengths,
                            deterministic=deterministic)

    def __call__(self, src_tokens, src_lengths, prev_feats, tgt_mask,
                 deterministic: bool = True):
        enc, enc_mask = self.encode(src_tokens, src_lengths,
                                    deterministic=deterministic)
        post, feat, eos_logits = self.decode_full(
            prev_feats, tgt_mask, enc, enc_mask, deterministic=deterministic
        )
        return {"post_feat": post, "feat": feat, "eos_logits": eos_logits}


@register_model("s2spect")
class S2SpecTModel(ModelHolder):
    @classmethod
    def build_model(cls, cfg: Config, task=None) -> "S2SpecTModel":
        conv_ks = cfg.get("conv_kernel_sizes", "5,5")
        if isinstance(conv_ks, str):
            conv_ks = tuple(int(k) for k in conv_ks.split(","))
        k = cfg.get("n_frames_per_step", 1)
        module = S2SpecTModule(
            vocab_size=1,  # unused: no token embedding on the speech side
            enc_dim=cfg.get("encoder_embed_dim", 512),
            enc_ffn_dim=cfg.get("encoder_ffn_embed_dim", 2048),
            enc_layers=cfg.get("encoder_layers", 12),
            enc_heads=cfg.get("encoder_attention_heads", 8),
            encoder_type=cfg.get("encoder_type", "transformer"),
            conv_channels=cfg.get("conv_channels", 1024),
            conv_kernel_sizes=conv_ks,
            depthwise_kernel_size=cfg.get("depthwise_conv_kernel_size", 31),
            dim=cfg.get("decoder_embed_dim", 512),
            ffn_dim=cfg.get("decoder_ffn_embed_dim", 2048),
            decoder_layers=cfg.get(
                "decoder_transformer_layers", cfg.get("decoder_layers", 6)),
            heads=cfg.get("decoder_attention_heads", 4),
            dropout=cfg.get("dropout", 0.1),
            out_dim=cfg.get("output_frame_dim", 80) * k,
            n_frames_per_step=k,
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


@register_architecture("s2spect", "s2spect_transformer")
def s2spect_transformer_arch(cfg: Config):
    """Reference s2spect_architecture_base (s2s_transformer.py:714-736)."""
    cfg.setdefault("encoder_embed_dim", 512)
    cfg.setdefault("encoder_ffn_embed_dim", 2048)
    cfg.setdefault("encoder_layers", 12)
    cfg.setdefault("encoder_attention_heads", 8)
    cfg.setdefault("decoder_embed_dim", 512)
    cfg.setdefault("decoder_ffn_embed_dim", 2048)
    cfg.setdefault("decoder_transformer_layers", 6)
    cfg.setdefault("decoder_attention_heads", 4)
    cfg.setdefault("output_frame_dim", 80)
    cfg.setdefault("dropout", 0.1)


@register_architecture("s2spect", "s2spect_transformer_fisher")
def s2spect_transformer_fisher_arch(cfg: Config):
    """Reference s2spect_architecture_fisher (s2s_transformer.py:748-758)."""
    cfg.setdefault("encoder_embed_dim", 256)
    cfg.setdefault("encoder_ffn_embed_dim", 256 * 8)
    cfg.setdefault("encoder_attention_heads", 4)
    cfg.setdefault("prenet_dim", 32)
    s2spect_transformer_arch(cfg)


@register_architecture("s2spect", "s2spect_conformer")
def s2spect_conformer_arch(cfg: Config):
    """Conformer-encoder variant (reference s2spect_conformer,
    fairseq/models/speech_to_speech/s2s_conformer.py)."""
    cfg.encoder_type = "conformer"
    cfg.setdefault("encoder_embed_dim", 256)
    cfg.setdefault("encoder_ffn_embed_dim", 2048)
    cfg.setdefault("encoder_layers", 16)
    cfg.setdefault("encoder_attention_heads", 4)
    s2spect_transformer_arch(cfg)
