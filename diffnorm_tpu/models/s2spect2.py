"""Translatotron2-style two-pass speech-to-spectrogram S2ST.

Capability parity with the reference's
fairseq/models/speech_to_speech/s2s_conformer_translatotron2.py
(`S2SpecT2ConformerModel`, arch names ``s2spect2_conformer`` / legacy
``s2spect_conformer_translatotron2``) driven by the
``speech_to_spectrogram_2pass`` criterion
(fairseq/criterions/speech_to_speech_criterion.py:434-520):

* conformer speech encoder -> first-pass MT text decoder (one of the
  ``--multitask-config-yaml`` tasks, flagged ``is_first_pass_decoder``;
  ``--translation-decoder-layers`` layers at the decoder width,
  s2s_conformer_translatotron2.py:63-105);
* the second pass consumes the first-pass decoder's post-layer-norm
  hidden states (reference forward :196-208), optionally refined by a
  ``--synthesizer-encoder-layers`` TransformerEncoderNoEmb (:210-221);
* a Tacotron-style AR spectrogram decoder synthesizes mel frames over the
  text features (:223-230, TTSTransformerDecoder with
  encoder_embed_dim=decoder_embed_dim, :107-115);
* remaining multitask tasks attach as aux CTC / transformer heads over
  encoder/decoder taps.

TPU redesign: the spectrogram decoder reuses the KV-cached TTS machinery
(models/tts_transformer.py) and the first-pass decoder is the same cached
ARUnitDecoder UnitY uses, so two-pass generation (first-pass beam ->
in-graph handoff -> AR mel rollout) jits into ONE program
(generate/translatotron2.py) instead of the reference's host-side
multi-decoder generator.
"""

from __future__ import annotations

import jax.numpy as jnp

from diffnorm_tpu.config import Config
from diffnorm_tpu.models.ar_transformer import ARUnitDecoder
from diffnorm_tpu.models.s2spect import S2SpecTModule
from diffnorm_tpu.models.unity import TextEncoderNoEmb
from diffnorm_tpu.models.vae import ModelHolder
from diffnorm_tpu.registry import register_architecture, register_model

PAD, BOS, EOS, UNK = 1, 0, 2, 3


class S2SpecT2Module(S2SpecTModule):
    """Conformer encoder + first-pass MT decoder + optional synthesizer
    text encoder + inherited Tacotron-style AR spectrogram decoder.

    `dim`/`ffn_dim`/`heads` size the second-pass decoder AND the first-pass
    MT decoder / synthesizer encoder (reference passes decoder_embed_dim to
    all three, s2s_conformer_translatotron2.py:75,110,171)."""

    mt_vocab_size: int = 0
    mt_task_name: str = "target_letter"
    translation_decoder_layers: int = 4
    synthesizer_encoder_layers: int = 0
    mt_dropout: float = 0.3
    # aux tasks EXCLUDING the first-pass one (its decoder is mt_decoder)
    multitask: tuple = ()

    def setup(self):
        super().setup()  # encoder + TTS spectrogram decoder fields
        assert self.mt_vocab_size > 0, "two-pass model needs an MT vocab"
        self.mt_decoder = ARUnitDecoder(
            vocab_size=self.mt_vocab_size,
            dim=self.dim,
            ffn_dim=self.ffn_dim,
            layers=self.translation_decoder_layers,
            heads=self.heads,
            dropout=self.mt_dropout,
            share_input_output_embed=True,
            dtype=self.dtype, name=f"mt_{self.mt_task_name}_decoder",
        )
        if self.synthesizer_encoder_layers > 0:
            self.synth_encoder = TextEncoderNoEmb(
                dim=self.dim, ffn_dim=self.ffn_dim,
                layers=self.synthesizer_encoder_layers,
                heads=self.heads, dropout=self.dropout,
                dtype=self.dtype, name="synthesizer_encoder",
            )
        else:
            self.synth_encoder = None
        from diffnorm_tpu.models.nar_transformer import build_aux_heads

        self.mt_modules = build_aux_heads(self.multitask, self.dtype)

    # ---- generation methods (generate/translatotron2.py fuses the
    # first-pass beam, the handoff, and the AR mel rollout) ----

    def decode_mt_step(self, token, enc, enc_mask, position,
                       max_decode_len: int = 256):
        """Single first-pass step: token [B, 1] -> text logits [B, Vmt]."""
        logits = self.mt_decoder(
            token, enc, enc_mask, deterministic=True, decode=True,
            decode_position=position, max_decode_len=max_decode_len,
        )
        return logits[:, 0]

    def mt_features(self, prev_tokens_mt, enc, enc_mask):
        """Teacher-forced first-pass features [B, L, D] (post-layer-norm;
        reference forward :196-204 takes inner_states[-1] + layer_norm)."""
        _, feats = self.mt_decoder(
            prev_tokens_mt, enc, enc_mask, deterministic=True,
            return_features=True,
        )
        return feats

    def synthesize(self, feats, mask, deterministic: bool = True):
        """Synthesizer text encoder over first-pass features (reference
        forward :210-221: TransformerEncoderNoEmb or identity)."""
        if self.synth_encoder is not None:
            return self.synth_encoder(feats, mask,
                                      deterministic=deterministic), mask
        return feats, mask

    # decode_step / apply_postnet for the AR mel rollout are inherited from
    # the TTS decoder (models/tts_transformer.py).

    # ---- training forward ----

    def __call__(self, src_tokens, src_lengths, prev_feats, tgt_mask,
                 prev_tokens_mt, tgt_tokens=None, multitask_prev=None,
                 deterministic: bool = True):
        """Teacher-forced two-pass forward (reference forward :177-237).
        Returns the Tacotron-style dict plus out["multitask"][mt_task_name]
        logits from the first-pass decoder (the reference reuses
        mt_decoder_out for that task's loss through get_multitask_loss)."""
        run_aux = bool(self.multitask) and tgt_tokens is not None
        if run_aux:
            enc, enc_mask, enc_states = self.encoder(
                src_tokens, src_lengths, deterministic=deterministic,
                return_all_layers=True)
        else:
            enc, enc_mask = self.encoder(src_tokens, src_lengths,
                                         deterministic=deterministic)

        # 1. first-pass MT decoder (logits for its loss + features)
        mt_logits, mt_feats = self.mt_decoder(
            prev_tokens_mt, enc, enc_mask, deterministic=deterministic,
            return_features=True,
        )
        mt_mask = prev_tokens_mt != PAD

        # 2. synthesizer text encoder
        t2u, t2u_mask = self.synthesize(mt_feats, mt_mask,
                                        deterministic=deterministic)

        # 3. AR spectrogram decoder over the text features
        need_inner = run_aux and any(
            s.input_from == "decoder" for s in self.multitask)
        if need_inner:
            post, feat, eos_logits, inner = self.decode_full(
                prev_feats, tgt_mask, t2u, t2u_mask,
                deterministic=deterministic, return_inner=True)
        else:
            post, feat, eos_logits = self.decode_full(
                prev_feats, tgt_mask, t2u, t2u_mask,
                deterministic=deterministic)

        out = {
            "post_feat": post, "feat": feat, "eos_logits": eos_logits,
            "multitask": {self.mt_task_name: {"logits": mt_logits}},
        }
        if run_aux:
            from diffnorm_tpu.models.nar_transformer import aux_head_outputs

            # decoder-tapped CTC masks come from dec_tokens != PAD; the
            # spectrogram decoder has no tokens, so synthesize ids whose
            # pad pattern encodes tgt_mask
            dec_tokens = jnp.where(tgt_mask, EOS, PAD)
            out["multitask"].update(aux_head_outputs(
                self.multitask, self.mt_modules, multitask_prev, enc_states,
                enc_mask, inner if need_inner else None, dec_tokens,
                deterministic))
        return out


@register_model("s2spect2_conformer")
class S2SpecT2Model(ModelHolder):
    @classmethod
    def build_model(cls, cfg: Config, task=None) -> "S2SpecT2Model":
        mt_name = getattr(task, "mt_task_name", None)
        assert mt_name, (
            "s2spect2_conformer needs a first-pass decoder task: pass "
            "--multitask-config-yaml with a transformer task flagged "
            "is_first_pass_decoder (reference "
            "s2s_conformer_translatotron2.py:157)"
        )
        specs = tuple(task.aux_task_specs())
        mt_spec = next(s for s in specs if s.name == mt_name)
        conv_ks = cfg.get("conv_kernel_sizes", "5,5")
        if isinstance(conv_ks, str):
            conv_ks = tuple(int(k) for k in conv_ks.split(","))
        k = cfg.get("n_frames_per_step", 1)
        module = S2SpecT2Module(
            vocab_size=1,  # unused: no token embedding on the speech side
            mt_vocab_size=mt_spec.vocab_size,
            mt_task_name=mt_name,
            enc_dim=cfg.get("encoder_embed_dim", 256),
            enc_ffn_dim=cfg.get("encoder_ffn_embed_dim", 2048),
            enc_layers=cfg.get("encoder_layers", 16),
            enc_heads=cfg.get("encoder_attention_heads", 4),
            encoder_type=cfg.get("encoder_type", "conformer"),
            conv_channels=cfg.get("conv_channels", 1024),
            conv_kernel_sizes=conv_ks,
            depthwise_kernel_size=cfg.get("depthwise_conv_kernel_size", 31),
            dim=cfg.get("decoder_embed_dim", 512),
            ffn_dim=cfg.get("decoder_ffn_embed_dim", 2048),
            decoder_layers=cfg.get(
                "decoder_transformer_layers", cfg.get("decoder_layers", 6)),
            heads=cfg.get("decoder_attention_heads", 4),
            translation_decoder_layers=cfg.get(
                "translation_decoder_layers", 4),
            synthesizer_encoder_layers=cfg.get(
                "synthesizer_encoder_layers", 0),
            mt_dropout=mt_spec.dropout,
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
            multitask=tuple(s for s in specs if s.name != mt_name),
            dtype=jnp.dtype(cfg.get("dtype", "float32")),
        )
        return cls(module=module, cfg=cfg)


@register_architecture("s2spect2_conformer", "s2spect2_conformer")
def s2spect2_conformer_arch(cfg: Config):
    """Reference s2spect2_conformer_architecture_base
    (s2s_conformer_translatotron2.py:240-254) + s2spect_architecture_base
    decoder defaults (s2s_transformer.py:688-709)."""
    cfg.encoder_type = "conformer"
    cfg.setdefault("encoder_embed_dim", 256)
    cfg.setdefault("encoder_ffn_embed_dim", 2048)
    cfg.setdefault("encoder_layers", 16)
    cfg.setdefault("encoder_attention_heads", 4)
    cfg.setdefault("depthwise_conv_kernel_size", 31)
    cfg.setdefault("dropout", 0.1)
    cfg.setdefault("decoder_embed_dim", 512)
    cfg.setdefault("decoder_ffn_embed_dim",
                   4 * cfg.get("decoder_embed_dim"))
    cfg.setdefault("decoder_transformer_layers", 6)
    cfg.setdefault("decoder_attention_heads", 4)
    cfg.setdefault("output_frame_dim", 80)
    cfg.setdefault("translation_decoder_layers", 4)


# the reference registers the same model under a legacy arch name
@register_architecture("s2spect2_conformer", "s2spect_conformer_translatotron2")
def s2spect2_conformer_arch_legacy(cfg: Config):
    s2spect2_conformer_arch(cfg)
