"""UnitY two-pass direct S2ST: conformer speech encoder -> first-pass MT
text decoder -> text-to-unit encoder -> second-pass discrete-unit decoder.

Capability parity with the reference's
fairseq/models/speech_to_speech/s2s_conformer_unity.py (UnityConformerModel,
arch names ``unity_conformer`` / legacy ``s2ut_conformer_translatotron2``)
plus the ``speech_to_unit_2pass`` criterion surface
(fairseq/criterions/speech_to_speech_criterion.py:258-330):

* the first-pass decoder IS one of the ``--multitask-config-yaml`` tasks
  (the one flagged ``is_first_pass_decoder`` / the first-pass index in
  data_cfg) — its decoder gets ``--translation-decoder-layers`` layers at
  the main decoder width (s2s_conformer_unity.py:92-101,160-182);
* the second pass consumes the first-pass decoder's post-layer-norm hidden
  states (reference forward :236-240 takes inner_states[-1] +
  mt_decoder.layer_norm), optionally refined by a
  ``--synthesizer-encoder-layers`` text encoder without embeddings
  (TransformerEncoderNoEmb, :196-206);
* remaining multitask tasks attach as the usual aux CTC / transformer
  heads over encoder/decoder taps.

TPU redesign: both decoder passes are flax modules with KV-cache decode
methods, so two-pass beam generation (generate/unity.py) jits into a
single program — the reference's host-side rebatching between passes
(examples/speech_to_speech/unity/sequence_generator_multi_decoder.py)
becomes a static-shape in-graph handoff.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from diffnorm_tpu.config import Config
from diffnorm_tpu.models.ar_transformer import ARUnitDecoder
from diffnorm_tpu.models.conformer import ConformerEncoder
from diffnorm_tpu.models.vae import ModelHolder
from diffnorm_tpu.registry import register_architecture, register_model

PAD, BOS, EOS, UNK = 1, 0, 2, 3


class TextEncoderLayer(nn.Module):
    """Pre-norm transformer encoder layer (reference TransformerEncoderLayer
    with normalize_before=True, the synthesizer-encoder configuration)."""

    dim: int
    ffn_dim: int
    heads: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        from diffnorm_tpu.models.nar_transformer import MultiheadAttention

        res = x
        h = nn.LayerNorm(dtype=self.dtype, name="self_attn_layer_norm")(x)
        h = MultiheadAttention(
            self.dim, self.heads, dropout=self.dropout, dtype=self.dtype,
            name="self_attn",
        )(h, mask=mask, deterministic=deterministic)
        x = res + nn.Dropout(self.dropout)(h, deterministic=deterministic)

        res = x
        h = nn.LayerNorm(dtype=self.dtype, name="final_layer_norm")(x)
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return res + h


class TextEncoderNoEmb(nn.Module):
    """Transformer encoder over already-embedded features (reference
    TransformerEncoderNoEmb, speech_to_speech/modules/transformer_encoder.py):
    the UnitY text-to-unit synthesizer encoder."""

    dim: int
    ffn_dim: int
    layers: int
    heads: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        for i in range(self.layers):
            x = TextEncoderLayer(
                dim=self.dim, ffn_dim=self.ffn_dim, heads=self.heads,
                dropout=self.dropout, dtype=self.dtype, name=f"layer_{i}",
            )(x, mask, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="layer_norm")(x)


class UnityS2UTModule(nn.Module):
    vocab_size: int  # discrete units (+4 specials)
    mt_vocab_size: int  # first-pass text dictionary
    mt_task_name: str = "target_letter"
    encoder_dim: int = 256
    encoder_ffn_dim: int = 2048
    encoder_layers: int = 16
    encoder_heads: int = 4
    decoder_dim: int = 256
    decoder_ffn_dim: int = 2048
    decoder_layers: int = 6
    decoder_heads: int = 8
    translation_decoder_layers: int = 4
    synthesizer_encoder_layers: int = 0
    dropout: float = 0.1
    mt_dropout: float = 0.3  # first-pass decoder_args dropout (base arch 0.3)
    attention_dropout: Optional[float] = None
    activation_dropout: Optional[float] = None
    depthwise_kernel_size: int = 31
    n_frames_per_step: int = 1
    # aux tasks EXCLUDING the first-pass one (that task's decoder is the
    # mt_decoder below and its logits are emitted directly)
    multitask: tuple = ()
    target_speaker_embed: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.target_speaker_embed:
            self.spk_emb_proj = nn.Dense(
                self.encoder_dim, dtype=self.dtype, name="spk_emb_proj")
        self.encoder = ConformerEncoder(
            dim=self.encoder_dim, ffn_dim=self.encoder_ffn_dim,
            layers=self.encoder_layers, heads=self.encoder_heads,
            dropout=self.dropout,
            attention_dropout=self.attention_dropout,
            activation_dropout=self.activation_dropout,
            depthwise_kernel_size=self.depthwise_kernel_size,
            dtype=self.dtype, name="encoder",
        )
        # first-pass MT decoder: --translation-decoder-layers at the main
        # decoder width/heads (s2s_conformer_unity.py:92-101); param scope
        # "mt_<task>_decoder" matches the aux-head naming convention
        self.mt_decoder = ARUnitDecoder(
            vocab_size=self.mt_vocab_size,
            dim=self.decoder_dim,
            ffn_dim=self.decoder_ffn_dim,
            layers=self.translation_decoder_layers,
            heads=self.decoder_heads,
            dropout=self.mt_dropout,
            share_input_output_embed=True,
            dtype=self.dtype, name=f"mt_{self.mt_task_name}_decoder",
        )
        if self.synthesizer_encoder_layers > 0:
            self.synth_encoder = TextEncoderNoEmb(
                dim=self.decoder_dim, ffn_dim=self.decoder_ffn_dim,
                layers=self.synthesizer_encoder_layers,
                heads=self.decoder_heads, dropout=self.dropout,
                dtype=self.dtype, name="synthesizer_encoder",
            )
        else:
            self.synth_encoder = None
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

    # ---- generation methods (each pass is cache-decodable; see
    # generate/unity.py for the fused two-pass beam program) ----

    def encode(self, src, src_lengths, deterministic: bool = True,
               tgt_speaker=None):
        enc, enc_mask = self.encoder(src, src_lengths,
                                     deterministic=deterministic)
        return self.apply_speaker(enc, tgt_speaker), enc_mask

    def apply_speaker(self, enc, tgt_speaker):
        """--target-speaker-embed conditioning on the speech-encoder output
        (reference s2s_conformer_unity.py:219-227 passes tgt_speaker into the
        encoder; the concat+Dense matches s2s_transformer.py:44-52). No-op
        unless enabled and an embedding is supplied."""
        if not self.target_speaker_embed or tgt_speaker is None:
            return enc
        spk = jnp.broadcast_to(
            tgt_speaker[:, None, :].astype(enc.dtype),
            (enc.shape[0], enc.shape[1], tgt_speaker.shape[-1]))
        return self.spk_emb_proj(jnp.concatenate([enc, spk], axis=-1))

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
        reference sequence_generator_multi_decoder.py:219-226
        features_only re-run over the selected hypothesis)."""
        _, feats = self.mt_decoder(
            prev_tokens_mt, enc, enc_mask, deterministic=True,
            return_features=True,
        )
        return feats

    def synthesize(self, feats, mask, deterministic: bool = True):
        """Text-to-unit encoder over first-pass features (reference forward
        :242-253: TransformerEncoderNoEmb or identity)."""
        if self.synth_encoder is not None:
            return self.synth_encoder(feats, mask,
                                      deterministic=deterministic), mask
        return feats, mask

    def decode_step(self, token, t2u, t2u_mask, position,
                    max_decode_len: int = 256):
        """Single second-pass step: token [B, 1] -> unit logits [B, V]
        (or [B, k, V] stacked) cross-attending the t2u encoder output."""
        logits = self.decoder(
            token, t2u, t2u_mask, deterministic=True, decode=True,
            decode_position=position, max_decode_len=max_decode_len,
        )
        return logits[:, 0]

    # ---- training forward ----

    def __call__(self, src, src_lengths, prev_tokens, prev_tokens_mt,
                 tgt_tokens=None, deterministic=True, multitask_prev=None,
                 tgt_speaker=None):
        """Teacher-forced two-pass forward (reference forward :214-275).
        Returns logits over units plus out["multitask"][mt_task_name]
        logits from the first-pass decoder (the reference reuses
        mt_decoder_out for that task's loss, speech_to_speech_criterion.py
        get_multitask_loss model_out["mt_decoder_out"] branch)."""
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

        # 1. first-pass MT decoder (logits for its loss + features)
        mt_logits, mt_feats = self.mt_decoder(
            prev_tokens_mt, enc, enc_mask, deterministic=deterministic,
            return_features=True,
        )
        mt_mask = prev_tokens_mt != PAD

        # 2. text-to-unit encoder
        t2u, t2u_mask = self.synthesize(mt_feats, mt_mask,
                                        deterministic=deterministic)

        # 3. second-pass unit decoder
        need_inner = run_mt and any(
            s.input_from == "decoder" for s in self.multitask)
        if need_inner:
            logits, inner = self.decoder(
                prev_tokens, t2u, t2u_mask, deterministic=deterministic,
                return_inner=True)
        else:
            logits = self.decoder(prev_tokens, t2u, t2u_mask,
                                  deterministic=deterministic)

        out = dict(logits=logits,
                   multitask={self.mt_task_name: {"logits": mt_logits}})
        if run_mt:
            out["multitask"].update(aux_head_outputs(
                self.multitask, self.mt_modules, multitask_prev, enc_states,
                enc_mask, inner if need_inner else None, prev_tokens,
                deterministic))
        return out


@register_model("unity_conformer")
class UnityModel(ModelHolder):
    @classmethod
    def build_model(cls, cfg: Config, task=None) -> "UnityModel":
        vocab = cfg.get("vocab_size")
        if vocab is None and task is not None and task.target_dictionary is not None:
            vocab = len(task.target_dictionary)
        mt_name = getattr(task, "mt_task_name", None)
        assert mt_name, (
            "unity_conformer needs a first-pass decoder task: pass "
            "--multitask-config-yaml with a transformer task named "
            "'target*' or flagged is_first_pass_decoder "
            "(reference s2s_conformer_unity.py:193)"
        )
        specs = tuple(task.aux_task_specs())
        mt_spec = next(s for s in specs if s.name == mt_name)
        module = UnityS2UTModule(
            vocab_size=vocab or 1004,
            mt_vocab_size=mt_spec.vocab_size,
            mt_task_name=mt_name,
            encoder_dim=cfg.get("encoder_embed_dim", 256),
            encoder_ffn_dim=cfg.get("encoder_ffn_embed_dim", 2048),
            encoder_layers=cfg.get("encoder_layers", 16),
            encoder_heads=cfg.get("encoder_attention_heads", 4),
            decoder_dim=cfg.get("decoder_embed_dim", 256),
            decoder_ffn_dim=cfg.get("decoder_ffn_embed_dim", 2048),
            decoder_layers=cfg.get("decoder_layers", 6),
            decoder_heads=cfg.get("decoder_attention_heads", 8),
            translation_decoder_layers=cfg.get(
                "translation_decoder_layers", 4),
            synthesizer_encoder_layers=cfg.get(
                "synthesizer_encoder_layers", 0),
            dropout=cfg.get("dropout", 0.1),
            mt_dropout=mt_spec.dropout,
            attention_dropout=cfg.get("attention_dropout"),
            activation_dropout=cfg.get(
                "relu_dropout", cfg.get("activation_dropout")),
            depthwise_kernel_size=cfg.get("depthwise_conv_kernel_size", 31),
            n_frames_per_step=cfg.get("n_frames_per_step", 1),
            multitask=tuple(s for s in specs if s.name != mt_name),
            target_speaker_embed=bool(cfg.get("target_speaker_embed", False)),
            dtype=jnp.dtype(cfg.get("dtype", "float32")),
        )
        return cls(module=module, cfg=cfg)


@register_architecture("unity_conformer", "unity_conformer")
def unity_conformer_arch(cfg: Config):
    # reference unity_conformer_architecture_base
    # (s2s_conformer_unity.py:281-293) + s2ut_architecture_base decoder
    # defaults (s2s_transformer.py:647-672)
    cfg.setdefault("encoder_embed_dim", 256)
    cfg.setdefault("encoder_ffn_embed_dim", 2048)
    cfg.setdefault("encoder_layers", 16)
    cfg.setdefault("encoder_attention_heads", 4)
    cfg.setdefault("depthwise_conv_kernel_size", 31)
    cfg.setdefault("decoder_embed_dim", cfg.get("encoder_embed_dim"))
    cfg.setdefault("decoder_ffn_embed_dim", cfg.get("encoder_ffn_embed_dim"))
    cfg.setdefault("decoder_layers", 6)
    cfg.setdefault("decoder_attention_heads", 8)


# the reference registers the same model under a legacy arch name
@register_architecture("unity_conformer", "s2ut_conformer_translatotron2")
def unity_conformer_arch_legacy(cfg: Config):
    unity_conformer_arch(cfg)
