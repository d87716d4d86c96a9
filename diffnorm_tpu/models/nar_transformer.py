"""Non-autoregressive CMLM speech-to-unit translator.

Capability parity with the reference `nar_conformer`/`nar_transformer` models
(research/TranSpeech/nar_transformer.py, nar_conformer.py):

* Conformer encoder over 80-d fbank (4x conv subsample)
* NAT Transformer unit decoder: full-context self-attention, sinusoidal
  positions keyed on pad structure, shared input/output embedding
* length head: 256-way classifier over mean-pooled encoder states
  (nar_transformer.py:435-478)
* classifier-free-guidance training dropout: with prob cg_prob the encoder
  features of a sequence are replaced by the BOS embedding "null context"
  (nar_transformer.py:371-395); inference-side guidance lives in
  generate/mask_predict.py

Dictionary layout: bos=0, pad=1, eos=2, unk=3 (mask token), units at +4.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

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


class AuxTaskSpec(NamedTuple):
    """One --multitask-config-yaml task as a static (hashable) model spec
    (reference S2STransformerMultitaskModelBase.build_multitask_decoder,
    s2s_transformer.py:171-230 + base_multitask_text_transformer_decoder_arch
    :582-616 defaults). input_layer uses the reference's indexing: -1 taps
    the final encoder layer / the last decoder inner state."""

    name: str
    decoder_type: str  # "transformer" | "ctc"
    vocab_size: int
    input_from: str = "encoder"  # "encoder" | "decoder"
    input_layer: int = -1
    decoder_layers: int = 2
    decoder_dim: int = 256
    decoder_heads: int = 4
    decoder_ffn_dim: int = 2048
    dropout: float = 0.3


def build_aux_heads(specs, dtype):
    """Construct the per-task aux head modules from AuxTaskSpecs — a linear
    CTC projection or a small causal transformer decoder per task (reference
    S2STransformerMultitaskModelBase.build_multitask_decoder,
    s2s_transformer.py:171-230). Shared by the NAR and AR S2UT models; must
    be called from a flax `setup` (names are explicit)."""
    from diffnorm_tpu.models.ar_transformer import ARUnitDecoder

    mt_modules = {}
    for spec in specs:
        if spec.decoder_type == "ctc":
            mt_modules[spec.name] = nn.Dense(
                spec.vocab_size, dtype=dtype, name=f"mt_{spec.name}_ctc",
            )
        else:
            mt_modules[spec.name] = ARUnitDecoder(
                vocab_size=spec.vocab_size,
                dim=spec.decoder_dim,
                ffn_dim=spec.decoder_ffn_dim,
                layers=spec.decoder_layers,
                heads=spec.decoder_heads,
                dropout=spec.dropout,
                share_input_output_embed=True,
                dtype=dtype,
                name=f"mt_{spec.name}_decoder",
            )
    return mt_modules


def aux_head_outputs(specs, mt_modules, multitask_prev, enc_states, enc_mask,
                     inner, dec_tokens, deterministic):
    """Run the aux heads over their tapped states. enc_states: per-layer
    encoder states (fairseq return_all_hiddens); inner: decoder inner_states
    [embed_out, after layer 1, ...] (may be None when no decoder tap);
    dec_tokens: the main decoder's input tokens (mask source for
    decoder-tapped CTC heads, reference research/TranSpeech/criterion.py:62-67).
    Transformer aux decoders always cross-attend the tapped ENCODER states
    (reference criterion.py:69-80 uses encoder_states for the non-CTC branch
    regardless of input_from)."""
    mt_out = {}
    for spec in specs:
        head = mt_modules[spec.name]
        if spec.decoder_type == "ctc":
            if spec.input_from == "decoder":
                tapped, mask = inner[spec.input_layer], dec_tokens != PAD
            else:
                tapped, mask = enc_states[spec.input_layer], enc_mask
            mt_out[spec.name] = {"logits": head(tapped), "mask": mask}
        else:
            prev_mt = multitask_prev[spec.name]
            mt_out[spec.name] = {
                "logits": head(
                    prev_mt, enc_states[spec.input_layer], enc_mask,
                    deterministic=deterministic),
            }
    return mt_out


class MultiheadAttention(nn.Module):
    """fairseq-style MHA (bias on qkv/out projections)."""

    dim: int
    heads: int
    dropout: float = 0.0
    quant: bool = False  # int8 W8A8 projections (inference only)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask=None, deterministic: bool = True):
        from diffnorm_tpu.models.layers import QDense

        h = self.heads
        d = self.dim // h
        ctx = x if context is None else context
        q = QDense(self.dim, quant=self.quant, dtype=self.dtype,
                   name="q_proj")(x)
        k = QDense(self.dim, quant=self.quant, dtype=self.dtype,
                   name="k_proj")(ctx)
        v = QDense(self.dim, quant=self.quant, dtype=self.dtype,
                   name="v_proj")(ctx)
        b, tq, _ = q.shape
        tk = k.shape[1]

        def heads_of(z, t):
            return z.reshape(b, t, h, d).transpose(0, 2, 1, 3)

        q, k, v = heads_of(q, tq), heads_of(k, tk), heads_of(v, tk)
        rng = None
        if self.dropout > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
        out = masked_attention(q, k, v, mask=mask, dropout=self.dropout, dropout_rng=rng)
        out = out.transpose(0, 2, 1, 3).reshape(b, tq, self.dim)
        return QDense(self.dim, quant=self.quant, dtype=self.dtype,
                      name="out_proj")(out)


class DecoderLayer(nn.Module):
    """Pre-norm transformer decoder layer (full-context self-attention)."""

    dim: int
    ffn_dim: int
    heads: int
    dropout: float
    quant: bool = False
    # fairseq --attention-dropout / --relu-dropout (activation dropout):
    # separate rates on attention probs / FF activation, defaulting to
    # `dropout` when unset
    attention_dropout: Optional[float] = None
    activation_dropout: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x, self_mask, enc, enc_mask, deterministic: bool = True
    ):
        from diffnorm_tpu.models.layers import QDense

        attn_do = (self.dropout if self.attention_dropout is None
                   else self.attention_dropout)
        act_do = (self.dropout if self.activation_dropout is None
                  else self.activation_dropout)
        res = x
        h = nn.LayerNorm(dtype=self.dtype, name="self_attn_layer_norm")(x)
        h = MultiheadAttention(
            self.dim, self.heads, attn_do, self.quant, self.dtype,
            name="self_attn",
        )(h, mask=self_mask, deterministic=deterministic)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = res + h

        res = x
        h = nn.LayerNorm(dtype=self.dtype, name="encoder_attn_layer_norm")(x)
        h = MultiheadAttention(
            self.dim, self.heads, attn_do, self.quant, self.dtype,
            name="encoder_attn",
        )(h, context=enc, mask=enc_mask, deterministic=deterministic)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = res + h

        res = x
        h = nn.LayerNorm(dtype=self.dtype, name="final_layer_norm")(x)
        h = QDense(self.ffn_dim, quant=self.quant, dtype=self.dtype,
                   name="fc1")(h)
        h = nn.relu(h)
        h = nn.Dropout(act_do)(h, deterministic=deterministic)
        h = QDense(self.dim, quant=self.quant, dtype=self.dtype,
                   name="fc2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return res + h


class NATUnitDecoder(nn.Module):
    """NAT unit decoder with length head (TransformerUnitDecoder parity)."""

    vocab_size: int
    dim: int = 512
    ffn_dim: int = 2048
    layers: int = 6
    heads: int = 8
    dropout: float = 0.1
    attention_dropout: Optional[float] = None
    activation_dropout: Optional[float] = None
    max_lengths: int = 256  # length-classifier classes
    share_input_output_embed: bool = True
    # stacked units (reference TransformerUnitDecoder out_proj_n_frames,
    # nar_transformer.py:104-113): packed-id canvas in, [B, T, k, V]
    # sub-frame logits out
    n_frames_per_step: int = 1
    quant: bool = False  # int8 W8A8 inference matmuls
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.n_frames_per_step > 1:
            from diffnorm_tpu.models.stacked import StackedEmbedding

            self.embed_tokens = StackedEmbedding(
                num_embeddings=self.vocab_size, embed_dim=self.dim,
                num_stacked=self.n_frames_per_step, dtype=self.dtype,
                name="embed_tokens",
            )
            self.out_proj_n_frames = nn.Dense(
                self.dim * self.n_frames_per_step, use_bias=False,
                dtype=self.dtype, name="out_proj_n_frames",
            )
            self.subframe_out = nn.Dense(
                self.vocab_size, use_bias=False, dtype=self.dtype,
                name="subframe_out",
            )
        else:
            self.embed_tokens = nn.Embed(
                self.vocab_size,
                self.dim,
                embedding_init=nn.initializers.normal(self.dim ** -0.5),
                dtype=self.dtype,
                name="embed_tokens",
            )
        self.embed_length = nn.Embed(
            self.max_lengths,
            self.dim,
            embedding_init=nn.initializers.normal(self.dim ** -0.5),
            name="embed_length",
        )
        self.dec_layers = [
            DecoderLayer(
                dim=self.dim,
                ffn_dim=self.ffn_dim,
                heads=self.heads,
                dropout=self.dropout,
                attention_dropout=self.attention_dropout,
                activation_dropout=self.activation_dropout,
                quant=self.quant,
                dtype=self.dtype,
                name=f"layer_{i}",
            )
            for i in range(self.layers)
        ]
        self.final_norm = nn.LayerNorm(dtype=self.dtype, name="layer_norm")
        self.embed_dropout = nn.Dropout(self.dropout)
        if not self.share_input_output_embed:
            self.output_proj = nn.Dense(
                self.vocab_size, use_bias=False, dtype=self.dtype, name="output_proj"
            )

    def null_context(self):
        """BOS embedding used as the CG null encoder feature [1, dim]."""
        return self.embed_tokens(jnp.full((1,), BOS, dtype=jnp.int32))

    def __call__(self, tokens, enc, enc_mask, deterministic: bool = True,
                 return_inner: bool = False):
        """tokens: [B, T] int; enc: [B, S, C]; enc_mask: [B, S] True=valid.
        Returns logits [B, T, vocab]. With return_inner=True also returns
        the pre-final-norm hidden states [embed_out, after layer 1, ...]
        (fairseq TransformerDecoder inner_states — decoder-tapped multitask
        CTC heads index into these)."""
        valid = tokens != PAD
        x = self.embed_tokens(tokens) * math.sqrt(self.dim)
        x = x + sinusoidal_positions(valid, self.dim, padding_idx=PAD).astype(x.dtype)
        x = self.embed_dropout(x, deterministic=deterministic)
        inner = [x]
        for layer in self.dec_layers:
            x = layer(x, valid, enc, enc_mask, deterministic=deterministic)
            if return_inner:
                inner.append(x)
        x = self.final_norm(x)
        k = self.n_frames_per_step
        if k > 1:
            b, t, _ = x.shape
            h = self.out_proj_n_frames(x).reshape(b, t, k, self.dim)
            logits = self.subframe_out(h)  # [B, T, k, V]
        elif self.share_input_output_embed:
            logits = self.embed_tokens.attend(x)
        else:
            logits = self.output_proj(x)
        return (logits, inner) if return_inner else logits

    def forward_length(self, enc, enc_mask):
        """Mean-pool encoder states -> [B, max_lengths] logits
        (nar_transformer.py:435-444 + nonautoregressive_transformer
        _mean_pooling)."""
        m = enc_mask[..., None].astype(enc.dtype)
        pooled = jnp.sum(enc * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
        table = self.embed_length.embedding.astype(pooled.dtype)
        return pooled @ table.T


class NARS2UTModule(nn.Module):
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
    depthwise_kernel_size: int = 31
    cg_prob: float = 0.0
    # auxiliary multitask heads over encoder states (reference
    # S2STransformerMultitaskModelBase.build_multitask_decoder with
    # decoder_type="ctc": a linear CTC projection; nar_transformer.py:500-525)
    ctc_vocab: int = 0
    # self-prompting (reference sp_forward, nar_transformer.py:188-299,
    # arXiv 2305.04044): with prob 0.5 per step, draft y0 with the current
    # model (no-grad, specials banned), prefix the encoder feature sequence
    # with embed(y0), and train on the prompted context
    use_sp: bool = False
    encoder_remat: bool = False  # jax.checkpoint per conformer layer
    attention_dropout: Optional[float] = None
    activation_dropout: Optional[float] = None
    n_frames_per_step: int = 1
    conv_channels: int = 1024
    conv_kernel_sizes: tuple = (5, 5)
    share_input_output_embed: bool = True
    quant_int8: bool = False  # int8 W8A8 inference matmuls (decode path)
    # --multitask-config-yaml aux tasks (static specs; see AuxTaskSpec)
    multitask: Tuple[AuxTaskSpec, ...] = ()
    # --target-speaker-embed: concat a per-utterance speaker embedding to
    # every (final) encoder frame and project back to encoder_dim
    # (reference s2s_transformer.py:38-52)
    target_speaker_embed: bool = False
    speaker_embed_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.target_speaker_embed:
            self.spk_emb_proj = nn.Dense(
                self.encoder_dim, dtype=self.dtype, name="spk_emb_proj")
        self.encoder = ConformerEncoder(
            dim=self.encoder_dim,
            ffn_dim=self.encoder_ffn_dim,
            layers=self.encoder_layers,
            heads=self.encoder_heads,
            dropout=self.dropout,
            attention_dropout=self.attention_dropout,
            activation_dropout=self.activation_dropout,
            depthwise_kernel_size=self.depthwise_kernel_size,
            conv_channels=self.conv_channels,
            conv_kernel_sizes=tuple(self.conv_kernel_sizes),
            remat=self.encoder_remat,
            quant=self.quant_int8,
            dtype=self.dtype,
            name="encoder",
        )
        self.decoder = NATUnitDecoder(
            vocab_size=self.vocab_size,
            dim=self.decoder_dim,
            ffn_dim=self.decoder_ffn_dim,
            layers=self.decoder_layers,
            heads=self.decoder_heads,
            dropout=self.dropout,
            attention_dropout=self.attention_dropout,
            activation_dropout=self.activation_dropout,
            n_frames_per_step=self.n_frames_per_step,
            share_input_output_embed=self.share_input_output_embed,
            quant=self.quant_int8,
            dtype=self.dtype,
            name="decoder",
        )
        if self.ctc_vocab:
            self.ctc_proj = nn.Dense(
                self.ctc_vocab, dtype=self.dtype, name="ctc_proj"
            )
        # --multitask-config-yaml aux decoders (reference
        # s2s_transformer.py:171-230): a linear CTC head or a small causal
        # transformer decoder per task, tapping encoder/decoder states
        self.mt_modules = build_aux_heads(self.multitask, self.dtype)

    def encode(self, src, src_lengths, deterministic: bool = True,
               tgt_speaker=None):
        enc, enc_mask = self.encoder(src, src_lengths,
                                     deterministic=deterministic)
        return self.apply_speaker(enc, tgt_speaker), enc_mask

    def apply_speaker(self, enc, tgt_speaker):
        """Speaker-conditioned encoder output: concat the [B, D] embedding
        to every frame + Dense back to encoder_dim (s2s_transformer.py:44-52).
        No-op unless target_speaker_embed is on and an embedding is given."""
        if not self.target_speaker_embed or tgt_speaker is None:
            return enc
        spk = jnp.broadcast_to(
            tgt_speaker[:, None, :].astype(enc.dtype),
            (enc.shape[0], enc.shape[1], tgt_speaker.shape[-1]))
        return self.spk_emb_proj(jnp.concatenate([enc, spk], axis=-1))

    def apply_cg_drop(self, enc, enc_mask, drop):
        """Replace dropped sequences' encoder output with the BOS null context
        and mark every position valid (reference zeroes the *padding* mask).
        drop: [B] bool."""
        null = self.decoder.null_context().astype(enc.dtype)  # [1, C]
        enc = jnp.where(drop[:, None, None], null[None], enc)
        enc_mask = jnp.where(drop[:, None], True, enc_mask)
        return enc, enc_mask

    def decode(self, tokens, enc, enc_mask, deterministic: bool = True):
        return self.decoder(tokens, enc, enc_mask, deterministic=deterministic)

    def forward_length(self, enc, enc_mask):
        return self.decoder.forward_length(enc, enc_mask)

    def __call__(
        self,
        src,
        src_lengths,
        prev_tokens,
        tgt_tokens=None,
        deterministic: bool = True,
        multitask_prev=None,
        tgt_speaker=None,
    ):
        """Training/valid forward. Returns dict with unit logits, the CMLM
        word-insertion mask (positions where prev==unk), length logits and the
        clamped length target (nar_transformer.py:729-787). multitask_prev:
        {task_name: prev_output_tokens [B, L]} for transformer aux decoders
        (reference MultitaskCriterion, speech_to_speech_criterion.py:67-123)."""
        run_mt = bool(self.multitask) and tgt_tokens is not None
        if run_mt:
            # aux heads tap the raw per-layer encoder states (fairseq
            # return_all_hiddens), BEFORE any CG/self-prompting rewrites
            enc, enc_mask, enc_states = self.encoder(
                src, src_lengths, deterministic=deterministic,
                return_all_layers=True)
        else:
            enc, enc_mask = self.encoder(
                src, src_lengths, deterministic=deterministic)
        enc = self.apply_speaker(enc, tgt_speaker)
        raw_enc_mask = enc_mask

        length_logits = self.decoder.forward_length(enc, enc_mask)
        if tgt_tokens is not None:
            if tgt_tokens.ndim == 3:  # stacked [B, T, k]: count packed steps
                tgt_tokens = tgt_tokens[..., 0]
            tgt_lengths = jnp.sum(tgt_tokens != PAD, axis=1)
            length_tgt = jnp.clip(tgt_lengths, 0, self.decoder.max_lengths - 1)
        else:
            length_tgt = jnp.argmax(length_logits, axis=-1)

        if self.cg_prob > 0.0 and not deterministic:
            drop = jax.random.bernoulli(
                self.make_rng("cg"), self.cg_prob, (enc.shape[0],)
            )
            enc, enc_mask = self.apply_cg_drop(enc, enc_mask, drop)

        if self.use_sp and not deterministic:
            # draft y0 without gradients, ban specials (sp_forward :229-237)
            draft_logits = jax.lax.stop_gradient(
                self.decoder(prev_tokens, enc, enc_mask, deterministic=True)
            )
            neg = jnp.finfo(jnp.float32).min
            draft_logits = draft_logits.astype(jnp.float32).at[..., :4].set(neg)
            draft = jnp.argmax(draft_logits, -1).astype(jnp.int32)
            if draft.ndim == 3:  # stacked sub-frames -> packed draft ids
                from diffnorm_tpu.models.stacked import OFFSET, pack_units

                draft = pack_units(
                    jnp.maximum(draft - OFFSET, 0),
                    self.vocab_size - 4, self.n_frames_per_step,
                )
            keep = (prev_tokens == PAD) | (prev_tokens == EOS)
            y0 = jnp.where(keep, prev_tokens, draft)
            prompt = jax.lax.stop_gradient(self.decoder.embed_tokens(y0))
            prompt_mask = y0 != PAD
            sp_enc = jnp.concatenate([prompt.astype(enc.dtype), enc], axis=1)
            sp_mask = jnp.concatenate([prompt_mask, enc_mask], axis=1)
            use_prompt = jax.random.bernoulli(self.make_rng("sp"), 0.5)
            pad_enc = jnp.pad(enc, ((0, 0), (0, prompt.shape[1]), (0, 0)))
            pad_mask = jnp.pad(enc_mask, ((0, 0), (0, prompt.shape[1])))
            enc = jnp.where(use_prompt, sp_enc, pad_enc)
            enc_mask = jnp.where(use_prompt, sp_mask, pad_mask)

        need_inner = run_mt and any(
            s.input_from == "decoder" for s in self.multitask)
        if need_inner:
            logits, inner = self.decoder(
                prev_tokens, enc, enc_mask, deterministic=deterministic,
                return_inner=True)
        else:
            logits = self.decoder(
                prev_tokens, enc, enc_mask, deterministic=deterministic)
        out = dict(
            logits=logits,
            word_ins_mask=prev_tokens == UNK,
            length_logits=length_logits,
            length_tgt=length_tgt,
        )
        if self.ctc_vocab:
            out["ctc_logits"] = self.ctc_proj(enc)
            out["ctc_mask"] = enc_mask
        if run_mt:
            # decoder taps index inner_states[decoder_layer - 1] over the
            # CMLM canvas, where inner_states = [embed_out, after layer 1,
            # ...] exactly as in fairseq (research/TranSpeech/criterion.py:62-67)
            out["multitask"] = aux_head_outputs(
                self.multitask, self.mt_modules, multitask_prev, enc_states,
                raw_enc_mask, inner if need_inner else None, prev_tokens,
                deterministic)
        return out


@register_model("nar_s2ut")
class NARS2UTModel(ModelHolder):
    @classmethod
    def build_model(cls, cfg: Config, task=None) -> "NARS2UTModel":
        vocab = cfg.get("vocab_size")
        if vocab is None and task is not None and task.target_dictionary is not None:
            vocab = len(task.target_dictionary)
        module = NARS2UTModule(
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
            # fairseq --attention-dropout / --relu-dropout (both default to
            # --dropout when not given, as the recipes assume)
            attention_dropout=cfg.get("attention_dropout"),
            activation_dropout=cfg.get(
                "relu_dropout", cfg.get("activation_dropout")),
            depthwise_kernel_size=cfg.get("depthwise_conv_kernel_size", 31),
            cg_prob=cfg.get("cg_prob", 0.0),
            ctc_vocab=cfg.get("multitask_ctc_vocab", 0),
            use_sp=cfg.get("use_sp", False),
            encoder_remat=cfg.get("encoder_remat", False),
            n_frames_per_step=cfg.get("n_frames_per_step", 1),
            conv_channels=cfg.get("conv_channels", 1024),
            conv_kernel_sizes=tuple(
                int(k) for k in str(cfg.get("conv_kernel_sizes", "5,5"))
                .strip("()[] ").replace(",", " ").split()
            ),
            share_input_output_embed=cfg.get(
                "share_decoder_input_output_embed", True),
            quant_int8=bool(cfg.get(
                "quant_int8",
                __import__("os").environ.get("DIFFNORM_INT8") == "1")),
            multitask=tuple(getattr(task, "aux_task_specs", lambda: ())()),
            target_speaker_embed=bool(cfg.get("target_speaker_embed", False)),
            speaker_embed_dim=cfg.get("speaker_embed_dim", 256),
            dtype=jnp.dtype(cfg.get("dtype", "float32")),
        )
        return cls(module=module, cfg=cfg)


@register_architecture("nar_s2ut", "nar_s2ut_conformer")
def nar_s2ut_conformer_arch(cfg: Config):
    """Base conformer S2UT arch (nar_transformer.py:954-1008 +
    nar_conformer.py:120-124)."""
    cfg.setdefault("encoder_embed_dim", 512)
    cfg.setdefault("encoder_ffn_embed_dim", 2048)
    cfg.setdefault("encoder_layers", 12)
    cfg.setdefault("encoder_attention_heads", 8)
    cfg.setdefault("decoder_embed_dim", cfg.get("encoder_embed_dim", 512))
    cfg.setdefault("decoder_ffn_embed_dim", cfg.get("encoder_ffn_embed_dim", 2048))
    cfg.setdefault("decoder_layers", 6)
    cfg.setdefault("decoder_attention_heads", 8)
    cfg.setdefault("dropout", 0.1)
    cfg.setdefault("depthwise_conv_kernel_size", 31)
    # recipe flags (scripts/s2ut/train.sh passes --attn-type espnet
    # --pos-enc-type rel_pos); only that combination is implemented here
    attn = cfg.setdefault("attn_type", "espnet")
    pos = cfg.setdefault("pos_enc_type", "rel_pos")
    if attn != "espnet" or pos != "rel_pos":
        raise ValueError(
            f"unsupported --attn-type {attn} / --pos-enc-type {pos}: the "
            "conformer encoder implements the ESPnet rel-pos attention the "
            "DiffNorm recipes use")


@register_architecture("nar_s2ut", "nar_s2ut_conformer_fisher")
def nar_s2ut_conformer_fisher_arch(cfg: Config):
    cfg.setdefault("encoder_embed_dim", 256)
    cfg.setdefault("encoder_attention_heads", 4)
    nar_s2ut_conformer_arch(cfg)
