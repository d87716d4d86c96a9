"""Stacked-unit pack/unpack round trips, StackedEmbedding, greedy stacked
generation."""

import jax
import jax.numpy as jnp
import numpy as np

from diffnorm_tpu.models.stacked import (
    EOS,
    OFFSET,
    PAD,
    StackedEmbedding,
    pack_units,
    stack_unit_generate,
    unpack_units,
)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    v, n = 10, 3
    units = jnp.asarray(rng.integers(0, v, size=(4, 6, n)), jnp.int32)
    packed = pack_units(units, v, n)
    assert int(packed.min()) >= OFFSET
    sub = unpack_units(packed, v, n)
    np.testing.assert_array_equal(np.asarray(sub) - OFFSET, np.asarray(units))


def test_unpack_passes_specials_through():
    sub = unpack_units(jnp.asarray([PAD, EOS]), 10, 2)
    np.testing.assert_array_equal(np.asarray(sub), [[PAD, PAD], [EOS, EOS]])


def test_stacked_embedding_shapes():
    m = StackedEmbedding(num_embeddings=14, embed_dim=8, num_stacked=2)
    toks = jnp.asarray([[4, 5, 1]], jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), toks)
    out = m.apply(variables, toks)
    assert out.shape == (1, 3, 8)
    m1 = StackedEmbedding(num_embeddings=14, embed_dim=8, num_stacked=1)
    v1 = m1.init(jax.random.PRNGKey(0), toks)
    assert m1.apply(v1, toks).shape == (1, 3, 8)


def test_stack_unit_generate():
    v, n, b = 6, 2, 3

    def decode_step(state, prev, pos):
        # deterministic toy: emit unit (pos mod v) in both sub-frames,
        # eos at step 4
        logits = jnp.full((b, n, v + 4), -10.0)
        unit = (pos[0] % v) + OFFSET
        logits = logits.at[:, :, unit].set(0.0)
        logits = jnp.where(pos[0] == 4, logits.at[:, :, EOS].set(5.0), logits)
        return logits, state

    packed, sub = stack_unit_generate(decode_step, b, v, n, max_len=8)
    packed = np.asarray(packed)
    sub = np.asarray(sub)
    assert packed.shape == (b, 8)
    assert sub.shape == (b, 8, n)
    # first 4 steps emit packed units, then pad after eos
    assert (packed[:, :4] >= OFFSET).all()
    assert (packed[:, 4:] == PAD).all()
    # packed value decodes back to the sub units
    np.testing.assert_array_equal(
        np.asarray(unpack_units(jnp.asarray(packed[:, :4]), v, n)),
        sub[:, :4],
    )


def test_ar_decoder_stacked_outputs():
    """n_frames_per_step>1 wiring: packed-id input, [B, T, k, V] logits,
    cached single-step decode feeding the stacked generator."""
    import jax
    from diffnorm_tpu.models.ar_transformer import ARS2UTModule

    v, k = 10, 2
    module = ARS2UTModule(
        vocab_size=v + 4, encoder_dim=16, encoder_ffn_dim=32,
        encoder_layers=1, encoder_heads=2, decoder_dim=16,
        decoder_ffn_dim=32, decoder_layers=1, decoder_heads=2,
        depthwise_kernel_size=7, n_frames_per_step=k,
    )
    rng = np.random.default_rng(7)
    src = jnp.asarray(rng.normal(size=(2, 24, 80)), jnp.float32)
    lens = jnp.asarray([24, 20], jnp.int32)
    sub = jnp.asarray(rng.integers(0, v, size=(2, 5, k)), jnp.int32)
    packed = pack_units(sub, v, k)
    variables = module.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        src, lens, packed, deterministic=True,
    )
    out = module.apply(variables, src, lens, packed, deterministic=True)
    assert out["logits"].shape == (2, 5, k, v + 4)

    # cached decode_step drives the stacked greedy generator
    enc, enc_mask = module.apply(variables, src, lens, method="encode")
    _, cache_vars = module.apply(
        variables, packed[:, :1], enc, enc_mask,
        jnp.zeros((2,), jnp.int32), 8,
        method=ARS2UTModule.decode_step, mutable=["cache"],
    )
    cache = jax.tree_util.tree_map(jnp.zeros_like, cache_vars["cache"])

    def decode_step(cache, prev, pos):
        logits, mut = module.apply(
            {**variables, "cache": cache}, prev[:, None], enc,
            enc_mask, pos, 8, method=ARS2UTModule.decode_step,
            mutable=["cache"],
        )
        return logits, mut["cache"]  # logits [B, k, V]

    packed_out, sub_out = stack_unit_generate(
        decode_step, batch_size=2, vocab_size=v, n_frames_per_step=k,
        max_len=4, init_state=cache,
    )
    assert np.asarray(packed_out).shape == (2, 4)
    assert np.asarray(sub_out).shape == (2, 4, k)
    # the KV cache threads through the scan carry: position 3 keys differ
    # from zeros only if earlier steps actually wrote into the cache
    from diffnorm_tpu.generate.beam_search import ar_generate_stacked
    from diffnorm_tpu.models.vae import ModelHolder

    class _Holder(ModelHolder):
        pass

    holder = _Holder(module=module, cfg=None)
    packed2, sub2 = ar_generate_stacked(holder, variables, src, lens,
                                        max_len=4)
    np.testing.assert_array_equal(np.asarray(packed2), np.asarray(packed_out))


def test_nar_stacked_forward_and_decode():
    """NAT decoder with n_frames_per_step=2: packed canvas in, [B, T, k, V]
    logits out; mask-predict fills sub-frames and returns the full-rate
    unit stream."""
    import jax
    from diffnorm_tpu.config import Config
    from diffnorm_tpu.generate.mask_predict import mask_predict_decode
    from diffnorm_tpu.registry import TASKS, _import_all

    _import_all()
    cfg = Config(
        arch="nar_s2ut_conformer", criterion="nar_speech_to_unit",
        target_code_size=10, n_frames_per_step=2, label_smoothing=0.1,
        encoder_layers=1, decoder_layers=1, encoder_embed_dim=16,
        encoder_ffn_embed_dim=32, encoder_attention_heads=2,
        decoder_attention_heads=2, decoder_embed_dim=16,
        decoder_ffn_embed_dim=32,
    )
    task = TASKS.get("dummy_nar").setup_task(cfg)
    model = task.build_model()
    crit = task.build_criterion()
    batch = task.dummy_batch(2, 24)
    assert batch["target"].ndim == 3 and batch["target"].shape[-1] == 2
    assert batch["prev_target"].ndim == 2  # packed canvas
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)

    loss, mets, _ = crit(model, variables, batch, jax.random.PRNGKey(1),
                         train=True)
    assert np.isfinite(float(loss))

    tokens, scores, steps = mask_predict_decode(
        model, variables, jnp.asarray(batch["src_tokens"]),
        jnp.asarray(batch["src_lengths"]), max_iter=2, max_len=8,
        n_frames_per_step=2,
    )
    assert tokens.shape == (2, 16)  # full-rate: 8 packed slots * 2
    assert not (np.asarray(tokens) == 3).any()  # no unfilled placeholders
