"""Fused S2ST serving path: in-jit duration expansion parity with host
repeat, end-to-end fbank->waveform program shape/mask invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnorm_tpu.config import Config
from diffnorm_tpu.generate.s2st import expand_units_padded, s2st_generate
from diffnorm_tpu.models.hifigan import CodeGenerator
from diffnorm_tpu.registry import TASKS


def test_expand_units_matches_np_repeat():
    rng = np.random.default_rng(0)
    units = rng.integers(0, 20, size=12).astype(np.int32)
    durs = rng.integers(0, 4, size=12).astype(np.int32)
    out, mask = expand_units_padded(jnp.asarray(units), jnp.asarray(durs), 64)
    ref = np.repeat(units, durs)
    n = int(mask.sum())
    assert n == len(ref)
    np.testing.assert_array_equal(np.asarray(out)[:n], ref)
    assert np.all(np.asarray(out)[n:] == 0)


def test_expand_units_truncates_at_cap():
    units = jnp.arange(4, dtype=jnp.int32)
    durs = jnp.full((4,), 5, jnp.int32)
    out, mask = expand_units_padded(units, durs, 8)
    assert int(mask.sum()) == 8
    np.testing.assert_array_equal(np.asarray(out), [0] * 5 + [1] * 3)


@pytest.fixture(scope="module")
def pipeline():
    cfg = Config(
        arch="nar_s2ut_conformer", criterion="nar_speech_to_unit",
        encoder_layers=2, decoder_layers=2, encoder_embed_dim=32,
        encoder_ffn_embed_dim=64, encoder_attention_heads=2,
        decoder_attention_heads=2, decoder_embed_dim=32,
        decoder_ffn_embed_dim=64, conv_channels=32,
        depthwise_conv_kernel_size=7, target_code_size=20,
        label_smoothing=0.2, lr=5e-4,
    )
    task = TASKS.get("dummy_nar").setup_task(cfg)
    model = task.build_model()
    batch = task.dummy_batch(2, 48)
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)

    voc = CodeGenerator(
        num_embeddings=20, embedding_dim=8, upsample_rates=(2, 2),
        upsample_kernel_sizes=(4, 4), upsample_initial_channel=16,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        dur_predictor=True, var_pred_hidden_dim=8,
    )
    code = jnp.zeros((1, 8), jnp.int32)

    def init_all(m, c):
        out = m(c)
        m.predict_durations(c)
        return out

    voc_vars = voc.init(jax.random.PRNGKey(1), code, method=init_all)
    return model, variables, voc, voc_vars, batch


def test_s2st_generate_end_to_end(pipeline):
    model, variables, voc, voc_vars, batch = pipeline
    src = jnp.asarray(batch["src_tokens"])
    lens = jnp.asarray(batch["src_lengths"])

    fn = jax.jit(lambda v, vv, s, l: s2st_generate(
        model, v, voc, vv, s, l, max_iter=3, max_len=16, max_duration=4,
    ))
    wav, wav_lengths, units, counts = fn(variables, voc_vars, src, lens)
    b, t_wav = wav.shape
    assert b == 2
    upsample = 2 * 2
    assert t_wav == 16 * 4 * upsample  # max_len * max_duration * upsample
    wl = np.asarray(wav_lengths)
    cn = np.asarray(counts)
    assert np.all(wl % upsample == 0)
    assert np.all(wl >= cn * upsample)  # every unit lasts >= 1 frame
    assert np.all(wl <= t_wav)
    u = np.asarray(units)
    assert np.all((u >= 0) & (u < 20))
    # reduced streams have no consecutive duplicates inside counts
    for i in range(b):
        row = u[i, : cn[i]]
        assert np.all(row[1:] != row[:-1])
    assert np.all(np.isfinite(np.asarray(wav)))


def test_s2st_generate_return_steps(pipeline):
    """return_steps appends per-row decode iteration counts (the e2e
    bench's difficulty reporting) without changing the other outputs."""
    model, variables, voc, voc_vars, batch = pipeline
    src = jnp.asarray(batch["src_tokens"])
    lens = jnp.asarray(batch["src_lengths"])
    kw = dict(max_iter=3, max_len=16, max_duration=4)
    out4 = jax.jit(lambda v, vv, s, l: s2st_generate(
        model, v, voc, vv, s, l, **kw))(variables, voc_vars, src, lens)
    out5 = jax.jit(lambda v, vv, s, l: s2st_generate(
        model, v, voc, vv, s, l, return_steps=True, **kw))(
            variables, voc_vars, src, lens)
    assert len(out4) == 4 and len(out5) == 5
    for a, b in zip(out4, out5[:4]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    steps = np.asarray(out5[4])
    assert steps.shape == (2,) and np.all(steps >= 1) and np.all(steps <= 4)


def test_s2st_generate_no_dur_prediction(pipeline):
    model, variables, voc, voc_vars, batch = pipeline
    src = jnp.asarray(batch["src_tokens"])
    lens = jnp.asarray(batch["src_lengths"])
    wav, wav_lengths, _, counts = jax.jit(
        lambda v, vv, s, l: s2st_generate(
            model, v, voc, vv, s, l, max_iter=2, max_len=16,
            dur_prediction=False,
        )
    )(variables, voc_vars, src, lens)
    # without expansion every valid decoded token lasts exactly one frame,
    # and the un-reduced stream is at least as long as the reduced one
    assert np.all(np.asarray(wav_lengths) // 4 >= np.asarray(counts))
    assert wav.shape[1] == 16 * 4


def test_strip_and_reduce_gap_semantics():
    """A special token mid-stream must not break a duplicate run
    (generate_waveform_from_code.py strips invalid codes before --reduce)."""
    from diffnorm_tpu.generate.s2st import strip_and_reduce_tokens

    # units +4 offset; 3 = <unk> mid-stream, 1 = trailing pad
    tokens = jnp.asarray([[4 + 16, 3, 4 + 16, 4 + 7, 4 + 7, 1, 1]])
    packed, packed_valid, reduced, counts = strip_and_reduce_tokens(tokens)
    assert int(packed_valid.sum()) == 4
    np.testing.assert_array_equal(np.asarray(packed)[0, :4], [16, 16, 7, 7])
    assert int(counts[0]) == 2
    np.testing.assert_array_equal(np.asarray(reduced)[0, :2], [16, 7])


def test_chunked_vocoder_matches_monolithic():
    from diffnorm_tpu.generate.s2st import _chunked_vocoder
    from diffnorm_tpu.models.hifigan import CodeGenerator

    voc = CodeGenerator(num_embeddings=24, embedding_dim=8,
                        upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
                        upsample_initial_channel=16,
                        resblock_kernel_sizes=(3,),
                        resblock_dilation_sizes=((1, 3),))
    codes = jnp.asarray(np.random.default_rng(0).integers(0, 24, (5, 12)),
                        jnp.int32)
    v = voc.init(jax.random.PRNGKey(0), codes[:1])
    ref = voc.apply(v, codes)
    got = _chunked_vocoder(voc, v, codes, None, chunk=2)  # B=5 pads to 6
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
