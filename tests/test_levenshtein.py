"""Levenshtein transformer: edit-path supervision (native + numpy), training
forward, host decode loop."""

import jax
import numpy as np
import pytest

from diffnorm_tpu.config import Config
from diffnorm_tpu.models.levenshtein import (
    edit_path_targets,
    levenshtein_decode,
)
from diffnorm_tpu.registry import TASKS

PAD, BOS, EOS, UNK = 1, 0, 2, 3


def test_edit_path_subsequence():
    # prev is a subsequence of tgt: no deletions, pure insertions
    prev = np.array([[5, 7, PAD]], np.int32)
    tgt = np.array([[5, 6, 7, 8]], np.int32)
    del_tgt, ins_tgt = edit_path_targets(prev, tgt)
    np.testing.assert_array_equal(del_tgt[0], [0, 0, 0])
    # slots: before 5 -> 0 insertions, before 7 -> 1 (the 6), after 7 -> 1 (8)
    np.testing.assert_array_equal(ins_tgt[0, :3], [0, 1, 1])


def test_edit_path_with_deletions():
    prev = np.array([[5, 9, 7]], np.int32)
    tgt = np.array([[5, 7, PAD]], np.int32)
    del_tgt, ins_tgt = edit_path_targets(prev, tgt)
    np.testing.assert_array_equal(del_tgt[0], [0, 1, 0])
    assert ins_tgt[0].sum() == 0


def test_edit_path_native_matches_numpy():
    from diffnorm_tpu.data.batching import _load_native

    if not _load_native():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(0)
    prev = rng.integers(4, 10, size=(4, 8)).astype(np.int32)
    tgt = rng.integers(4, 10, size=(4, 10)).astype(np.int32)
    prev[:, 6:] = PAD
    tgt[:, 7:] = PAD
    d1, i1 = edit_path_targets(prev, tgt)
    # force the numpy fallback by monkeypatching
    import diffnorm_tpu.models.levenshtein as lev
    import diffnorm_tpu.data.batching as batching

    orig = batching._LIB
    try:
        batching._LIB = False
        d2, i2 = edit_path_targets(prev, tgt)
    finally:
        batching._LIB = orig
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(i1, i2)


@pytest.fixture(scope="module")
def built():
    cfg = Config(
        arch="levenshtein_transformer", criterion="levenshtein_loss",
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=1,
        decoder_layers=1, encoder_attention_heads=2, target_code_size=20,
        src_vocab_size=24, label_smoothing=0.1,
    )
    task = TASKS.get("dummy_lev").setup_task(cfg)
    model = task.build_model()
    crit = task.build_criterion()
    batch = task.dummy_batch(2, 10)
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    return task, model, crit, batch, variables


def test_levenshtein_training(built):
    task, model, crit, batch, variables = built
    loss, mets, _ = crit(model, variables, batch, jax.random.PRNGKey(1),
                         train=True)
    assert np.isfinite(float(loss))
    for k in ("del_loss", "ins_loss", "word_loss"):
        assert np.isfinite(float(mets[k])), k


def test_levenshtein_decode(built):
    task, model, crit, batch, variables = built
    out = levenshtein_decode(
        model, variables, batch["src_tokens"], batch["src_lengths"],
        max_iter=2, max_len=16,
    )
    assert out.shape[0] == 2
    assert (out[:, 0] == BOS).all()
    assert not (out == UNK).any()  # all placeholders filled


def test_levenshtein_decode_jit(built):
    from diffnorm_tpu.models.levenshtein import levenshtein_decode_jit

    task, model, crit, batch, variables = built
    fn = jax.jit(
        lambda v, s, l: levenshtein_decode_jit(
            model, v, s, l, max_iter=2, max_len=16
        )
    )
    out = np.asarray(fn(variables, batch["src_tokens"],
                        batch["src_lengths"]))
    assert out.shape == (2, 16)
    assert (out[:, 0] == BOS).all()
    assert not (out == UNK).any()  # all placeholders filled
    # canvas stays left-aligned: nothing real after the first PAD
    for row in out:
        pads = np.where(row == PAD)[0]
        if len(pads):
            assert (row[pads[0]:] == PAD).all()
    # the jitted program is shape-static: a second call with the same
    # shapes must not retrace (cache hit)
    out2 = np.asarray(fn(variables, batch["src_tokens"],
                         batch["src_lengths"]))
    np.testing.assert_array_equal(out, out2)


def test_levenshtein_eos_penalty():
    """--iter-decode-eos-penalty penalizes the insert-nothing class
    (reference levenshtein_transformer.py:195-196). With a stub scorer whose
    argmax is 'insert 0' in every slot, penalty 0 leaves the canvas at
    [BOS, EOS] while a penalty above the logit gap flips the argmax to
    'insert 2' and grows it."""
    import types

    import jax.numpy as jnp

    from diffnorm_tpu.models.levenshtein import levenshtein_decode_jit

    L, V, MAX_INS = 16, 20, 4

    class _Stub:
        def apply(self, v, *args, method=None):
            if method == "encode":
                return None, None
            tokens = args[0]
            b = tokens.shape[0]
            word = jnp.zeros((b, L, V)).at[..., 7].set(5.0)
            dele = jnp.zeros((b, L, 2)).at[..., 0].set(5.0)  # keep all
            ins = jnp.zeros((b, L - 1, MAX_INS))
            ins = ins.at[..., 0].set(3.0).at[..., 2].set(1.0)
            return word, dele, ins

    model = types.SimpleNamespace(module=_Stub())
    src = np.zeros((1, 4), np.int32)
    lens = np.asarray([4], np.int32)

    def run(pen):
        out = np.asarray(levenshtein_decode_jit(
            model, {}, src, lens, max_iter=1, max_len=L, eos_penalty=pen))
        return out[0]

    base = run(0.0)
    assert (base != 1).sum() == 2  # just BOS, EOS — no insertions
    pushed = run(10.0)
    np.testing.assert_array_equal(pushed[:4], [0, 7, 7, 2])
    assert (pushed[4:] == 1).all()
    # sub-gap penalty leaves the argmax unchanged
    np.testing.assert_array_equal(run(1.0), base)
