"""NAR S2UT model: forward shapes, masking policies, mask-predict decode,
skeptical unmasking, CG null context."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnorm_tpu.config import Config
from diffnorm_tpu.generate.mask_predict import (
    init_canvas,
    mask_predict_decode,
    skeptical_mask,
)
from diffnorm_tpu.registry import TASKS
from diffnorm_tpu.tasks.nar_s2ut_task import random_mask, side_mask

PAD, BOS, EOS, UNK = 1, 0, 2, 3


def tiny_cfg(**kw):
    cfg = Config(
        arch="nar_s2ut_conformer", criterion="nar_speech_to_unit",
        encoder_layers=2, decoder_layers=2, encoder_embed_dim=32,
        encoder_ffn_embed_dim=64, encoder_attention_heads=2,
        decoder_attention_heads=2, decoder_embed_dim=32,
        decoder_ffn_embed_dim=64, conv_channels=32,
        depthwise_conv_kernel_size=7, target_code_size=20,
        label_smoothing=0.2, lr=5e-4,
    )
    cfg.update(**kw)
    return cfg


@pytest.fixture(scope="module")
def built():
    cfg = tiny_cfg()
    task = TASKS.get("dummy_nar").setup_task(cfg)
    model = task.build_model()
    crit = task.build_criterion()
    batch = task.dummy_batch(2, 48)
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    return task, model, crit, batch, variables


def test_forward_shapes(built):
    task, model, crit, batch, variables = built
    out = model.apply(
        variables, batch["src_tokens"], batch["src_lengths"],
        batch["prev_target"], tgt_tokens=batch["target"], deterministic=True,
    )
    b, t = batch["target"].shape
    assert out["logits"].shape == (b, t, 24)
    assert out["length_logits"].shape == (b, 256)
    # word_ins_mask marks exactly the unk positions
    np.testing.assert_array_equal(
        np.asarray(out["word_ins_mask"]), batch["prev_target"] == UNK
    )
    # length target == non-pad count
    np.testing.assert_array_equal(
        np.asarray(out["length_tgt"]), (batch["target"] != PAD).sum(1)
    )


def test_criterion_finite(built):
    task, model, crit, batch, variables = built
    loss, mets, mutated = crit(model, variables, batch, jax.random.PRNGKey(1),
                               train=True)
    assert np.isfinite(float(loss))
    assert "batch_stats" in mutated  # conformer batch-norm updated
    loss2, mets2, _ = crit(model, variables, batch, jax.random.PRNGKey(1),
                           train=False)
    assert np.isfinite(float(loss2))


def test_random_mask_masks_only_tokens():
    rng = np.random.default_rng(0)
    target = np.array([
        [10, 11, 12, 13, EOS, PAD, PAD],
        [10, 11, EOS, PAD, PAD, PAD, PAD],
    ], np.int32)
    out = random_mask(target, rng)
    # pad/eos/bos never masked
    assert (out[target == PAD] == PAD).all()
    assert (out[target == EOS] == EOS).all()
    # at least one mask per row
    assert (out == UNK).any(axis=1).all()


def test_side_mask_masks_only_tokens():
    rng = np.random.default_rng(0)
    target = np.tile(np.arange(10, 30, dtype=np.int32), (4, 1))
    target[:, -1] = EOS
    out = side_mask(target, rng)
    assert (out[target == EOS] == EOS).all()
    assert out.shape == target.shape


def test_skeptical_mask_counts():
    scores = jnp.asarray([[-5.0, -1.0, -3.0, -2.0, 0.0, 0.0]])
    non_pad = jnp.asarray([[True, True, True, True, False, False]])
    m = np.asarray(skeptical_mask(scores, non_pad, 0.5))
    # boundary = floor((4-2)*0.5) = 1 -> only the single worst position
    assert m.sum() == 1 and m[0, 0]


def test_init_canvas():
    tokens, scores = init_canvas(jnp.asarray([3, 1]), 5)
    EOS = 2
    np.testing.assert_array_equal(
        np.asarray(tokens), [[UNK, UNK, EOS, PAD, PAD], [UNK, EOS, PAD, PAD, PAD]]
    )  # min length clamps to 2; eos anchors the last real position


def test_mask_predict_single_step_fills_all(built):
    """max_iter=0 -> exactly one fill pass, no remask: every canvas position
    gets written (an untrained argmax may legally emit any token id, unk
    included — the reference does not ban specials in the base decode path,
    nar_transformer.py:809-813)."""
    task, model, crit, batch, variables = built
    tokens, scores, steps = mask_predict_decode(
        model, variables, batch["src_tokens"], batch["src_lengths"],
        max_iter=0, max_len=32,
    )
    tokens = np.asarray(tokens)
    scores = np.asarray(scores)
    assert tokens.shape == (2, 32)
    # every originally-masked position got a real log-prob score; the
    # positions beyond the predicted length stayed pad with score 0
    assert (scores < 0).any(axis=1).all()
    assert int(np.asarray(steps).max()) == 1


def test_mask_predict_decode_runs(built):
    task, model, crit, batch, variables = built
    tokens, scores, steps = mask_predict_decode(
        model, variables, batch["src_tokens"], batch["src_lengths"],
        max_iter=3, max_len=32,
    )
    tokens = np.asarray(tokens)
    assert tokens.shape == (2, 32)
    # untrained models may loop-freeze with masks left (reference adaptive
    # termination finalizes those canvases too); pads must stay pads
    lens = np.asarray((tokens != PAD).sum(1))
    assert (lens >= 2).all()
    assert int(np.asarray(steps).max()) <= 4


def test_mask_predict_cg_and_beam(built):
    task, model, crit, batch, variables = built
    tokens, scores, steps = mask_predict_decode(
        model, variables, batch["src_tokens"], batch["src_lengths"],
        max_iter=2, max_len=32, cond_scale=1.5, length_beam=3,
    )
    assert np.asarray(tokens).shape == (2, 32)


def test_mask_predict_decode_chunked_matches_unchunked():
    """Chunked decode (opt-in knob) must produce identical tokens to the
    monolithic call, including with batch padding (B=3, chunk=2)."""
    from diffnorm_tpu.generate.mask_predict import mask_predict_decode_chunked

    cfg = tiny_cfg()
    task = TASKS.get("dummy_nar").setup_task(cfg)
    model = task.build_model()
    batch = task.dummy_batch(3, 48)
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    src = jnp.asarray(batch["src_tokens"])
    lens = jnp.asarray(batch["src_lengths"])
    ref = mask_predict_decode(model, variables, src, lens,
                              max_iter=2, max_len=32)
    got = mask_predict_decode_chunked(model, variables, src, lens, chunk=2,
                                      max_iter=2, max_len=32)
    # lax.map compiles the body separately -> ~1e-7 logit reassociation;
    # allow argmax flips only at such near-ties (>=99% token agreement)
    tok_r, tok_g = np.asarray(ref[0]), np.asarray(got[0])
    assert (tok_r == tok_g).mean() >= 0.99
    np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(got[1]),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ref[2]), np.asarray(got[2]))

    # beam x chunk composition (n_steps must come back per selected row)
    tb, sb, nb = mask_predict_decode_chunked(
        model, variables, src, lens, chunk=2, max_iter=2, max_len=32,
        length_beam=2,
    )
    assert np.asarray(tb).shape == (3, 32)
    assert np.asarray(nb).shape == (3,)


def test_retain_history(built):
    """retain_history returns each step's FILLED canvas; the last history
    entry is exactly the final output (reference --retain-iter-history)."""
    task, model, crit, batch, variables = built
    out = mask_predict_decode(
        model, variables, batch["src_tokens"], batch["src_lengths"],
        max_iter=2, max_len=32, retain_history=True,
    )
    assert len(out) == 4
    tokens, scores, steps, history = out
    history = np.asarray(history)
    assert history.shape == (3, 2, 32)
    np.testing.assert_array_equal(history[-1], np.asarray(tokens))
    # and with a length beam the history follows the SELECTED beam
    t2, _, _, h2 = mask_predict_decode(
        model, variables, batch["src_tokens"], batch["src_lengths"],
        max_iter=1, max_len=32, length_beam=3, retain_history=True,
    )
    np.testing.assert_array_equal(np.asarray(h2)[-1], np.asarray(t2))


def test_ar_rerank_scores_oracle():
    """ar_rerank_scores against a numpy oracle: EOS start substitution,
    teacher-forced gather of tokens[1:], pad-masked mean."""
    import types

    from diffnorm_tpu.generate.mask_predict import ar_rerank_scores

    n, t, v = 3, 6, 11
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(n, t - 1, v)).astype(np.float32)
    cand = rng.integers(4, v, size=(n, t)).astype(np.int32)
    cand[1, 4:] = PAD
    cand[2, 3:] = PAD

    class Stub:
        def apply(self, variables, src, src_lengths, prev):
            assert prev.shape == (n, t - 1)
            return dict(logits=jnp.asarray(logits))

    model = types.SimpleNamespace(module=Stub())
    got = np.asarray(ar_rerank_scores(
        model, {}, jnp.zeros((n, 4, 8)), jnp.full((n,), 4),
        jnp.asarray(cand),
    ))

    toks = cand.copy()
    toks[:, 0] = EOS
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    want = np.zeros(n)
    for i in range(n):
        tgt = toks[i, 1:]
        m = tgt != PAD
        want[i] = lp[i, np.arange(t - 1), tgt][m].mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ar_reranked_beam_selection(built):
    """Length-beam selection with an AR reranker picks the candidate the
    reranker scores highest — verified by reconstructing each beam's
    candidate independently (true_length = l + offset reproduces the beam
    row exactly) and choosing a reranker that provably disagrees with the
    mean-score selection on this case."""
    import types

    from diffnorm_tpu.generate.mask_predict import ar_rerank_scores

    task, model, crit, _, variables = built
    batch = task.dummy_batch(4, 48)
    src, lens = batch["src_tokens"], batch["src_lengths"]
    beam, max_len = 3, 32
    module = model.module
    vocab = module.vocab_size

    # predicted lengths (same code path as the decoder)
    enc, enc_mask = module.apply(variables, src, lens, method="encode")
    length_logits = module.apply(variables, enc, enc_mask,
                                 method="forward_length")
    l_pred = np.asarray(jnp.argmax(length_logits, axis=-1))

    # reconstruct the three beam candidates per row + their mean scores
    cands, means = [], []
    for off in (-1, 0, 1):
        tk, sc, _ = mask_predict_decode(
            model, variables, src, lens, max_iter=2, max_len=max_len,
            true_length=jnp.asarray(l_pred + off),
        )
        tk, sc = np.asarray(tk), np.asarray(sc)
        np_ = tk != PAD
        means.append((sc * np_).sum(1) / np.maximum(np_.sum(1), 1))
        cands.append(tk)
    cands = np.stack(cands, axis=1)  # [B, beam, T]
    mean_winner = np.argmax(np.stack(means, 1), axis=1)

    def make_stub(sign):
        class Stub:
            def apply(self, variables, src, src_lengths, prev):
                n, tm1 = prev.shape
                base = np.zeros((n, tm1, vocab), np.float32)
                base[..., EOS] = 10.0 * sign
                return dict(logits=jnp.asarray(base))

        return types.SimpleNamespace(module=Stub())

    # favor-short (EOS bonus) picks beam 0; favor-long picks beam 2;
    # whichever disagrees with the mean-score winner somewhere is the
    # constructed "reranker changes the selection" case
    sign = 1.0 if (mean_winner != 0).any() else -1.0
    stub = make_stub(sign)

    tokens_rr, _, _ = mask_predict_decode(
        model, variables, src, lens, max_iter=2, max_len=max_len,
        length_beam=beam, reranker=(stub, {}),
    )
    tokens_rr = np.asarray(tokens_rr)

    # oracle winner via the same scorer on the reconstructed candidates
    flat = jnp.asarray(cands.reshape(-1, max_len))
    rr = np.asarray(ar_rerank_scores(
        stub, {}, jnp.repeat(src, beam, axis=0),
        jnp.repeat(lens, beam, axis=0), flat,
    )).reshape(-1, beam)
    rr_winner = np.argmax(rr, axis=1)
    for i in range(cands.shape[0]):
        np.testing.assert_array_equal(tokens_rr[i], cands[i, rr_winner[i]],
                                      err_msg=f"row {i}")
    assert (rr_winner != mean_winner).any()  # the constructed disagreement

    tokens_ms, _, _ = mask_predict_decode(
        model, variables, src, lens, max_iter=2, max_len=max_len,
        length_beam=beam,
    )
    assert not np.array_equal(tokens_rr, np.asarray(tokens_ms))


def test_conformer_encoder_remat_grads():
    """--encoder-remat (jax.checkpoint per conformer layer) must stay
    differentiable through the setup-style encoder."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffnorm_tpu.models.conformer import ConformerEncoder

    enc = ConformerEncoder(dim=16, ffn_dim=32, layers=2, heads=4,
                           dropout=0.0, depthwise_kernel_size=7,
                           conv_channels=16, remat=True)
    src = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 80)), jnp.float32)
    lens = jnp.asarray([32, 20])
    v = enc.init(jax.random.PRNGKey(0), src, lens)

    def loss(v):
        out, _ = enc.apply(v, src, lens)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(v)
    total = jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)
    assert np.isfinite(float(total)) and float(total) > 0


def test_recipe_attn_pos_enc_flags():
    """scripts/s2ut/train.sh passes --attn-type espnet --pos-enc-type
    rel_pos; the arch accepts those and rejects unimplemented combos."""
    import pytest as _pytest

    from diffnorm_tpu.config import Config
    from diffnorm_tpu.registry import ARCHITECTURES

    _, arch = ARCHITECTURES.get("nar_s2ut_conformer")
    cfg = Config(attn_type="espnet", pos_enc_type="rel_pos")
    arch(cfg)
    assert cfg["encoder_embed_dim"] == 512
    with _pytest.raises(ValueError, match="attn-type"):
        arch(Config(pos_enc_type="abs"))


def test_separate_attention_and_activation_dropout():
    """--attention-dropout/--relu-dropout are independent knobs (fairseq
    TransformerConfig): with base dropout 0 but attention_dropout ~1 the
    train-mode forward must be stochastic, and with all rates 0 it must
    equal the deterministic forward."""
    import jax.numpy as jnp

    def forward(attn_do, relu_do, key):
        cfg = tiny_cfg(dropout=0.0)
        if attn_do is not None:
            cfg["attention_dropout"] = attn_do
        if relu_do is not None:
            cfg["relu_dropout"] = relu_do
        task = TASKS.get("dummy_nar").setup_task(cfg)
        model = task.build_model()
        batch = task.dummy_batch(2, 48)
        variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
        out, _ = model.module.apply(
            variables, jnp.asarray(batch["src_tokens"]),
            jnp.asarray(batch["src_lengths"]),
            jnp.asarray(batch["prev_target"]),
            tgt_tokens=jnp.asarray(batch["target"]),
            deterministic=False,
            rngs={"dropout": key, "cg": jax.random.PRNGKey(9)},
            mutable=["batch_stats"],
        )
        return np.asarray(out["logits"])

    base = forward(None, None, jax.random.PRNGKey(1))
    # all-zero rates: train == another train draw (no stochastic path)
    np.testing.assert_allclose(
        base, forward(None, None, jax.random.PRNGKey(2)), atol=1e-6)
    # attention dropout alone makes it stochastic
    a1 = forward(0.7, None, jax.random.PRNGKey(1))
    a2 = forward(0.7, None, jax.random.PRNGKey(2))
    assert not np.allclose(a1, a2, atol=1e-4)
    # activation (relu) dropout alone makes it stochastic
    r1 = forward(None, 0.7, jax.random.PRNGKey(1))
    r2 = forward(None, 0.7, jax.random.PRNGKey(2))
    assert not np.allclose(r1, r2, atol=1e-4)
