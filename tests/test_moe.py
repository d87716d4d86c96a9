"""BASE-layer MoE: native balanced assignment, sinkhorn routing balance,
expert layer forward + expert-axis sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnorm_tpu.models.moe import (
    BaseLayer,
    balanced_assignment_host,
    sinkhorn_routing,
)


def test_balanced_assignment_host_exact_balance():
    rng = np.random.default_rng(0)
    scores = rng.normal(size=(16, 4)).astype(np.float32)
    out = balanced_assignment_host(scores)
    counts = np.bincount(out, minlength=4)
    np.testing.assert_array_equal(counts, [4, 4, 4, 4])
    # obvious preference case: identity-ish blocks
    strong = np.full((8, 2), -10.0, np.float32)
    strong[:4, 0] = 10.0
    strong[4:, 1] = 10.0
    out2 = balanced_assignment_host(strong)
    np.testing.assert_array_equal(out2, [0, 0, 0, 0, 1, 1, 1, 1])


def test_balanced_assignment_native_matches_numpy():
    from diffnorm_tpu.data.batching import _load_native
    import diffnorm_tpu.data.batching as batching

    if not _load_native():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(1)
    scores = rng.normal(size=(24, 6)).astype(np.float32)
    native = balanced_assignment_host(scores)
    orig = batching._LIB
    try:
        batching._LIB = False
        fallback = balanced_assignment_host(scores)
    finally:
        batching._LIB = orig
    np.testing.assert_array_equal(native, fallback)


def test_sinkhorn_routing_balanced():
    rng = np.random.default_rng(2)
    scores = jnp.asarray(rng.normal(size=(32, 4)), jnp.float32)
    expert_id = sinkhorn_routing(scores)
    counts = np.bincount(np.asarray(expert_id), minlength=4)
    # exact balance: every expert gets exactly cap tokens
    np.testing.assert_array_equal(counts, [8, 8, 8, 8])


def test_base_layer_forward():
    layer = BaseLayer(dim=8, ffn_dim=16, num_experts=4)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(16, 8)), jnp.float32)
    variables = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(variables, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # expert params carry the leading expert axis for EP sharding
    assert variables["params"]["experts_w1"].shape == (4, 8, 16)


def test_base_layer_expert_sharding():
    from jax.sharding import PartitionSpec as P

    from diffnorm_tpu.parallel.sharding_rules import param_spec

    w1 = np.zeros((4, 8, 16))
    spec = param_spec(("base_layer", "experts_w1"), w1)
    assert spec == P("model", None, None)