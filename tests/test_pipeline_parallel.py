"""GPipe pipeline: output parity with sequential stage application."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnorm_tpu.parallel.pipeline import make_stage_mesh, pipeline_apply


def test_pipeline_matches_sequential():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    s, m, mb, d = 4, 6, 2, 8
    rng = np.random.default_rng(0)
    # stage = affine transform: x @ W + b
    stage_params = {
        "w": jnp.asarray(rng.normal(size=(s, d, d)) * 0.3, jnp.float32),
        "b": jnp.asarray(rng.normal(size=(s, d)), jnp.float32),
    }
    x = jnp.asarray(rng.normal(size=(m, mb, d)), jnp.float32)

    def stage_fn(params, h):
        return jnp.tanh(h @ params["w"] + params["b"])

    mesh = make_stage_mesh(s)
    out = pipeline_apply(stage_fn, stage_params, x, mesh)

    # sequential reference
    ref = x
    for i in range(s):
        ref = jnp.tanh(
            ref @ stage_params["w"][i] + stage_params["b"][i]
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
