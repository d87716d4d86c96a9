"""Multi-chip sharding dry-run (mirrors the driver's dryrun_multichip check:
dp x tp mesh + FSDP param sharding on the virtual 8-device CPU mesh)."""

import jax
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (conftest sets XLA_FLAGS)")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_tp_sharding_rules():
    from jax.sharding import PartitionSpec as P

    import numpy as np

    from diffnorm_tpu.parallel.sharding_rules import fsdp_spec, param_spec
    from diffnorm_tpu.parallel.mesh import make_mesh

    w = np.zeros((64, 128))
    # column-parallel: out dim sharded
    assert param_spec(("layer_0", "q_proj", "kernel"), w) == P(None, "model")
    # row-parallel: in dim sharded
    assert param_spec(("layer_0", "out_proj", "kernel"), w) == P("model", None)
    # everything else replicated
    assert param_spec(("embed", "embedding"), w) == P()

    mesh = make_mesh(data=4, model=2)
    # fsdp adds "data" on the largest free axis
    spec = fsdp_spec(P(None, "model"), w, mesh)
    assert spec == P("data", "model")
    spec2 = fsdp_spec(P(), w, mesh)
    assert "data" in spec2
