"""Serialized model export (StableHLO via jax.export).

Parity target: reference tests/test_export.py (TorchScript round trips).
Covers: baked-params self-contained artifact, params-as-argument mode,
shape-polymorphic batch dimension, artifact file round trip, and magic
validation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnorm_tpu.config import Config
from diffnorm_tpu.registry import TASKS
from diffnorm_tpu.utils.export import (
    export_fn,
    load_exported,
    save_exported,
)


@pytest.fixture(scope="module")
def built():
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

    def fwd(variables, src, src_lengths, prev_target):
        return model.apply(
            variables, src, src_lengths, prev_target,
            tgt_tokens=prev_target, deterministic=True,
        )["logits"]

    args = (batch["src_tokens"], batch["src_lengths"], batch["prev_target"])
    want = fwd(variables, *args)
    return fwd, variables, args, want


def test_baked_params_round_trip(tmp_path, built):
    fwd, variables, args, want = built
    path = tmp_path / "nar.dnx"
    nbytes = save_exported(path, fwd, args, params=variables)
    assert nbytes > 0 and path.exists()
    got = load_exported(path)(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_params_as_argument(built):
    fwd, variables, args, want = built
    blob = export_fn(fwd, args, params=variables, bake_params=False)
    from jax import export as jexport

    got = jexport.deserialize(bytearray(blob)).call(variables, *args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_batch_polymorphic(tmp_path, built):
    fwd, variables, args, want = built
    path = tmp_path / "nar_poly.dnx"
    save_exported(path, fwd, args, params=variables, batch_poly=True)
    call = load_exported(path)
    # traced at B=2; runs at B=2 and B=5 from the same artifact
    got2 = call(*args)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    big = tuple(jnp.concatenate([jnp.asarray(a)] * 3, axis=0)[:5]
                for a in args)
    got5 = call(*big)
    assert got5.shape[0] == 5
    np.testing.assert_allclose(np.asarray(got5[:2]), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_magic_validation(tmp_path):
    import zipfile

    bad = tmp_path / "bad.dnx"
    with zipfile.ZipFile(bad, "w") as z:
        z.writestr("MAGIC", "something-else")
        z.writestr("module.stablehlo", b"")
    with pytest.raises(ValueError, match="not a diffnorm export artifact"):
        load_exported(bad)
