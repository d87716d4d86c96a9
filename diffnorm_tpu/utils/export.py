"""Serialized model export for serving (StableHLO via jax.export).

TPU-native equivalent of the reference's TorchScript export surface
(reference: tests/test_export.py — `torch.jit.script` round trips of
transformer/dictionary modules). Instead of scripting Python, we trace the
jitted inference function once and serialize the StableHLO module; the
artifact reloads and executes without any model code, across processes and
jax versions (jax.export's compatibility guarantees), and compiles for any
backend (TPU/CPU).

Two modes:
  * bake_params=True  — model parameters are closed over and baked into the
    module as constants: ONE self-contained artifact, nothing else to ship.
  * bake_params=False — the exported callable takes the parameter pytree as
    its first argument (artifact stays small; params ship via orbax).

`batch_poly=True` marks every input's leading axis with one shared symbolic
dimension "b", so a single artifact serves any batch size (shape
polymorphism is the analog of TorchScript's dynamic batch).
"""

from __future__ import annotations

import io
import zipfile

import jax
import jax.numpy as jnp
from jax import export as jexport

_MAGIC = "diffnorm-export-v1"


def _poly_specs(example_args, batch_poly: bool):
    """ShapeDtypeStructs for example arrays, leading dim symbolic if asked."""
    if batch_poly:
        (b,) = jexport.symbolic_shape("b")

    def spec(x):
        x = jnp.asarray(x)
        shape = x.shape
        if batch_poly and x.ndim >= 1:
            shape = (b,) + shape[1:]
        return jax.ShapeDtypeStruct(shape, x.dtype)

    return jax.tree_util.tree_map(spec, example_args)


def export_fn(fn, example_args, params=None, bake_params: bool = True,
              batch_poly: bool = False):
    """Export `fn` traced at `example_args` to serialized StableHLO bytes.

    fn: callable — `fn(*example_args)` when params is None, otherwise
        `fn(params, *example_args)`.
    params: optional pytree of arrays (model variables).
    bake_params: close over `params` (constants in the module) instead of
        taking them as a runtime argument. Ignored when params is None.
    batch_poly: export with a shared symbolic leading ("batch") dimension
        on every example arg.
    """
    specs = _poly_specs(tuple(example_args), batch_poly)
    if params is None:
        exp = jexport.export(jax.jit(fn))(*specs)
    elif bake_params:
        frozen = jax.tree_util.tree_map(jnp.asarray, params)
        exp = jexport.export(jax.jit(lambda *a: fn(frozen, *a)))(*specs)
    else:
        pspecs = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
            params,
        )
        exp = jexport.export(jax.jit(fn))(pspecs, *specs)
    return bytes(exp.serialize())


def save_exported(path, fn, example_args, params=None,
                  bake_params: bool = True, batch_poly: bool = False):
    """export_fn + write a self-describing zip artifact to `path`."""
    blob = export_fn(fn, example_args, params=params,
                     bake_params=bake_params, batch_poly=batch_poly)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("MAGIC", _MAGIC)
        z.writestr("module.stablehlo", blob)
    with open(path, "wb") as f:
        f.write(buf.getvalue())
    return len(blob)


def load_exported(path):
    """Load an artifact written by save_exported; returns a callable.

    The callable executes the serialized module (jit-compiled for the
    current backend) with the same signature the export traced.
    """
    with zipfile.ZipFile(path) as z:
        magic = z.read("MAGIC").decode()
        if magic != _MAGIC:
            raise ValueError(f"not a diffnorm export artifact: {magic!r}")
        blob = z.read("module.stablehlo")
    exp = jexport.deserialize(bytearray(blob))
    return lambda *args: exp.call(*args)
