"""Average model parameters across checkpoints (reference:
scripts/average_checkpoints.py — used for ensembling the best-k)."""

from __future__ import annotations

import argparse
import sys

import jax
import numpy as np

from diffnorm_tpu.train.checkpoint import load_checkpoint_params


def average_checkpoints(paths):
    trees = [load_checkpoint_params(p) for p in paths]
    n = len(trees)

    def avg(*xs):
        # jnp.issubdtype (not np.) so extended float dtypes (bfloat16)
        # are averaged too instead of silently keeping the first value
        import jax.numpy as jnp

        if not hasattr(xs[0], "dtype") or not jnp.issubdtype(
            np.asarray(xs[0]).dtype, jnp.floating
        ):
            return xs[0]
        mean = sum(np.asarray(x, np.float64) for x in xs) / n
        return mean.astype(np.asarray(xs[0]).dtype)

    return jax.tree_util.tree_map(avg, *trees)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--inputs", nargs="+", required=True)
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)

    import orbax.checkpoint as ocp

    avg = average_checkpoints(args.inputs)
    ckptr = ocp.StandardCheckpointer()
    import os

    ckptr.save(os.path.abspath(args.output), avg)
    ckptr.wait_until_finished()
    print(f"averaged {len(args.inputs)} checkpoints -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
