"""Persistent XLA compilation cache shared by every CLI entry point.

First compiles through the remote TPU tunnel take minutes (PERFORMANCE.md);
the axon backend supports serialized executables, so a disk cache makes
re-runs of the same program (training restarts, repeated synthesis/eval
invocations, the driver's bench) compile in seconds. CPU runs benefit too
(the multichip dryrun went 9.7 -> 3.2 min warm).

Replaces nothing in the reference — torch caches kernels in-process only;
this is a TPU-build affordance. Opt out with DIFFNORM_COMPILE_CACHE=0, or
point DIFFNORM_COMPILE_CACHE at a directory of your choice.
"""

from __future__ import annotations

import os


def enable_compile_cache(default_dir: str = "/tmp/diffnorm_jax_cache",
                         min_secs: float = 2.0) -> None:
    """Point jax at a persistent compile cache.

    Precedence: DIFFNORM_COMPILE_CACHE=0 disables; a non-empty
    DIFFNORM_COMPILE_CACHE value or JAX_COMPILATION_CACHE_DIR overrides the
    caller's `default_dir` (CLIs use /tmp, the multichip dryrun a repo-local
    dir with a lower time threshold since its programs are tiny)."""
    import jax

    knob = os.environ.get("DIFFNORM_COMPILE_CACHE", "")
    if knob == "0":
        return
    cache_dir = (knob or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or default_dir)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_secs)
    except Exception:
        pass  # older jax without the knobs: the cache is an optimization only
