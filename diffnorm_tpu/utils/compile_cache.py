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


def host_fingerprint() -> str:
    """Short hash of the host's ISA + CPU feature flags.

    XLA:CPU AOT executables embed the compile machine's features; loading
    a cache entry compiled on a feature-richer host (e.g. AVX-512) can
    SIGILL on this one — jax only warns ("Compile machine features ...
    doesn't match"). Caches that can travel between machines (the
    repo-local multichip-dryrun cache) are therefore keyed on this
    fingerprint so a new host starts a fresh namespace instead of loading
    foreign executables."""
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = line.split(":", 1)[1]
                    break
    except OSError:
        pass
    key = platform.machine() + "|" + " ".join(sorted(feats.split()))
    return hashlib.sha256(key.encode()).hexdigest()[:12]


def enable_compile_cache(default_dir: str = "/tmp/diffnorm_jax_cache",
                         min_secs: float = 2.0,
                         host_keyed: bool = True) -> None:
    """Point jax at a persistent compile cache.

    Precedence: DIFFNORM_COMPILE_CACHE=0 disables; a non-empty
    DIFFNORM_COMPILE_CACHE value or JAX_COMPILATION_CACHE_DIR overrides the
    caller's `default_dir` (CLIs use /tmp, the multichip dryrun a repo-local
    dir with a lower time threshold since its programs are tiny).
    `host_keyed` (default on) namespaces the directory by
    `host_fingerprint()` — both the repo-local dryrun cache AND /tmp have
    been observed to outlive the machine that compiled them (the driver
    snapshots the filesystem between rounds), and loading a foreign
    XLA:CPU AOT executable is a SIGILL hazard. TPU executables are
    host-agnostic, so the extra namespace merely costs one warm-up per
    host."""
    import jax

    knob = os.environ.get("DIFFNORM_COMPILE_CACHE", "")
    if knob == "0":
        return
    cache_dir = (knob or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or default_dir)
    if host_keyed:
        # only the CPU backend's AOT executables embed host ISA features;
        # TPU executables are device-targeted and SHOULD stay shared
        # across hosts (the driver's end-of-round bench rides that warmth)
        try:
            backend = jax.default_backend()
        except Exception:
            backend = None
        if backend == "cpu":
            cache_dir = os.path.join(cache_dir,
                                     "host-" + host_fingerprint())
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_secs)
    except Exception:
        pass  # older jax without the knobs: the cache is an optimization only
