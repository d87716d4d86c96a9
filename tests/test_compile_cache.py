"""Compile-cache helper: host fingerprinting keeps machine-portable cache
directories from serving XLA:CPU AOT executables compiled on a different
host's ISA feature set (VERDICT r4 weak 4 — jax's "Compile machine
features ... doesn't match" warning is a SIGILL hazard, not a nit)."""

import os

from diffnorm_tpu.utils.compile_cache import (
    enable_compile_cache,
    host_fingerprint,
    install_cpu_aot_warning_filter,
)


def test_host_fingerprint_stable_and_short():
    a, b = host_fingerprint(), host_fingerprint()
    assert a == b
    assert len(a) == 12 and all(c in "0123456789abcdef" for c in a)


def test_enable_compile_cache_host_keyed(tmp_path, monkeypatch):
    import jax

    monkeypatch.delenv("DIFFNORM_COMPILE_CACHE", raising=False)
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    old = jax.config.jax_compilation_cache_dir
    try:
        # host-keyed is the DEFAULT: /tmp and the repo dir both outlive
        # the compile host under the driver's filesystem snapshotting
        enable_compile_cache(default_dir=str(tmp_path))
        got = jax.config.jax_compilation_cache_dir
        assert got == os.path.join(str(tmp_path),
                                   "host-" + host_fingerprint())
        # opt-out: the directory is used as-is
        enable_compile_cache(default_dir=str(tmp_path), host_keyed=False)
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)
        # DIFFNORM_COMPILE_CACHE=0 leaves the current setting untouched
        monkeypatch.setenv("DIFFNORM_COMPILE_CACHE", "0")
        enable_compile_cache(default_dir="/elsewhere")
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


def test_aot_warning_filter_drops_only_the_false_positive(tmp_path):
    """The dryrun's stderr filter drops cpu_aot_loader's same-host
    feature-mismatch line (a tuning-pref string comparison that can never
    succeed, see install_cpu_aot_warning_filter) and forwards everything
    else byte-for-byte — checked through the real fd 2 in a subprocess so
    the dup2 plumbing is what's under test."""
    import subprocess
    import sys

    prog = """
from diffnorm_tpu.utils.compile_cache import install_cpu_aot_warning_filter
import os, sys
restore = install_cpu_aot_warning_filter()
os.write(2, b"E0000 00:00 cpu_aot_loader.cc:210] Loading XLA:CPU AOT "
            b"result. Compile machine features: [+avx] vs host\\n")
os.write(2, b"a real error line\\n")
print("partial with no newline", end="", file=sys.stderr)
sys.stderr.flush()
restore()
restore()  # idempotent
os.write(2, b"\\nafter restore\\n")
"""
    out = subprocess.run(
        [sys.executable, "-c", prog], cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
        capture_output=True, timeout=120)
    err = out.stderr.decode()
    assert out.returncode == 0, (err, out.stdout)
    assert "cpu_aot_loader" not in err and "machine features" not in err
    assert "a real error line\n" in err
    assert "partial with no newline" in err
    assert "after restore" in err
