"""JAX runtime setup: persistent compilation cache.

The proving pipeline compiles many mid-sized kernels per trace shape; the
on-disk cache makes repeat runs (tests, benches, prover services) skip XLA
compilation entirely.  Idempotent; respects an existing user setting.

Only compilations that took >= 1s are cached (the JAX default): lowering the
threshold to 0 makes every tiny eager op take the Python dispatch path plus a
disk read, which measures ~0.35s per op-shape on this image - catastrophically
slower than just recompiling.
"""

from __future__ import annotations

import os

_done = False


def enable_cpu_fast_field():
    """On the CPU backend, enable x64 so field muls use native uint64.

    Cuts traced-graph size (and XLA compile time, the dominant unit-test
    cost) ~3x; see ops/field.py fmul.  No-op on TPU.
    """
    import jax

    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)


def _host_fingerprint() -> str:
    """Short hash of this host's CPU feature flags.

    The persistent cache stores XLA:CPU executables compiled for the exact
    host microarchitecture; this image's home directory is SHARED across
    machines with different avx512 feature sets, and loading a foreign
    entry warns ("could lead to execution errors such as SIGILL") and was
    observed to SEGFAULT the test suite mid-run (round 4).  Keying the
    cache directory by the feature flags isolates hosts from each other.
    """
    import hashlib

    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    return hashlib.sha256(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None):
    global _done
    if _done:
        return
    import jax

    # Host-fingerprint the CPU cache only: XLA:CPU executables are
    # machine-specific (foreign entries segfault), while TPU executables are
    # target-compiled server-side and SHOULD stay shared across hosts.
    suffix = _host_fingerprint() if jax.default_backend() == "cpu" else ""
    cache_dir = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.join(
            os.path.expanduser("~"), ".cache", "zkvm_brainfuck_tpu", "xla", suffix
        )
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache anything that took >= 0.2s to compile: the prover's per-chip
        # programs mostly compile in 0.2-50s and recur across runs, while
        # eager per-op compiles stay in the 1-20ms range and must NOT hit the
        # disk path (a 0-second threshold measured ~0.35s of disk I/O per op).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    except Exception:
        pass
    _done = True
