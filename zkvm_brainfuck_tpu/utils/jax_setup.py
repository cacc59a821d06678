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


def _mark_done():
    global _done
    _done = True


def ensure_cpu_isa_cap() -> None:
    """Cap XLA:CPU codegen at AVX2 (idempotent; call BEFORE jax backend
    init).

    XLA:CPU on this image emits AMX/AVX512 executables whose own AOT loader
    warns "+prefer-no-scatter ... could lead to execution errors such as
    SIGILL" when reloading them.  Capping the ISA silences that hazard class
    outright.  (It did NOT stop the persistent-cache deserialization
    segfaults - those reproduced with capped, fresh-cache entries, which is
    why the CPU persistent cache is disabled in enable_compilation_cache -
    but it remains defense-in-depth for anyone re-enabling the cache, at
    negligible test-speed cost.)  Harmless for TPU processes (the flag only
    affects CPU compiles)."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_max_isa" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_cpu_max_isa=AVX2").strip()


def enable_cpu_fast_field():
    """On the CPU backend, enable x64 so field muls use native uint64.

    Cuts traced-graph size (and XLA compile time, the dominant unit-test
    cost) ~3x; see ops/field.py fmul.  No-op on TPU.
    """
    import jax

    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)


def enable_compilation_cache(path: str | None = None):
    global _done
    if _done:
        return
    import jax

    if jax.default_backend() == "cpu" and os.environ.get("ZKBF_CPU_CACHE") != "1":
        # The persistent cache is DISABLED on the CPU backend: XLA:CPU
        # executable DESERIALIZATION randomly segfaults in this jax version
        # (round-5 finding - crashes in compilation_cache.get_executable_and
        # _time reproduced with a fresh cache, matching machine features,
        # serialized compiles, and an AVX2 ISA cap; neither the round-4
        # host-fingerprint nor any of those mitigations stopped it).  The
        # jax.export AOT layer (utils/aot.py) still skips tracing+lowering;
        # XLA:CPU recompiles once per process.  Re-enable for experiments
        # with ZKBF_CPU_CACHE=1.
        _mark_done()
        return
    cache_dir = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.join(
            os.path.expanduser("~"), ".cache", "zkvm_brainfuck_tpu", "xla"
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
