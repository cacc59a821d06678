"""JAX runtime setup: persistent compilation cache.

The proving pipeline compiles many mid-sized kernels per trace shape; the
on-disk cache makes repeat runs (tests, benches, prover services) skip XLA
compilation entirely.  Idempotent; respects an existing user setting.
"""

from __future__ import annotations

import os

_done = False


def enable_compilation_cache(path: str | None = None):
    global _done
    if _done:
        return
    import jax

    cache_dir = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.join(os.path.expanduser("~"), ".cache", "zkvm_brainfuck_tpu", "xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    _done = True
