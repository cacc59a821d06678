"""AOT kernel cache: skip Python tracing + MLIR lowering across processes.

The prover's hot programs (per-chip quotient / LogUp kernels, Merkle tree
builders) have large traced graphs: profiling a cold 2^16-cycle prove on this
image showed 157 s of jaxpr tracing + 90 s of MLIR lowering + 443 s of XLA
compilation for ~20 s of actual compute.  JAX's persistent compilation cache
only skips the XLA step - tracing and lowering re-run in every process.

This module closes the rest of the gap with `jax.export`: the first build of
a kernel serializes its StableHLO to disk; later processes deserialize and
call it directly (no tracing, no constraint-builder Python, no lowering), and
the XLA compile of the deserialized module hits the persistent compilation
cache because the HLO is byte-identical.

Cache keys include the jax version, the backend platform, a hash of this
package's source tree (any source edit invalidates every entry), and the
caller-supplied kernel key (name + shape/static signature).
"""

from __future__ import annotations

import hashlib
import logging
import os
import time
from typing import Callable, Sequence

log = logging.getLogger("zkbf.aot")

_mem: dict = {}
_code_version_cache: list = []


def _package_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def code_version() -> str:
    """Hash of every .py source in the package (kernel-semantics version)."""
    if _code_version_cache:
        return _code_version_cache[0]
    h = hashlib.sha256()
    root = _package_root()
    files = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            if fn.endswith(".py"):
                files.append(os.path.join(dirpath, fn))
    for path in sorted(files):
        h.update(path.encode())
        with open(path, "rb") as fh:
            h.update(fh.read())
    v = h.hexdigest()[:16]
    _code_version_cache.append(v)
    return v


def _cache_dir() -> str:
    import jax

    base = os.environ.get("ZKBF_AOT_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "zkvm_brainfuck_tpu", "export"
    )
    d = os.path.join(base, jax.__version__, jax.default_backend(), code_version())
    os.makedirs(d, exist_ok=True)
    return d


def _key_digest(key) -> str:
    return hashlib.sha256(repr(key).encode()).hexdigest()[:32]


def cached_kernel(key, build: Callable[[], Callable], example_args: Sequence):
    """Return a compiled callable for `build()` specialized to `example_args`.

    key: any repr-stable value identifying the kernel (name + shapes +
    static config).  build: zero-arg factory returning the traceable
    function.  example_args: arrays (or ShapeDtypeStructs) fixing the
    signature.

    First call per (machine, code version): traces + lowers + serializes to
    disk.  Later processes: deserializes StableHLO (ms) and compiles via the
    persistent XLA cache.  Within a process the jitted wrapper is memoized.
    """
    import jax

    full_key = ("aot", key)
    fn = _mem.get(full_key)
    if fn is not None:
        return fn

    path = os.path.join(_cache_dir(), _key_digest(key) + ".shlo")
    exported = None
    if os.path.exists(path) and not os.environ.get("ZKBF_AOT_DISABLE"):
        try:
            t0 = time.time()
            with open(path, "rb") as fh:
                exported = jax.export.deserialize(bytearray(fh.read()))
            log.debug("aot: loaded %r in %.3fs", key, time.time() - t0)
        except Exception as e:  # stale/corrupt entry: rebuild
            log.warning("aot: failed to load %r (%s); rebuilding", key, e)
            exported = None
    if exported is None:
        t0 = time.time()
        shapes = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tuple(example_args)
        )
        exported = jax.export.export(jax.jit(build()))(*shapes)
        if not os.environ.get("ZKBF_AOT_DISABLE"):
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as fh:
                fh.write(exported.serialize())
            os.replace(tmp, path)
        log.debug("aot: built %r in %.3fs", key, time.time() - t0)

    fn = jax.jit(exported.call)
    _mem[full_key] = fn
    return fn
