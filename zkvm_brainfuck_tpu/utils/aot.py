"""AOT kernel cache: skip Python tracing + MLIR lowering across processes.

The prover's hot programs (per-chip quotient / LogUp kernels, fused batch
commits, FRI layers) have large traced graphs: profiling a cold 2^16-cycle
prove on this image showed 157 s of jaxpr tracing + 90 s of MLIR lowering +
443 s of XLA compilation for ~20 s of actual compute.  JAX's persistent
compilation cache only skips the XLA step - tracing and lowering re-run in
every process.

This module closes the rest of the gap with `jax.export`: the first build of
a kernel serializes its StableHLO to disk; later processes deserialize and
call it directly (no tracing, no constraint-builder Python, no lowering), and
the XLA compile of the deserialized module hits the persistent compilation
cache because the HLO is byte-identical.

`jax.export` only serializes pytrees with string dict keys, so the wrapper
flattens inputs and outputs to flat leaf tuples and persists the output
treedef in a pickle sidecar next to the StableHLO blob.

Cache keys include the jax version, the backend platform, a PER-KERNEL source
version (the hash of the kernel module's static intra-package import closure -
NOT the whole package, so edits to unrelated modules such as the verifier,
serializer, prover orchestration, bench, or tests do not invalidate compiled
kernels; round-3 lesson: a whole-package hash meant the end-of-round snapshot
commit cold-started every program in the driver's bench), and the
caller-supplied kernel key (name + shape/static signature).

Disable with ZKBF_AOT=0 (falls back to plain jax.jit).
"""

from __future__ import annotations

import ast
import hashlib
import logging
import os
import pickle
import time
from typing import Callable, Sequence

log = logging.getLogger("zkbf.aot")

_mem: dict = {}


def enabled() -> bool:
    return os.environ.get("ZKBF_AOT", "1") != "0"


def _package_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pkg_name() -> str:
    return os.path.basename(_package_root())


# -- per-kernel source versioning -------------------------------------------
#
# A kernel's compiled artifact depends on the Python that TRACES it: its own
# module plus every package module reachable through static imports (including
# deferred in-function imports - ast.walk sees them all).  Call sites whose
# traced graph additionally captures code from modules they do not import
# (e.g. the quotient kernel runs chip `eval` methods defined in models/)
# declare those as explicit `deps`.

_dep_cache: dict = {}
_closure_cache: dict = {}


def _module_path(dotted: str):
    """Package-relative dotted name -> .py path (module file or pkg __init__)."""
    root = _package_root()
    cand = os.path.join(root, *dotted.split("."))
    if os.path.isfile(cand + ".py"):
        return cand + ".py"
    if os.path.isdir(cand):
        return os.path.join(cand, "__init__.py")
    return None


def _static_deps_of(path: str, mod_parts: tuple):
    """Package-relative dotted names statically imported by `path`.

    mod_parts: the module's own package path, e.g. ("ops",) for ops/merkle.py.
    """
    cached = _dep_cache.get(path)
    if cached is not None:
        return cached
    pkg = _pkg_name()
    deps = set()
    try:
        with open(path, "r") as fh:
            tree = ast.parse(fh.read(), filename=path)
    except (OSError, SyntaxError):
        _dep_cache[path] = frozenset()
        return frozenset()

    def add(dotted: str, names=()):
        if _module_path(dotted) is not None:
            deps.add(dotted)
        for n in names:
            sub = f"{dotted}.{n}" if dotted else n
            if _module_path(sub) is not None:
                deps.add(sub)

    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            if node.level > 0:
                # relative: resolve against this module's package
                base = mod_parts[: len(mod_parts) - (node.level - 1)]
                target = ".".join(base + tuple((node.module or "").split(".") if node.module else ()))
                add(target.strip("."), [a.name for a in node.names])
            elif node.module and node.module.split(".")[0] == pkg:
                target = ".".join(node.module.split(".")[1:])
                add(target, [a.name for a in node.names])
        elif isinstance(node, ast.Import):
            for a in node.names:
                parts = a.name.split(".")
                if parts[0] == pkg and len(parts) > 1:
                    add(".".join(parts[1:]))
    out = frozenset(deps)
    _dep_cache[path] = out
    return out


def _expand_package(dotted: str):
    """A package dep (e.g. "models") means every .py under its directory."""
    root = _package_root()
    d = os.path.join(root, *dotted.split("."))
    if os.path.isdir(d):
        return sorted(
            os.path.join(d, fn) for fn in os.listdir(d) if fn.endswith(".py")
        )
    p = _module_path(dotted)
    return [p] if p else []


def closure_version(roots: tuple) -> str:
    """Version hash for the import closure of `roots` (package-relative
    dotted module names).  Always includes this module and data/ constants."""
    roots = tuple(sorted(set(roots)))
    cached = _closure_cache.get(roots)
    if cached is not None:
        return cached
    root_dir = _package_root()
    files = {os.path.abspath(__file__)}
    data_dir = os.path.join(root_dir, "data")
    if os.path.isdir(data_dir):
        files.update(os.path.join(data_dir, fn) for fn in os.listdir(data_dir))
    todo = []
    for r in roots:
        todo.extend(_expand_package(r))
    seen_mods = set(roots)
    while todo:
        path = todo.pop()
        if path in files:
            continue
        files.add(path)
        rel = os.path.relpath(path, root_dir)
        mod_parts = tuple(rel[:-3].split(os.sep)[:-1])
        for dep in _static_deps_of(path, mod_parts):
            if dep not in seen_mods:
                seen_mods.add(dep)
                p = _module_path(dep)
                if p:
                    todo.append(p)
    h = hashlib.sha256()
    for path in sorted(files):
        h.update(os.path.relpath(path, root_dir).encode())
        h.update(_semantic_bytes(path))
    v = h.hexdigest()[:16]
    _closure_cache[roots] = v
    return v


def _semantic_bytes(path: str) -> bytes:
    """Source bytes reduced to code SEMANTICS for .py files: the AST dump
    with docstrings stripped, so comment/doc-only edits (e.g. the
    end-of-round snapshot commit touching a docstring) do NOT invalidate
    compiled kernels.  Non-Python files (data/) hash raw."""
    try:
        with open(path, "rb") as fh:
            raw = fh.read()
    except OSError:
        return b""
    if not path.endswith(".py"):
        return raw
    try:
        tree = ast.parse(raw)
        for node in ast.walk(tree):
            body = getattr(node, "body", None)
            if (
                isinstance(node, (ast.Module, ast.ClassDef, ast.FunctionDef, ast.AsyncFunctionDef))
                and body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                body[0].value.value = ""
        return ast.dump(tree).encode()
    except SyntaxError:
        return raw


def _cache_dir() -> str:
    import jax

    base = os.environ.get("ZKBF_AOT_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "zkvm_brainfuck_tpu", "export"
    )
    d = os.path.join(base, jax.__version__, jax.default_backend())
    os.makedirs(d, exist_ok=True)
    return d


def _key_digest(key, version: str = "") -> str:
    return hashlib.sha256((repr(key) + "|" + version).encode()).hexdigest()[:32]


def aot_compile(key, build: Callable[[], Callable], example_args: Sequence, version: str = "", donate_leaves: int = 0):
    """Return a compiled callable for `build()` specialized to `example_args`.

    key: any repr-stable value identifying the kernel (name + shapes + static
    config).  build: zero-arg factory returning the traceable function.
    example_args: the positional args pytree - arrays OR ShapeDtypeStructs
    (the latter for compile-only warm-up).
    version: source-version string (see closure_version) mixed into the disk
    digest so cached entries survive edits to unrelated modules and die with
    edits to their own dependency closure.

    First call per (machine, kernel source version): traces + lowers +
    serializes the flat StableHLO and the output treedef to disk.  Later
    processes: deserialize (ms), then XLA-compile via the persistent
    compilation cache.  Within a process the compiled executable is memoized
    by `key`.
    """
    import jax

    full_key = ("aot", key)
    cached = _mem.get(full_key)
    if cached is not None:
        return cached

    leaves, in_tree = jax.tree.flatten(tuple(example_args))
    shapes = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves]

    donate = tuple(range(donate_leaves))

    if not enabled():
        flat_cell = []
        flat_fn = _flatwrap(build(), in_tree, flat_cell)
        fn = jax.jit(flat_fn, donate_argnums=donate) if donate else jax.jit(build())
        if donate:
            wrapper = _rewrap(fn, flat_cell, in_tree)
        else:
            wrapper = fn
        _mem[full_key] = wrapper
        return wrapper

    digest = _key_digest(key, version)
    path = os.path.join(_cache_dir(), digest + ".shlo")
    meta_path = os.path.join(_cache_dir(), digest + ".meta")
    exported = None
    out_tree = None
    if os.path.exists(path) and os.path.exists(meta_path):
        try:
            t0 = time.time()
            with open(path, "rb") as fh:
                exported = jax.export.deserialize(bytearray(fh.read()))
            with open(meta_path, "rb") as fh:
                meta = pickle.load(fh)
            assert meta["key"] == repr(key), "digest collision"
            out_tree = meta["out_tree"]
            log.debug("aot: loaded %r in %.3fs", key, time.time() - t0)
        except Exception as e:  # stale/corrupt entry: rebuild
            log.warning("aot: failed to load %r (%s); rebuilding", key, e)
            exported = None
    if exported is None:
        t0 = time.time()
        out_tree_cell = []
        flat_fn = _flatwrap(build(), in_tree, out_tree_cell)
        try:
            exported = jax.export.export(jax.jit(flat_fn, donate_argnums=donate))(*shapes)
        except Exception as e:
            # Anything jax.export cannot handle falls back to plain jit.
            log.warning("aot: export failed for %r (%s); plain jit", key, e)
            fn = jax.jit(flat_fn, donate_argnums=donate)
            wrapper = _rewrap(fn, out_tree_cell, in_tree)
            _mem[full_key] = wrapper
            return wrapper
        out_tree = out_tree_cell[0]
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(exported.serialize())
        os.replace(tmp, path)
        tmp = meta_path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as fh:
            pickle.dump({"key": repr(key), "out_tree": out_tree}, fh)
        os.replace(tmp, meta_path)
        log.debug("aot: built %r in %.3fs", key, time.time() - t0)

    t0 = time.time()
    with _compile_guard():
        compiled = (
            jax.jit(exported.call, donate_argnums=donate).lower(*shapes).compile()
        )
    log.debug("aot: compiled %r in %.3fs", key, time.time() - t0)

    def wrapper(*args):
        lv, td = jax.tree.flatten(tuple(args))
        assert td == in_tree, f"aot {key}: arg structure changed"
        return jax.tree.unflatten(out_tree, compiled(*lv))

    _mem[full_key] = wrapper
    return wrapper


def _flatwrap(fn, in_tree, out_tree_cell=None):
    import jax

    def flat_fn(*leaves):
        out = fn(*jax.tree.unflatten(in_tree, leaves))
        out_leaves, out_tree = jax.tree.flatten(out)
        if out_tree_cell is not None and not out_tree_cell:
            out_tree_cell.append(out_tree)
        return tuple(out_leaves)

    return flat_fn


def _rewrap(flat_jit, out_tree_cell, in_tree):
    """Wrap a flat jit fallback back into pytree-in/pytree-out form.

    The cell fills during the first (tracing) call, so unflattening after
    the call is always safe."""
    import jax

    def wrapper(*args):
        lv, _ = jax.tree.flatten(tuple(args))
        out = flat_jit(*lv)
        return jax.tree.unflatten(out_tree_cell[0], out)

    return wrapper


import threading

# XLA:CPU's backend_compile_and_load SEGFAULTS under concurrent compilation
# from multiple threads once a process has compiled enough programs
# (reproduced round 5: warm_fri thread racing the main pipeline ~160
# programs into a serial pytest run; the round-4 host-fingerprinted-cache
# "fix" did not address it).  On the CPU backend all compiles take one
# process-wide lock; TPU compiles are server-side RPCs with no such race
# and keep their concurrency.
_cpu_compile_lock = threading.Lock()


class _NullCtx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _compile_guard():
    import jax

    return _cpu_compile_lock if jax.default_backend() == "cpu" else _NullCtx()


_locks_guard = threading.Lock()
_locks: dict = {}


def _key_lock(key) -> threading.Lock:
    with _locks_guard:
        lk = _locks.get(key)
        if lk is None:
            lk = _locks[key] = threading.Lock()
        return lk


def jit_aot(key, impl, deps: tuple = (), donate_leaves: int = 0):
    """Drop-in `jax.jit(impl)` replacement: AOT-compiled on first call using
    the real call arguments as the specialization signature.  The caller's
    `key` must determine every arg shape (callers key their program caches by
    shape signature already).

    deps: extra package-relative dotted module/package names whose source the
    traced graph depends on beyond `impl`'s own module's import closure (e.g.
    ("models",) for kernels that run captured chip `eval` code).
    donate_leaves: donate the first N flattened argument leaves to XLA - the
    caller promises not to read them after the call, letting the runtime
    free/reuse their buffers DURING execution (peak-HBM lever for commits
    whose eval inputs die at the first iNTT).

    `wrapper.warm(*args)` compiles without executing - args may be
    ShapeDtypeStructs, so warm-up allocates NO device buffers.  Per-key
    locking makes warm threads and the real pipeline rendezvous on the same
    compile instead of duplicating it (compiles release the GIL, so distinct
    keys still compile concurrently)."""
    state = {}
    pkg = _pkg_name() + "."
    mod = getattr(impl, "__module__", "") or ""
    root = mod[len(pkg):] if mod.startswith(pkg) else None
    roots = tuple(deps) + ((root,) if root else ())

    def _ensure(args):
        # When a shard mesh is active, inputs carry NamedShardings that an
        # AOT executable compiled for single-device placement rejects; use a
        # plain memoized jit there (XLA propagates the shardings itself) and
        # key it by mesh so single-device and sharded callers never collide.
        from ..parallel.mesh import current_mesh

        mesh = current_mesh()
        mkey = None if mesh is None else tuple(d.id for d in mesh.devices.flat)
        fn = state.get(mkey)
        if fn is None:
            with _key_lock(("jit_aot", key, mkey)):
                fn = state.get(mkey)
                if fn is None:
                    if mkey is None:
                        fn = aot_compile(
                            key, lambda: impl, args,
                            version=closure_version(roots),
                            donate_leaves=donate_leaves,
                        )
                    else:
                        fn = _mesh_jit(impl, mesh)
                    state[mkey] = fn
        return fn

    def wrapper(*args):
        return _ensure(args)(*args)

    def warm(*args):
        fn = _ensure(args)
        w = getattr(fn, "warm", None)
        if w is not None:
            w(*args)

    wrapper.warm = warm
    return wrapper


# Outputs smaller than this stay replicated on the mesh: force-scattering a
# tiny array (an (8,) root, a (4,) cumulative sum) across 8 devices buys
# nothing and inserts collectives on the critical path.
_MESH_MIN_SHARD_ELEMS = 1 << 13


def _mesh_jit(impl, mesh):
    """Plain jit for the sharded path.

    Jobs (vs the single-device AOT path):
    - constant/aux tables generated on the default device arrive committed to
      ONE device while traces carry a NamedSharding over the mesh - jit
      rejects that mix, so single-device jax.Arrays are re-placed as
      mesh-replicated before the call;
    - XLA's own output-sharding choice may silently replicate big results (the
      classic GSPMD scaling failure, VERDICT r2 item 3), so out_shardings are
      FORCED: every output whose leading dim divides over the mesh AND is big
      enough to be worth scattering stays row-sharded; everything else is
      replicated;
    - the jitted fn + out_shardings are memoized PER ARG-SHAPE SIGNATURE
      (a single memo entry would silently reuse the first call's output
      shardings for different output pytrees);
    - `.warm()` eval_shapes + constructs the jit (catching tracing errors
      early).  It does NOT precompile: the XLA executable depends on the real
      input shardings, which ShapeDtypeStructs do not carry.
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec, SingleDeviceSharding

    from ..parallel.mesh import ROWS_AXIS

    repl = NamedSharding(mesh, PartitionSpec())
    rows = NamedSharding(mesh, PartitionSpec(ROWS_AXIS))
    n_dev = mesh.devices.size
    multiproc = any(
        d.process_index != jax.process_index() for d in mesh.devices.flat
    )
    state = {}

    def replace(leaf):
        if isinstance(leaf, jax.Array) and isinstance(
            leaf.sharding, SingleDeviceSharding
        ):
            if multiproc:
                # cross-process replication goes via host: every process
                # computes identical aux tables, so local values ARE the
                # global values
                return jax.device_put(np.asarray(leaf), repl)
            return jax.device_put(leaf, repl)
        return leaf

    def choose(aval):
        shape = getattr(aval, "shape", ())
        size = 1
        for d in shape:
            size *= d
        if (
            len(shape) >= 1
            and shape[0] >= n_dev
            and shape[0] % n_dev == 0
            and size >= _MESH_MIN_SHARD_ELEMS
        ):
            return rows
        return repl

    def _sig(args):
        leaves, treedef = jax.tree.flatten(args)
        return (
            treedef,
            tuple((tuple(l.shape), str(getattr(l, "dtype", ""))) for l in leaves),
        )

    def _get_jfn(args):
        sig = _sig(args)
        jfn = state.get(sig)
        if jfn is None:
            out_sh = jax.tree.map(choose, jax.eval_shape(impl, *args))
            jfn = state[sig] = jax.jit(impl, out_shardings=out_sh)
        return jfn

    def wrapper(*args):
        args = jax.tree.map(replace, args)
        return _get_jfn(args)(*args)

    def warm(*args):
        _get_jfn(args)

    wrapper.warm = warm
    return wrapper


def sds(shape, dtype=None):
    """ShapeDtypeStruct shorthand for warm-up argument skeletons."""
    import jax
    import jax.numpy as jnp

    return jax.ShapeDtypeStruct(tuple(shape), dtype or jnp.uint32)
