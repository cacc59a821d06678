"""Merkle-tree MMCS over Poseidon2 (digest 8), p3 `MerkleTreeMmcs` semantics.

Reference config: crates/stark/src/kb31_poseidon2.rs:27-28 (PaddingFreeSponge
16/8/8 leaf hashing, TruncatedPermutation compress, digest size 8).

Commit semantics for a batch of matrices with power-of-two heights:
- the digest layer at height H hashes, per index i, the concatenation of row i
  of every matrix of height H (in batch order) with one padding-free sponge;
- going up, `compress(left, right)` combines children, and when a layer's size
  matches some matrices' height, their row-hash is folded in with an extra
  compress (p3's compress-and-inject).

Build discipline:

- the leaf sponge is `lax.scan` over rate-8 column chunks (ONE Poseidon2
  permutation instance in the graph, any width);
- every tree level lives in one flat (L, 8) buffer at host-planned offsets,
  and each level is compressed in ONE whole-level Poseidon2 call (a rolled
  ~200-primitive instance per level, log_n instances per tree).  Round-5
  lesson: the previous CHUNK-granular `lax.scan` schedule (4096-row steps)
  serialized ~520 INDEPENDENT steps per big tree at ~0.4 ms each - the walk
  was the single largest non-kernel cost in every commit and FRI layer.
  Whole-level steps keep the sequential depth at log_n (the true data
  dependence) with full-batch VPU work per step.

`commit()` wraps the builder in one jit per batch signature; `build_traced`
is reused inside fused PCS/FRI programs so a whole commit (NTT + LDE +
bit-reversal + tree) is a single compiled program.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import field as f
from . import poseidon2 as p2

# ---------------------------------------------------------------------------
# Host-side plan
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TreePlan:
    """Host-computed layout for one batch signature.

    Flat buffer regions: region 0 is the digest layer (height max_h); region
    i >= 1 holds the size-(max_h >> i) level.  `inject_levels` marks levels
    whose size matches some smaller matrices' height (p3 compress-and-inject).
    """

    heights: Tuple[int, ...]  # per matrix, batch order
    max_h: int
    log_max: int
    level_off: Tuple[int, ...]  # offset of level i (0 = digest layer)
    flat_len: int
    inject_levels: Tuple[Tuple[int, int], ...]  # (level index, size)


@lru_cache(maxsize=None)
def make_plan(heights: Tuple[int, ...]) -> TreePlan:
    max_h = max(heights)
    log_max = max_h.bit_length() - 1
    inject_sizes = {h for h in heights if h != max_h}

    level_off = [0]
    off = max_h
    inject_levels: List[Tuple[int, int]] = []
    for i in range(1, log_max + 1):
        level_off.append(off)
        off += max_h >> i
        if (max_h >> i) in inject_sizes:
            inject_levels.append((i, max_h >> i))

    return TreePlan(
        heights=tuple(heights),
        max_h=max_h,
        log_max=log_max,
        level_off=tuple(level_off),
        flat_len=off,
        inject_levels=tuple(inject_levels),
    )


# ---------------------------------------------------------------------------
# Traceable sponge / tree builder
# ---------------------------------------------------------------------------


def sponge_rows_traced(mats: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """PaddingFreeSponge 16/8/8 over row-wise concat of same-height matrices.

    (H, W_total) -> (H, 8).  The full rate-8 chunks run under ONE lax.scan
    (a single permutation instance in the graph); a trailing partial chunk
    (W_total % 8 != 0) costs one more permutation instance.
    """
    h = mats[0].shape[0]
    cols = [m[:, c] for m in mats for c in range(m.shape[1])]
    w = len(cols)
    n_full = w // 8
    if not p2._use_soa():
        # CPU test backend: rolled permute + lax.scan keeps graphs small.
        state = jnp.zeros((h, p2.WIDTH), dtype=jnp.uint32)
        if n_full == 1:
            chunk = jnp.stack(cols[:8], axis=1)
            state = p2.permute(jnp.concatenate([chunk, state[:, 8:]], axis=1))
        elif n_full > 1:
            stacked = jnp.stack(
                [jnp.stack(cols[i * 8 : (i + 1) * 8], axis=1) for i in range(n_full)]
            )  # (n_full, H, 8)

            def step(st, chunk):
                st = p2.permute(jnp.concatenate([chunk, st[:, 8:]], axis=1))
                return st, None

            state, _ = jax.lax.scan(step, state, stacked)
        rem = w - n_full * 8
        if rem:
            chunk = jnp.stack(cols[n_full * 8 :], axis=1)
            state = p2.permute(jnp.concatenate([chunk, state[:, rem:]], axis=1))
        return state[:, :8]
    # TPU: column-form sponge state (16 separate (H,) arrays = full lane
    # utilization, see poseidon2._use_soa); full rate-8 chunks run under one
    # lax.scan so the graph carries a single permutation instance.
    zero = jnp.zeros((h,), dtype=jnp.uint32)
    state = [zero] * p2.WIDTH
    if n_full == 1:
        state = p2.permute_cols(list(cols[:8]) + state[8:])
    elif n_full > 1:
        stacked = jnp.stack(
            [jnp.stack(cols[i * 8 : (i + 1) * 8], axis=0) for i in range(n_full)]
        )  # (n_full, 8, H)

        def step(st, chunk):
            return tuple(p2.permute_cols([chunk[j] for j in range(8)] + list(st[8:]))), None

        state, _ = jax.lax.scan(step, tuple(state), stacked)
        state = list(state)
    rem = w - n_full * 8
    if rem:
        state = p2.permute_cols(list(cols[n_full * 8 :]) + state[rem:])
    return jnp.stack(state[:8], axis=1)


def build_tree_traced(
    plan: TreePlan, digests_by_height: dict
) -> jnp.ndarray:
    """Build the flat level buffer from per-height leaf digest layers.

    digests_by_height: height -> (height, 8) Monty digest rows (bit-reversal,
    if any, already applied by the caller).  Returns the (flat_len, 8) buffer;
    the root lives at row plan.level_off[plan.log_max] (or row 0 when the
    batch is a single-row matrix).
    """
    inject = dict(plan.inject_levels)
    flat = jnp.zeros((plan.flat_len, 8), dtype=jnp.uint32)
    flat = jax.lax.dynamic_update_slice(flat, digests_by_height[plan.max_h], (0, 0))
    prev = digests_by_height[plan.max_h]
    for i in range(1, plan.log_max + 1):
        s = plan.max_h >> i
        out = p2.permute(prev.reshape(s, 16))[:, :8]
        if i in inject:
            out = p2.permute(
                jnp.concatenate([out, digests_by_height[inject[i]]], axis=1)
            )[:, :8]
        flat = jax.lax.dynamic_update_slice(flat, out, (plan.level_off[i], 0))
        prev = out
    return flat


def commit_traced(matrices: Sequence[jnp.ndarray]):
    """Traceable batch commit: matrices (Monty, rows in final committed order)
    -> (plan, flat).  Used inside fused PCS/FRI programs."""
    heights = tuple(int(m.shape[0]) for m in matrices)
    for h in heights:
        assert h & (h - 1) == 0, "heights must be powers of two"
    plan = make_plan(heights)
    by_height: dict = {}
    for m, h in zip(matrices, heights):
        by_height.setdefault(h, []).append(m)
    digests = {h: sponge_rows_traced(ms) for h, ms in by_height.items()}
    return plan, build_tree_traced(plan, digests)


def root_of(plan: TreePlan, flat: jnp.ndarray) -> jnp.ndarray:
    """(8,) canonical root row (device)."""
    return f.from_monty(flat[plan.level_off[plan.log_max]])


# ---------------------------------------------------------------------------
# Prover-side tree object + jitted standalone commit
# ---------------------------------------------------------------------------


@dataclass
class MerkleTree:
    matrices: List[jnp.ndarray]  # matrices (Monty), original order
    plan: TreePlan
    flat: jnp.ndarray  # digest layer + all levels (padded regions)
    root: np.ndarray  # (8,) canonical uint32 (host)
    # True when committed row i is matrices[k][bit_reverse(i)] (PCS LDEs are
    # stored in natural order; the bit-reversal is resolved at open time with
    # host-side index math instead of materializing reversed copies).
    bitrev: bool = False

    @property
    def max_height(self) -> int:
        return self.plan.max_h


@lru_cache(maxsize=None)
def _commit_jit(sig: tuple):
    from ..utils.aot import jit_aot

    def impl(*mats):
        plan = make_plan(tuple(h for h, _ in sig))
        by_height: dict = {}
        for m in mats:
            by_height.setdefault(int(m.shape[0]), []).append(m)
        digests = {h: sponge_rows_traced(ms) for h, ms in by_height.items()}
        flat = build_tree_traced(plan, digests)
        return flat, root_of(plan, flat)

    return jit_aot(("mk_commit", sig), impl)


def commit(matrices: Sequence[jnp.ndarray]) -> MerkleTree:
    """Commit to a batch of (H_i, W_i) Monty matrices (H_i powers of two)."""
    assert matrices, "empty batch"
    sig = tuple((int(m.shape[0]), int(m.shape[1])) for m in matrices)
    plan = make_plan(tuple(h for h, _ in sig))
    flat, root_dev = _commit_jit(sig)(*matrices)
    return MerkleTree(
        matrices=list(matrices),
        plan=plan,
        flat=flat,
        root=np.asarray(root_dev),
    )


# ---------------------------------------------------------------------------
# Openings
# ---------------------------------------------------------------------------


def sibling_flat_indices(plan: TreePlan, indices: np.ndarray) -> np.ndarray:
    """Host: flat-buffer row index of the sibling at every level.

    indices: (Q,) leaf indices.  Returns (Q, log_max) int32 into the flat
    buffer (level 0 sibling lives in the digest layer region).
    """
    q = len(indices)
    out = np.empty((q, plan.log_max), dtype=np.int32)
    idx = np.array(indices, np.int64)  # copy: `>>=` below must not mutate input
    for level in range(plan.log_max):
        out[:, level] = plan.level_off[level] + (idx ^ 1)
        idx >>= 1
    return out


def open_batch_device(tree: MerkleTree, indices: np.ndarray):
    """Device-side opening gathers (no host sync).

    Returns (opened_rows, proof) as CANONICAL device arrays:
    - opened_rows: list per matrix of (Q, W)
    - proof: (Q, log_max, 8) sibling digests, leaf-to-root order.
    """
    indices = np.asarray(indices, dtype=np.int64)
    plan = tree.plan
    q = len(indices)

    opened = []
    for m in tree.matrices:
        h = int(m.shape[0])
        log_h = h.bit_length() - 1
        rows = indices >> (plan.log_max - log_h)
        if tree.bitrev:
            from . import ntt as nt

            rows = nt.bit_reversal_perm(log_h)[rows]
        opened.append(f.from_monty(m[jnp.asarray(rows, jnp.int32)]))

    if plan.log_max == 0:
        return opened, jnp.zeros((q, 0, 8), jnp.uint32)

    sib = sibling_flat_indices(plan, indices)  # (Q, L)
    proof = f.from_monty(tree.flat[jnp.asarray(sib.reshape(-1))]).reshape(
        q, plan.log_max, 8
    )
    return opened, proof


def _open_many_impl(args):
    """Gather opened rows + sibling paths for MANY trees in one program.

    args: list per tree of {"mats": [...], "flat": arr, "rows": [idx arrays],
    "sibs": (Q, L) flat indices}.  Returns the same structure with gathered
    canonical values.  One compiled program per shape signature.
    """
    out = []
    for a in args:
        rows = [
            f.from_monty(m[r]) for m, r in zip(a["mats"], a["rows"])
        ]
        q, l = a["sibs"].shape
        proofs = f.from_monty(a["flat"][a["sibs"].reshape(-1)]).reshape(q, l, 8)
        out.append({"rows": rows, "proofs": proofs})
    return out


@lru_cache(maxsize=None)
def _open_many_program(sig: tuple):
    from ..utils.aot import jit_aot

    return jit_aot(("mk_open_many", sig), _open_many_impl)


def open_many_device(trees: Sequence[MerkleTree], indices_list):
    """Device-side openings for many trees in ONE compiled program.

    indices_list[t]: (Q,) leaf indices for tree t.  Returns a list per tree
    of (opened_rows per matrix, (Q, L, 8) sibling paths), all device arrays.
    """
    from . import ntt as nt

    args = []
    for tree, indices in zip(trees, indices_list):
        indices = np.asarray(indices, np.int64)
        plan = tree.plan
        rows = []
        for m in tree.matrices:
            log_h = int(m.shape[0]).bit_length() - 1
            r = indices >> (plan.log_max - log_h)
            if tree.bitrev:
                r = nt.bit_reversal_perm(log_h)[r]
            # int32 pin: index dtype must not depend on the x64 flag
            # (AOT export signatures key on shapes; a dtype flip between
            # processes poisons the disk cache)
            rows.append(jnp.asarray(r, jnp.int32))
        if plan.log_max > 0:
            sibs = sibling_flat_indices(plan, indices)
        else:
            sibs = np.zeros((len(indices), 0), np.int32)
        args.append(
            {
                "mats": list(tree.matrices),
                "flat": tree.flat,
                "rows": rows,
                "sibs": jnp.asarray(sibs, jnp.int32),
            }
        )
    sig = tuple(
        (
            tuple(tuple(int(d) for d in m.shape) for m in a["mats"]),
            tuple(int(d) for d in a["flat"].shape),
            tuple(tuple(int(d) for d in r.shape) for r in a["rows"]),
            tuple(int(d) for d in a["sibs"].shape),
        )
        for a in args
    )
    out = _open_many_program(sig)(args)
    return [(o["rows"], o["proofs"]) for o in out]


def open_batch(tree: MerkleTree, indices: np.ndarray):
    """Host-side opening (one blocking transfer); see open_batch_device."""
    from ..utils.transfer import fetch_all

    opened_dev, proof_dev = open_batch_device(tree, indices)
    fetched = fetch_all(list(opened_dev) + [proof_dev])
    return fetched[:-1], fetched[-1]


def verify_batch(
    root: Sequence[int],
    dims: Sequence[tuple],
    index: int,
    opened_rows: Sequence[Sequence[int]],
    proof: np.ndarray,
) -> bool:
    """Host-side batch opening check (used by the verifier).

    dims: per matrix (height, width). opened_rows: canonical ints per matrix.
    proof: (log_max, 8) sibling digests leaf-to-root.
    """
    heights = [h for h, _ in dims]
    max_h = max(heights)
    log_max = max_h.bit_length() - 1

    by_height = {}
    for (h, _w), row in zip(dims, opened_rows):
        by_height.setdefault(h, []).append([int(v) for v in row])

    curr = p2.hash_host([v for row in by_height[max_h] for v in row])
    idx = index
    size = max_h
    for level in range(log_max):
        sib = [int(x) for x in proof[level]]
        if idx & 1:
            curr = p2.compress_host(sib, curr)
        else:
            curr = p2.compress_host(curr, sib)
        idx >>= 1
        size //= 2
        if size in by_height:
            injected = p2.hash_host([v for row in by_height[size] for v in row])
            curr = p2.compress_host(curr, injected)
    return curr == [int(x) for x in root]


def verify_batch_np(
    root,
    dims: Sequence[tuple],
    indices: np.ndarray,
    opened_rows: Sequence[np.ndarray],
    proofs: np.ndarray,
) -> np.ndarray:
    """Vectorized host-side batch-opening check over ALL queries at once.

    Same semantics as `verify_batch` (p3 MerkleTreeMmcs verify), but walks
    every query in one numpy pass: the scalar walk cost the round-3 verifier
    ~7.6 s at 2^18 (84 queries x ~20 levels of Python Poseidon2).

    dims: per matrix (height, width).
    indices: (Q,) leaf indices.
    opened_rows[m]: (Q, W_m) canonical values for matrix m.
    proofs: (Q, log_max, 8) sibling digests, leaf-to-root order.
    Returns a (Q,) bool array (True = path checks out against `root`).
    """
    from . import poseidon2 as p2

    q = len(indices)
    heights = [h for h, _ in dims]
    max_h = max(heights)
    log_max = max_h.bit_length() - 1

    by_height: dict = {}
    for (h, _w), rows in zip(dims, opened_rows):
        by_height.setdefault(h, []).append(np.asarray(rows, dtype=np.uint64))

    curr = p2.hash_np(np.concatenate(by_height[max_h], axis=1))  # (Q, 8)
    idx = np.asarray(indices, dtype=np.int64).copy()
    proofs = np.asarray(proofs, dtype=np.uint64)
    size = max_h
    for level in range(log_max):
        sib = proofs[:, level]  # (Q, 8)
        odd = (idx & 1).astype(bool)[:, None]
        left = np.where(odd, sib, curr)
        right = np.where(odd, curr, sib)
        curr = p2.compress_np(left, right)
        idx >>= 1
        size //= 2
        if size in by_height:
            injected = p2.hash_np(np.concatenate(by_height[size], axis=1))
            curr = p2.compress_np(curr, injected)
    root_v = np.asarray([int(x) for x in root], dtype=np.uint64)
    return (curr == root_v[None, :]).all(axis=1)


def digest_layer_bitrev_scan(mats: Sequence[jnp.ndarray], rev: jnp.ndarray) -> jnp.ndarray:
    """Digest layer of bit-reversed rows WITHOUT materializing reversed
    copies of the matrices: (H, W_i) natural-order Monty matrices (equal H)
    + rev (H,) device permutation -> (H, 8) committed-order digests.

    Row hashing commutes with row permutation, so hash in NATURAL order and
    permute the (H, 8) digest layer: digest_committed[i] =
    hash(rows[rev[i]]) = hash_natural[rev][i].  The round-4 memory lesson:
    `lde[rev]` inside the commit program materialized a second copy of every
    LDE (~2 GB at 2^22 rows) as a program temp; permuting digests costs one
    (H, 8) copy instead (16x smaller than a W=128 matrix copy).
    """
    h = int(mats[0].shape[0])
    for m in mats:
        assert int(m.shape[0]) == h
    return sponge_rows_traced(mats)[rev]
