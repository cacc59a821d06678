"""Merkle-tree MMCS over Poseidon2 (digest 8), p3 `MerkleTreeMmcs` semantics.

Reference config: crates/stark/src/kb31_poseidon2.rs:27-28 (PaddingFreeSponge
16/8/8 leaf hashing, TruncatedPermutation compress, digest size 8).

Commit semantics for a batch of matrices with power-of-two heights:
- the digest layer at height H hashes, per index i, the concatenation of row i
  of every matrix of height H (in batch order) with one padding-free sponge;
- going up, `compress(left, right)` combines children, and when a layer's size
  matches some matrices' height, their row-hash is folded in with an extra
  compress (p3's compress-and-inject).

Dispatch discipline (the tunneled-TPU lesson): device dispatches cost ~0.5ms
client-side and more server-side, and a proof builds ~25 trees, so the tree
walk is packed into few launches:
- leaf digest layers are ONE jitted program per (heights x widths) signature;
- levels above `TAIL` rows run as one eager compress per level (they are few
  and large);
- every run of levels at or below `TAIL` rows collapses into one jitted
  "tail" program per (size, n_levels) signature (signatures repeat across
  trees and layers, so these compile once);
- all levels are concatenated into ONE flat device array, so a query opening
  is a single gather over host-computed offsets, and the whole query phase
  across all trees can be fetched with one blocking transfer
  (utils/transfer.fetch_all).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import field as f
from . import poseidon2 as p2

TAIL = 1024  # levels at or below this size are built inside one jit


@dataclass
class MerkleTree:
    """Prover-side commitment data for one batch of matrices.

    `flat` stores every tree level (sizes H/2 ... 1) concatenated; level i
    (1-indexed from the leaf-digest layer) occupies
    flat[level_offsets[i-1] : level_offsets[i-1] + (H >> i)].
    """

    matrices: List[jnp.ndarray]  # committed matrices (Monty), original order
    digests: jnp.ndarray  # leaf-digest layer at max height (H, 8) Monty
    flat: jnp.ndarray  # all levels above the digest layer, concatenated
    level_sizes: List[int]
    level_offsets: List[int]
    root: np.ndarray  # (8,) canonical uint32 (host)

    @property
    def max_height(self) -> int:
        return self.digests.shape[0]


def _digest_sig(mats: Sequence[jnp.ndarray]) -> tuple:
    return tuple((int(m.shape[0]), int(m.shape[1])) for m in mats)


@lru_cache(maxsize=None)
def _rows_digest_jit(sig: tuple):
    def impl(*mats):
        cols = []
        for m in mats:
            for c in range(m.shape[1]):
                cols.append(m[:, c])
        pieces = [
            jnp.stack(cols[i : i + p2.RATE], axis=1)
            for i in range(0, len(cols), p2.RATE)
        ]
        return p2.hash_row_chunks(pieces)

    return jax.jit(impl)


def _rows_digest(mats: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Hash row-wise concatenation of same-height matrices -> (H, 8)."""
    return _rows_digest_jit(_digest_sig(mats))(*mats)


@lru_cache(maxsize=None)
def _tail_jit(size: int, n_levels: int):
    """One program building `n_levels` exact tree levels from a (size, 8)
    layer; returns them concatenated (sizes size/2, size/4, ...)."""

    def impl(digests):
        levels = []
        cur = digests
        for _ in range(n_levels):
            cur = p2.compress(cur[0::2], cur[1::2])
            levels.append(cur)
        return jnp.concatenate(levels, axis=0) if len(levels) > 1 else levels[0]

    return jax.jit(impl)


def commit(matrices: Sequence[jnp.ndarray]) -> MerkleTree:
    """Commit to a batch of (H_i, W_i) Monty matrices (H_i powers of two)."""
    assert matrices, "empty batch"
    heights = [int(m.shape[0]) for m in matrices]
    for h in heights:
        assert h & (h - 1) == 0, "heights must be powers of two"
    max_h = max(heights)

    by_height = {}
    for m, h in zip(matrices, heights):
        by_height.setdefault(h, []).append(m)

    inject_sizes = sorted((h for h in by_height if h != max_h), reverse=True)

    digests = _rows_digest(by_height[max_h])
    levels: List[jnp.ndarray] = []
    level_sizes: List[int] = []

    cur = digests
    size = max_h
    while size > 1:
        # how many levels until the next injection (or the root)?
        next_stop = inject_sizes[0] if inject_sizes else 1
        if size <= TAIL:
            n = (size // next_stop).bit_length() - 1
            tail = _tail_jit(size, n)(cur)
            off = 0
            s = size
            for _ in range(n):
                s //= 2
                levels.append(tail[off : off + s])
                level_sizes.append(s)
                off += s
            cur = levels[-1]
            size = s
        else:
            cur = p2.compress(cur[0::2], cur[1::2])
            size //= 2
            levels.append(cur)
            level_sizes.append(size)
        if inject_sizes and size == inject_sizes[0]:
            inject_sizes.pop(0)
            injected = _rows_digest(by_height[size])
            cur = p2.compress(cur, injected)
            levels[-1] = cur

    if not levels:  # single-row batch: the digest layer is the root
        return MerkleTree(
            matrices=list(matrices),
            digests=digests,
            flat=digests,
            level_sizes=[],
            level_offsets=[],
            root=np.asarray(f.from_monty(digests[0])),
        )
    flat = jnp.concatenate(levels, axis=0) if len(levels) > 1 else levels[0]
    level_offsets = list(np.cumsum([0] + level_sizes[:-1]))
    root = np.asarray(f.from_monty(flat[-1]))
    return MerkleTree(
        matrices=list(matrices),
        digests=digests,
        flat=flat,
        level_sizes=level_sizes,
        level_offsets=[int(x) for x in level_offsets],
        root=root,
    )


def open_batch_device(tree: MerkleTree, indices: np.ndarray):
    """Device-side opening gathers (no host sync).

    Returns (opened_rows, proof) as CANONICAL device arrays:
    - opened_rows: list per matrix of (Q, W)
    - proof: (Q, log_max, 8) sibling digests, leaf-to-root order.
    One gather per matrix plus ONE gather for all sibling levels; combine with
    utils.transfer.fetch_all for a single blocking transfer across many trees.
    """
    indices = np.asarray(indices, dtype=np.int64)
    max_h = tree.max_height
    log_max = max_h.bit_length() - 1
    q = len(indices)

    opened = []
    for m in tree.matrices:
        h = int(m.shape[0])
        shift = log_max - (h.bit_length() - 1)
        opened.append(f.from_monty(m[jnp.asarray(indices >> shift)]))

    if log_max == 0:
        return opened, jnp.zeros((q, 0, 8), jnp.uint32)

    # Sibling index per level, resolved into the flat layout host-side.
    # Level 0 siblings live in the leaf-digest layer; levels 1.. in `flat`.
    idx = indices
    leaf_sib = idx ^ 1
    flat_idx = np.empty((log_max - 1, q), dtype=np.int64)
    for level in range(1, log_max):
        idx = idx >> 1
        flat_idx[level - 1] = tree.level_offsets[level - 1] + (idx ^ 1)
    leaf_sibs = f.from_monty(tree.digests[jnp.asarray(leaf_sib)])  # (Q, 8)
    if log_max > 1:
        rest = f.from_monty(tree.flat[jnp.asarray(flat_idx.reshape(-1))])
        rest = rest.reshape(log_max - 1, q, 8).transpose(1, 0, 2)
        proof = jnp.concatenate([leaf_sibs[:, None, :], rest], axis=1)
    else:
        proof = leaf_sibs[:, None, :]
    return opened, proof


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
