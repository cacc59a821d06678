"""Merkle-tree MMCS over Poseidon2 (digest 8), p3 `MerkleTreeMmcs` semantics.

Reference config: crates/stark/src/kb31_poseidon2.rs:27-28 (PaddingFreeSponge
16/8/8 leaf hashing, TruncatedPermutation compress, digest size 8).

Commit semantics for a batch of matrices with power-of-two heights:
- the digest layer at height H hashes, per index i, the concatenation of row i
  of every matrix of height H (in batch order) with one padding-free sponge;
- going up, `compress(left, right)` combines children, and when a layer's size
  matches some matrices' height, their row-hash is folded in with an extra
  compress (p3's compress-and-inject).

All layers are built with batched device Poseidon2; the whole tree for a
2^22-leaf batch is a few hundred fused VPU kernels.

The prover data keeps every layer on device; query-phase openings gather row
values and sibling paths for all query indices at once.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import field as f
from . import poseidon2 as p2


@dataclass
class MerkleTree:
    """Prover-side commitment data for one batch of matrices."""

    matrices: List[jnp.ndarray]  # committed matrices (Monty), original order
    layers: List[jnp.ndarray]  # layers[0] = leaf digests at max height, ... root
    root: np.ndarray  # (8,) canonical uint32 (host)

    @property
    def max_height(self) -> int:
        return self.layers[0].shape[0]


def _rows_digest(mats: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Hash row-wise concatenation of same-height matrices -> (H, 8)."""
    # split the concatenated row into <=8-wide pieces without materializing concat
    cols = []
    for m in mats:
        for c in range(m.shape[1]):
            cols.append(m[:, c])
    pieces = [
        jnp.stack(cols[i : i + p2.RATE], axis=1) for i in range(0, len(cols), p2.RATE)
    ]
    return p2.hash_row_chunks(pieces)


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

    layers = []
    digests = _rows_digest(by_height[max_h])
    layers.append(digests)
    size = max_h
    while size > 1:
        size //= 2
        digests = p2.compress(digests[0::2], digests[1::2])
        if size in by_height:
            injected = _rows_digest(by_height[size])
            digests = p2.compress(digests, injected)
        layers.append(digests)

    root = np.asarray(f.from_monty(layers[-1][0]))
    return MerkleTree(matrices=list(matrices), layers=layers, root=root)


def open_batch(tree: MerkleTree, indices: np.ndarray):
    """Open rows + sibling paths at `indices` (taken at max height).

    Returns (opened_rows, proof):
    - opened_rows: list per matrix of (Q, W) canonical uint32 host arrays
      (row index >> (log_max - log_h) per p3)
    - proof: (Q, log_max, 8) canonical sibling digests, leaf-to-root order.
    """
    indices = np.asarray(indices, dtype=np.int64)
    max_h = tree.max_height
    log_max = max_h.bit_length() - 1

    opened = []
    for m in tree.matrices:
        h = int(m.shape[0])
        shift = log_max - (h.bit_length() - 1)
        rows = np.asarray(f.from_monty(m[jnp.asarray(indices >> shift)]))
        opened.append(rows)

    sibs = []
    idx = indices.copy()
    for level in range(log_max):
        layer = tree.layers[level]
        sib = np.asarray(f.from_monty(layer[jnp.asarray(idx ^ 1)]))
        sibs.append(sib)
        idx >>= 1
    proof = np.stack(sibs, axis=1) if sibs else np.zeros((len(indices), 0, 8), np.uint32)
    return opened, proof


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
