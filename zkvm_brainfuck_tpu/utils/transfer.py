"""Batched device->host transfers.

The query/opening phase of the prover reads many small arrays back from the
device (opened rows, Merkle sibling paths, opened values).  Each individual
`np.asarray(device_array)` is a blocking round trip - on a tunneled TPU that
is tens of milliseconds of latency per call, and the reference-shape proof
needs hundreds of them.  `fetch_all` concatenates everything into one flat
device vector and performs ONE synchronous transfer, then splits host-side.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np


def fetch_all(pieces: Sequence[jnp.ndarray]) -> List[np.ndarray]:
    """One blocking D2H transfer for any number of device arrays.

    Returns numpy arrays with the original shapes, in order.

    Multi-host: when processes hold only their own shards, a sharded global
    array cannot be read directly; the flat vector is first re-laid-out as
    MESH-REPLICATED (an all-gather executed identically by every process),
    after which every process reads its local copy.
    """
    pieces = list(pieces)
    if not pieces:
        return []
    shapes = [tuple(p.shape) for p in pieces]
    sizes = [int(np.prod(s)) if s else 1 for s in shapes]
    flat = jnp.concatenate([jnp.ravel(p) for p in pieces])
    if not getattr(flat, "is_fully_addressable", True):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        from ..parallel.mesh import current_mesh

        mesh = current_mesh()
        assert mesh is not None, "non-addressable array without an active mesh"
        flat = jax.jit(
            lambda x: x, out_shardings=NamedSharding(mesh, PartitionSpec())
        )(flat)
    host = np.asarray(flat)  # the single sync point
    out = []
    off = 0
    for shape, size in zip(shapes, sizes):
        out.append(host[off : off + size].reshape(shape))
        off += size
    return out
