"""Device mesh helpers for multi-chip proving.

The scaling axis of a STARK prover is trace rows (SURVEY.md §5.7): traces,
LDEs, Merkle leaves, LogUp terms, and quotient points all shard over a 1-D
"rows" mesh.  Collectives used: psum (LogUp totals, Merkle reduction),
all_gather (tree tops, boundary rows), ppermute (halo rows for next-row
constraints).  The reference has no distribution at all (rayon only,
SURVEY.md §2.5) - this module is the from-scratch TPU-native replacement.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROWS_AXIS = "rows"


def make_row_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D rows mesh.  The mesh size must be a power of two <= 16: every
    committed trace height is a power of two >= 16 (reference min-height
    padding, utils/mod.rs:47-53), so such meshes always divide every height
    - the only configuration in which row sharding is sound.  (Padding
    heights to a non-power-of-two mesh multiple is NOT an option: heights
    are NTT domain sizes and commitments bind them.)"""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n & (n - 1) or n > 16:
        raise ValueError(
            f"rows mesh size must be a power of two <= 16, got {n} "
            "(trace heights are powers of two >= 16; other mesh sizes "
            "cannot divide them)"
        )
    return Mesh(np.array(devs[:n]), (ROWS_AXIS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(ROWS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# -- the active proving mesh -------------------------------------------------
#
# When set (see __graft_entry__.dryrun_multichip), generated traces are
# placed row-sharded over this mesh and the whole pipeline runs SPMD - XLA
# propagates the sharding through commits, LogUp, quotient, and FRI,
# inserting collectives over the mesh axis.

CURRENT_MESH: Optional[Mesh] = None


def set_shard_mesh(mesh: Optional[Mesh]) -> None:
    global CURRENT_MESH
    CURRENT_MESH = mesh


def current_mesh() -> Optional[Mesh]:
    return CURRENT_MESH


def place_rows(arr):
    """Place `arr` row-sharded over the active mesh (no-op without one).

    Power-of-two trace heights (min 16) always divide the power-of-two
    meshes `make_row_mesh` permits; an indivisible height therefore means a
    misconfiguration, and silently replicating it would be the classic GSPMD
    scaling failure (VERDICT r3) - so this RAISES instead."""
    mesh = CURRENT_MESH
    if mesh is None:
        return arr
    n_dev = mesh.devices.size
    if arr.shape[0] % n_dev != 0:
        raise ValueError(
            f"trace height {arr.shape[0]} not divisible by mesh size {n_dev}; "
            "row sharding requires power-of-two meshes <= 16 (make_row_mesh)"
        )
    if any(d.process_index != jax.process_index() for d in mesh.devices.flat):
        # multi-host: place from identical per-process HOST copies (every
        # process generates the same deterministic traces)
        import numpy as np

        arr = np.asarray(arr)
    return jax.device_put(arr, NamedSharding(mesh, P(ROWS_AXIS)))


def shard_fraction(arr) -> float:
    """Fraction of `arr` stored on ONE device (1.0 = fully replicated).

    The scaling self-check: a row-sharded intermediate on an n-device mesh
    must report ~1/n (per-device live bytes ~ total/n_devices).
    """
    per_dev: dict = {}
    for s in arr.addressable_shards:
        per_dev.setdefault(s.device.id, 0)
        per_dev[s.device.id] += s.data.size
    first = next(iter(per_dev.values()))
    return first / arr.size
