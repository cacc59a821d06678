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
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (ROWS_AXIS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(ROWS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
