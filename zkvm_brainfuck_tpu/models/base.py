"""Chip (AIR) base interface.

The "model family" of this framework: each chip declares its column layout,
generates its trace from the columnar execution record with vectorized device
code, contributes byte-table dependencies as histogram inputs, and evaluates
its constraints through the polymorphic builder (stark/builder.py).

Counterpart of the reference's `MachineAir` trait (stark/src/air/machine.rs)
with trace generation mapped onto the TPU programming model:
`event_to_row` row loops become whole-column jnp expressions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.record import ExecutionRecord
from ..stark.layout import Layout


def next_power_of_two(n: int, minimum: int = 16) -> int:
    """Reference utils/mod.rs:47-53 (min height 16)."""
    if n <= minimum:
        return minimum
    return 1 << (n - 1).bit_length()


@dataclass
class ByteDeps:
    """Byte-table dependency streams: (values, weights) pairs to histogram."""

    u8: List[Tuple[jnp.ndarray, jnp.ndarray]] = field(default_factory=list)
    u16: List[Tuple[jnp.ndarray, jnp.ndarray]] = field(default_factory=list)

    def add_u8(self, values, weights=None):
        v = jnp.asarray(values, jnp.uint32)
        w = jnp.ones_like(v) if weights is None else jnp.asarray(weights, jnp.uint32)
        self.u8.append((v, w))

    def add_u16(self, values, weights=None):
        v = jnp.asarray(values, jnp.uint32)
        w = jnp.ones_like(v) if weights is None else jnp.asarray(weights, jnp.uint32)
        self.u16.append((v, w))


class ChipAir:
    """Base chip. Subclasses define layouts, trace gen, and eval."""

    name: str = ""
    cols: Layout = None
    prep_cols: Optional[Layout] = None
    local_only: bool = False

    @property
    def width(self) -> int:
        return self.cols.width

    @property
    def preprocessed_width(self) -> int:
        return self.prep_cols.width if self.prep_cols else 0

    def included(self, record: ExecutionRecord) -> bool:
        return True

    def num_rows(self, record: ExecutionRecord) -> int:
        raise NotImplementedError

    def generate_trace(self, record: ExecutionRecord, deps) -> jnp.ndarray:
        """(padded_rows, width) canonical uint32 device array."""
        raise NotImplementedError

    def byte_dependencies(self, record: ExecutionRecord, out: ByteDeps) -> None:
        """Contribute u8/u16 range-check streams (generate_dependencies)."""

    def generate_preprocessed(self, program) -> Optional[jnp.ndarray]:
        return None

    def eval(self, b) -> None:
        """Constraints + lookup messages over a builder."""
        raise NotImplementedError


def pad_rows(cols: Dict[str, jnp.ndarray], n: int, padded: int) -> Dict[str, jnp.ndarray]:
    """Zero-pad every column array from n to `padded` rows."""
    if padded == n:
        return cols
    return {k: jnp.pad(v, (0, padded - n)) for k, v in cols.items()}
