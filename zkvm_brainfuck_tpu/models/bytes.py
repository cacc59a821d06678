"""Byte chip: 2^16-row preprocessed range-check table + multiplicities.

Reference: crates/core/machine/src/bytes/.  Row r carries value_u8 = r & 0xff
and value_u16 = r; the main trace holds per-row multiplicities for U8Range
(receives (0, value_u8, 0)) and U16Range (receives (1, 0, value_u16)).

Multiplicities come from device histograms over every chip's range-check
streams (ByteDeps) - the TPU-native form of the reference's
`generate_dependencies` byte-lookup multiset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.isa import NUM_BYTE_OPS
from ..core.record import ExecutionRecord
from ..stark.layout import Layout
from ..stark.lookup import LookupKind
from .base import ByteDeps, ChipAir

NUM_ROWS = 1 << 16

BYTE_PREPROCESSED_COLS = Layout([("value_u8", 1), ("value_u16", 1)])
BYTE_MULT_COLS = Layout([("multiplicities", NUM_BYTE_OPS)])


def histogram(deps: ByteDeps):
    """Aggregate u8/u16 streams into 2^16-length multiplicity columns."""
    u8 = jnp.zeros(NUM_ROWS, jnp.uint32)
    for vals, weights in deps.u8:
        u8 = u8.at[vals.ravel()].add(weights.ravel())
    u16 = jnp.zeros(NUM_ROWS, jnp.uint32)
    for vals, weights in deps.u16:
        u16 = u16.at[vals.ravel()].add(weights.ravel())
    return u8, u16


class ByteChip(ChipAir):
    name = "Byte"
    cols = BYTE_MULT_COLS
    prep_cols = BYTE_PREPROCESSED_COLS
    local_only = False

    def included(self, record: ExecutionRecord) -> bool:
        return True

    def num_rows(self, record: ExecutionRecord) -> int:
        return NUM_ROWS

    def generate_preprocessed(self, program) -> jnp.ndarray:
        r = jnp.arange(NUM_ROWS, dtype=jnp.uint32)
        return self.prep_cols.assemble({"value_u8": r & 0xFF, "value_u16": r}, NUM_ROWS)

    def generate_trace(self, record: ExecutionRecord, deps) -> jnp.ndarray:
        u8, u16 = histogram(deps)
        return self.cols.assemble(
            {"multiplicities[0]": u8, "multiplicities[1]": u16}, NUM_ROWS
        )

    def eval(self, b) -> None:
        prep = b.prep_local
        mult = b.local.multiplicities
        b.receive(LookupKind.BYTE, [0, prep.value_u8, 0], mult[0])
        b.receive(LookupKind.BYTE, [1, 0, prep.value_u16], mult[1])
