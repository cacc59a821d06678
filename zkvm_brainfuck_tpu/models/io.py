"""IO chip: ','/'.' selectors; value correctness rides on the CPU memory
argument.  Reference: crates/core/machine/src/io/mod.rs.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.record import ExecutionRecord
from ..stark.layout import Layout
from ..stark.lookup import LookupKind
from .base import ChipAir, next_power_of_two

IO_COLS = Layout(
    [("pc", 1), ("mp", 1), ("mv", 1), ("is_input", 1), ("is_output", 1)]
)


class IoChip(ChipAir):
    name = "IO"
    cols = IO_COLS
    local_only = True

    def included(self, record: ExecutionRecord) -> bool:
        return bool(record.io_mask.any())

    def num_rows(self, record: ExecutionRecord) -> int:
        return next_power_of_two(int(record.io_mask.sum()))

    def generate_trace(self, record: ExecutionRecord, deps) -> jnp.ndarray:
        mask = record.io_mask
        c = record.cpu
        n = int(mask.sum())
        opcode = jnp.asarray(c.opcode[mask])
        cols = {
            "pc": jnp.asarray(c.pc[mask]),
            "mp": jnp.asarray(c.mp[mask]),
            "mv": jnp.asarray(c.mv[mask]),
            "is_input": (opcode == 6).astype(jnp.uint32),
            "is_output": (opcode == 7).astype(jnp.uint32),
        }
        padded = self.num_rows(record)
        cols = {k: jnp.pad(v, (0, padded - n)) for k, v in cols.items()}
        return self.cols.assemble(cols, padded)

    def eval(self, b) -> None:
        local = b.local
        is_real = local.is_input + local.is_output
        b.assert_bool(local.is_input)
        b.assert_bool(local.is_output)
        b.assert_bool(is_real)
        opcode = local.is_input * 6 + local.is_output * 7
        b.receive(LookupKind.IO, [local.pc, opcode, local.mp, local.mv], is_real)
