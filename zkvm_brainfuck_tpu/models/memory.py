"""Memory chip: closes the per-address access chains of the Memory argument.

Reference: crates/core/machine/src/memory/memory.rs.  For every touched
address it RECEIVES (initial_clk, addr, initial_value) and SENDS
(final_clk, addr, final_value); together with the CPU's per-access
send(prev)/receive(current) pairs the Memory-kind multiset cancels iff every
read sees the last write (initial memory is all-zeros at timestamp 0).
Two address entries per row.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.record import ExecutionRecord
from ..stark.layout import Layout
from ..stark.lookup import LookupKind
from .base import ChipAir, next_power_of_two

NUM_MEMORY_ENTRIES_PER_ROW = 2

SINGLE_MEMORY_LOCAL = Layout(
    [
        ("addr", 1),
        ("initial_clk", 1),
        ("final_clk", 1),
        ("initial_value", 1),
        ("final_value", 1),
        ("is_real", 1),
    ]
)

MEM_COLS = Layout([("memory_entries", (NUM_MEMORY_ENTRIES_PER_ROW, SINGLE_MEMORY_LOCAL))])


class MemoryChip(ChipAir):
    name = "Memory"
    cols = MEM_COLS
    local_only = False  # reference MemoryChip keeps default local_only = false

    def included(self, record: ExecutionRecord) -> bool:
        return len(record.memory) > 0

    def num_rows(self, record: ExecutionRecord) -> int:
        n = (len(record.memory) + NUM_MEMORY_ENTRIES_PER_ROW - 1) // NUM_MEMORY_ENTRIES_PER_ROW
        return next_power_of_two(n)

    def generate_trace(self, record: ExecutionRecord, deps) -> jnp.ndarray:
        m = record.memory
        n_ev = len(m)
        padded = self.num_rows(record)
        total = padded * NUM_MEMORY_ENTRIES_PER_ROW

        def col(x):
            return jnp.pad(jnp.asarray(x), (0, total - n_ev))

        cols = {}
        data = {
            "addr": col(m.addr),
            "initial_clk": col(m.initial_ts),
            "final_clk": col(m.final_ts),
            "initial_value": col(m.initial_value),
            "final_value": col(m.final_value),
            "is_real": jnp.pad(jnp.ones(n_ev, jnp.uint32), (0, total - n_ev)),
        }
        for k in range(NUM_MEMORY_ENTRIES_PER_ROW):
            for name, arr in data.items():
                cols[f"memory_entries[{k}].{name}"] = arr[k::NUM_MEMORY_ENTRIES_PER_ROW]
        return self.cols.assemble(cols, padded)

    def eval(self, b) -> None:
        for entry in b.local.memory_entries:
            b.receive(
                LookupKind.MEMORY,
                [entry.initial_clk, entry.addr, entry.initial_value],
                entry.is_real,
            )
            b.send(
                LookupKind.MEMORY,
                [entry.final_clk, entry.addr, entry.final_value],
                entry.is_real,
            )
