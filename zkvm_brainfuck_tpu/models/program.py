"""Program chip: preprocessed instruction table + execution multiplicities.

Reference: crates/core/machine/src/program/mod.rs.  The preprocessed trace
pins (pc, opcode, op_a) for the whole program; the main trace is the per-pc
execution count (a device bincount over cpu pc events), received against the
CPU's Program-kind sends.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.record import ExecutionRecord
from ..stark.layout import Layout
from ..stark.lookup import LookupKind
from . import operations as op
from .base import ChipAir, next_power_of_two
from .cpu import INSTRUCTION_COLS

PROGRAM_PREPROCESSED_COLS = Layout([("pc", 1), ("instruction", INSTRUCTION_COLS)])
PROGRAM_MULT_COLS = Layout([("multiplicity", 1)])


class ProgramChip(ChipAir):
    name = "Program"
    cols = PROGRAM_MULT_COLS
    prep_cols = PROGRAM_PREPROCESSED_COLS
    local_only = False

    def included(self, record: ExecutionRecord) -> bool:
        return True

    def num_rows(self, record: ExecutionRecord) -> int:
        return next_power_of_two(len(record.program))

    def generate_preprocessed(self, program) -> jnp.ndarray:
        opcodes, op_a = program.to_arrays()
        n = len(opcodes)
        padded = next_power_of_two(n)
        cols = {
            "pc": jnp.pad(jnp.arange(n, dtype=jnp.uint32), (0, padded - n)),
            "instruction.opcode": jnp.pad(jnp.asarray(opcodes), (0, padded - n)),
        }
        for i, bb in enumerate(op.word_bytes(jnp.asarray(op_a))):
            cols[f"instruction.op_a[{i}]"] = jnp.pad(bb, (0, padded - n))
        return self.prep_cols.assemble(cols, padded)

    def generate_trace(self, record: ExecutionRecord, deps) -> jnp.ndarray:
        n = len(record.program)
        padded = next_power_of_two(n)
        counts = np.bincount(record.cpu.pc, minlength=padded).astype(np.uint32)
        return self.cols.assemble({"multiplicity": jnp.asarray(counts[:padded])}, padded)

    def eval(self, b) -> None:
        prep = b.prep_local
        b.receive(
            LookupKind.PROGRAM,
            [prep.pc, prep.instruction.opcode, prep.instruction.opcode]
            + list(prep.instruction.op_a),
            b.local.multiplicity,
        )
