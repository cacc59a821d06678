"""AddSub chip: '+'/'-' mod 256 through one shared adder.

Reference: crates/core/machine/src/alu/mod.rs.  For Add, operand_1 = mv and
the adder output is next_mv; for Sub the roles swap (operand_1 = next_mv, so
operand_1 + 1 == mv), letting both opcodes share AddOperation.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.record import ExecutionRecord
from ..stark.layout import Layout
from ..stark.lookup import LookupKind
from . import operations as op
from .base import ByteDeps, ChipAir, next_power_of_two

ADD_SUB_COLS = Layout(
    [
        ("pc", 1),
        ("add_operation", op.ADD_OPERATION),
        ("operand_1", 1),
        ("operand_2", 1),
        ("is_add", 1),
        ("is_sub", 1),
    ]
)


class AddSubChip(ChipAir):
    name = "AddSub"
    cols = ADD_SUB_COLS
    local_only = True

    def included(self, record: ExecutionRecord) -> bool:
        return bool(record.alu_mask.any())

    def num_rows(self, record: ExecutionRecord) -> int:
        return next_power_of_two(int(record.alu_mask.sum()))

    def _columns(self, record: ExecutionRecord):
        mask = record.alu_mask
        c = record.cpu
        pc = jnp.asarray(c.pc[mask])
        opcode = jnp.asarray(c.opcode[mask])
        mv = jnp.asarray(c.mv[mask])
        next_mv = jnp.asarray(c.next_mv[mask])
        is_add = (opcode == 2).astype(jnp.uint32)
        operand_1 = jnp.where(opcode == 2, mv, next_mv)
        operand_2 = jnp.ones_like(operand_1)
        add_cols = op.populate_add_operation(operand_1, operand_2)
        cols = {
            "pc": pc,
            "operand_1": operand_1,
            "operand_2": operand_2,
            "is_add": is_add,
            "is_sub": (opcode == 3).astype(jnp.uint32),
            "add_operation.value": add_cols["value"],
            "add_operation.carry": add_cols["carry"],
        }
        return cols, int(mask.sum())

    def generate_trace(self, record: ExecutionRecord, deps) -> jnp.ndarray:
        cols, n = self._columns(record)
        padded = self.num_rows(record)
        cols = {k: jnp.pad(v, (0, padded - n)) for k, v in cols.items()}
        return self.cols.assemble(cols, padded)

    def byte_dependencies(self, record: ExecutionRecord, out: ByteDeps) -> None:
        cols, n = self._columns(record)
        out.add_u8(cols["operand_1"])
        out.add_u8(cols["operand_2"])
        out.add_u8(cols["add_operation.value"])

    def eval(self, b) -> None:
        local = b.local
        is_real = local.is_add + local.is_sub
        b.assert_bool(local.is_add)
        b.assert_bool(local.is_sub)
        b.assert_bool(is_real)

        op.eval_add_operation(
            b, local.operand_1, local.operand_2, local.add_operation, is_real
        )

        # Add: (pc, ADD, result, operand_1); Sub: (pc, SUB, operand_1, result)
        b.receive(
            LookupKind.ALU,
            [local.pc, 2, local.add_operation.value, local.operand_1],
            local.is_add,
        )
        b.receive(
            LookupKind.ALU,
            [local.pc, 3, local.operand_1, local.add_operation.value],
            local.is_sub,
        )
