"""Columnar execution record: the "shard" as struct-of-arrays.

TPU-first re-design of the reference's event vectors
(crates/core/executor/src/record.rs:15-43, events/*):  instead of per-cycle
structs, every event field is a dense numpy column so that chip trace
generation becomes vectorized device code.  Per-instruction-class event lists
(add/jump/memory-instr/io) are *derived views* selected by opcode masks - they
are not stored separately (the reference's sub_events is empty anyway,
record.rs:21-23).  Byte-lookup multiplicities are not collected here at all:
they are computed on-device as histograms during trace generation
(the TPU equivalent of `generate_dependencies`).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Optional

import numpy as np

from .program import Program


@dataclass
class CpuColumns:
    """One entry per executed cycle; clk(i) = 2*i."""

    pc: np.ndarray  # u32
    next_pc: np.ndarray  # u32
    mp: np.ndarray  # u32
    next_mp: np.ndarray  # u32
    mv: np.ndarray  # u32 (byte value)
    next_mv: np.ndarray  # u32 (byte value; ALU result)
    opcode: np.ndarray  # u32
    op_a: np.ndarray  # u32 (jump destination operand)
    mv_accessed: np.ndarray  # u8 bool: cycle touched memory at clk+1
    mv_prev_ts: np.ndarray  # u32: previous access timestamp for the clk+1 access
    mv_prev_value: np.ndarray  # u32: value before the clk+1 access
    next_mv_accessed: np.ndarray  # u8 bool: ALU write at clk+2
    next_mv_prev_ts: np.ndarray  # u32

    def __len__(self):
        return len(self.pc)


@dataclass
class MemoryFirstLast:
    """Per touched address: first/last access records (events/memory.rs:7-26)."""

    addr: np.ndarray  # u32
    initial_ts: np.ndarray  # u32
    initial_value: np.ndarray  # u32
    final_ts: np.ndarray  # u32
    final_value: np.ndarray  # u32

    def __len__(self):
        return len(self.addr)


@dataclass
class ExecutionRecord:
    program: Program
    cpu: CpuColumns
    memory: MemoryFirstLast
    input_stream: bytes
    output_stream: bytes
    global_clk: int

    # -- derived per-instruction-class masks (cached) ---------------------

    def _mask(self, *opcodes) -> np.ndarray:
        m = np.zeros(len(self.cpu), dtype=bool)
        for op in opcodes:
            m |= self.cpu.opcode == int(op)
        return m

    @property
    def alu_mask(self) -> np.ndarray:
        return self._mask(2, 3)

    @property
    def jump_mask(self) -> np.ndarray:
        return self._mask(0, 1)

    @property
    def memory_instr_mask(self) -> np.ndarray:
        return self._mask(4, 5)

    @property
    def io_mask(self) -> np.ndarray:
        return self._mask(6, 7)

    @property
    def num_cycles(self) -> int:
        return len(self.cpu)

    def opcode_counts(self) -> dict:
        from .isa import Opcode

        vals, counts = np.unique(self.cpu.opcode, return_counts=True)
        return {Opcode(int(v)).mnemonic: int(c) for v, c in zip(vals, counts)}
