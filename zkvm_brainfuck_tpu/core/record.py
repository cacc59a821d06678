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

    def append(self, other: "ExecutionRecord") -> None:
        """Merge another record's events into this one (MachineRecord::append,
        reference record.rs:71-88 / stark/src/record.rs:2-5).

        Columnar concatenation per field; memory first/last entries are
        reconciled per address (earliest initial access wins the initial
        slot, latest final access wins the final slot), mirroring how the
        reference merges per-address MemoryEvent maps.
        """
        self.cpu = CpuColumns(
            **{
                f: np.concatenate([getattr(self.cpu, f), getattr(other.cpu, f)])
                for f in (
                    "pc", "next_pc", "mp", "next_mp", "mv", "next_mv",
                    "opcode", "op_a", "mv_accessed", "mv_prev_ts",
                    "mv_prev_value", "next_mv_accessed", "next_mv_prev_ts",
                )
            }
        )
        if len(other.memory):
            addr = np.concatenate([self.memory.addr, other.memory.addr])
            ini_ts = np.concatenate([self.memory.initial_ts, other.memory.initial_ts])
            ini_v = np.concatenate([self.memory.initial_value, other.memory.initial_value])
            fin_ts = np.concatenate([self.memory.final_ts, other.memory.final_ts])
            fin_v = np.concatenate([self.memory.final_value, other.memory.final_value])
            uniq, inv = np.unique(addr, return_inverse=True)
            n = len(uniq)
            first = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(first, inv, ini_ts.astype(np.int64))
            last = np.zeros(n, dtype=np.int64)
            np.maximum.at(last, inv, fin_ts.astype(np.int64))
            ini_v_out = np.zeros(n, dtype=np.uint32)
            fin_v_out = np.zeros(n, dtype=np.uint32)
            ini_v_out[inv[ini_ts.astype(np.int64) == first[inv]]] = ini_v[
                ini_ts.astype(np.int64) == first[inv]
            ]
            fin_v_out[inv[fin_ts.astype(np.int64) == last[inv]]] = fin_v[
                fin_ts.astype(np.int64) == last[inv]
            ]
            self.memory = MemoryFirstLast(
                addr=uniq.astype(np.uint32),
                initial_ts=first.astype(np.uint32),
                initial_value=ini_v_out,
                final_ts=last.astype(np.uint32),
                final_value=fin_v_out,
            )
        self.input_stream = self.input_stream + other.input_stream
        self.output_stream = self.output_stream + other.output_stream
        self.global_clk += other.global_clk

    def opcode_counts(self) -> dict:
        from .isa import Opcode

        vals, counts = np.unique(self.cpu.opcode, return_counts=True)
        return {Opcode(int(v)).mnemonic: int(c) for v, c in zip(vals, counts)}
