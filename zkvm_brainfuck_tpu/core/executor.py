"""Brainfuck interpreter emitting columnar events (host front-end).

Faithful to the reference interpreter (crates/core/executor/src/executor.rs):
- clk += 2 per instruction; memory reads happen at clk+1, ALU writes at clk+2
- ALU: read mv at clk+1, write mv+/-1 (mod 256) at clk+2
- jumps: read mv at clk+1, branch on zero/nonzero to op_a or pc+1
- '>' '<': move mem_ptr only (no memory access)
- ',': write input byte at clk+1; '.': read at clk+1 and append to output
- terminates when pc == len(program)
- per-address first/last access records maintained for the Memory chip

Two engines produce identical records:
- this pure-Python engine (reference implementation, differential test anchor)
- the C++ engine in `native/` (production path for long executions), loaded
  via ctypes when built.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .isa import Opcode
from .program import Program
from .record import CpuColumns, ExecutionRecord, MemoryFirstLast


class ExecutionError(Exception):
    pass


_GROW = 1 << 16


class _Cols:
    """Append-only growable uint32 column."""

    def __init__(self):
        self.buf = np.zeros(_GROW, dtype=np.uint32)
        self.n = 0

    def append(self, v):
        if self.n == len(self.buf):
            self.buf = np.concatenate([self.buf, np.zeros(len(self.buf), np.uint32)])
        self.buf[self.n] = v
        self.n += 1

    def done(self):
        return self.buf[: self.n].copy()


def execute_python(program: Program, input_stream: bytes) -> ExecutionRecord:
    """Pure-Python engine (exact but slow; see native engine for production)."""
    n_instr = len(program)
    opcodes = [int(i.opcode) for i in program.instructions]
    op_as = [i.op_a for i in program.instructions]

    pc = 0
    mem_ptr = 0
    clk = 0
    global_clk = 0
    inp_ptr = 0
    memory = {}  # addr -> (value, ts)
    mem_first = {}  # addr -> (initial_ts, initial_value) at first touch
    output = bytearray()

    cols = {
        name: []
        for name in (
            "pc",
            "next_pc",
            "mp",
            "next_mp",
            "mv",
            "next_mv",
            "opcode",
            "op_a",
            "mv_accessed",
            "mv_prev_ts",
            "mv_prev_value",
            "next_mv_accessed",
            "next_mv_prev_ts",
        )
    }
    ap = {k: v.append for k, v in cols.items()}

    def access(addr, ts, new_value=None):
        """Touch memory; returns (prev_value, prev_ts). Updates first/last."""
        prev = memory.get(addr, (0, 0))
        if addr not in mem_first:
            mem_first[addr] = (prev[1], prev[0])
        value = prev[0] if new_value is None else new_value
        memory[addr] = (value, ts)
        return prev

    while pc != n_instr:
        op = opcodes[pc]
        next_pc = pc + 1
        mv = 0
        next_mv = 0
        mp = mem_ptr
        mv_accessed = 0
        mv_prev_ts = 0
        mv_prev_value = 0
        next_mv_accessed = 0
        next_mv_prev_ts = 0

        if op == 2 or op == 3:  # + / -
            prev_v, prev_t = access(mem_ptr, clk + 1)
            mv = prev_v
            mv_prev_ts, mv_prev_value = prev_t, prev_v
            mv_accessed = 1
            next_mv = (mv + 1) & 0xFF if op == 2 else (mv - 1) & 0xFF
            pv, pt = access(mem_ptr, clk + 2, next_mv)
            next_mv_accessed = 1
            next_mv_prev_ts = pt
        elif op == 0 or op == 1:  # [ / ]
            prev_v, prev_t = access(mem_ptr, clk + 1)
            mv = prev_v
            mv_prev_ts, mv_prev_value = prev_t, prev_v
            mv_accessed = 1
            if (op == 0 and mv == 0) or (op == 1 and mv != 0):
                next_pc = op_as[pc]
        elif op == 4:  # >
            mem_ptr = (mem_ptr + 1) & 0xFFFFFFFF
        elif op == 5:  # <
            mem_ptr = (mem_ptr - 1) & 0xFFFFFFFF
        elif op == 6:  # ,
            if inp_ptr >= len(input_stream):
                raise ExecutionError("input stream exhausted")
            byte = input_stream[inp_ptr]
            inp_ptr += 1
            prev_v, prev_t = access(mem_ptr, clk + 1, byte)
            mv = byte
            mv_prev_ts, mv_prev_value = prev_t, prev_v
            mv_accessed = 1
        elif op == 7:  # .
            prev_v, prev_t = access(mem_ptr, clk + 1)
            mv = prev_v
            mv_prev_ts, mv_prev_value = prev_t, prev_v
            mv_accessed = 1
            output.append(mv)

        ap["pc"](pc)
        ap["next_pc"](next_pc)
        ap["mp"](mp)
        ap["next_mp"](mem_ptr)
        ap["mv"](mv)
        ap["next_mv"](next_mv)
        ap["opcode"](op)
        ap["op_a"](op_as[pc])
        ap["mv_accessed"](mv_accessed)
        ap["mv_prev_ts"](mv_prev_ts)
        ap["mv_prev_value"](mv_prev_value)
        ap["next_mv_accessed"](next_mv_accessed)
        ap["next_mv_prev_ts"](next_mv_prev_ts)

        pc = next_pc
        clk += 2
        global_clk += 1

    arr = {k: np.array(v, dtype=np.uint32) for k, v in cols.items()}
    cpu = CpuColumns(**arr)

    addrs = np.array(sorted(mem_first.keys()), dtype=np.uint32)
    mem = MemoryFirstLast(
        addr=addrs,
        initial_ts=np.array([mem_first[a][0] for a in addrs], dtype=np.uint32),
        initial_value=np.array([mem_first[a][1] for a in addrs], dtype=np.uint32),
        final_ts=np.array([memory[a][1] for a in addrs], dtype=np.uint32),
        final_value=np.array([memory[a][0] for a in addrs], dtype=np.uint32),
    )
    return ExecutionRecord(
        program=program,
        cpu=cpu,
        memory=mem,
        input_stream=bytes(input_stream),
        output_stream=bytes(output),
        global_clk=global_clk,
    )


def execute(program: Program, input_stream: bytes, engine: str = "auto") -> ExecutionRecord:
    """Run the guest program. engine: 'auto' | 'native' | 'python'."""
    if engine in ("auto", "native"):
        try:
            from .native import execute_native

            return execute_native(program, input_stream)
        except Exception:
            if engine == "native":
                raise
    return execute_python(program, input_stream)
