"""Interpreter semantics tests (mirrors reference executor.rs:328-417) plus
Python vs native C++ engine differential tests."""

import numpy as np
import pytest

from zkvm_brainfuck_tpu import test_artifacts as ta
from zkvm_brainfuck_tpu.core.executor import ExecutionError, execute_python
from zkvm_brainfuck_tpu.core.program import Program


def run(src, inp=b"", engine="python"):
    prog = Program.from_source(src)
    if engine == "python":
        return execute_python(prog, inp)
    from zkvm_brainfuck_tpu.core.native import execute_native

    return execute_native(prog, inp)


def test_program_bracket_resolution():
    p = Program.from_source("[-[+]]")
    # '[' op_a = index of matching ']' (patched before the ']' push);
    # ']' op_a = index after the matching '['
    assert p.instructions[0].op_a == 5
    assert p.instructions[2].op_a == 4
    assert p.instructions[4].op_a == 3
    assert p.instructions[5].op_a == 1


def test_add_sub_run():
    rec = run("++-.")
    assert rec.output_stream == bytes([1])


def test_mem_run():
    rec = run(">><")
    assert rec.cpu.next_mp[-1] == 1


def test_jmp_run():
    # cell 0 == 0: '[' jumps TO the ']' (cycle 1), whose zero-check falls
    # through to pc+1 == len (cycle 2) - matches reference executor.rs:352-358.
    rec = run("[----]", b"\x01")
    assert rec.global_clk == 2


def test_io_run():
    rec = run(",.", b"\x01")
    assert rec.output_stream == bytes([1])


def test_printa():
    rec = run(ta.PRINTA_BF)
    assert rec.output_stream == b"A"


def test_move():
    rec = run(ta.MOVE_BF)
    assert rec.output_stream == bytes([2, 0])


def test_loop():
    rec = run(ta.LOOP_BF)
    assert rec.cpu.next_pc[-1] == 9
    assert rec.output_stream == bytes([0])


def test_hello():
    rec = run(ta.HELLO_BF)
    assert rec.output_stream == b"Hello"


def test_fibo():
    rec = run(ta.FIBO_BF, bytes([17]))
    assert rec.output_stream == bytes([85])


def test_input_exhausted():
    with pytest.raises(ExecutionError):
        run(",", b"")


def test_clk_and_timestamps():
    rec = run("+.")
    # cycle 0: '+' reads at clk 1, writes at clk 2; cycle 1: '.' reads at clk 3
    assert rec.cpu.mv_prev_ts[0] == 0 and rec.cpu.next_mv_prev_ts[0] == 1
    assert rec.cpu.mv_prev_ts[1] == 2
    assert rec.memory.initial_ts[0] == 0 and rec.memory.final_ts[0] == 3
    assert rec.memory.final_value[0] == 1


@pytest.mark.parametrize(
    "src,inp",
    [
        (ta.FIBO_BF, bytes([17])),
        (ta.HELLO_BF, b""),
        (ta.LOOP_BF, b""),
        (ta.MOVE_BF, b""),
        (ta.PRINTA_BF, b""),
        ("[----]", b"\x01"),
        (",.", b"\x07"),
    ],
)
def test_native_matches_python(src, inp):
    a = run(src, inp, engine="python")
    b = run(src, inp, engine="native")
    assert a.output_stream == b.output_stream
    assert a.global_clk == b.global_clk
    for fld in a.cpu.__dataclass_fields__:
        assert np.array_equal(getattr(a.cpu, fld), getattr(b.cpu, fld)), fld
    for fld in a.memory.__dataclass_fields__:
        assert np.array_equal(getattr(a.memory, fld), getattr(b.memory, fld)), fld


def test_record_append():
    # MachineRecord::append (reference record.rs:71-88): merging two records
    # of the SAME program concatenates cycle columns (with other's implicit
    # clocks rebased by 2*len(self.cpu)), merges per-address memory
    # first/last, and joins IO streams.
    prog = Program.from_source(">+.")
    a = execute_python(prog, b"")
    b = execute_python(prog, b"")
    n_a, n_b = len(a.cpu), len(b.cpu)
    out = a.output_stream + b.output_stream
    a.append(b)
    assert len(a.cpu) == n_a + n_b
    assert a.output_stream == out
    # both records touch address 1 (and address 0 via the '>' move bookkeeping
    # is NOT recorded - only accessed cells appear)
    assert 1 in set(a.memory.addr.tolist())
    i1 = list(a.memory.addr).index(1)
    # initial: both fresh (ts 0, value 0) - self wins the tie deterministically
    assert a.memory.initial_ts[i1] == 0 and a.memory.initial_value[i1] == 0
    # final: other's last access (rebased past all of self's clocks) wins
    assert a.memory.final_ts[i1] > 2 * n_a
    assert a.memory.final_value[i1] == 1
    # other's non-fresh prev timestamps moved into the merged clock frame
    rebased = a.cpu.mv_prev_ts[n_a:]
    assert (rebased[rebased > 0] > 2 * n_a).all()


def test_record_append_distinct_timestamps():
    # Same address, DISTINCT initial/final timestamps after rebasing: the
    # earliest initial and the latest final must win, with other's frame
    # offset by 2*len(self.cpu).
    prog = Program.from_source("+-+.")
    a = execute_python(prog, b"")
    b = execute_python(prog, b"")
    fin_b = int(b.memory.final_ts[0])
    n_a = len(a.cpu)
    ini_a = int(a.memory.initial_ts[0])
    a.append(b)
    assert len(a.memory.addr) == 1
    assert int(a.memory.initial_ts[0]) == ini_a  # self's initial (earlier)
    assert int(a.memory.final_ts[0]) == fin_b + 2 * n_a  # other's final, rebased


def test_record_append_program_mismatch():
    a = run("+.")
    b = run(">+.")
    with pytest.raises(AssertionError):
        a.append(b)
