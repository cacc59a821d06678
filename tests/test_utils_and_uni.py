"""Utility coverage: spans, turn-sync, report tables, uni-stark single-chip
prove/verify (the reference's alu/jump p3_uni_stark tests)."""

import threading

import numpy as np
import jax.numpy as jnp
import pytest

from zkvm_brainfuck_tpu.utils.report import generate_execution_report, sorted_table_lines
from zkvm_brainfuck_tpu.utils.span import SpanBuilder
from zkvm_brainfuck_tpu.utils.concurrency import TurnBasedSync


def test_span_builder():
    b = SpanBuilder("program")
    b.item("+", 3)
    b.enter("loop")
    b.item("-", 5)
    b.exit()
    root = b.finish()
    assert root.total() == 8
    text = "\n".join(root.lines())
    assert "loop" in text and "total" in text


def test_turn_based_sync():
    sync = TurnBasedSync()
    order = []

    def worker(turn):
        sync.wait_for_turn(turn)
        order.append(turn)
        sync.advance_turn()

    threads = [threading.Thread(target=worker, args=(t,)) for t in (2, 0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=5)
    assert order == [0, 1, 2]


def test_report_tables():
    table = {"+": 10, "-": 3, ".": 0}
    width, lines = sorted_table_lines(table)
    assert lines[0] == ("+", 10)
    rows = list(generate_execution_report(table))
    assert len(rows) == 2  # zero rows hidden


def test_uni_stark_addsub_roundtrip():
    from zkvm_brainfuck_tpu.core.executor import execute_python
    from zkvm_brainfuck_tpu.core.program import Program
    from zkvm_brainfuck_tpu.models.alu import AddSubChip
    from zkvm_brainfuck_tpu.models.base import ByteDeps
    from zkvm_brainfuck_tpu.stark.challenger import DuplexChallenger
    from zkvm_brainfuck_tpu.stark.chip import Chip
    from zkvm_brainfuck_tpu.stark.fri import VerificationFailure
    from zkvm_brainfuck_tpu.stark.uni import uni_stark_prove, uni_stark_verify

    program = Program.from_source("+++++---")
    record = execute_python(program, b"")
    chip = Chip(AddSubChip())
    trace = np.asarray(chip.air.generate_trace(record, ByteDeps()))

    proof = uni_stark_prove(chip, trace, DuplexChallenger(), num_queries=8)
    uni_stark_verify(chip, proof, DuplexChallenger(), num_queries=8)

    # tampering with an opened value must fail
    bad = list(proof.main_local)
    bad[0] = ((bad[0][0] + 1) % 0x7F000001,) + tuple(bad[0][1:])
    proof.main_local = bad
    with pytest.raises(VerificationFailure):
        uni_stark_verify(chip, proof, DuplexChallenger(), num_queries=8)


def _branchy_record():
    """A guest with many taken/untaken branches and pointer walks (the
    reference tests Jump/MemoryInstrs standalone with random event lists:
    jump/mod.rs:34-52, memory/instructions/mod.rs:21-37)."""
    from zkvm_brainfuck_tpu.core.executor import execute_python
    from zkvm_brainfuck_tpu.core.program import Program

    # 40 outer iterations of an inner clear loop: hundreds of jump events
    # (both directions) and > < pointer moves.
    src = "+" * 40 + "[->+++[-]<]" + "." 
    program = Program.from_source(src)
    return execute_python(program, b"")


def _uni_roundtrip(air_cls, record, tamper_col):
    from zkvm_brainfuck_tpu.models.base import ByteDeps
    from zkvm_brainfuck_tpu.stark.challenger import DuplexChallenger
    from zkvm_brainfuck_tpu.stark.chip import Chip
    from zkvm_brainfuck_tpu.stark.fri import VerificationFailure
    from zkvm_brainfuck_tpu.stark.uni import uni_stark_prove, uni_stark_verify

    chip = Chip(air_cls())
    deps = ByteDeps()
    chip.air.byte_dependencies(record, deps)
    trace = np.asarray(chip.air.generate_trace(record, deps))
    assert trace.shape[0] >= 16

    proof = uni_stark_prove(chip, trace, DuplexChallenger(), num_queries=8)
    uni_stark_verify(chip, proof, DuplexChallenger(), num_queries=8)

    # mutated witness must fail
    bad = np.array(trace, copy=True)
    bad[0, tamper_col] = (int(bad[0, tamper_col]) + 1) % 0x7F000001
    bad_proof = uni_stark_prove(chip, bad, DuplexChallenger(), num_queries=8)
    with pytest.raises((VerificationFailure, AssertionError)):
        uni_stark_verify(chip, bad_proof, DuplexChallenger(), num_queries=8)


def test_uni_stark_jump_roundtrip():
    from zkvm_brainfuck_tpu.models.jump import JumpChip

    _uni_roundtrip(JumpChip, _branchy_record(), tamper_col=0)


def test_uni_stark_memory_instrs_roundtrip():
    from zkvm_brainfuck_tpu.models.memory_instr import MemoryInstructionsChip

    _uni_roundtrip(MemoryInstructionsChip, _branchy_record(), tamper_col=2)  # mp limb -> breaks next_mp = mp+-1


def test_graph_audit_smoke():
    """tools/graph_audit.py must stay runnable (it rotted once, VERDICT r2):
    audit one small chip and sanity-check the equation counts."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import graph_audit

    from zkvm_brainfuck_tpu.models.io import IoChip
    from zkvm_brainfuck_tpu.stark.chip import Chip

    out = graph_audit.audit([Chip(IoChip())])
    (perm_eqns, q_eqns, n_constraints) = out["IO"]
    assert perm_eqns > 100 and q_eqns > 100 and n_constraints >= 1
    # compile/trace budget: a regression that balloons these graphs shows up
    # as minutes of extra XLA time (keep each well under ~100k eqns)
    assert perm_eqns < 100_000 and q_eqns < 100_000
