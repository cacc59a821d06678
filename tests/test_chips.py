"""Chip-level tests: trace generation + row-wise constraint replay + LogUp
balance across the whole machine (no proving yet).

This is the Python/TPU analogue of the reference's debug-feature deep checks
(machine.rs:288-387, debug.rs, lookup/debug.rs) run as a regular unit test.
"""

import numpy as np
import pytest

from zkvm_brainfuck_tpu import test_artifacts as ta
from zkvm_brainfuck_tpu.core.executor import execute_python
from zkvm_brainfuck_tpu.core.program import Program
from zkvm_brainfuck_tpu.models.base import ByteDeps
from zkvm_brainfuck_tpu.models.machine_def import brainfuck_chips
from zkvm_brainfuck_tpu.stark.chip import Chip
from zkvm_brainfuck_tpu.stark.debug import check_constraints, debug_lookup_balance


def build_all(src, inp=b""):
    program = Program.from_source(src)
    record = execute_python(program, inp)
    chips = [Chip(a) for a in brainfuck_chips()]
    deps = ByteDeps()
    for c in chips:
        if c.included(record):
            c.air.byte_dependencies(record, deps)
    out = []
    for c in chips:
        if not c.included(record):
            continue
        prep = c.air.generate_preprocessed(program)
        prep = np.asarray(prep) if prep is not None else None
        main = np.asarray(c.air.generate_trace(record, deps))
        out.append((c, prep, main))
    return record, out


def test_chip_symbolic_analysis():
    chips = {c.name: c for c in (Chip(a) for a in brainfuck_chips())}
    # every chip with lookups gets degree >= 3 -> log quotient degree 1
    for name, c in chips.items():
        assert c.num_interactions > 0
        assert c.log_quotient_degree == 1, name
        assert c.logup_batch_size == 2
    # interaction counts: CPU sends program+4 instr tuples + 2x(2 byte+1 mem)
    # + mv u8 + 2 clk byte sends ; receives 2 memory
    cpu = chips["Cpu"]
    assert len(cpu.receives) == 2
    assert len(cpu.sends) == 14
    assert chips["Memory"].num_interactions == 4
    assert chips["Byte"].num_interactions == 2
    assert chips["Program"].num_interactions == 1
    # permutation widths: ceil(I/2)+1
    assert cpu.permutation_width == 9
    assert chips["AddSub"].permutation_width == 4  # 5 receives+sends? -> ceil(5/2)+1


@pytest.mark.parametrize(
    "src,inp",
    [
        ("++-.", b""),
        (">><", b""),
        ("[----]", b"\x01"),
        (",.", b"\x01"),
        (ta.LOOP_BF, b""),
        (ta.MOVE_BF, b""),
        (ta.PRINTA_BF, b""),
        (ta.FIBO_BF, bytes([17])),
    ],
)
def test_constraints_and_balance(src, inp):
    record, triples = build_all(src, inp)
    for chip, prep, main in triples:
        fails = check_constraints(chip, main, prep)
        assert not fails, fails
    imbalance = debug_lookup_balance(triples)
    assert imbalance == {}, dict(list(imbalance.items())[:5])
