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


def test_kb_bit_decomposition_gadget():
    """KoalaBearBitDecomposition (operations/koala_bear_range.rs:10-113):
    32-bit range-check gadget — honest witnesses pass, value >= p fails."""
    import jax.numpy as jnp

    from zkvm_brainfuck_tpu.models.operations import (
        KB_BIT_DECOMPOSITION,
        eval_kb_bit_decomposition,
        populate_kb_bit_decomposition,
    )
    from zkvm_brainfuck_tpu.ops.field import P
    from zkvm_brainfuck_tpu.stark.builder import NumericBuilder, NumpyBackend, V

    def run(values):
        vals = jnp.asarray(np.asarray(values, np.uint32))
        cols = populate_kb_bit_decomposition(vals)
        mat = np.asarray(KB_BIT_DECOMPOSITION.assemble(cols, len(values)))
        n = mat.shape[0]
        mat64 = mat.astype(np.uint64)
        fails = []

        def on_constraint(v: V):
            arr = np.broadcast_to(v.p, (n,))
            if arr.any():
                fails.append(np.nonzero(arr)[0].tolist())

        be = NumpyBackend
        b = NumericBuilder(
            backend=be,
            main_local=lambda i: V(be, mat64[:, i]),
            main_next=lambda i: V(be, mat64[:, i]),
            prep_local=None,
            prep_next=None,
            is_first_row=V(be, np.zeros(n, np.uint64)),
            is_last_row=V(be, np.zeros(n, np.uint64)),
            is_transition=V(be, np.ones(n, np.uint64)),
            on_constraint=on_constraint,
        )
        view = KB_BIT_DECOMPOSITION.view(lambda i: V(be, mat64[:, i]))
        value = V(be, (np.asarray(values, np.uint64) % P))
        eval_kb_bit_decomposition(b, value, view, V(be, np.ones(n, np.uint64)))
        return fails

    rng = np.random.default_rng(7)
    good = rng.integers(0, P, size=64, dtype=np.uint32)
    good[:3] = [0, 1, P - 1]
    assert run(good) == []

    # value = p: bits reconstruct p (== 0 in-field) with the 0x7f top byte;
    # the and-chain fires and the low-bit sum is nonzero -> must fail
    assert run([P]) != []
