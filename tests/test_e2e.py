"""End-to-end prove + verify through the machine and SDK layers.

Mirrors the reference's integration pyramid (brainfuck/mod.rs:113-189 run_test
per instruction class, prover/src/lib.rs test_e2e, sdk test_e2e_core), with a
reduced FRI query count for unit-test speed (the full 84-query config runs in
bench.py).
"""

import os

import pytest

os.environ.setdefault("FRI_QUERIES", "12")

from zkvm_brainfuck_tpu import ProverClient, test_artifacts as ta
from zkvm_brainfuck_tpu.prover import BfProver
from zkvm_brainfuck_tpu.stark.fri import VerificationFailure


def run_test(src, inp=b""):
    prover = BfProver()
    pk, vk = prover.setup(src)
    core = prover.prove(pk, inp)
    prover.verify(core.proof, vk)
    return core


def test_add_sub_prove():
    core = run_test("++-")
    assert core.cycles == 3


def test_mem_prove():
    run_test(">><")


def test_jmp_prove():
    run_test("[----]", b"\x01")


def test_io_prove():
    core = run_test(",.", b"\x01")
    assert core.public_values == bytes([1])


def test_instructions_prove():
    # one of each instruction class in a straight line
    run_test("+-><,.", b"\x01")


def test_loop_prove():
    run_test(ta.LOOP_BF)


def test_move_prove():
    core = run_test(ta.MOVE_BF)
    assert core.public_values == bytes([2, 0])


def test_printa_prove():
    core = run_test(ta.PRINTA_BF)
    assert core.public_values == b"A"


def test_fibo_prove_and_tamper():
    prover = BfProver()
    pk, vk = prover.setup(ta.FIBO_BF)
    core = prover.prove(pk, bytes([17]))
    assert core.public_values == bytes([85])
    prover.verify(core.proof, vk)

    # tamper: flip a cumulative sum -> must fail
    sp = core.proof.shard_proof
    cs = list(sp.opened_values[0].cumulative_sum)
    cs[0] = (cs[0] + 1) % 0x7F000001
    sp.opened_values[0].cumulative_sum = tuple(cs)
    with pytest.raises(VerificationFailure):
        prover.verify(core.proof, vk)


def test_sdk_execute_and_e2e_core():
    client = ProverClient()
    out = client.execute(ta.FIBO_BF, bytes([17])).run()
    assert out[0] == 85

    pk, vk = client.setup(ta.FIBO_BF)
    proof = client.prove(pk, bytes([17])).run()
    client.verify(proof, vk)
    assert proof.public_values == bytes([85])
