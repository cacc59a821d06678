"""Debug-mode permutation replay + machine-level adversarial tests.

Coverage mirrors the reference debug machinery (machine.rs:288-387,
debug.rs:24-262) and its verifier error taxonomy (verifier.rs:350-365):
- debug_constraints replays AIR + permutation constraints on the real traces
  with sampled challenges and catches a corrupted permutation trace;
- machine.verify rejects: wrong vk, tampered main/permutation/quotient
  commitments, a tampered Merkle sibling, and a truncated opening proof.
"""

import copy
import os

import numpy as np
import pytest

os.environ.setdefault("FRI_QUERIES", "12")

from zkvm_brainfuck_tpu import ProverClient
from zkvm_brainfuck_tpu.stark.errors import (
    CpuLogDegreeTooLarge,
    InvalidOpeningArgument,
    InvalidPowWitness,
    MachineVerificationError,
    MissingCpuChip,
    OodEvaluationMismatch,
    OpeningShapeError,
    VerificationFailure,
)

GUEST = ",+."  # one IO read, one add, one output


@pytest.fixture(scope="module")
def proven():
    client = ProverClient()
    pk, vk = client.setup(GUEST)
    proof = client.prove(pk, b"A").run()
    client.verify(proof, vk)
    return client, pk, vk, proof


def _verify(client, proof, vk):
    client.verify(proof, vk)


def test_debug_permutation_replay_passes():
    from zkvm_brainfuck_tpu.core.executor import execute_python
    from zkvm_brainfuck_tpu.core.program import Program
    from zkvm_brainfuck_tpu.models.machine_def import brainfuck_chips
    from zkvm_brainfuck_tpu.stark.config import KoalaBearPoseidon2
    from zkvm_brainfuck_tpu.stark.machine import StarkMachine

    program = Program.from_source(GUEST)
    record = execute_python(program, b"A")
    machine = StarkMachine(KoalaBearPoseidon2(), brainfuck_chips())
    machine.debug_constraints(program, record)  # must not raise


def test_debug_catches_corrupted_permutation_trace():
    import jax.numpy as jnp

    from zkvm_brainfuck_tpu.core.executor import execute_python
    from zkvm_brainfuck_tpu.core.program import Program
    from zkvm_brainfuck_tpu.models.base import ByteDeps
    from zkvm_brainfuck_tpu.models.machine_def import brainfuck_chips
    from zkvm_brainfuck_tpu.ops import field as xf
    from zkvm_brainfuck_tpu.stark.chip import Chip
    from zkvm_brainfuck_tpu.stark.debug import check_constraints
    from zkvm_brainfuck_tpu.stark.permutation import generate_permutation_trace

    program = Program.from_source(GUEST)
    record = execute_python(program, b"A")
    chip = Chip(next(a for a in brainfuck_chips() if a.name == "AddSub"))
    deps = ByteDeps()
    chip.air.byte_dependencies(record, deps)
    main_np = np.asarray(chip.air.generate_trace(record, deps))
    challenges = [(1, 2, 3, 4), (5, 6, 7, 8)]
    alpha_dev = xf.to_monty(jnp.asarray(np.array(challenges[0], np.uint32)))
    perm, csum = generate_permutation_trace(
        chip, None, xf.to_monty(jnp.asarray(main_np)), alpha_dev, challenges[1]
    )
    perm_np = np.asarray(xf.from_monty(perm))
    csum_host = tuple(int(x) for x in np.asarray(xf.from_monty(csum)))

    ok = check_constraints(chip, main_np, None, perm_np, challenges, csum_host)
    assert ok == []

    bad = perm_np.copy()
    bad[0, 0, 0] = (bad[0, 0, 0] + 1) % 0x7F000001
    fails = check_constraints(chip, main_np, None, bad, challenges, csum_host)
    assert fails, "corrupted permutation trace must fail the debug replay"


def test_wrong_vk_rejected(proven):
    client, pk, vk, proof = proven
    _pk2, vk2 = client.setup("+++.")
    # wrong vk => typed VerificationFailure (structural malformations are
    # wrapped in MachineVerificationError by machine.verify)
    with pytest.raises(VerificationFailure):
        _verify(client, proof, vk2)


def test_tampered_commitments_rejected(proven):
    client, pk, vk, proof = proven
    for field in ("main_commit", "permutation_commit", "quotient_commit"):
        bad = copy.deepcopy(proof)
        commitment = bad.proof.proof.shard_proof.commitment
        digest = list(getattr(commitment, field))
        digest[0] = (digest[0] + 1) % 0x7F000001
        setattr(commitment, field, digest)
        # A tampered commitment diverges the Fiat-Shamir transcript; the
        # first downstream check to notice is the PoW grind (p=1-2^-16),
        # else a query-path/OOD mismatch - never an untyped failure.
        with pytest.raises(
            (InvalidPowWitness, InvalidOpeningArgument, OodEvaluationMismatch)
        ):
            _verify(client, bad, vk)


def test_tampered_merkle_sibling_rejected(proven):
    client, pk, vk, proof = proven
    bad = copy.deepcopy(proof)
    opening = bad.proof.proof.shard_proof.opening_proof
    b = opening.query_input_openings[0][0]
    b.proof = np.array(b.proof, dtype=np.uint32, copy=True)
    b.proof[0][0] ^= 1
    # opened values untouched => transcript replays fine; the Merkle path
    # check itself must be what rejects
    with pytest.raises(InvalidOpeningArgument):
        _verify(client, bad, vk)


def test_truncated_opening_proof_rejected(proven):
    client, pk, vk, proof = proven
    bad = copy.deepcopy(proof)
    opening = bad.proof.proof.shard_proof.opening_proof
    opening.query_input_openings = opening.query_input_openings[:-1]
    with pytest.raises(OpeningShapeError):
        _verify(client, bad, vk)


def test_tampered_fri_final_poly_rejected(proven):
    client, pk, vk, proof = proven
    bad = copy.deepcopy(proof)
    fri = bad.proof.proof.shard_proof.opening_proof.fri
    fp = list(fri.final_poly)
    fp[0] = (fp[0] + 1) % 0x7F000001
    fri.final_poly = tuple(fp)
    # final_poly is observed before the PoW witness check, so the grind
    # rejects first (p=1-2^-16); the fold-chain check is the backstop
    with pytest.raises((InvalidPowWitness, InvalidOpeningArgument)):
        _verify(client, bad, vk)


def test_full_production_fri_config():
    """One prove+verify at the PRODUCTION FRI config (84 queries, 16 PoW
    bits, kb31_poseidon2.rs:53-64) so the real grind + query loop run in the
    unit suite (everything else uses the 12-query test config)."""
    old = os.environ.get("FRI_QUERIES")
    os.environ["FRI_QUERIES"] = "84"
    try:
        client = ProverClient()
        pk, vk = client.setup(GUEST)
        proof = client.prove(pk, b"A").run()
        client.verify(proof, vk)
        sp = proof.proof.proof.shard_proof
        assert len(sp.opening_proof.query_input_openings) == 84
    finally:
        if old is None:
            del os.environ["FRI_QUERIES"]
        else:
            os.environ["FRI_QUERIES"] = old


def test_missing_cpu_chip_typed(proven):
    client, pk, vk, proof = proven
    bad = copy.deepcopy(proof)
    sp = bad.proof.proof.shard_proof
    sp.chip_ordering = {
        (k if k != "Cpu" else "NotCpu"): v for k, v in sp.chip_ordering.items()
    }
    with pytest.raises(MissingCpuChip):
        _verify(client, bad, vk)


def test_cpu_log_degree_bound_typed(proven):
    client, pk, vk, proof = proven
    bad = copy.deepcopy(proof)
    sp = bad.proof.proof.shard_proof
    cpu_i = sp.chip_ordering["Cpu"]
    sp.opened_values[cpu_i].log_degree = 23
    with pytest.raises(CpuLogDegreeTooLarge):
        _verify(client, bad, vk)


def test_tampered_opened_value_rejected_typed(proven):
    """Corrupt one opened main value: the transcript replays it (observed),
    so rejection comes from the PoW / OOD / opening checks - typed."""
    client, pk, vk, proof = proven
    bad = copy.deepcopy(proof)
    sp = bad.proof.proof.shard_proof
    vals = sp.opened_values[0].main.local
    y = list(vals[0])
    y[0] = (y[0] + 1) % 0x7F000001
    vals[0] = tuple(y)
    with pytest.raises(
        (InvalidPowWitness, InvalidOpeningArgument, OodEvaluationMismatch)
    ):
        _verify(client, bad, vk)


def test_malformed_proof_wrapped(proven):
    """A structurally broken proof (chip ordering pointing nowhere) must
    surface as MachineVerificationError, not a raw KeyError/IndexError."""
    client, pk, vk, proof = proven
    bad = copy.deepcopy(proof)
    sp = bad.proof.proof.shard_proof
    sp.chip_ordering = {k: v + 50 for k, v in sp.chip_ordering.items()}
    with pytest.raises(VerificationFailure):
        _verify(client, bad, vk)
