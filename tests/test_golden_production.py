"""Production-config (84-query) golden fixtures (VERDICT r4 item 6).

The 12-query golden transcript (tests/test_golden_transcript.py) freezes the
test-config schedule, but the PRODUCTION FRI layer/query schedule (84 queries,
16 PoW bits - crates/stark/src/kb31_poseidon2.rs:53-64) differs exactly where
drift is most likely (query sampling, grind, layer count).  This module
freezes, for the `printa` guest at the production config:

- the complete Fiat-Shamir observe/sample stream
  (`tests/golden/transcript_printa_q84.json`), and
- the serialized proof + verifying-key BYTES
  (`tests/golden/proof_printa_q84.bin`, `vk_printa_q84.bin`) - the artifact a
  Rust-side `verify_shard` replay (verifier.rs:27-216) consumes.

Regenerate deliberately with ZKBF_REGEN_GOLDEN=1 after an INTENDED protocol
change (and say so in the commit message).
"""

import json
import os

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
T_GOLDEN = os.path.join(GOLDEN_DIR, "transcript_printa_q84.json")
P_GOLDEN = os.path.join(GOLDEN_DIR, "proof_printa_q84.bin")
VK_GOLDEN = os.path.join(GOLDEN_DIR, "vk_printa_q84.bin")

_REGEN = os.environ.get("ZKBF_REGEN_GOLDEN") == "1"


@pytest.fixture(scope="module")
def production_proof():
    from zkvm_brainfuck_tpu.core.executor import execute
    from zkvm_brainfuck_tpu.core.program import Program
    from zkvm_brainfuck_tpu.models.machine_def import brainfuck_chips
    from zkvm_brainfuck_tpu.stark.config import FriConfig, KoalaBearPoseidon2
    from zkvm_brainfuck_tpu.stark.machine import StarkMachine
    from zkvm_brainfuck_tpu.stark.prover import TpuProver
    from zkvm_brainfuck_tpu.stark.serial import encode_shard_proof, encode_vk
    from zkvm_brainfuck_tpu.test_artifacts import PRINTA_BF

    config = KoalaBearPoseidon2(
        FriConfig(log_blowup=1, num_queries=84, proof_of_work_bits=16)
    )
    machine = StarkMachine(config, brainfuck_chips())
    prover = TpuProver(machine)
    program = Program.from_source(PRINTA_BF)
    pk, vk = prover.setup(program)
    record = execute(program, b"")

    ch = config.challenger()
    ch.start_recording()
    proof = prover.prove(pk, record, ch)
    prove_rec = ch.record

    vch = config.challenger()
    machine.verify(vk, proof, vch)  # must verify before freezing
    return prove_rec, encode_shard_proof(proof.shard_proof), encode_vk(vk)


def _check_bin(path: str, got: bytes, what: str):
    if _REGEN or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "wb") as fh:
            fh.write(got)
        if not _REGEN:
            pytest.fail(f"golden {what} fixture was missing; generated - commit it")
    with open(path, "rb") as fh:
        want = fh.read()
    assert got == want, (
        f"{what} bytes diverged from the golden fixture: either a bug, or an "
        "intended protocol change needs ZKBF_REGEN_GOLDEN=1 + a commit note"
    )


def test_production_transcript_fixture(production_proof):
    prove_rec, _proof_b, _vk_b = production_proof
    payload = {
        "guest": "printa",
        "stdin": "",
        "fri_queries": 84,
        "pow_bits": 16,
        "transcript": prove_rec,
    }
    if _REGEN or not os.path.exists(T_GOLDEN):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(T_GOLDEN, "w") as fh:
            json.dump(payload, fh, indent=None, separators=(",", ":"))
        if not _REGEN:
            pytest.fail("golden 84q transcript fixture was missing; generated")
    with open(T_GOLDEN) as fh:
        golden = json.load(fh)
    assert payload == golden


def test_production_proof_bytes_fixture(production_proof):
    _rec, proof_b, _vk_b = production_proof
    _check_bin(P_GOLDEN, proof_b, "84q proof")


def test_production_vk_bytes_fixture(production_proof):
    _rec, _proof_b, vk_b = production_proof
    _check_bin(VK_GOLDEN, vk_b, "84q vk")


def test_production_proof_bytes_roundtrip(production_proof):
    """The committed bytes decode back to a verifying proof (fresh machine)."""
    from zkvm_brainfuck_tpu.models.machine_def import brainfuck_chips
    from zkvm_brainfuck_tpu.stark.config import FriConfig, KoalaBearPoseidon2
    from zkvm_brainfuck_tpu.stark.machine import StarkMachine
    from zkvm_brainfuck_tpu.stark.serial import decode_shard_proof, decode_vk
    from zkvm_brainfuck_tpu.stark.types import MachineProof

    _rec, proof_b, vk_b = production_proof
    config = KoalaBearPoseidon2(
        FriConfig(log_blowup=1, num_queries=84, proof_of_work_bits=16)
    )
    machine = StarkMachine(config, brainfuck_chips())
    sp = decode_shard_proof(proof_b)
    vk = decode_vk(vk_b)
    machine.verify(vk, MachineProof(shard_proof=sp), config.challenger())
