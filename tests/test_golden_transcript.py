"""Golden Fiat-Shamir transcript fixture (SURVEY.md §7 contract).

Freezes the COMPLETE observe/sample value stream of one small fixed proof
(the `printa` guest at the 12-query test config) in
`tests/golden/transcript_printa.json`:

- any accidental transcript reorder (commit order, 7-zero pad, cumulative-sum
  observes, FRI layer schedule, PoW, query sampling - prover.rs:242-553 /
  verifier.rs:27-216 parity) changes the stream and fails the byte-equality;
- the stream is exactly what a future Rust-side cross-check consumes to
  replay this framework's transcript against the reference challenger.

Regenerate deliberately with ZKBF_REGEN_GOLDEN=1 after an INTENDED protocol
change (and say so in the commit message).
"""

import json
import os

import pytest

os.environ.setdefault("FRI_QUERIES", "12")

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "transcript_printa.json")


@pytest.fixture(scope="module")
def transcripts():
    from zkvm_brainfuck_tpu.core.executor import execute
    from zkvm_brainfuck_tpu.core.program import Program
    from zkvm_brainfuck_tpu.models.machine_def import brainfuck_chips
    from zkvm_brainfuck_tpu.stark.config import KoalaBearPoseidon2
    from zkvm_brainfuck_tpu.stark.machine import StarkMachine
    from zkvm_brainfuck_tpu.stark.prover import TpuProver
    from zkvm_brainfuck_tpu.test_artifacts import PRINTA_BF

    assert int(os.environ.get("FRI_QUERIES", "84")) == 12, (
        "golden fixture is pinned to the 12-query test config"
    )
    config = KoalaBearPoseidon2()
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
    vch.start_recording()
    machine.verify(vk, proof, vch)
    verify_rec = vch.record
    return prove_rec, verify_rec


def test_prove_and_verify_transcripts_identical(transcripts):
    prove_rec, verify_rec = transcripts
    # The verifier replays the prover's exact observe/sample schedule
    # (including the PoW witness observe + grind sample) - value-identical.
    assert prove_rec == verify_rec


def test_golden_transcript_fixture(transcripts):
    prove_rec, _ = transcripts
    payload = {
        "guest": "printa",
        "stdin": "",
        "fri_queries": 12,
        "transcript": prove_rec,
    }
    if os.environ.get("ZKBF_REGEN_GOLDEN") == "1" or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as fh:
            json.dump(payload, fh, indent=None, separators=(",", ":"))
        if os.environ.get("ZKBF_REGEN_GOLDEN") != "1":
            pytest.fail(
                "golden transcript fixture was missing; generated - commit it"
            )
    with open(GOLDEN) as fh:
        golden = json.load(fh)
    assert payload == golden, (
        "transcript diverged from the golden fixture: either a bug "
        "reordered the Fiat-Shamir schedule, or an intended protocol change "
        "needs ZKBF_REGEN_GOLDEN=1 + a commit note"
    )
