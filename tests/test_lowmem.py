"""Low-memory proving mode (ZKBF_LOWMEM): proof-byte equality.

The low-memory path changes WHERE values are computed (source-domain
barycentrics, exact-quotient reduced openings, query-time tree rebuilds) but
not a single committed or opened VALUE: proofs must be byte-identical to the
normal mode.  Runs forced-on at tiny heights; production engages it
automatically at 2^ZKBF_LOWMEM_LOG-row LDEs (the 2^22-cycle scale).
"""

import os

import pytest

os.environ.setdefault("FRI_QUERIES", "12")

from zkvm_brainfuck_tpu import ProverClient
from zkvm_brainfuck_tpu.stark.serial import encode_shard_proof

GUEST = ",+[->+<]>."  # io + loop: exercises Cpu/AddSub/Jump/Memory/IO chips


def _prove_bytes() -> bytes:
    client = ProverClient()
    pk, vk = client.setup(GUEST)
    proof = client.prove(pk, bytes([3])).run()
    client.verify(proof, vk)
    return encode_shard_proof(proof.proof.proof.shard_proof)


@pytest.fixture(scope="module")
def normal_bytes():
    return _prove_bytes()


def test_lowmem_proof_bytes_identical(normal_bytes, monkeypatch):
    monkeypatch.setenv("ZKBF_LOWMEM", "1")
    assert _prove_bytes() == normal_bytes


def test_lowmem_blocked_proof_bytes_identical(normal_bytes, monkeypatch):
    """Low-memory AND narrow column blocks (the exact 2^22 production
    configuration, scaled down)."""
    monkeypatch.setenv("ZKBF_LOWMEM", "1")
    monkeypatch.setenv("ZKBF_BLK_LOG", "4")  # every LDE height blocks
    monkeypatch.setenv("ZKBF_BLK_W", "8")
    assert _prove_bytes() == normal_bytes
