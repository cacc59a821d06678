"""Multi-device sharded prover == single-device prover, byte for byte.

The headline TPU-native capability (SURVEY §2.5 / §7 step 10): with a
row-sharding mesh installed, the WHOLE pipeline (commit / LogUp / quotient /
FRI) runs SPMD over the devices with XLA-inserted collectives — and the proof
must be bit-identical to the single-device proof, because sharding is a
placement decision, not a protocol change.  (Reference parallelism is rayon
shared-memory, prover.rs:283-296; here the axis is the 8-device CPU mesh from
conftest.py.)
"""

import os

os.environ.setdefault("FRI_QUERIES", "12")

from zkvm_brainfuck_tpu import ProverClient
from zkvm_brainfuck_tpu.parallel.mesh import make_row_mesh
from zkvm_brainfuck_tpu.stark import prover as stark_prover


def test_sharded_proof_matches_single_device():
    import jax

    n = len(jax.devices())
    assert n >= 8, "conftest must provide the virtual 8-device CPU mesh"

    guest = "+-" * 64 + "."  # 129 cycles -> 256-row CPU trace, divisible by 8
    client = ProverClient()
    pk, vk = client.setup(guest)

    single = client.prove(pk).run()
    client.verify(single, vk)

    mesh = make_row_mesh(8)
    stark_prover.set_shard_mesh(mesh)
    try:
        sharded = client.prove(pk).run()
    finally:
        stark_prover.set_shard_mesh(None)
    client.verify(sharded, vk)

    assert sharded.proof.proof.to_bytes() == single.proof.proof.to_bytes()
