"""Multi-process (fake multi-host) dryrun of the REAL prover.

SURVEY.md §5.8 / §7 step 10 call for "then multi-host (DCN) on the same
shard_map code".  Real multi-host TPU is unavailable here, so this runs the
REAL pipeline - `ProverClient.setup/prove/verify` with the row mesh active -
across N separate Python PROCESSES with `jax.distributed.initialize` over
local CPU backends: process boundaries stand in for hosts, and every
collective the sharded prover needs (all-gathers for transcript reads,
GSPMD-inserted collectives inside commits/LogUp/quotient/FRI) crosses them.

The proof each worker assembles must be BYTE-IDENTICAL to the committed
single-process golden fixture `tests/golden/proof_printa_q84.bin` (the
production 84-query config, `printa` guest) - the strongest cross-process
correctness check available without a second toolchain.

Usage:
    python tools/multihost_dryrun.py            # 2 processes x 4 devices
    python tools/multihost_dryrun.py N_PROCS DEVS_PER_PROC

Exit code 0 + "MULTIHOST OK" on stdout = success.
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = int(os.environ.get("ZKBF_MH_PORT", "52435"))
GOLDEN = os.path.join(REPO, "tests", "golden", "proof_printa_q84.bin")


def worker(proc_id: int, n_procs: int, devs_per_proc: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devs_per_proc}"
    ).strip()
    from zkvm_brainfuck_tpu.utils.jax_setup import ensure_cpu_isa_cap

    ensure_cpu_isa_cap()
    os.environ["FRI_QUERIES"] = "84"  # the golden fixture's config
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=n_procs,
        process_id=proc_id,
    )
    import numpy as np

    from zkvm_brainfuck_tpu.utils.jax_setup import (
        enable_compilation_cache,
        enable_cpu_fast_field,
    )

    enable_compilation_cache()
    enable_cpu_fast_field()

    from jax.sharding import Mesh

    from zkvm_brainfuck_tpu import ProverClient
    from zkvm_brainfuck_tpu.parallel.mesh import ROWS_AXIS
    from zkvm_brainfuck_tpu.stark import prover as stark_prover
    from zkvm_brainfuck_tpu.stark.serial import encode_shard_proof
    from zkvm_brainfuck_tpu.test_artifacts import PRINTA_BF

    n_dev = n_procs * devs_per_proc
    assert len(jax.devices()) == n_dev, (len(jax.devices()), n_dev)
    mesh = Mesh(np.array(jax.devices()), (ROWS_AXIS,))

    stark_prover.set_shard_mesh(mesh)
    try:
        client = ProverClient()
        pk, vk = client.setup(PRINTA_BF)
        proof = client.prove(pk).run()
        client.verify(proof, vk)
    finally:
        stark_prover.set_shard_mesh(None)

    got = encode_shard_proof(proof.proof.proof.shard_proof)
    with open(GOLDEN, "rb") as fh:
        want = fh.read()
    assert got == want, (
        f"proc {proc_id}: multi-process proof bytes differ from the "
        f"single-process golden fixture ({len(got)} vs {len(want)} bytes)"
    )
    if proc_id == 0:
        print("MULTIHOST OK", flush=True)


def main() -> None:
    n_procs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    devs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    procs = []
    for pid in range(n_procs):
        env = dict(os.environ)
        env["ZKBF_MH_WORKER"] = f"{pid}:{n_procs}:{devs}"
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                stdout=None if pid == 0 else subprocess.DEVNULL,
            )
        )
    deadline = time.time() + 1800
    rc = 0
    for p in procs:
        try:
            p.wait(timeout=max(5, deadline - time.time()))
        except subprocess.TimeoutExpired:
            p.kill()
            rc = 1
        rc = rc or p.returncode
    sys.exit(rc)


if __name__ == "__main__":
    spec = os.environ.get("ZKBF_MH_WORKER")
    if spec:
        pid, n, d = (int(x) for x in spec.split(":"))
        worker(pid, n, d)
    else:
        main()
