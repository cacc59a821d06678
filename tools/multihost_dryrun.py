"""Multi-process (fake multi-host) dryrun: the DCN stand-in this image allows.

SURVEY.md §5.8 / §7 step 10 call for "then multi-host (DCN) on the same
shard_map code".  Real multi-host TPU is unavailable here, so this runs the
SAME pipeline across N separate Python PROCESSES with
`jax.distributed.initialize` over local CPU backends - process boundaries
stand in for hosts, and every collective the row-mesh uses (psum,
all_gather, ppermute) crosses them.

Usage:
    python tools/multihost_dryrun.py            # 2 processes x 4 devices
    python tools/multihost_dryrun.py N_PROCS DEVS_PER_PROC

Parent spawns the workers and waits; each worker:
- initializes jax.distributed with a shared coordinator,
- builds the GLOBAL 1-D rows mesh over all processes' devices,
- runs the explicit-collective prove step (parallel/sharded.py) on a
  row-sharded global array,
- process 0 checks the results against a single-process reference.

Exit code 0 + "MULTIHOST OK" on stdout = success.
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = int(os.environ.get("ZKBF_MH_PORT", "52435"))


def worker(proc_id: int, n_procs: int, devs_per_proc: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devs_per_proc}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=n_procs,
        process_id=proc_id,
    )
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from zkvm_brainfuck_tpu.ops import field as xf
    from zkvm_brainfuck_tpu.parallel.mesh import ROWS_AXIS
    from zkvm_brainfuck_tpu.parallel.sharded import sharded_prove_step

    n_dev = n_procs * devs_per_proc
    assert len(jax.devices()) == n_dev, (len(jax.devices()), n_dev)
    mesh = Mesh(np.array(jax.devices()), (ROWS_AXIS,))

    rows = 32 * n_dev
    rng = np.random.default_rng(0)
    trace_host = rng.integers(0, xf.P, size=(rows, 8), dtype=np.uint32)
    alpha_host = rng.integers(0, xf.P, size=(4,), dtype=np.uint32)
    beta_host = rng.integers(0, xf.P, size=(4,), dtype=np.uint32)

    sharding = NamedSharding(mesh, P(ROWS_AXIS))
    # Global array from identical per-process host data (standard multi-host
    # pattern: every process holds the full logical array and contributes its
    # addressable shards).
    trace = jax.make_array_from_callback(
        trace_host.shape, sharding, lambda idx: trace_host[idx]
    )
    repl = NamedSharding(mesh, P())
    alpha = jax.make_array_from_callback(
        alpha_host.shape, repl, lambda idx: alpha_host[idx]
    )
    beta = jax.make_array_from_callback(
        beta_host.shape, repl, lambda idx: beta_host[idx]
    )

    import functools

    step = jax.jit(functools.partial(sharded_prove_step, mesh))
    root, cumulative, transition = step(trace, alpha, beta)
    jax.block_until_ready((root, cumulative, transition))

    # root / cumulative are replicated -> addressable everywhere
    root_np = np.asarray(root)
    cum_np = np.asarray(cumulative)

    if proc_id == 0:
        # Single-device reference: Merkle root via host Poseidon2 + LogUp sum.
        from zkvm_brainfuck_tpu.ops import poseidon2 as p2
        from zkvm_brainfuck_tpu.stark import ef_host as efh

        digests = p2.hash_np(trace_host)
        level = digests
        while level.shape[0] > 1:
            level = p2.compress_np(level[0::2], level[1::2])
        # sharded_prove_step returns Montgomery-form digests
        got_root = [int(x) for x in xf.np_from_monty(root_np.astype(np.uint32))]
        assert got_root == [int(x) for x in level[0]], "multihost Merkle root mismatch"
        # LogUp cumulative sum reference
        fp = np.zeros((rows,), dtype=np.uint64)
        for c in range(trace_host.shape[1]):
            fp = (fp * 257 + trace_host[:, c]) % xf.P
        total = (0, 0, 0, 0)
        a_t = tuple(int(x) for x in alpha_host)
        b_t = tuple(int(x) for x in beta_host)
        for v in fp:
            denom = efh.add(a_t, efh.mul_base(b_t, int(v)))
            total = efh.add(total, efh.inv(denom))
        got = tuple(int(x) for x in xf.np_from_monty(cum_np.astype(np.uint32)))
        assert got == total, f"multihost LogUp sum mismatch: {got} != {total}"
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
    deadline = time.time() + 600
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
