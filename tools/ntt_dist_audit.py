"""GSPMD vs explicit-collective distributed NTT: the measured decision
(VERDICT r4 item 4 / SURVEY §2.5 "Parallel NTT").

Compares, on an 8-virtual-device CPU rows mesh, the production commit-path
NTT under (a) GSPMD propagation (`ntt_traced` on a row-sharded input, XLA
chooses the collectives) and (b) the explicit-collective 4-step NTT
(`parallel.sharded.sharded_ntt`, 3 all_to_alls):

- bit-equality of both against the single-device NTT,
- collective-op counts in the compiled HLO (the DCN/ICI traffic proxy this
  host can measure - wall-clock on 8 virtual CPU devices of a 2-vCPU host
  measures host contention, not communication),
- compiled wall time (reported for completeness, heavily caveated).

Run: python tools/ntt_dist_audit.py [log_n] [width]
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

from zkvm_brainfuck_tpu.utils.jax_setup import ensure_cpu_isa_cap

ensure_cpu_isa_cap()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from zkvm_brainfuck_tpu.ops import field as f
from zkvm_brainfuck_tpu.ops import ntt as nt
from zkvm_brainfuck_tpu.parallel.mesh import ROWS_AXIS, make_row_mesh
from zkvm_brainfuck_tpu.parallel.sharded import sharded_ntt

COLLECTIVES = [
    "all-to-all", "all-reduce", "all-gather", "collective-permute",
    "reduce-scatter",
]


def count_collectives(compiled) -> dict:
    txt = compiled.as_text()
    return {c: len(re.findall(rf"\b{c}\b", txt)) for c in COLLECTIVES}


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n = 1 << log_n
    mesh = make_row_mesh(8)
    rows = NamedSharding(mesh, P(ROWS_AXIS))

    rng = np.random.default_rng(0)
    x_host = rng.integers(0, f.P, size=(n, width), dtype=np.uint32)
    x_sharded = jax.device_put(jnp.asarray(x_host), rows)

    want = np.asarray(nt.ntt(jnp.asarray(x_host)))

    # (a) GSPMD: the exact commit-path kernel on a sharded input.
    tw = jnp.asarray(nt.twiddle_blob(log_n, False))
    rev = jnp.asarray(nt.bit_reversal_perm(log_n).astype(np.int32))

    gspmd = jax.jit(
        lambda x, t, r: nt.ntt_traced(x, t, r, log_n, False),
        out_shardings=rows,
    )
    c_gspmd = gspmd.lower(x_sharded, tw, rev).compile()
    got = np.asarray(jax.device_put(c_gspmd(x_sharded, tw, rev), NamedSharding(mesh, P())))
    assert (got == want).all(), "GSPMD NTT mismatch"

    # (b) explicit 4-step all_to_all NTT.
    import functools

    expl = jax.jit(functools.partial(sharded_ntt, mesh), static_argnames=("inverse",))
    c_expl = expl.lower(x_sharded).compile()
    got2 = np.asarray(jax.device_put(c_expl(x_sharded), NamedSharding(mesh, P())))
    assert (got2 == want).all(), "explicit NTT mismatch"

    print(f"shape 2^{log_n} x {width}, 8-device rows mesh")
    print(f"{'path':10s} {'collective ops in HLO'}")
    for name, comp in [("gspmd", c_gspmd), ("explicit", c_expl)]:
        counts = count_collectives(comp)
        tot = sum(counts.values())
        nz = {k: v for k, v in counts.items() if v}
        print(f"{name:10s} total={tot}  {nz}")

    for name, fn, args in [
        ("gspmd", c_gspmd, (x_sharded, tw, rev)),
        ("explicit", c_expl, (x_sharded,)),
    ]:
        ts = []
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(fn(*args))
            ts.append(time.time() - t0)
        print(f"{name:10s} wall best {min(ts) * 1e3:.1f} ms (8 virtual devices on"
              " 2 vCPUs - contention, not comm)")


if __name__ == "__main__":
    main()
