"""Audit traced-graph sizes (jaxpr equation counts) of the hot prover jits.

Python tracing + XLA compile cost scales with the number of primitive
equations in each jitted program; this tool prints eqn counts for the main
per-chip programs so graph-size regressions are visible without (noisy) wall
timing.  Run: python tools/graph_audit.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from zkvm_brainfuck_tpu.models.machine_def import brainfuck_chips
from zkvm_brainfuck_tpu.stark.chip import Chip
from zkvm_brainfuck_tpu.ops import field as xf
from zkvm_brainfuck_tpu.stark import ef_host as efh
from zkvm_brainfuck_tpu.stark.domains import Domain
from zkvm_brainfuck_tpu.stark.permutation import _generate_permutation_trace
from zkvm_brainfuck_tpu.stark.quotient import _quotient_values, constraint_ext_flags


def count_eqns(closed):
    n = 0
    todo = [closed.jaxpr]
    while todo:
        j = todo.pop()
        for eq in j.eqns:
            n += 1
            for v in eq.params.values():
                if hasattr(v, "jaxpr"):
                    todo.append(v.jaxpr if hasattr(v.jaxpr, "eqns") else v)
                elif isinstance(v, (list, tuple)):
                    for x in v:
                        if hasattr(x, "jaxpr"):
                            todo.append(x.jaxpr if hasattr(x.jaxpr, "eqns") else x)
    return n


def main():
    chips = [Chip(a) for a in brainfuck_chips()]

    log_n = 4
    n = 1 << log_n
    total = 0
    for chip in chips:
        w = chip.width
        pw = chip.preprocessed_width
        main = jnp.zeros((n, w), jnp.uint32)
        prep = jnp.zeros((n, pw), jnp.uint32) if pw else None
        alpha = jnp.zeros((4,), jnp.uint32)
        beta = jnp.zeros((4,), jnp.uint32)

        max_vals = max(
            len(lk.values) for lk in list(chip.sends) + list(chip.receives)
        )
        bpows = jnp.zeros((max_vals + 1, 4), jnp.uint32)
        perm_fn = lambda m, a, b: _generate_permutation_trace(chip, prep, m, a, b)
        perm_eqns = count_eqns(jax.make_jaxpr(perm_fn)(main, alpha, bpows))

        td = Domain(log_n, 1)
        qd = td.create_disjoint_domain(1 << (log_n + chip.log_quotient_degree))
        nq = qd.size
        flags = constraint_ext_flags(chip)
        kb = sum(1 for f in flags if not f)
        ke = len(flags) - kb
        main_lde = jnp.zeros((nq, w), jnp.uint32)
        prep_lde = jnp.zeros((nq, pw), jnp.uint32) if pw else None
        perm_lde = jnp.zeros((nq, chip.permutation_width * 4), jnp.uint32)
        bw = jnp.zeros((kb, 4), jnp.uint32)
        ew = jnp.zeros((ke, 4), jnp.uint32)
        cs = jnp.zeros((4,), jnp.uint32)
        q_fn = lambda m, pm, ch0, bp_, b_, e_, c_: _quotient_values(
            chip, td, qd, prep_lde, m, pm, ch0, bp_, b_, e_, c_
        )
        q_eqns = count_eqns(
            jax.make_jaxpr(q_fn)(main_lde, perm_lde, alpha, bpows, bw, ew, cs)
        )
        total += perm_eqns + q_eqns
        print(
            f"{chip.name:<12} perm_eqns={perm_eqns:6d}  quotient_eqns={q_eqns:6d}  "
            f"constraints={len(flags):3d} (base={kb}, ext={ke})"
        )
    print(f"{'TOTAL':<12} {total}")


if __name__ == "__main__":
    main()
