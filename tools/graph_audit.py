"""Audit traced-graph sizes (jaxpr equation counts) of the hot prover jits.

Python tracing + XLA compile cost scales with the number of primitive
equations in each jitted program; this tool prints eqn counts for the main
per-chip scan-body programs (the LogUp entry builder and the quotient
constraint evaluator - the graphs that dominate compile time) so graph-size
regressions are visible without (noisy) wall timing.
Run: python tools/graph_audit.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

from zkvm_brainfuck_tpu.utils.jax_setup import ensure_cpu_isa_cap

ensure_cpu_isa_cap()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from zkvm_brainfuck_tpu.models.machine_def import brainfuck_chips
from zkvm_brainfuck_tpu.stark.chip import Chip
from zkvm_brainfuck_tpu.stark.permutation import _entries_chunk, _interactions
from zkvm_brainfuck_tpu.stark.quotient import _quotient_chunk, constraint_ext_flags


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


def audit(chips=None, rows: int = 16):
    """Returns {chip_name: (perm_eqns, quotient_eqns, n_constraints)}."""
    chips = chips or [Chip(a) for a in brainfuck_chips()]
    out = {}
    n = rows
    for chip in chips:
        w = chip.width
        pw = chip.preprocessed_width
        main = jnp.zeros((n, w), jnp.uint32)
        prep = jnp.zeros((n, pw), jnp.uint32) if pw else None
        alpha = jnp.zeros((4,), jnp.uint32)
        max_vals = max(len(lk.values) for lk, _ in _interactions(chip))
        bpows = jnp.zeros((max_vals + 1, 4), jnp.uint32)

        perm_fn = lambda m, a, b: _entries_chunk(chip, prep, m, a, b)
        perm_eqns = count_eqns(jax.make_jaxpr(perm_fn)(main, alpha, bpows))

        flags = constraint_ext_flags(chip)
        kb = sum(1 for f in flags if not f)
        ke = len(flags) - kb
        sels = {
            k: jnp.zeros((n,), jnp.uint32)
            for k in ("is_first_row", "is_last_row", "is_transition", "inv_zeroifier")
        }
        perm_mat = jnp.zeros((n, chip.permutation_width * 4), jnp.uint32)
        bw = jnp.zeros((kb, 4), jnp.uint32)
        ew = jnp.zeros((ke, 4), jnp.uint32)
        cs = jnp.zeros((4,), jnp.uint32)

        def q_fn(m, pm, a, bp_, b_, e_, c_):
            return _quotient_chunk(
                chip, sels, prep, prep, m, m, pm, pm, a, bp_, b_, e_, c_
            )

        q_eqns = count_eqns(
            jax.make_jaxpr(q_fn)(main, perm_mat, alpha, bpows, bw, ew, cs)
        )
        out[chip.name] = (perm_eqns, q_eqns, len(flags))
    return out


def main():
    total = 0
    for name, (perm_eqns, q_eqns, n_constraints) in audit().items():
        total += perm_eqns + q_eqns
        print(
            f"{name:<12} perm_eqns={perm_eqns:6d}  quotient_eqns={q_eqns:6d}  "
            f"constraints={n_constraints:3d}"
        )
    print(f"{'TOTAL':<12} {total}")


if __name__ == "__main__":
    main()
