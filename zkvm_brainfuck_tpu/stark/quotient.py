"""Quotient polynomial evaluation on the disjoint coset (device).

Counterpart of crates/stark/src/quotient.rs: run the chip's constraints (AIR +
permutation) over every coset point with the alpha-Horner folding of
folder.rs:68-72, multiply by the inverse zeroifier, and return the EF4
quotient evaluations.  Where the reference walks PackedVal SIMD lanes, here
the whole coset is one batched builder evaluation - each constraint is a fused
element-wise expression over (coset_size,) arrays, and XLA fuses the Horner
chain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import ext as xe
from ..ops import field as xf
from .builder import JnpBackend, NumericBuilder, V
from .chip import Chip
from .domains import Domain, selectors_on_coset
from .permutation import eval_permutation_constraints


def quotient_values(
    chip: Chip,
    trace_domain: Domain,
    quotient_domain: Domain,
    prep_on_coset,  # (Nq, PW) Monty or None
    main_on_coset,  # (Nq, W) Monty
    perm_on_coset,  # (Nq, PWperm*4) Monty flattened base cols
    perm_challenges,  # [(4,), (4,)] Monty EF device arrays
    alpha,  # (4,) Monty EF device array
    cumulative_sum,  # (4,) Monty EF device array
):
    """Returns (Nq, 4) Monty EF4 quotient evals in natural coset order."""
    nq = quotient_domain.size
    next_step = 1 << (quotient_domain.log_n - trace_domain.log_n)
    sels = selectors_on_coset(
        trace_domain.log_n, quotient_domain.log_n, quotient_domain.shift
    )

    be = JnpBackend
    main_next = jnp.roll(main_on_coset, -next_step, axis=0)
    prep_next = (
        jnp.roll(prep_on_coset, -next_step, axis=0) if prep_on_coset is not None else None
    )
    perm_w = perm_on_coset.shape[1] // 4
    perm_ef = perm_on_coset.reshape(nq, perm_w, 4)
    perm_ef_next = jnp.roll(perm_ef, -next_step, axis=0)

    acc = [xe.ezeros((nq,))]
    alpha_b = jnp.asarray(alpha)

    def on_constraint(v: V):
        a = xe.emul(acc[0], jnp.broadcast_to(alpha_b, (nq, 4)))
        if v.ext:
            acc[0] = xe.eadd(a, v.p)
        else:
            acc[0] = xe.eadd_base(a, jnp.broadcast_to(v.p, (nq,)))

    b = NumericBuilder(
        backend=be,
        main_local=lambda i: V(be, main_on_coset[:, i]),
        main_next=lambda i: V(be, main_next[:, i]),
        prep_local=(lambda i: V(be, prep_on_coset[:, i])) if prep_on_coset is not None else None,
        prep_next=(lambda i: V(be, prep_next[:, i])) if prep_next is not None else None,
        is_first_row=V(be, sels["is_first_row"]),
        is_last_row=V(be, sels["is_last_row"]),
        is_transition=V(be, sels["is_transition"]),
        on_constraint=on_constraint,
        perm_local=[V(be, perm_ef[:, i], True) for i in range(perm_w)],
        perm_next=[V(be, perm_ef_next[:, i], True) for i in range(perm_w)],
        perm_challenges=[V(be, jnp.asarray(c), True) for c in perm_challenges],
        cumulative_sum=V(be, jnp.broadcast_to(jnp.asarray(cumulative_sum), (nq, 4)), True),
    )
    chip.eval(b)
    eval_permutation_constraints(chip, b)

    return xe.emul_base(acc[0], sels["inv_zeroifier"])


def split_quotient_chunks(quotient_domain: Domain, qvals, n_chunks: int):
    """Split coset evals into per-subdomain chunk matrices (p3 split_evals).

    qvals: (Nq, 4) EF evals natural order.  Chunk k = rows k::n_chunks,
    flattened to 4 base columns, living on split_domains(n_chunks)[k].
    """
    return [qvals[k::n_chunks].reshape(-1, 4) for k in range(n_chunks)]
