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


_QUOTIENT_JITS = {}


def quotient_values(
    chip, trace_domain, quotient_domain, prep_on_coset, main_on_coset,
    perm_on_coset, perm_challenges, alpha, cumulative_sum,
):
    """Jit-dispatched wrapper; one compiled program per (chip, domains)."""
    key = (id(chip), trace_domain, quotient_domain, prep_on_coset is None)
    if key not in _QUOTIENT_JITS:
        if prep_on_coset is None:
            _QUOTIENT_JITS[key] = jax.jit(
                lambda m, pm, ch, al, cs: _quotient_values(
                    chip, trace_domain, quotient_domain, None, m, pm, ch, al, cs
                )
            )
        else:
            _QUOTIENT_JITS[key] = jax.jit(
                lambda p, m, pm, ch, al, cs: _quotient_values(
                    chip, trace_domain, quotient_domain, p, m, pm, ch, al, cs
                )
            )
    fn = _QUOTIENT_JITS[key]
    args = (main_on_coset, perm_on_coset, perm_challenges, alpha, cumulative_sum)
    if prep_on_coset is None:
        return fn(*args)
    return fn(prep_on_coset, *args)


def _quotient_values(
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
    perm_next_mat = jnp.roll(perm_on_coset, -next_step, axis=0)

    def perm_planes(mat, i):
        return tuple(mat[:, 4 * i + k] for k in range(4))

    # Collect constraints, then fold with power-weighted sums: equivalent to
    # the verifier's Horner (acc = acc*alpha + c) but with far fewer EF
    # multiplies: acc = sum_j alpha^{K-1-j} c_j, with alpha powers from a
    # log-depth scan and base constraints folded coefficient-wise.
    collected = []

    def on_constraint(v: V):
        collected.append((v.p, v.ext))

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
        perm_local=[V(be, perm_planes(perm_on_coset, i), True) for i in range(perm_w)],
        perm_next=[V(be, perm_planes(perm_next_mat, i), True) for i in range(perm_w)],
        perm_challenges=[V(be, xe.from_array(jnp.asarray(c)), True) for c in perm_challenges],
        cumulative_sum=V(be, xe.from_array(jnp.asarray(cumulative_sum)), True),
    )
    chip.eval(b)
    eval_permutation_constraints(chip, b)

    k_total = len(collected)
    alpha_p = xe.from_array(jnp.asarray(alpha))
    # alpha powers 0..k_total-1 via log-depth scan on stacked planes
    apow_stack = tuple(
        jnp.concatenate(
            [jnp.full((1,), xf.R1 if k == 0 else 0, jnp.uint32),
             jnp.broadcast_to(alpha_p[k], (k_total - 1,))]
        )
        for k in range(4)
    )
    apows = jax.lax.associative_scan(xe.emul, apow_stack, axis=0)  # (K,) planes

    acc = xe.ezeros((nq,))
    for j, (payload, ext) in enumerate(collected):
        w = tuple(a[k_total - 1 - j] for a in apows)  # alpha^{K-1-j} planes (scalars)
        if ext:
            contrib = xe.emul(payload, w)
        else:
            contrib = xe.emul_base(w, payload)
        acc = xe.eadd(acc, contrib)

    return jnp.stack(list(xe.emul_base(acc, sels["inv_zeroifier"])), axis=-1)


def split_quotient_chunks(quotient_domain: Domain, qvals, n_chunks: int):
    """Split coset evals into per-subdomain chunk matrices (p3 split_evals).

    qvals: (Nq, 4) EF evals natural order.  Chunk k = rows k::n_chunks,
    flattened to 4 base columns, living on split_domains(n_chunks)[k].
    """
    return [qvals[k::n_chunks].reshape(-1, 4) for k in range(n_chunks)]
