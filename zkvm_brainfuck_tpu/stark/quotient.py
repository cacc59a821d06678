"""Quotient polynomial evaluation on the disjoint coset (device).

Counterpart of crates/stark/src/quotient.rs: run the chip's constraints (AIR +
permutation) over every coset point with the alpha-Horner folding of
folder.rs:68-72, multiply by the inverse zeroifier, and return the EF4
quotient evaluations.  Where the reference walks PackedVal SIMD lanes, here
the whole coset is one batched builder evaluation - each constraint is a fused
element-wise expression over (coset_size,) arrays.

Folding strategy (TPU + compile-time shaped): the alpha-power weights
alpha^{K-1-j} are exact host EF4 scalars (alpha is a host transcript sample),
and the K constraint payloads are STACKED into (K, Nq) planes and folded with
ONE weighted mod-p contraction - instead of K per-constraint EF multiplies,
which made the traced graph (and XLA compile time) scale linearly with the
constraint count.  The constraint count / ext-flag schedule is discovered once
per chip with an exact host-scalar dry run of the same builder code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ext as xe
from ..ops import field as xf
from . import ef_host as efh
from .builder import HostEFBackend, JnpBackend, NumericBuilder, V
from .chip import Chip
from .domains import Domain, selectors_on_coset
from .permutation import eval_permutation_constraints


_QUOTIENT_JITS = {}
_CONSTRAINT_FLAGS = {}


def constraint_ext_flags(chip: Chip):
    """Per-constraint ext(True)/base(False) flags, in emission order.

    One cached exact host-scalar pass through chip.eval + permutation
    constraints; the flag schedule is value-independent (it only depends on
    the V-wrapper ext propagation, which is the same on every backend).
    """
    key = id(chip)
    if key not in _CONSTRAINT_FLAGS:
        be = HostEFBackend
        flags = []
        one = efh.from_base(1)
        b = NumericBuilder(
            backend=be,
            main_local=lambda i: V(be, one),
            main_next=lambda i: V(be, one),
            prep_local=(lambda i: V(be, one)) if chip.preprocessed_width else None,
            prep_next=(lambda i: V(be, one)) if chip.preprocessed_width else None,
            is_first_row=V(be, one),
            is_last_row=V(be, one),
            is_transition=V(be, one),
            on_constraint=lambda v: flags.append(v.ext),
            perm_local=[V(be, efh.ONE, True)] * chip.permutation_width,
            perm_next=[V(be, efh.ONE, True)] * chip.permutation_width,
            perm_challenges=[V(be, efh.ONE, True), V(be, efh.ONE, True)],
            cumulative_sum=V(be, efh.ZERO, True),
        )
        chip.eval(b)
        eval_permutation_constraints(chip, b)
        _CONSTRAINT_FLAGS[key] = flags
    return _CONSTRAINT_FLAGS[key]


def quotient_values(
    chip, trace_domain, quotient_domain, prep_on_coset, main_on_coset,
    perm_on_coset, perm_challenges_host, alpha_host, cumulative_sum,
):
    """Jit-dispatched wrapper; one compiled program per (chip, domains).

    perm_challenges_host / alpha_host: exact host EF4 tuples (transcript
    samples); alpha's K powers and beta's value powers are computed host-side
    and enter the device program as small constant matrices - scalar EF
    multiply chains never appear in the traced graph.
    """
    from .permutation import host_beta_pows

    flags = constraint_ext_flags(chip)
    k_total = len(flags)
    # weight for constraint j is alpha^{K-1-j}
    pows = [efh.ONE]
    for _ in range(k_total - 1):
        pows.append(efh.mul(pows[-1], alpha_host))
    base_w = np.array(
        [pows[k_total - 1 - j] for j, ext in enumerate(flags) if not ext], np.uint32
    ).reshape(-1, 4)
    ext_w = np.array(
        [pows[k_total - 1 - j] for j, ext in enumerate(flags) if ext], np.uint32
    ).reshape(-1, 4)

    alpha_ch = jnp.asarray(np.array(perm_challenges_host[0], np.uint32))
    beta_pows = jnp.asarray(host_beta_pows(chip, perm_challenges_host[1]))

    key = (id(chip), trace_domain, quotient_domain, prep_on_coset is None)
    if key not in _QUOTIENT_JITS:
        if prep_on_coset is None:
            _QUOTIENT_JITS[key] = jax.jit(
                lambda m, pm, ac, bp, bw, ew, cs: _quotient_values(
                    chip, trace_domain, quotient_domain, None, m, pm, ac, bp, bw, ew, cs
                )
            )
        else:
            _QUOTIENT_JITS[key] = jax.jit(
                lambda p, m, pm, ac, bp, bw, ew, cs: _quotient_values(
                    chip, trace_domain, quotient_domain, p, m, pm, ac, bp, bw, ew, cs
                )
            )
    fn = _QUOTIENT_JITS[key]
    args = (
        main_on_coset,
        perm_on_coset,
        alpha_ch,
        beta_pows,
        jnp.asarray(base_w),
        jnp.asarray(ext_w),
        cumulative_sum,
    )
    if prep_on_coset is None:
        return fn(*args)
    return fn(prep_on_coset, *args)


def _fsum_axis0(x):
    """Exact mod-p sum over axis 0 by pairwise tree reduction."""
    n = x.shape[0]
    while n > 1:
        if n % 2 == 1:
            x = jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)
            n += 1
        x = xf.fadd(x[0::2], x[1::2])
        n = x.shape[0]
    return x[0]


def _quotient_values(
    chip: Chip,
    trace_domain: Domain,
    quotient_domain: Domain,
    prep_on_coset,  # (Nq, PW) Monty or None
    main_on_coset,  # (Nq, W) Monty
    perm_on_coset,  # (Nq, PWperm*4) Monty flattened base cols
    alpha_ch,  # (4,) canonical LogUp alpha challenge
    beta_pows_canon,  # (max_vals+1, 4) canonical beta powers
    base_w,  # (Kb, 4) canonical alpha powers for base constraints
    ext_w,  # (Ke, 4) canonical alpha powers for ext constraints
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

    collected = []

    def on_constraint(v: V):
        collected.append((v.p, v.ext))

    bp = xf.to_monty(beta_pows_canon)
    alpha_m = xf.to_monty(alpha_ch)
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
        perm_challenges=[
            V(be, tuple(alpha_m[k] for k in range(4)), True),
            V(be, tuple(bp[1, k] for k in range(4)), True),
        ],
        cumulative_sum=V(be, xe.from_array(jnp.asarray(cumulative_sum)), True),
    )
    b.perm_beta_pows = [
        V(be, tuple(bp[j, k] for k in range(4)), True) for j in range(bp.shape[0])
    ]
    chip.eval(b)
    eval_permutation_constraints(chip, b)

    assert len(collected) == base_w.shape[0] + ext_w.shape[0]

    # Stack payloads and fold with the host-computed alpha powers:
    #   acc = sum_j alpha^{K-1-j} c_j   (== the Horner fold of folder.rs).
    base_payloads = [
        jnp.broadcast_to(p, (nq,)) for (p, ext) in collected if not ext
    ]
    ext_payloads = [
        tuple(jnp.broadcast_to(pl, (nq,)) for pl in p)
        for (p, ext) in collected
        if ext
    ]
    acc = xe.ezeros((nq,))
    if base_payloads:
        bstack = jnp.stack(base_payloads)  # (Kb, Nq)
        bw = xf.to_monty(base_w)  # (Kb, 4)
        acc = xe.eadd(
            acc,
            tuple(_fsum_axis0(xf.fmul(bstack, bw[:, k][:, None])) for k in range(4)),
        )
    if ext_payloads:
        estack = tuple(
            jnp.stack([p[k] for p in ext_payloads]) for k in range(4)
        )  # (Ke, Nq) x4
        ew = xf.to_monty(ext_w)
        ewp = tuple(ew[:, k][:, None] for k in range(4))
        prod = xe.emul(estack, ewp)  # (Ke, Nq) planes
        acc = xe.eadd(acc, tuple(_fsum_axis0(pl) for pl in prod))

    return jnp.stack(list(xe.emul_base(acc, sels["inv_zeroifier"])), axis=-1)


def split_quotient_chunks(quotient_domain: Domain, qvals, n_chunks: int):
    """Split coset evals into per-subdomain chunk matrices (p3 split_evals).

    qvals: (Nq, 4) EF evals natural order.  Chunk k = rows k::n_chunks,
    flattened to 4 base columns, living on split_domains(n_chunks)[k].
    """
    return [qvals[k::n_chunks].reshape(-1, 4) for k in range(n_chunks)]
