"""LogUp permutation argument: device trace generation + constraints.

Reference: crates/stark/src/permutation.rs.  Per chip with I interactions and
batch size B (= 2^log_quotient_degree), the permutation trace has
ceil(I/B) + 1 EF4 columns: batched sums of +/- mult_i / fingerprint_i, plus an
inclusive running-sum column whose last entry is the chip's cumulative sum.

fingerprint_i = alpha + argument_index_i + sum_j beta^{j+1} * value_{i,j}
(the beta^0 slot carries the LookupKind discriminant).

TPU mapping:
- affine lookup values -> fused multiply-adds over trace columns,
- all I denominators inverted with ONE Montgomery batch inversion per row
  (cumulative products along the interaction axis, a single EF4 inverse,
  then an unwind pass) instead of I Fermat ladders,
- the running sum is `jax.lax.associative_scan` over rows - the parallel-scan
  replacement for rayon_scan (permutation.rs:137), and the piece that
  parallelizes over device meshes with a per-device offset exchange.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import ext as xe
from ..ops import field as xf
from .builder import V
from .chip import Chip
from .lookup import Affine


def _affine_device(aff: Affine, prep, main):
    """Evaluate an Affine over Montgomery trace matrices -> (N,) base."""
    n = main.shape[0]
    acc = jnp.full((n,), xf.monty_of(aff.const), jnp.uint32)
    for is_prep, idx, w in aff.terms:
        col = prep[:, idx] if is_prep else main[:, idx]
        if w == 1:
            acc = xf.fadd(acc, col)
        else:
            acc = xf.fadd(acc, xf.fmul(jnp.uint32(xf.monty_of(w)), col))
    return acc


def _interactions(chip: Chip):
    return [(lk, True) for lk in chip.sends] + [(lk, False) for lk in chip.receives]


def generate_permutation_trace(
    chip: Chip,
    prep,  # (N, PW) Monty or None
    main,  # (N, W) Monty
    alpha,  # (4,) Monty EF
    beta,  # (4,) Monty EF
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (perm_trace (N, PW, 4) Monty, cumulative_sum (4,) Monty)."""
    inter = _interactions(chip)
    batch = chip.logup_batch_size
    n = main.shape[0]
    num_batches = (len(inter) + batch - 1) // batch

    max_vals = max(len(lk.values) for lk, _ in inter)
    beta_pows = [xe.eones(())]  # beta^0
    for _ in range(max_vals):
        beta_pows.append(xe.emul(beta_pows[-1], beta))

    # Denominators (fingerprints) per interaction: (N, 4) each.
    denoms = []
    mults = []
    for lk, is_send in inter:
        d = jnp.broadcast_to(alpha, (n, 4))
        d = xe.eadd_base(
            d, jnp.full((n,), xf.monty_of(lk.argument_index), jnp.uint32)
        )
        for j, aff in enumerate(lk.values):
            val = _affine_device(aff, prep, main)  # (N,)
            d = xe.eadd(d, xf.fmul(beta_pows[j + 1][None, :], val[:, None]))
        denoms.append(d)
        m = _affine_device(lk.multiplicity, prep, main)
        mults.append(m if is_send else xf.fneg(m))

    # Montgomery batch inversion across the interaction axis.
    prefix = [denoms[0]]
    for d in denoms[1:]:
        prefix.append(xe.emul(prefix[-1], d))
    total_inv = xe.einv(prefix[-1])
    invs = [None] * len(denoms)
    acc = total_inv
    for i in range(len(denoms) - 1, 0, -1):
        invs[i] = xe.emul(acc, prefix[i - 1])
        acc = xe.emul(acc, denoms[i])
    invs[0] = acc

    terms = [xe.emul_base(invs[i], mults[i]) for i in range(len(inter))]

    entries = []
    for bi in range(num_batches):
        chunk = terms[bi * batch : (bi + 1) * batch]
        e = chunk[0]
        for t in chunk[1:]:
            e = xe.eadd(e, t)
        entries.append(e)

    row_sum = entries[0]
    for e in entries[1:]:
        row_sum = xe.eadd(row_sum, e)
    phi = jax.lax.associative_scan(xf.fadd, row_sum, axis=0)

    perm = jnp.stack(entries + [phi], axis=1)  # (N, num_batches+1, 4)
    return perm, phi[-1]


def eval_permutation_constraints(chip: Chip, b) -> None:
    """Constraints tying the permutation trace to the main trace.

    Mirrors permutation.rs:199-271: per batch,
    entry * prod_i rlc_i == sum_i (+/-m_i) * prod_{j != i} rlc_j,
    and the running-sum column's first/transition/last-row equations.
    Runs over any numeric builder (quotient / verifier / debug).
    """
    inter = _interactions(chip)
    batch = chip.logup_batch_size
    alpha, beta = b.perm_challenges[0], b.perm_challenges[1]

    max_vals = max(len(lk.values) for lk, _ in inter)
    beta_pows = [b._const(1).as_ext()]
    for _ in range(max_vals):
        beta_pows.append(beta_pows[-1] * beta)

    def affine_value(aff: Affine):
        acc = b._const(aff.const)
        for is_prep, idx, w in aff.terms:
            col = b.get_prep_local(idx) if is_prep else b.get_main_local(idx)
            acc = acc + col * w
        return acc

    perm_local = b.perm_local
    perm_next = b.perm_next
    num_batches = len(perm_local) - 1

    for bi in range(num_batches):
        chunk = inter[bi * batch : (bi + 1) * batch]
        rlcs = []
        ms = []
        for lk, is_send in chunk:
            rlc = alpha + b._const(lk.argument_index).as_ext()
            for j, aff in enumerate(lk.values):
                rlc = rlc + beta_pows[j + 1] * affine_value(aff)
            rlcs.append(rlc)
            m = affine_value(lk.multiplicity)
            ms.append(m if is_send else -m)

        product = rlcs[0]
        for r in rlcs[1:]:
            product = product * r
        numerator = None
        for i, m in enumerate(ms):
            term = m.as_ext()
            for j, r in enumerate(rlcs):
                if j != i:
                    term = term * r
            numerator = term if numerator is None else numerator + term
        b.assert_eq_ext(perm_local[bi] * product, numerator)

    sum_local = perm_local[0]
    sum_next = perm_next[0]
    for i in range(1, num_batches):
        sum_local = sum_local + perm_local[i]
        sum_next = sum_next + perm_next[i]
    phi_local = perm_local[-1]
    phi_next = perm_next[-1]

    b.when_first_row().assert_eq_ext(phi_local, sum_local)
    b.when_transition().assert_eq_ext(phi_next - phi_local, sum_next)
    b.when_last_row().assert_eq_ext(phi_local, b.cumulative_sum)
