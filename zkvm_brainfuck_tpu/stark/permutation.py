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
import numpy as np

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


_PERM_JITS = {}
_PHI_JITS = {}
_CHIP_BY_KEY = {}

CHUNK_P = 1 << 12  # rows per scan step; all heights <= this share one compile


def host_beta_pows(chip: Chip, beta_host) -> "np.ndarray":
    """(max_vals+1, 4) canonical beta powers 1, beta, beta^2, ... (host exact).

    beta is a host transcript sample; computing its powers host-side keeps
    scalar EF multiply chains out of every per-chip device graph.
    """
    from . import ef_host as efh

    inter = _interactions(chip)
    max_vals = max(len(lk.values) for lk, _ in inter)
    pows = [efh.ONE]
    for _ in range(max_vals):
        pows.append(efh.mul(pows[-1], beta_host))
    return np.array(pows, np.uint32)


def _entries_chunk(chip: Chip, prep, main, alpha, bp):
    """Batched LogUp entries for one row chunk.

    prep: (C, PW) or None; main: (C, W); alpha: (4,) Monty; bp: (V+1, 4)
    Monty beta powers.  Returns (entries (C, NB, 4), row_sum (C, 4)) Monty.
    The interaction denominators are stacked along a new axis and inverted
    with ONE vectorized einv (a Fermat ladder on the whole stack) instead of
    I sequential ladders.
    """
    inter = _interactions(chip)
    batch = chip.logup_batch_size
    n = main.shape[0]
    num_batches = (len(inter) + batch - 1) // batch
    n_inter = len(inter)

    alpha_p = xe.from_array(alpha)
    beta_pows = [tuple(bp[j, k] for k in range(4)) for j in range(bp.shape[0])]

    denom_cols = [[] for _ in range(4)]
    mult_cols = []
    for lk, is_send in inter:
        d = tuple(jnp.broadcast_to(alpha_p[k], (n,)) for k in range(4))
        d = xe.eadd_base(d, jnp.full((n,), xf.monty_of(lk.argument_index), jnp.uint32))
        for j, aff in enumerate(lk.values):
            val = _affine_device(aff, prep, main)  # (C,)
            d = xe.eadd(d, xe.emul_base(beta_pows[j + 1], val))
        for k in range(4):
            denom_cols[k].append(d[k])
        m = _affine_device(lk.multiplicity, prep, main)
        mult_cols.append(m if is_send else xf.fneg(m))

    denoms = tuple(jnp.stack(denom_cols[k], axis=1) for k in range(4))  # (C, I) x4
    mults = jnp.stack(mult_cols, axis=1)  # (C, I)

    invs = xe.einv(denoms)  # vectorized over (C, I)
    terms = xe.emul_base(invs, mults)  # (C, I) planes

    pad = num_batches * batch - n_inter
    if pad:
        terms = tuple(jnp.pad(t, ((0, 0), (0, pad))) for t in terms)
    entries = tuple(
        t.reshape(n, num_batches, batch).transpose(0, 2, 1) for t in terms
    )
    ent = tuple(e[:, 0, :] for e in entries)
    for b in range(1, batch):
        ent = tuple(xf.fadd(x, e[:, b, :]) for x, e in zip(ent, entries))
    # ent: (C, NB) planes
    row_sum = tuple(e[:, 0] for e in ent)
    for bi in range(1, num_batches):
        row_sum = tuple(xf.fadd(x, e[:, bi]) for x, e in zip(row_sum, ent))
    return (
        jnp.stack(list(ent), axis=-1),  # (C, NB, 4)
        jnp.stack(list(row_sum), axis=-1),  # (C, 4)
    )


def generate_permutation_trace(chip: Chip, prep, main, alpha, beta_host):
    """Chunk-scanned LogUp trace: the entry graph compiles once per
    (chip, chunk-count); the running-sum scan is a tiny per-(N, NB) program
    SHARED across chips.

    alpha: (4,) Monty device array; beta_host: exact host EF4 tuple.
    Returns (perm_trace (N, NB+1, 4) Monty, cumulative_sum (4,) Monty).
    """
    bpows = xf.to_monty(jnp.asarray(host_beta_pows(chip, beta_host)))
    n = main.shape[0]
    pad = (-n) % CHUNK_P
    n_chunks = (n + pad) // CHUNK_P

    def chunked(x):
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))
        return x.reshape((n_chunks, CHUNK_P) + x.shape[1:])

    fn = _perm_program(chip, n_chunks, prep is not None)

    chunks = {"main": chunked(main)}
    if prep is not None:
        chunks["prep"] = chunked(prep)
    entries, row_sum = fn(chunks, alpha, bpows)

    nb = entries.shape[1]
    # On a mesh, the running sum uses the EXPLICIT-collective scan (local
    # inclusive scan + all_gather'd per-device offsets,
    # parallel/sharded.logup_phi_sharded) instead of relying on GSPMD's
    # decomposition of associative_scan - bit-identical results
    # (tests/test_sharded.py asserts proof-byte equality).
    from ..parallel.mesh import current_mesh

    mesh = current_mesh()
    if mesh is not None and pad == 0 and n % mesh.devices.size == 0:
        from ..parallel.sharded import logup_phi_sharded

        return _phi_sharded_call(mesh, entries, row_sum)
    return _phi_program(n, nb)(entries, row_sum)


def _perm_program(chip: Chip, n_chunks: int, has_prep: bool):
    """The chunk-scanned LogUp entry program (AOT-cached per signature)."""
    key = (chip.name, n_chunks, has_prep)
    if key not in _PERM_JITS:
        from ..utils.aot import jit_aot

        _CHIP_BY_KEY[chip.name] = chip

        def impl(chunks, alpha_arg, bp):
            def body(_, xs):
                ent, rs = _entries_chunk(
                    _CHIP_BY_KEY[chip.name], xs.get("prep"), xs["main"], alpha_arg, bp
                )
                return None, (ent, rs)

            _, (ents, rss) = jax.lax.scan(body, None, chunks)
            return ents.reshape(-1, *ents.shape[2:]), rss.reshape(-1, 4)

        _PERM_JITS[key] = jit_aot(
            ("perm",) + key, impl, deps=("models", "stark.builder")
        )
    return _PERM_JITS[key]


def _phi_sharded_call(mesh, entries, row_sum):
    """jit-wrapped explicit-collective phi (cached per mesh + shape)."""
    from ..parallel.sharded import logup_phi_sharded

    key = (
        "phi_sharded",
        tuple(d.id for d in mesh.devices.flat),
        tuple(int(x) for x in entries.shape),
    )
    fn = _PHI_JITS.get(key)
    if fn is None:
        import functools

        fn = _PHI_JITS[key] = jax.jit(functools.partial(logup_phi_sharded, mesh))
    return fn(entries, row_sum)


def _phi_program(n: int, nb: int):
    """Running-sum scan program, shared across chips of equal (N, NB)."""
    pkey = (n, nb)
    if pkey not in _PHI_JITS:
        from ..utils.aot import jit_aot

        def phi_impl(ents, rss):
            ents = ents[:n]
            rss = rss[:n]
            phi = jax.lax.associative_scan(xf.fadd, rss, axis=0)  # (N, 4)
            perm = jnp.concatenate([ents, phi[:, None, :]], axis=1)
            return perm, phi[-1]

        _PHI_JITS[pkey] = jit_aot(("phi", n, nb), phi_impl)
    return _PHI_JITS[pkey]


def perm_shape(chip: Chip, log_degree: int):
    """(n_chunks, padded_n, num_batches) for warm-up shape construction."""
    n = 1 << log_degree
    pad = (-n) % CHUNK_P
    n_chunks = (n + pad) // CHUNK_P
    inter = _interactions(chip)
    num_batches = (len(inter) + chip.logup_batch_size - 1) // chip.logup_batch_size
    return n_chunks, n + pad, num_batches


def warm_permutation(chip: Chip, log_degree: int, prep_width) -> None:
    """Compile (without executing) this chip's LogUp programs."""
    from ..utils.aot import sds

    n_chunks, padded, nb = perm_shape(chip, log_degree)
    chunks = {"main": sds((n_chunks, CHUNK_P, chip.width))}
    if prep_width:
        chunks["prep"] = sds((n_chunks, CHUNK_P, prep_width))
    bp = host_beta_pows(chip, (2, 0, 0, 0))
    _perm_program(chip, n_chunks, bool(prep_width)).warm(
        chunks, sds((4,)), sds(bp.shape)
    )
    _phi_program(1 << log_degree, nb).warm(
        sds((padded, nb, 4)), sds((padded, 4))
    )


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
    beta_pows = getattr(b, "perm_beta_pows", None)
    if beta_pows is None:
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
            # start from the base-field multiplicity: the first rlc multiply
            # is then ext*base (4 muls) instead of a full EF product (16)
            term = m
            for j, r in enumerate(rlcs):
                if j != i:
                    term = term * r
            term = term.as_ext()
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
