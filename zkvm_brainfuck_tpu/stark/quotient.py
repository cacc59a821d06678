"""Quotient polynomial evaluation on the disjoint coset (device).

Counterpart of crates/stark/src/quotient.rs: run the chip's constraints (AIR +
permutation) over every coset point with the alpha-Horner folding of
folder.rs:68-72, multiply by the inverse zeroifier, and return the EF4
quotient evaluations.  Where the reference walks PackedVal SIMD lanes, here
the whole coset is one batched builder evaluation - each constraint is a fused
element-wise expression over row-chunk arrays.

Folding strategy (TPU + compile-time shaped): the alpha-power weights
alpha^{K-1-j} are exact host EF4 scalars (alpha is a host transcript sample),
and the K constraint payloads are STACKED into (K, rows) planes and folded
with ONE weighted mod-p contraction - instead of K per-constraint EF
multiplies, which made the traced graph (and XLA compile time) scale linearly
with the constraint count.

Compile discipline: the coset is processed in fixed CHUNK_Q-row chunks under
`lax.scan`, so the (large) constraint graph is traced/compiled ONCE per chip
per chunk-count - every trace height <= CHUNK_Q shares a single compiled
program, and selectors/next-row copies stream in as scan inputs instead of
being embedded as multi-MB HLO constants.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ext as xe
from ..ops import field as xf
from . import ef_host as efh
from .builder import HostEFBackend, JnpBackend, NumericBuilder, V
from .chip import Chip
from .domains import Domain, selectors_on_coset_dev
from .permutation import eval_permutation_constraints

CHUNK_Q = 1 << 14  # rows per scan step; all heights <= this share one compile

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


def _fsum_axis0(x):
    """Exact mod-p sum over the (small) constraint axis: native split-sum."""
    return xf.fsum_small(x, axis=0)


def _quotient_chunk(
    chip: Chip,
    sels,  # dict of (C,) Monty selector chunks
    prep,  # (C, PW) / None
    prep_next,
    main,  # (C, W)
    main_next,
    perm,  # (C, PWperm*4)
    perm_next,
    alpha_m,  # (4,) Monty LogUp alpha challenge
    bp,  # (max_vals+1, 4) Monty beta powers
    base_w,  # (Kb, 4) Monty alpha powers for base constraints
    ext_w,  # (Ke, 4) Monty alpha powers for ext constraints
    cumulative_sum,  # (4,) Monty EF
):
    """(C, 4) Monty EF4 quotient evals for one row chunk."""
    c_rows = main.shape[0]
    be = JnpBackend
    perm_w = perm.shape[1] // 4

    def perm_planes(mat, i):
        return tuple(mat[:, 4 * i + k] for k in range(4))

    collected = []
    b = NumericBuilder(
        backend=be,
        main_local=lambda i: V(be, main[:, i]),
        main_next=lambda i: V(be, main_next[:, i]),
        prep_local=(lambda i: V(be, prep[:, i])) if prep is not None else None,
        prep_next=(lambda i: V(be, prep_next[:, i])) if prep_next is not None else None,
        is_first_row=V(be, sels["is_first_row"]),
        is_last_row=V(be, sels["is_last_row"]),
        is_transition=V(be, sels["is_transition"]),
        on_constraint=lambda v: collected.append((v.p, v.ext)),
        perm_local=[V(be, perm_planes(perm, i), True) for i in range(perm_w)],
        perm_next=[V(be, perm_planes(perm_next, i), True) for i in range(perm_w)],
        perm_challenges=[
            V(be, tuple(alpha_m[k] for k in range(4)), True),
            V(be, tuple(bp[1, k] for k in range(4)), True),
        ],
        cumulative_sum=V(be, xe.from_array(cumulative_sum), True),
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
        jnp.broadcast_to(p, (c_rows,)) for (p, ext) in collected if not ext
    ]
    ext_payloads = [
        tuple(jnp.broadcast_to(pl, (c_rows,)) for pl in p)
        for (p, ext) in collected
        if ext
    ]
    acc = xe.ezeros((c_rows,))
    if base_payloads:
        bstack = jnp.stack(base_payloads)  # (Kb, C)
        acc = xe.eadd(
            acc,
            tuple(
                _fsum_axis0(xf.fmul(bstack, base_w[:, k][:, None])) for k in range(4)
            ),
        )
    if ext_payloads:
        estack = tuple(
            jnp.stack([p[k] for p in ext_payloads]) for k in range(4)
        )  # (Ke, C) x4
        ewp = tuple(ext_w[:, k][:, None] for k in range(4))
        prod = xe.emul(estack, ewp)  # (Ke, C) planes
        acc = xe.eadd(acc, tuple(_fsum_axis0(pl) for pl in prod))

    return jnp.stack(list(xe.emul_base(acc, sels["inv_zeroifier"])), axis=-1)


@lru_cache(maxsize=None)
def _quotient_program(
    chip_key, n_chunks: int, next_step: int, has_prep: bool, carry_next: bool
):
    """Scan program per (chip, chunk count): the constraint graph is traced
    once as the scan body.

    carry_next (the pad == 0 case): next-row matrices are NOT materialized
    as rolled copies of the full coset (at 2^22 rows the main+perm rolls
    were ~2.2 GB of pure copy - the round-5 OOM lever); instead the scan
    runs in REVERSE carrying each chunk's first `next_step` rows, so chunk i
    assembles its shifted rows from its own tail plus chunk i+1's head (the
    wraparound head being chunk 0's).  With pad != 0 there is exactly one
    padded chunk and the host passes tiny rolled copies as before."""
    chip = _CHIP_BY_KEY[chip_key]
    name = chip.name

    def impl(chunks, alpha_m, bp, base_w, ext_w, csum):
        carried = ["main", "perm"] + (["prep"] if has_prep else [])

        def eval_chunk(xs, nxt):
            sels = {
                "is_first_row": xs["first"],
                "is_last_row": xs["last"],
                "is_transition": xs["trans"],
                "inv_zeroifier": xs["invz"],
            }
            return _quotient_chunk(
                chip,
                sels,
                xs.get("prep"),
                nxt.get("prep"),
                xs["main"],
                nxt["main"],
                xs["perm"],
                nxt["perm"],
                alpha_m,
                bp,
                base_w,
                ext_w,
                csum,
            )

        if not carry_next:
            def body(_, xs):
                nxt = {k: xs[k + "_next"] for k in carried}
                return None, eval_chunk(xs, nxt)

            _, outs = jax.lax.scan(body, None, chunks)
            return outs.reshape(-1, 4)

        def body(heads, xs):
            nxt = {
                k: jnp.concatenate([xs[k][next_step:], heads[k]], axis=0)
                for k in carried
            }
            new_heads = {k: xs[k][:next_step] for k in carried}
            return new_heads, eval_chunk(xs, nxt)

        init = {k: chunks[k][0, :next_step] for k in carried}
        _, outs = jax.lax.scan(body, init, chunks, reverse=True)
        return outs.reshape(-1, 4)

    from ..utils.aot import jit_aot

    return jit_aot(
        ("quotient", name, n_chunks, next_step, has_prep, carry_next),
        impl,
        # the traced graph runs the captured chip's eval (models/) lowered
        # through the device folder (stark/builder.py)
        deps=("models", "stark.builder"),
    )


def warm_quotient(chip, trace_log_n: int, prep_width) -> None:
    """Compile (without executing) this chip's quotient program."""
    from ..utils.aot import sds

    log_qd = chip.log_quotient_degree
    nq = 1 << (trace_log_n + log_qd)
    next_step = 1 << log_qd
    pad = (-nq) % CHUNK_Q
    n_chunks = (nq + pad) // CHUNK_Q
    flags = constraint_ext_flags(chip)
    kb = sum(1 for ext in flags if not ext)
    ke = sum(1 for ext in flags if ext)
    from .permutation import _interactions

    max_vals = max(len(lk.values) for lk, _ in _interactions(chip))
    carry_next = pad == 0
    chunks = {
        "first": sds((n_chunks, CHUNK_Q)),
        "last": sds((n_chunks, CHUNK_Q)),
        "trans": sds((n_chunks, CHUNK_Q)),
        "invz": sds((n_chunks, CHUNK_Q)),
        "main": sds((n_chunks, CHUNK_Q, chip.width)),
        "perm": sds((n_chunks, CHUNK_Q, chip.permutation_width * 4)),
    }
    if not carry_next:
        chunks["main_next"] = sds((n_chunks, CHUNK_Q, chip.width))
        chunks["perm_next"] = sds((n_chunks, CHUNK_Q, chip.permutation_width * 4))
    if prep_width:
        chunks["prep"] = sds((n_chunks, CHUNK_Q, prep_width))
        if not carry_next:
            chunks["prep_next"] = sds((n_chunks, CHUNK_Q, prep_width))
    _CHIP_BY_KEY[id(chip)] = chip
    _quotient_program(
        id(chip), n_chunks, next_step, bool(prep_width), carry_next
    ).warm(
        chunks,
        sds((4,)),
        sds((max_vals + 1, 4)),
        sds((kb, 4)),
        sds((ke, 4)),
        sds((4,)),
    )


_CHIP_BY_KEY = {}


def quotient_values(
    chip, trace_domain, quotient_domain, prep_on_coset, main_on_coset,
    perm_on_coset, perm_challenges_host, alpha_host, cumulative_sum,
):
    """Chunk-scanned quotient evaluation; one compiled program per
    (chip, chunk-count) - every quotient height <= CHUNK_Q shares one.

    perm_challenges_host / alpha_host: exact host EF4 tuples (transcript
    samples); alpha's K powers and beta's value powers are computed host-side
    and enter the device program as small argument matrices - scalar EF
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

    nq = quotient_domain.size
    next_step = 1 << (quotient_domain.log_n - trace_domain.log_n)
    sels_dev = selectors_on_coset_dev(
        trace_domain.log_n, quotient_domain.log_n, quotient_domain.shift
    )

    pad = (-nq) % CHUNK_Q
    n_chunks = (nq + pad) // CHUNK_Q

    def chunked(x):
        if pad:
            x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        return x.reshape((n_chunks, CHUNK_Q) + x.shape[1:])

    chunks = {
        "first": chunked(sels_dev["is_first_row"]),
        "last": chunked(sels_dev["is_last_row"]),
        "trans": chunked(sels_dev["is_transition"]),
        "invz": chunked(sels_dev["inv_zeroifier"]),
        "main": chunked(main_on_coset),
        "perm": chunked(perm_on_coset),
    }
    carry_next = pad == 0
    if not carry_next:  # single small padded chunk: tiny rolled copies
        chunks["main_next"] = chunked(jnp.roll(main_on_coset, -next_step, axis=0))
        chunks["perm_next"] = chunked(jnp.roll(perm_on_coset, -next_step, axis=0))
    if prep_on_coset is not None:
        chunks["prep"] = chunked(prep_on_coset)
        if not carry_next:
            chunks["prep_next"] = chunked(
                jnp.roll(prep_on_coset, -next_step, axis=0)
            )

    _CHIP_BY_KEY[id(chip)] = chip
    fn = _quotient_program(
        id(chip), n_chunks, next_step, prep_on_coset is not None, carry_next
    )
    qvals = fn(
        chunks,
        xf.to_monty(jnp.asarray(np.array(perm_challenges_host[0], np.uint32))),
        xf.to_monty(jnp.asarray(host_beta_pows(chip, perm_challenges_host[1]))),
        xf.to_monty(jnp.asarray(base_w)),
        xf.to_monty(jnp.asarray(ext_w)),
        jnp.asarray(cumulative_sum),
    )
    return qvals[:nq]


def split_quotient_chunks(quotient_domain: Domain, qvals, n_chunks: int):
    """Split coset evals into per-subdomain chunk matrices (p3 split_evals).

    qvals: (Nq, 4) EF evals natural order.  Chunk k = rows k::n_chunks,
    flattened to 4 base columns, living on split_domains(n_chunks)[k].
    """
    return [qvals[k::n_chunks].reshape(-1, 4) for k in range(n_chunks)]
