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


def _blk_col(blocks, widths, i):
    """Column i of a column-blocked matrix (list of (C, w_b) blocks)."""
    off = 0
    for b, w in zip(blocks, widths):
        if i < off + w:
            return b[:, i - off]
        off += w
    raise IndexError(i)


def _quotient_chunk(
    chip: Chip,
    sels,  # dict of (C,) Monty selector chunks
    prep,  # list of (C, w_b) blocks / None
    prep_next,
    main,  # list of (C, w_b) blocks
    main_next,
    perm,  # list of (C, w_b) blocks (PWperm*4 total)
    perm_next,
    alpha_m,  # (4,) Monty LogUp alpha challenge
    bp,  # (max_vals+1, 4) Monty beta powers
    base_w,  # (Kb, 4) Monty alpha powers for base constraints
    ext_w,  # (Ke, 4) Monty alpha powers for ext constraints
    cumulative_sum,  # (4,) Monty EF
):
    """(C, 4) Monty EF4 quotient evals for one row chunk."""
    c_rows = main[0].shape[0]
    be = JnpBackend
    mw = [b.shape[1] for b in main]
    pw = [b.shape[1] for b in perm]
    perm_w = sum(pw) // 4

    def perm_planes(i):
        return tuple(_blk_col(perm, pw, 4 * i + k) for k in range(4))

    def perm_planes_next(i):
        return tuple(_blk_col(perm_next, pw, 4 * i + k) for k in range(4))

    prw = [b.shape[1] for b in prep] if prep is not None else []

    collected = []
    b = NumericBuilder(
        backend=be,
        main_local=lambda i: V(be, _blk_col(main, mw, i)),
        main_next=lambda i: V(be, _blk_col(main_next, mw, i)),
        prep_local=(lambda i: V(be, _blk_col(prep, prw, i)))
        if prep is not None
        else None,
        prep_next=(lambda i: V(be, _blk_col(prep_next, prw, i)))
        if prep_next is not None
        else None,
        is_first_row=V(be, sels["is_first_row"]),
        is_last_row=V(be, sels["is_last_row"]),
        is_transition=V(be, sels["is_transition"]),
        on_constraint=lambda v: collected.append((v.p, v.ext)),
        perm_local=[V(be, perm_planes(i), True) for i in range(perm_w)],
        perm_next=[V(be, perm_planes_next(i), True) for i in range(perm_w)],
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
    chip_key,
    n_chunks: int,
    next_step: int,
    has_prep: bool,
    carry_next: bool,
    blk_sig: tuple = (),
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
        def blocks_of(xs, prefix):
            out = []
            j = 0
            while f"{prefix}{j}" in xs:
                out.append(xs[f"{prefix}{j}"])
                j += 1
            return out or None

        carried = [
            k
            for k in sorted(chunks)
            if any(k.startswith(p) for p in ("main", "perm", "prep"))
            and not k.endswith("_next")
        ]

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
                blocks_of(xs, "prep"),
                blocks_of(nxt, "prep"),
                blocks_of(xs, "main"),
                blocks_of(nxt, "main"),
                blocks_of(xs, "perm"),
                blocks_of(nxt, "perm"),
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
        ("quotient", name, n_chunks, next_step, has_prep, carry_next, blk_sig),
        impl,
        # the traced graph runs the captured chip's eval (models/) lowered
        # through the device folder (stark/builder.py)
        deps=("models", "stark.builder"),
    )


def quotient_block_widths(chip, trace_log_n: int, prep_width):
    """The column-block widths the prover will pass for (chip, height):
    single full-width blocks normally; ZKBF_BLK_W-col blocks at low-memory
    heights (mirrors stark/pcs._blk_cfg on the LDE height)."""
    from .pcs import LOG_BLOWUP, _blk_cfg, _blocked_spans

    blk_log, blk_w = _blk_cfg()
    widths = {
        "main": chip.width,
        "perm": chip.permutation_width * 4,
        "prep": prep_width or 0,
    }
    out = {}
    for k, w in widths.items():
        if not w:
            out[k] = ()
        elif trace_log_n + LOG_BLOWUP >= blk_log:
            out[k] = tuple(c1 - c0 for c0, c1 in _blocked_spans(w, blk_w))
        else:
            out[k] = (w,)
    return out


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
    }
    bw = quotient_block_widths(chip, trace_log_n, prep_width)
    for prefix in ("main", "perm", "prep"):
        for j, w in enumerate(bw[prefix]):
            chunks[f"{prefix}{j}"] = sds((n_chunks, CHUNK_Q, w))
            if not carry_next:
                chunks[f"{prefix}{j}_next"] = sds((n_chunks, CHUNK_Q, w))
    blk_sig = (bw["main"], bw["perm"], bw["prep"])
    _CHIP_BY_KEY[id(chip)] = chip
    _quotient_program(
        id(chip), n_chunks, next_step, bool(prep_width), carry_next, blk_sig
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

    prep/main/perm_on_coset: (Nq, W) matrices OR lists of column blocks
    (the low-memory path recomputes LDEs blocked and never concatenates).

    perm_challenges_host / alpha_host: exact host EF4 tuples (transcript
    samples); alpha's K powers and beta's value powers are computed host-side
    and enter the device program as small argument matrices - scalar EF
    multiply chains never appear in the traced graph.
    """
    from .permutation import host_beta_pows

    def as_blocks(x):
        if x is None:
            return None
        return list(x) if isinstance(x, (list, tuple)) else [x]

    main_blocks = as_blocks(main_on_coset)
    perm_blocks = as_blocks(perm_on_coset)
    prep_blocks = as_blocks(prep_on_coset)

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
    }
    carry_next = pad == 0
    for prefix, blocks in (
        ("main", main_blocks),
        ("perm", perm_blocks),
        ("prep", prep_blocks),
    ):
        if blocks is None:
            continue
        for j, b in enumerate(blocks):
            chunks[f"{prefix}{j}"] = chunked(b)
            if not carry_next:  # single small padded chunk: tiny rolled copies
                chunks[f"{prefix}{j}_next"] = chunked(
                    jnp.roll(b, -next_step, axis=0)
                )

    blk_sig = tuple(
        tuple(int(b.shape[1]) for b in blocks) if blocks is not None else ()
        for blocks in (main_blocks, perm_blocks, prep_blocks)
    )
    _CHIP_BY_KEY[id(chip)] = chip
    fn = _quotient_program(
        id(chip), n_chunks, next_step, prep_blocks is not None, carry_next, blk_sig
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
