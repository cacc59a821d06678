"""Two-adic FRI polynomial commitment scheme (the reference's TwoAdicFriPcs).

commit: evals over (log_n, shift) domains -> coset LDE onto GENERATOR*H_{2n}
(blowup 2), committed in bit-reversed row order under one Merkle MMCS batch
(kb31_poseidon2.rs:27-32 semantics).  Coefficients and natural-order LDEs are
kept in prover data for openings and quotient evaluation.

open: for every (matrix, point): evaluate from coefficients on device; the
transcript observes all opened values, samples the batch-combination alpha,
reduces every (f(x)-y)/(x-z) into per-height accumulators, and runs FRI
(fri.py).  Query proofs bundle input-batch Merkle openings + FRI layer walks.

verify: full host-side replay - transcript, Merkle paths, reduced-opening
reconstruction at each query point, fold chain, final constant.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ext as xe
from ..ops import field as xf
from ..ops import merkle as mk
from ..ops import ntt as nt
from ..ops.field import GENERATOR, P
from . import ef_host as efh
from .challenger import DuplexChallenger
from .domains import Domain
from .errors import InvalidOpeningArgument, OpeningShapeError, VerificationFailure
from .fri import FriProof, fri_prove, fri_verify_transcript

LOG_BLOWUP = 1


@dataclass
class PcsProverData:
    domains: List[Domain]
    ldes: List[jnp.ndarray]  # LDE evals over GENERATOR*H_2n, natural, Monty
    tree: mk.MerkleTree  # commits bit-reversed LDE rows

    # NOTE: neither the original eval matrices nor coefficient matrices are
    # retained: quotient/FRI/query openings read the LDEs, and opened values
    # are evaluated BARYCENTRICALLY from the LDEs (_open_eval_program) - at
    # 2^22 rows the coefficient copies alone were ~3 GB of HBM residency
    # (round-4 capacity lesson: the tunneled chip's free HBM fluctuates
    # with other tenants, so residency is survival, not just speed).

    @property
    def root(self) -> np.ndarray:
        return self.tree.root


# Device-resident argument tables (twiddle blobs, bit-reversal permutations,
# LDE shift powers).  Passing these as jit ARGUMENTS instead of letting the
# tracer embed them keeps multi-MB constants out of the HLO (compile time and
# persistent-cache keys both scale with HLO size).  They are GENERATED on
# device (ops/ntt.py powers_traced et al.) - the host->device link on a
# tunneled TPU is the scarcest resource, and these tables total >100 MB for
# a 2^20-cycle prove.
@lru_cache(maxsize=None)
def _tw_dev(log_n: int, inverse: bool) -> jnp.ndarray:
    return jax.jit(lambda: nt.twiddle_blob_traced(log_n, inverse))()


@lru_cache(maxsize=None)
def _rev_dev(log_n: int) -> jnp.ndarray:
    return jax.jit(lambda: nt.bitrev_traced(log_n))()


@lru_cache(maxsize=None)
def _lde_shift_pows_dev(shift: int, log_n: int) -> jnp.ndarray:
    lde_shift = GENERATOR * pow(shift, P - 2, P) % P
    return jax.jit(lambda: nt.powers_traced(lde_shift, log_n))()


@lru_cache(maxsize=None)
def _lde_points_dev(log_h: int) -> jnp.ndarray:
    """(2^log_h,) MONTY domain points of the LDE coset GENERATOR*H, device."""
    return jax.jit(
        lambda: xf.fmul(
            nt.powers_traced(xf.two_adic_root(log_h), log_h),
            jnp.uint32(xf.monty_of(GENERATOR)),
        )
    )()


def _lde_traced(evals, log_n: int, aux: dict, spkey):
    """intt -> shift-scale -> zero-pad -> ntt: one traced LDE (blowup 2)."""
    n = 1 << log_n
    log_lde = log_n + LOG_BLOWUP
    c = nt.ntt_traced(evals, aux["inv"][log_n], aux["rev"][log_n], log_n, True) if log_n else evals
    sc = xf.fmul(c, aux["sp"][spkey][:, None])
    padded = jnp.pad(sc, ((0, n * ((1 << LOG_BLOWUP) - 1)), (0, 0)))
    lde = nt.ntt_traced(padded, aux["fwd"][log_lde], aux["rev"][log_lde], log_lde, False)
    return c, lde


# The commit is split into one program PER HEIGHT GROUP (all matrices whose
# LDEs share a height: iNTT -> LDE -> whole-level bit-reversed digest
# layer) plus one small tree-walk program over the digest layers.  Round-4
# memory lesson: a single fused program's working set at 2^22 rows (~7 GB
# with the bit-reversed gather temps) exceeded the chip's fast capacity;
# the split bounds each program's peak to ~inputs+outputs while the extra
# dispatches stay asynchronous (no added host round trips).
#
# Round-5 addition: at huge heights (LDE >= 2^ZKBF_BLK_LOG rows, default
# 2^23 - the 2^22-cycle north-star scale) even ONE matrix's fused
# iNTT->LDE transform is too big: the NTT stage ping-pong holds ~3x the
# LDE (a 31-column CPU-chip LDE at 2^23 rows peaked ~4 GB and OOM'd the
# shared chip, BENCH_r04/r05 probes).  Those groups run BLOCKED: one
# program per <=ZKBF_BLK_W-column slice (peak ~5x the block), then a cheap
# concat to the monolithic LDE storage every downstream consumer expects.


def _blk_cfg() -> Tuple[int, int]:
    import os

    return (
        int(os.environ.get("ZKBF_BLK_LOG", "23")),
        int(os.environ.get("ZKBF_BLK_W", "8")),
    )


@lru_cache(maxsize=None)
def _lde_block_program(log_n: int, shift: int, width: int, c0: int, c1: int):
    """One column-block LDE: slices cols [c0, c1) of the (2^log_n, width)
    eval matrix inside the program (static bounds - no host-side copy) and
    returns the (2^(log_n+1), c1-c0) LDE block."""

    def impl(evals, aux):
        block = jax.lax.slice(evals, (0, c0), (evals.shape[0], c1))
        _c, lde = _lde_traced(block, log_n, aux, (shift, log_n))
        return lde

    from ..utils.aot import jit_aot

    return jit_aot(("ldeblk", log_n, shift, width, c0, c1), impl)


@lru_cache(maxsize=None)
def _digest_program(gsig: tuple):
    """Digest layer for one height group from already-computed LDEs."""
    log_lde = gsig[0][0] + LOG_BLOWUP

    def impl(ldes, rev):
        return mk.digest_layer_bitrev_scan(list(ldes), rev)

    from ..utils.aot import jit_aot

    return jit_aot(("digestg", gsig), impl)


def _blocked_spans(width: int, bw: int):
    return [(c0, min(c0 + bw, width)) for c0 in range(0, width, bw)]


@lru_cache(maxsize=None)
def _group_commit_program(gsig: tuple, donate: bool = False):
    """Per-height-group program.  gsig: tuple of (log_n, shift, width), all
    with equal log_n + LOG_BLOWUP.  Returns (ldes..., digest).  With
    `donate`, the eval inputs are donated (caller must not reuse them) so
    their buffers free during execution."""
    log_lde = gsig[0][0] + LOG_BLOWUP

    def impl(mats, aux):
        ldes = []
        for (log_n, shift, _w), e in zip(gsig, mats):
            _c, lde = _lde_traced(e, log_n, aux, (shift, log_n))
            ldes.append(lde)  # the coefficients are a program temp only
        digest = mk.digest_layer_bitrev_scan(ldes, aux["rev"][log_lde])
        return tuple(ldes), digest

    from ..utils.aot import jit_aot

    return jit_aot(
        ("commitg", gsig, donate), impl, donate_leaves=len(gsig) if donate else 0
    )


@lru_cache(maxsize=None)
def _tree_program(heights: tuple):
    """Tree walk over per-height digest layers -> (flat, root).
    heights: per matrix (batch order), for the inject schedule."""
    plan = mk.make_plan(heights)

    def impl(digests_by_height):
        flat = mk.build_tree_traced(plan, digests_by_height)
        return flat, mk.root_of(plan, flat)

    from ..utils.aot import jit_aot

    return plan, jit_aot(("tree", heights), impl)


def _commit_aux(sig: tuple) -> dict:
    """Device argument tables for one commit signature (device-generated)."""
    aux = {"inv": {}, "fwd": {}, "rev": {}, "sp": {}}
    for log_n, shift, _w in sig:
        log_lde = log_n + LOG_BLOWUP
        if log_n:
            aux["inv"][log_n] = _tw_dev(log_n, True)
            aux["rev"].setdefault(log_n, _rev_dev(log_n))
        aux["fwd"][log_lde] = _tw_dev(log_lde, False)
        aux["rev"].setdefault(log_lde, _rev_dev(log_lde))
        aux["sp"][(shift, log_n)] = _lde_shift_pows_dev(shift, log_n)
    return aux


def _group_sigs(sig: tuple):
    """Group (index, matsig) by LDE height, preserving batch order within
    each group (the digest layer hashes same-height rows in batch order)."""
    groups: Dict[int, list] = {}
    for i, ms in enumerate(sig):
        groups.setdefault(ms[0] + LOG_BLOWUP, []).append((i, ms))
    return sorted(groups.items(), key=lambda kv: -kv[0])


def warm_commit(sig: tuple, donate_inputs: bool = False) -> None:
    """Compile (without executing) the commit programs for `sig`."""
    from ..utils.aot import sds

    blk_log, blk_w = _blk_cfg()
    heights = tuple(1 << (ln + LOG_BLOWUP) for ln, _, _ in sig)
    for log_lde, members in _group_sigs(sig):
        gsig = tuple(ms for _i, ms in members)
        if log_lde >= blk_log:
            for log_n, shift, w in gsig:
                for c0, c1 in _blocked_spans(w, blk_w):
                    _lde_block_program(log_n, shift, w, c0, c1).warm(
                        sds((1 << log_n, w)), _commit_aux(((log_n, shift, w),))
                    )
            _digest_program(gsig).warm(
                tuple(sds((1 << log_lde, w)) for _ln, _s, w in gsig),
                _rev_dev(log_lde),
            )
        else:
            mats = tuple(sds((1 << ln, w)) for ln, _s, w in gsig)
            _group_commit_program(gsig, donate_inputs).warm(mats, _commit_aux(gsig))
    _plan, tree_fn = _tree_program(heights)
    tree_fn.warm({1 << ll: sds((1 << ll, 8)) for ll, _m in _group_sigs(sig)})


def pcs_commit(
    domains_and_evals: Sequence[Tuple[Domain, jnp.ndarray]],
    donate_inputs: bool = False,
) -> Tuple[np.ndarray, PcsProverData]:
    """Commit a batch of (2^log_n, W) Monty eval matrices: one program per
    LDE-height group + one tree-walk program (all dispatches asynchronous).

    donate_inputs: the caller will never touch the eval matrices again
    (permutation/quotient rounds) - donate them so HBM frees mid-program."""
    domains = [d for d, _ in domains_and_evals]
    evals = [e for _, e in domains_and_evals]
    for d, e in domains_and_evals:
        assert e.shape[0] == d.size
    sig = tuple(
        (d.log_n, d.shift, int(e.shape[1])) for d, e in domains_and_evals
    )
    heights = tuple(1 << (ln + LOG_BLOWUP) for ln, _, _ in sig)

    blk_log, blk_w = _blk_cfg()
    ldes: list = [None] * len(sig)
    digests: Dict[int, jnp.ndarray] = {}
    for log_lde, members in _group_sigs(sig):
        gsig = tuple(ms for _i, ms in members)
        if log_lde >= blk_log:
            # Blocked path: one dispatch per column block bounds the NTT
            # ping-pong transient to ~5x the block instead of ~3x the LDE.
            for i, (log_n, shift, w) in members:
                aux1 = _commit_aux(((log_n, shift, w),))
                blocks = [
                    _lde_block_program(log_n, shift, w, c0, c1)(evals[i], aux1)
                    for c0, c1 in _blocked_spans(w, blk_w)
                ]
                ldes[i] = (
                    blocks[0]
                    if len(blocks) == 1
                    else jnp.concatenate(blocks, axis=1)
                )
                del blocks
            digests[1 << log_lde] = _digest_program(gsig)(
                tuple(ldes[i] for i, _ms in members), _rev_dev(log_lde)
            )
        else:
            fn = _group_commit_program(gsig, donate_inputs)
            g_ldes, digest = fn(
                tuple(evals[i] for i, _ms in members), _commit_aux(gsig)
            )
            for (i, _ms), l in zip(members, g_ldes):
                ldes[i] = l
            digests[1 << log_lde] = digest

    plan, tree_fn = _tree_program(heights)
    flat, root_dev = tree_fn(digests)
    tree = mk.MerkleTree(
        matrices=list(ldes), plan=plan, flat=flat, root=np.asarray(root_dev),
        bitrev=True,
    )
    data = PcsProverData(
        domains=domains, ldes=list(ldes), tree=tree,
    )
    return tree.root, data


# ---------------------------------------------------------------------------
# Opening-value evaluation (device, barycentric from the LDEs)
# ---------------------------------------------------------------------------


# Exact mod-p sum over axis 0 (power-of-two heights): native split-sum
# reductions (ops/field.fsum_rows) - the former pairwise fadd tree ran at
# 1.5-8 GB/s on TPU vregs, this at ~20 GB/s (round-5 kernel measurement).
_fsum_rows = xf.fsum_rows


# ---------------------------------------------------------------------------
# Reduced openings + FRI proving
# ---------------------------------------------------------------------------


@dataclass
class BatchOpening:
    """Input openings for one round at one query: rows per matrix + path."""

    opened_rows: List[np.ndarray]
    proof: np.ndarray


@dataclass
class PcsProof:
    fri: FriProof
    # query_input_openings[q][round] = BatchOpening
    query_input_openings: List[List[BatchOpening]]


@lru_cache(maxsize=None)
def _open_eval_program(sig: tuple):
    """ONE fused program for every opened-value evaluation in every round,
    evaluated BARYCENTRICALLY from the LDEs (no coefficient matrices exist;
    see PcsProverData).

    For evaluations f(x_i) on the blowup coset g*H (|H| = N', g = GENERATOR):

        f(z) = (z^N' - g^N')/(N' g^N') * sum_i f(x_i) * x_i / (z - x_i)

    The device computes the raw sums S_c = sum_i f_c(x_i) * x_i * inv(x_i-z)
    per (height, point) group (concatenating every member matrix's columns);
    the host multiplies by the scalar factor -(z^N'-g^N')/(N' g^N') (the sign
    folds inv(x_i-z) = -inv(z-x_i)).  The original domain's shift is
    irrelevant - the values live on the GENERATOR coset after the LDE.

    sig: per round, per matrix: (log_n, shift, width, tuple of z-indices).
    Output: tuple of (W_group, 4) canonical RAW SUM arrays in group order.
    """
    groups: Dict[tuple, list] = {}
    for r, mats in enumerate(sig):
        for i, (log_n, _shift, _w, zis) in enumerate(mats):
            log_h = log_n + LOG_BLOWUP
            for pi, zi in enumerate(zis):
                groups.setdefault((log_h, zi), []).append((r, i, pi))
    group_list = list(groups.items())

    def impl(ldes, zs, pts):
        outs = []
        weight_cache = {}
        for (log_h, zi), members in group_list:
            key = (log_h, zi)
            if key not in weight_cache:
                xm = pts[log_h]
                z_dev = xe.from_array(xf.to_monty(zs[zi]))
                xz = xe.esub(
                    xe.from_base(xm),
                    tuple(jnp.broadcast_to(z_dev[t], xm.shape) for t in range(4)),
                )
                # w_i = x_i * inv(x_i - z), EF planes
                weight_cache[key] = xe.emul_base(xe.einv(xz), xm)
            w = weight_cache[key]
            # per-member column sums (concatenating member LDEs materialized
            # a full-height copy of the whole group - GBs at 2^22 rows; the
            # raw sums are (W, 4), so concatenate RESULTS instead)
            accs = [
                tuple(
                    _fsum_rows(xf.fmul(ldes[(r, i)], w[t][:, None]))
                    for t in range(4)
                )
                for r, i, _pi in members
            ]
            acc = (
                accs[0]
                if len(accs) == 1
                else tuple(
                    jnp.concatenate([a[t] for a in accs]) for t in range(4)
                )
            )
            outs.append(xf.from_monty(jnp.stack(acc, axis=-1)))
        return tuple(outs)

    from ..utils.aot import jit_aot

    return group_list, jit_aot(("open_eval_bary", sig), impl)


@lru_cache(maxsize=None)
def _ro_program(sig: tuple):
    """ONE fused program building every per-height reduced opening.

    Alpha-power counters are per (height, point): quotients at DIFFERENT
    points have distinct poles, so their contributions cannot cancel even
    with shared alpha powers; columns at the SAME point always get distinct
    consecutive powers.  Matrices sharing (height, point) are reduced over
    concatenated columns.  Returns (plan, jitted fn); the plan carries the
    static (group -> alpha-power offset) assignment the host needs to
    compute the exact `s` sums.
    """
    groups: Dict[tuple, list] = {}
    for r, mats in enumerate(sig):
        for i, (log_n, _shift, w, zis) in enumerate(mats):
            log_h = log_n + LOG_BLOWUP
            for pi, zi in enumerate(zis):
                groups.setdefault((log_h, zi), []).append((r, i, pi, w))
    counters: Dict[tuple, int] = {}
    plan = []  # (log_h, zi, members, c0, w_total)
    for (log_h, zi), members in groups.items():
        w_total = sum(w for _r, _i, _pi, w in members)
        c0 = counters.get((log_h, zi), 0)
        plan.append((log_h, zi, tuple(members), c0, w_total))
        counters[(log_h, zi)] = c0 + w_total
    heights = sorted({log_h for log_h, _zi, _m, _c, _w in plan})

    def impl(ldes, alpha_pows, s_vals, zs, pts):
        # alpha_pows: (A, 4) canonical; s_vals[g]: (4,) canonical;
        # zs[zi]: (4,) canonical; pts[log_h]: (h,) MONTY domain points.
        ro = {log_h: xe.ezeros((1 << log_h,)) for log_h in heights}
        inv_cache = {}
        for g, (log_h, zi, members, c0, w_total) in enumerate(plan):
            key = (log_h, zi)
            if key not in inv_cache:
                xm = pts[log_h]
                z_dev = xe.from_array(xf.to_monty(zs[zi]))
                xz = xe.esub(
                    xe.from_base(xm),
                    tuple(jnp.broadcast_to(z_dev[t], xm.shape) for t in range(4)),
                )
                inv_cache[key] = xe.einv(xz)
            off = c0
            pairs = []
            for r, i, _pi, w in members:
                pairs.append((ldes[(r, i)], alpha_pows[off : off + w]))
                off += w
            ro[log_h] = _ro_accum_traced(
                ro[log_h], pairs, s_vals[g], inv_cache[key]
            )
        return {log_h: xe.to_array(v) for log_h, v in ro.items()}

    from ..utils.aot import jit_aot

    return plan, jit_aot(("ro", sig), impl)


def _open_sig(rounds, zmap: Dict[tuple, int]) -> tuple:
    sig = []
    for data, points_per_mat in rounds:
        mats = []
        for domain, lde, pts in zip(data.domains, data.ldes, points_per_mat):
            zis = tuple(zmap.setdefault(z, len(zmap)) for z in pts)
            mats.append((domain.log_n, domain.shift, int(lde.shape[1]), zis))
        sig.append(tuple(mats))
    return tuple(sig)


def pcs_open(
    rounds: Sequence[Tuple[PcsProverData, List[List[tuple]]]],
    challenger: DuplexChallenger,
    num_queries: int,
    pow_bits: int,
    free_after_use: Optional[Sequence[bool]] = None,
):
    """Open rounds at EF points.

    rounds: (data, points_per_matrix) where points_per_matrix[i] is the list
    of EF4 host tuples for matrix i.
    free_after_use: retained for API compatibility; since the barycentric
    rewrite no coefficient buffers exist to free (LDEs stay live through the
    query openings).
    Returns (opened_values, PcsProof); opened_values[r][i][p] = list of EF
    tuples per column.
    """
    import logging
    import time as _time

    _log = logging.getLogger("zkbf.pcs")
    _t0 = _time.time()
    from ..utils.transfer import fetch_all

    # 1. Evaluate all openings barycentrically from the LDEs: ONE program.
    zmap: Dict[tuple, int] = {}
    sig = _open_sig(rounds, zmap)
    z_by_index = {zi: z for z, zi in zmap.items()}
    group_list, eval_fn = _open_eval_program(sig)

    lde_args = {
        (r, i): data.ldes[i]
        for r, (data, _pts) in enumerate(rounds)
        for i in range(len(data.ldes))
    }
    pts_args = {
        log_h: _lde_points_dev(log_h) for log_h, _zi in dict(group_list)
    }
    zs_args = {
        zi: jnp.asarray(np.array(z_by_index[zi], np.uint32))
        for _lh, zi in dict(group_list)
    }
    eval_pieces = eval_fn(lde_args, zs_args, pts_args)

    opened_values = [
        [[None] * len(pts) for pts in points_per_mat] for _, points_per_mat in rounds
    ]
    # ONE blocking transfer; host applies the scalar barycentric factor.
    factor_cache: Dict[tuple, tuple] = {}
    for ys_raw, ((log_h, zi), members) in zip(
        fetch_all(list(eval_pieces)), group_list
    ):
        key = (log_h, zi)
        if key not in factor_cache:
            z = z_by_index[zi]
            n_p = 1 << log_h
            g_n = pow(GENERATOR, n_p, P)
            num = efh.add_base(efh.epow(z, n_p), P - g_n)  # z^N' - g^N'
            den_inv = pow(n_p * g_n % P, P - 2, P)
            # sign: device sums used inv(x_i - z) = -inv(z - x_i)
            factor_cache[key] = efh.neg(efh.mul_base(num, den_inv))
        factor = factor_cache[key]
        off = 0
        for r, i, pi in members:
            w = rounds[r][0].ldes[i].shape[1]
            opened_values[r][i][pi] = [
                efh.mul(factor, tuple(int(x) for x in y))
                for y in ys_raw[off : off + w]
            ]
            off += w

    _log.debug("open: eval values in %.3fs", _time.time() - _t0)
    from ..utils import phases as _phases

    _phases.add("open_eval", _time.time() - _t0); _t0 = _time.time()

    # 2. Bind opened values, then sample the combination challenge.
    for round_vals in opened_values:
        for mat_vals in round_vals:
            for pt_vals in mat_vals:
                for y in pt_vals:
                    challenger.observe_slice(list(y))
    alpha = challenger.sample_ext()

    # 3. Build per-height reduced openings: ONE fused program.
    alpha_pows_host = _ef_powers_host(alpha, _total_alpha_budget(rounds))
    ro_plan, ro_fn = _ro_program(sig)

    s_vals = []
    for log_h, zi, members, c0, _w_total in ro_plan:
        s = efh.ZERO
        k = c0
        for r, i, pi, _w in members:
            for y in opened_values[r][i][pi]:
                s = efh.add(s, efh.mul(alpha_pows_host[k], y))
                k += 1
        s_vals.append(np.array(s, np.uint32))
    lde_args = {
        (r, i): data.ldes[i]
        for r, (data, _pts) in enumerate(rounds)
        for i in range(len(data.ldes))
    }
    n_alpha = max(c0 + w for _lh, _zi, _m, c0, w in ro_plan) if ro_plan else 1
    pts_args = {
        log_h: _lde_points_dev(log_h)
        for log_h in sorted({lh for lh, _zi, _m, _c, _w in ro_plan})
    }
    zs_args = {
        zi: jnp.asarray(np.array(z_by_index[zi], np.uint32))
        for _lh, zi, _m, _c, _w in ro_plan
    }
    ro_arrays = ro_fn(
        lde_args,
        jnp.asarray(np.array(alpha_pows_host[:n_alpha], np.uint32)),
        [jnp.asarray(s) for s in s_vals],
        zs_args,
        pts_args,
    )
    ro: Dict[int, tuple] = {log_h: xe.from_array(v) for log_h, v in ro_arrays.items()}
    _log.debug("open: reduced openings in %.3fs", _time.time() - _t0)
    _phases.add("reduced_open", _time.time() - _t0); _t0 = _time.time()

    # 4. FRI.
    fri_proof, indices = fri_prove(ro, challenger, LOG_BLOWUP, num_queries, pow_bits)
    _log.debug("open: fri_prove in %.3fs", _time.time() - _t0); _t0 = _time.time()

    # 5. Input-batch openings at the query indices: ONE gather program for
    # all rounds, then ONE blocking transfer.
    from ..utils.transfer import fetch_all

    log_global = max(ro.keys())
    idx = np.asarray(indices, np.int64)
    opened_many = mk.open_many_device(
        [data.tree for data, _pts in rounds],
        [
            idx >> (log_global - (data.tree.max_height.bit_length() - 1))
            for data, _pts in rounds
        ],
    )
    pieces: List = []
    piece_plan: List[int] = []
    for rows_dev, paths_dev in opened_many:
        pieces.extend(rows_dev)
        pieces.append(paths_dev)
        piece_plan.append(len(rows_dev))
    fetched = fetch_all(pieces)
    per_round: List[Tuple[List[np.ndarray], np.ndarray]] = []
    off = 0
    for n_rows in piece_plan:
        per_round.append((fetched[off : off + n_rows], fetched[off + n_rows]))
        off += n_rows + 1
    query_input_openings = []
    for q in range(num_queries):
        per_q = []
        for rows, paths in per_round:
            per_q.append(
                BatchOpening(
                    opened_rows=[r[q] for r in rows],
                    proof=paths[q],
                )
            )
        query_input_openings.append(per_q)

    _log.debug("open: query openings in %.3fs", _time.time() - _t0)
    _phases.add("query_open", _time.time() - _t0)
    return opened_values, PcsProof(fri=fri_proof, query_input_openings=query_input_openings)


def _total_alpha_budget(rounds) -> int:
    per_height: Dict[int, int] = {}
    for data, points_per_mat in rounds:
        for lde, pts in zip(data.ldes, points_per_mat):
            log_h = lde.shape[0].bit_length() - 1
            per_height[log_h] = per_height.get(log_h, 0) + lde.shape[1] * len(pts)
    return max(per_height.values()) if per_height else 1


def _ef_powers_host(alpha: tuple, n: int) -> List[tuple]:
    out = [efh.ONE]
    for _ in range(n):
        out.append(efh.mul(out[-1], alpha))
    return out


@lru_cache(maxsize=None)
def _lde_points_host(log_h: int) -> np.ndarray:
    return Domain(log_h, GENERATOR).points_host()


def _ro_accum_traced(ro, mats_and_aps, s_canon, inv_xz):
    """ro += (sum_k alpha^k f_k(x) - S) / (x - z), traced inline.

    mats_and_aps: list of (lde (h, w), alpha_pows_canon (w, 4)) member
    matrices sharing the (height, point) group - summed WITHOUT concatenating
    the member LDEs (a full-height group copy is GBs at 2^22 rows).
    ro/inv_xz: EF plane tuples of (h,); s_canon (4,).
    The alpha-weighted column fold is 4 whole-matrix mod-p multiplies plus a
    pairwise tree reduction (constant-size traced graph in the width).
    """
    h = mats_and_aps[0][0].shape[0]
    a = None
    for lde, ap_canon in mats_and_aps:
        ap = xf.to_monty(ap_canon)  # (w, 4)
        part = tuple(_fsum_cols(xf.fmul(lde, ap[None, :, t])) for t in range(4))
        a = part if a is None else xe.eadd(a, part)
    s_dev = xe.from_array(xf.to_monty(s_canon))
    diff = xe.esub(a, tuple(jnp.broadcast_to(s_dev[t], (h,)) for t in range(4)))
    return xe.eadd(ro, xe.emul(diff, inv_xz))


_fsum_cols = xf.fsum_small  # exact mod-p sum over the (small) last axis


# ---------------------------------------------------------------------------
# Verification (host)
# ---------------------------------------------------------------------------


def pcs_verify(
    rounds: Sequence[Tuple[Sequence[int], List[Tuple[Domain, List[Tuple[tuple, List[tuple]]]]]]],
    proof: PcsProof,
    challenger: DuplexChallenger,
    num_queries: int,
    pow_bits: int,
):
    """rounds: (root, [(domain, [(point, ys_per_column), ...]), ...]).

    Raises VerificationFailure on any inconsistency.
    """
    # 1. Replay opened-value observations; alpha.
    for _root, mats in rounds:
        for _domain, pts in mats:
            for _z, ys in pts:
                for y in ys:
                    challenger.observe_slice(list(y))
    alpha = challenger.sample_ext()

    # 2. FRI transcript replay.
    log_global = max(
        domain.log_n + LOG_BLOWUP for _root, mats in rounds for domain, _ in mats
    )
    betas, indices = fri_verify_transcript(
        proof.fri, challenger, log_global, num_queries, pow_bits
    )

    max_alpha = 0
    per_h: Dict[int, int] = {}
    for _root, mats in rounds:
        for domain, pts in mats:
            lh = domain.log_n + LOG_BLOWUP
            for _z, ys in pts:
                per_h[lh] = per_h.get(lh, 0) + len(ys)
    alpha_pows = _ef_powers_host(alpha, max(per_h.values()) if per_h else 1)

    # 3. Per-query checks, vectorized over ALL queries at once (the scalar
    # per-query walk - `mk.verify_batch` + `fri_check_query` - is kept as the
    # semantic reference and differential-test target; 84 scalar walks cost
    # ~7.6 s at 2^18, this costs ~0.1 s).
    if len(proof.query_input_openings) != num_queries or len(
        proof.fri.query_commit_openings
    ) != num_queries:
        raise OpeningShapeError("wrong number of query openings")
    for q in range(num_queries):
        if len(proof.query_input_openings[q]) != len(rounds):
            raise OpeningShapeError("wrong number of round openings")

    idx_arr = np.asarray(indices, dtype=np.int64)
    u64p = np.uint64(P)

    # 3a. Input-batch Merkle proofs: one vectorized walk per round.
    rows_by_round: List[List[np.ndarray]] = []
    for r, (root, mats) in enumerate(rounds):
        log_batch = max(d.log_n for d, _ in mats) + LOG_BLOWUP
        dims = [(1 << (d.log_n + LOG_BLOWUP), len(_first_ys(pts))) for d, pts in mats]
        try:
            rows_mats = [
                np.stack(
                    [
                        np.asarray(
                            proof.query_input_openings[q][r].opened_rows[m],
                            dtype=np.uint64,
                        )
                        for q in range(num_queries)
                    ]
                )
                for m in range(len(mats))
            ]
            paths = np.stack(
                [
                    np.asarray(proof.query_input_openings[q][r].proof, dtype=np.uint64)
                    for q in range(num_queries)
                ]
            )
        except (ValueError, IndexError) as err:
            raise OpeningShapeError(f"malformed input openings: {err}") from err
        for (h, w), rm in zip(dims, rows_mats):
            if rm.shape != (num_queries, w):
                raise OpeningShapeError("opened row width mismatch")
        idx_b = idx_arr >> (log_global - log_batch)
        ok = mk.verify_batch_np(root, dims, idx_b, rows_mats, paths)
        if not ok.all():
            raise InvalidOpeningArgument(
                f"query {int(np.argmin(ok))}: bad input Merkle proof"
            )
        rows_by_round.append(rows_mats)

    # 3b. Reduced openings per height at every query point, vectorized.
    # Alpha-power counters per (height, point), matching the prover.
    ro_val: Dict[int, np.ndarray] = {}
    counters: Dict[tuple, int] = {}
    inv_xz_cache: Dict[tuple, np.ndarray] = {}
    x_cache: Dict[int, np.ndarray] = {}
    alpha_pows_arr = np.asarray(alpha_pows, dtype=np.uint64)  # (A+1, 4)
    for (root, mats), rows in zip(rounds, rows_by_round):
        for (domain, pts), row in zip(mats, rows):
            log_h = domain.log_n + LOG_BLOWUP
            if log_h not in x_cache:
                idx_h = idx_arr >> (log_global - log_h)
                x_cache[log_h] = np.asarray(
                    _lde_points_host(log_h), dtype=np.uint64
                )[nt.bit_reversal_perm(log_h)[idx_h]]
            x = x_cache[log_h]  # (Q,)
            ro_val.setdefault(log_h, np.zeros((num_queries, 4), dtype=np.uint64))
            row64 = row % u64p  # (Q, W)
            for z, ys in pts:
                c0 = counters.get((log_h, z), 0)
                if len(ys) == 0:
                    continue
                ck = (log_h, z)
                if ck not in inv_xz_cache:
                    # inv(x - z) per query
                    xz = np.broadcast_to(
                        (u64p - np.asarray(z, dtype=np.uint64) % u64p) % u64p,
                        (num_queries, 4),
                    ).copy()
                    xz[:, 0] = (xz[:, 0] + x) % u64p
                    inv_xz_cache[ck] = efh.v_inv(xz)
                inv_xz = inv_xz_cache[ck]
                if len(ys) != row64.shape[1]:
                    raise OpeningShapeError("opened value count mismatch")
                ys_arr = np.asarray(ys, dtype=np.uint64) % u64p  # (W, 4)
                diff = np.broadcast_to(
                    (u64p - ys_arr) % u64p, (num_queries,) + ys_arr.shape
                ).copy()  # (Q, W, 4)
                diff[:, :, 0] = (diff[:, :, 0] + row64) % u64p
                ap = alpha_pows_arr[c0 : c0 + len(ys)]  # (W, 4)
                prod = efh.v_mul(ap[None, :, :], diff)  # (Q, W, 4)
                acc = prod.sum(axis=1, dtype=np.uint64) % u64p  # (Q, 4)
                ro_val[log_h] = (ro_val[log_h] + efh.v_mul(acc, inv_xz)) % u64p
                counters[(log_h, z)] = c0 + len(ys)

    # 3c. FRI fold chains, vectorized.
    from .fri import fri_check_queries_np

    fri_check_queries_np(proof.fri, indices, betas, log_global, LOG_BLOWUP, ro_val)


def _first_ys(pts):
    return pts[0][1] if pts else []
