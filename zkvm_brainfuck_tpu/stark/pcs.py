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
    # LDE evals over GENERATOR*H_2n, natural, Monty - or None in LOW-MEMORY
    # mode, where only the (half-size) source-domain eval matrices are kept
    # and LDEs are recomputed blocked on demand (quotient phase, query-time
    # tree rebuild).  The reduced openings are then built per source domain
    # via the exact-quotient identity q = (g - g(z)) * inv(x - z) followed
    # by a 4-column LDE - bit-identical values to the direct LDE-domain
    # evaluation, at roughly half the resident bytes.
    ldes: Optional[List]
    tree: mk.MerkleTree  # commits bit-reversed LDE rows
    evals: Optional[List] = None  # kept ONLY in low-memory mode (Monty)
    sig: Optional[tuple] = None  # per matrix (log_n, shift, width)

    # NOTE: in the normal mode neither the original eval matrices nor
    # coefficient matrices are retained: quotient/FRI/query openings read
    # the LDEs, and opened values are evaluated BARYCENTRICALLY
    # (_open_eval_group_program) - at 2^22 rows the coefficient copies alone
    # were ~3 GB of HBM residency (round-4 capacity lesson: the tunneled
    # chip's free HBM fluctuates with other tenants, so residency is
    # survival, not just speed).

    @property
    def lowmem(self) -> bool:
        return self.ldes is None

    @property
    def root(self) -> np.ndarray:
        return self.tree.root

    def lde_blocks(self, i: int) -> List[jnp.ndarray]:
        """Column-blocked LDE of matrix i (recomputed in low-memory mode)."""
        if not self.lowmem:
            return [self.ldes[i]]
        log_n, shift, w = self.sig[i]
        aux1 = _commit_aux(((log_n, shift, w),))
        return [
            _lde_block_program(log_n, shift, w, c0, c1)(self.evals[i], aux1)
            for c0, c1 in _lde_spans(log_n, w)
        ]


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
def _domain_points_dev(log_m: int, shift: int) -> jnp.ndarray:
    """(2^log_m,) MONTY domain points of the coset shift*H, device."""
    return jax.jit(
        lambda: xf.fmul(
            nt.powers_traced(xf.two_adic_root(log_m), log_m),
            jnp.uint32(xf.monty_of(shift)),
        )
    )()


def _lde_points_dev(log_h: int) -> jnp.ndarray:
    """(2^log_h,) MONTY domain points of the LDE coset GENERATOR*H, device."""
    return _domain_points_dev(log_h, GENERATOR)


def _ntt_dispatch(x, tw, rev, log_n: int, inverse: bool):
    """Local stage-loop NTT - or, when a device mesh is active, the
    EXPLICIT-collective 4-step distributed NTT (3 all_to_alls).

    Wire-or-retire decision (VERDICT r4 item 4), measured in
    tools/ntt_dist_audit.py on the 8-device CPU mesh at 2^16 x 16: GSPMD
    propagation of the stage loop inserts 675 collectives (445
    collective-permutes - one per butterfly stage boundary); the explicit
    4-step NTT needs 30 all_to_alls and ran 2.2x faster even on contended
    virtual devices -> the mesh path now defaults to the explicit kernel
    (bit-exact; tests/test_sharded.py).  ZKBF_GSPMD_NTT=1 reverts."""
    import os

    from ..parallel.mesh import current_mesh

    mesh = current_mesh()
    n = 1 << log_n
    if (
        mesh is not None
        and os.environ.get("ZKBF_GSPMD_NTT") != "1"
        and n >= mesh.devices.size ** 2
        and n % mesh.devices.size == 0
    ):
        from ..parallel.sharded import sharded_ntt

        orig = x.shape
        out = sharded_ntt(mesh, x.reshape(n, -1), inverse=inverse)
        return out.reshape(orig)
    return nt.ntt_traced(x, tw, rev, log_n, inverse)


def _lde_traced(evals, log_n: int, aux: dict, spkey):
    """intt -> shift-scale -> zero-pad -> ntt: one traced LDE (blowup 2)."""
    n = 1 << log_n
    log_lde = log_n + LOG_BLOWUP
    c = _ntt_dispatch(evals, aux["inv"][log_n], aux["rev"][log_n], log_n, True) if log_n else evals
    sc = xf.fmul(c, aux["sp"][spkey][:, None])
    padded = jnp.pad(sc, ((0, n * ((1 << LOG_BLOWUP) - 1)), (0, 0)))
    lde = _ntt_dispatch(padded, aux["fwd"][log_lde], aux["rev"][log_lde], log_lde, False)
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
def _digest_program(log_lde: int, widths: tuple):
    """Digest layer for one height group from already-computed LDE pieces
    (monolithic matrices or column blocks - the sponge flattens columns in
    order either way)."""

    def impl(ldes, rev):
        return mk.digest_layer_bitrev_scan(list(ldes), rev)

    from ..utils.aot import jit_aot

    return jit_aot(("digestg", log_lde, widths), impl)


def _blocked_spans(width: int, bw: int):
    return [(c0, min(c0 + bw, width)) for c0 in range(0, width, bw)]


def _lde_spans(log_n: int, width: int):
    """Column spans for one matrix's LDE programs: narrow blocks at heights
    where the NTT ping-pong would blow the budget, one full-width span
    otherwise."""
    blk_log, blk_w = _blk_cfg()
    if log_n + LOG_BLOWUP >= blk_log:
        return _blocked_spans(width, blk_w)
    return [(0, width)]


def _lowmem_for(sig: tuple) -> bool:
    """LOW-MEMORY commit mode: keep evals, drop LDEs + tree flats.

    ZKBF_LOWMEM=1 forces it on (tests), =0 off; default engages when the
    batch's tallest LDE reaches 2^ZKBF_LOWMEM_LOG rows (default 2^23 - the
    2^22-cycle scale where all-rounds-live LDE residency exceeds the shared
    chip's fluctuating free HBM; see BASELINE.md round-5 capacity notes)."""
    import os

    env = os.environ.get("ZKBF_LOWMEM", "")
    if env == "1":
        return True
    if env == "0":
        return False
    thr = int(os.environ.get("ZKBF_LOWMEM_LOG", "23"))
    return max(ln + LOG_BLOWUP for ln, _s, _w in sig) >= thr


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

    lowmem = _lowmem_for(sig)
    blk_log, blk_w = _blk_cfg()
    heights = tuple(1 << (ln + LOG_BLOWUP) for ln, _, _ in sig)
    for log_lde, members in _group_sigs(sig):
        gsig = tuple(ms for _i, ms in members)
        if lowmem or log_lde >= blk_log:
            widths = []
            for log_n, shift, w in gsig:
                for c0, c1 in _lde_spans(log_n, w):
                    _lde_block_program(log_n, shift, w, c0, c1).warm(
                        sds((1 << log_n, w)), _commit_aux(((log_n, shift, w),))
                    )
                    widths.append(c1 - c0)
            _digest_program(log_lde, tuple(widths)).warm(
                tuple(sds((1 << log_lde, w)) for w in widths),
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

    lowmem = _lowmem_for(sig)
    blk_log, blk_w = _blk_cfg()
    ldes: list = [None] * len(sig)
    lde_block_lists: Dict[int, list] = {}
    digests: Dict[int, jnp.ndarray] = {}
    for log_lde, members in _group_sigs(sig):
        gsig = tuple(ms for _i, ms in members)
        if lowmem or log_lde >= blk_log:
            # Blocked path: one dispatch per column block bounds the NTT
            # ping-pong transient to ~5x the block instead of ~3x the LDE.
            group_blocks = []
            for i, (log_n, shift, w) in members:
                aux1 = _commit_aux(((log_n, shift, w),))
                blocks = [
                    _lde_block_program(log_n, shift, w, c0, c1)(evals[i], aux1)
                    for c0, c1 in _lde_spans(log_n, w)
                ]
                lde_block_lists[i] = blocks
                group_blocks.extend(blocks)
                if not lowmem:
                    ldes[i] = (
                        blocks[0]
                        if len(blocks) == 1
                        else jnp.concatenate(blocks, axis=1)
                    )
            digests[1 << log_lde] = _digest_program(
                log_lde, tuple(int(b.shape[1]) for b in group_blocks)
            )(tuple(group_blocks), _rev_dev(log_lde))
            # low-memory: the block LDEs die once the digest layer is
            # computed (the dispatches above are async; freeing is by
            # refcount, so drop every reference now)
            del group_blocks
            if lowmem:
                lde_block_lists.clear()
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
    if lowmem:
        # Keep only the root + plan: the flat level buffer and LDEs are
        # rebuilt at query time, one round at a time (pcs_open step 5).
        tree = mk.MerkleTree(
            matrices=None, plan=plan, flat=None, root=np.asarray(root_dev),
            bitrev=True,
        )
        return tree.root, PcsProverData(
            domains=domains, ldes=None, tree=tree, evals=list(evals), sig=sig
        )
    tree = mk.MerkleTree(
        matrices=list(ldes), plan=plan, flat=flat, root=np.asarray(root_dev),
        bitrev=True,
    )
    data = PcsProverData(
        domains=domains, ldes=list(ldes), tree=tree, sig=sig,
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


def _open_groups(sig: tuple):
    groups: Dict[tuple, list] = {}
    for r, mats in enumerate(sig):
        for i, (log_n, _shift, _w, zis) in enumerate(mats):
            log_h = log_n + LOG_BLOWUP
            for pi, zi in enumerate(zis):
                groups.setdefault((log_h, zi), []).append((r, i, pi))
    return list(groups.items())


@lru_cache(maxsize=None)
def _open_eval_group_program(domain_key: tuple, widths: tuple):
    """Opened-value raw sums for ONE (evaluation domain, point) unit,
    evaluated BARYCENTRICALLY from resident evaluations - the LDEs in normal
    mode, the source-domain eval matrices in low-memory mode (the formula
    only depends on the points `pts` actually passed; `domain_key` =
    (log_m, shift) keys the compiled program).

    For evaluations f(x_i) on the blowup coset g*H (|H| = N', g = GENERATOR):

        f(z) = (z^N' - g^N')/(N' g^N') * sum_i f(x_i) * x_i / (z - x_i)

    The device computes the raw sums S_c = sum_i f_c(x_i) * x_i * inv(x_i-z)
    per member matrix; the host multiplies by the scalar factor
    -(z^N'-g^N')/(N' g^N') (the sign folds inv(x_i-z) = -inv(z-x_i)).  The
    original domain's shift is irrelevant - the values live on the GENERATOR
    coset after the LDE.

    ONE PROGRAM PER GROUP (round-5 lesson: the previous all-groups fused
    program's HLO at 2^22-row signatures crashed the tunnel's remote-compile
    helper; group programs are small, reusable across rounds, and the extra
    dispatches are ~0.1 ms each).

    Output: (sum(widths), 4) canonical RAW SUM array.
    """

    def impl(mats, z, pts):
        z_dev = xe.from_array(xf.to_monty(z))
        xz = xe.esub(
            xe.from_base(pts),
            tuple(jnp.broadcast_to(z_dev[t], pts.shape) for t in range(4)),
        )
        # w_i = x_i * inv(x_i - z), EF planes
        w = xe.emul_base(xe.einv(xz), pts)
        accs = [
            tuple(_fsum_rows(xf.fmul(m, w[t][:, None])) for t in range(4))
            for m in mats
        ]
        acc = (
            accs[0]
            if len(accs) == 1
            else tuple(jnp.concatenate([a[t] for a in accs]) for t in range(4))
        )
        return xf.from_monty(jnp.stack(acc, axis=-1))

    from ..utils.aot import jit_aot

    return jit_aot(("open_evalg", domain_key, widths), impl)


def _ro_plan(sig: tuple):
    """Static reduced-opening plan: (log_h, zi, members, c0, w_total) per
    (height, point) group.

    Alpha-power counters are per (height, point): quotients at DIFFERENT
    points have distinct poles, so their contributions cannot cancel even
    with shared alpha powers; columns at the SAME point always get distinct
    consecutive powers.
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
    return plan


@lru_cache(maxsize=None)
def _ro_group_program(log_h: int, widths: tuple, first: bool):
    """Accumulate ONE (height, point) group into the height's reduced
    opening: ro += (sum_k alpha^k f_k(x) - S) * inv(x - z).  One small
    program per group (see _open_eval_group_program for why); `first` groups
    start from zero instead of taking an input accumulator."""

    def impl(ro_in, mats, aps, s, z, pts):
        z_dev = xe.from_array(xf.to_monty(z))
        xz = xe.esub(
            xe.from_base(pts),
            tuple(jnp.broadcast_to(z_dev[t], pts.shape) for t in range(4)),
        )
        inv_xz = xe.einv(xz)
        ro = xe.ezeros((1 << log_h,)) if first else xe.from_array(ro_in)
        ro = _ro_accum_traced(ro, list(zip(mats, aps)), s, inv_xz)
        return xe.to_array(ro)

    from ..utils.aot import jit_aot

    return jit_aot(("rog", log_h, widths, first), impl)


@lru_cache(maxsize=None)
def _ro_src_group_program(log_n: int, shift: int, widths: tuple, first: bool):
    """LOW-MEMORY reduced-opening accumulation from SOURCE-domain evals.

    For members living on shift*H_{2^log_n}, the group's contribution to the
    LDE-domain reduced opening is the polynomial

        q(X) = (g(X) - g(z)) / (X - z),   g = sum_k alpha^{c0+k} f_k,

    whose source-domain values are (g(x) - S) * inv(x - z) (exact division:
    S = g(z)); ONE 4-column coset LDE carries them to GENERATOR*H_{2^(n+1)},
    bit-identical to evaluating sum alpha^k (f_k(x)-y_k)/(x-z) directly on
    the (twice as large, no longer resident) LDEs."""

    def impl(ro_in, mats, aps, s, z, pts, aux):
        z_dev = xe.from_array(xf.to_monty(z))
        xz = xe.esub(
            xe.from_base(pts),
            tuple(jnp.broadcast_to(z_dev[t], pts.shape) for t in range(4)),
        )
        inv_xz = xe.einv(xz)
        q = _ro_accum_traced(
            xe.ezeros((1 << log_n,)), list(zip(mats, aps)), s, inv_xz
        )
        _c, q_lde = _lde_traced(xe.to_array(q), log_n, aux, (shift, log_n))
        contrib = xe.from_array(q_lde)
        if first:
            return xe.to_array(contrib)
        return xe.to_array(xe.eadd(xe.from_array(ro_in), contrib))

    from ..utils.aot import jit_aot

    return jit_aot(("rosrc", log_n, shift, widths, first), impl)


def _open_sig(rounds, zmap: Dict[tuple, int]) -> tuple:
    sig = []
    for data, points_per_mat in rounds:
        mats = []
        for (log_n, shift, w), pts in zip(data.sig, points_per_mat):
            zis = tuple(zmap.setdefault(z, len(zmap)) for z in pts)
            mats.append((log_n, shift, w, zis))
        sig.append(tuple(mats))
    return tuple(sig)


def _bary_factor(log_m: int, shift: int, z: tuple) -> tuple:
    """-(z^M - s^M) / (M * s^M): the host scalar completing the barycentric
    raw sums on the coset shift*H_M (the sign folds inv(x-z) = -inv(z-x))."""
    m = 1 << log_m
    s_m = pow(shift, m, P)
    num = efh.add_base(efh.epow(z, m), P - s_m)  # z^M - s^M
    den_inv = pow(m * s_m % P, P - 2, P)
    return efh.neg(efh.mul_base(num, den_inv))


def pcs_open(
    rounds: Sequence[Tuple[PcsProverData, List[List[tuple]]]],
    challenger: DuplexChallenger,
    num_queries: int,
    pow_bits: int,
):
    """Open rounds at EF points.

    rounds: (data, points_per_matrix) where points_per_matrix[i] is the list
    of EF4 host tuples for matrix i.  Low-memory rounds (data.lowmem)
    evaluate openings/reduced openings from their source-domain eval
    matrices and rebuild LDEs+trees per round at query time.
    Returns (opened_values, PcsProof); opened_values[r][i][p] = list of EF
    tuples per column.
    """
    import logging
    import time as _time

    _log = logging.getLogger("zkbf.pcs")
    _t0 = _time.time()
    from ..utils.transfer import fetch_all

    # 1. Evaluate all openings barycentrically: one small program per
    # evaluation unit, dispatched asynchronously.  Normal rounds read the
    # resident LDEs per (LDE height, point) group; low-memory rounds read
    # the (half-size) source evals per (source domain, point).
    zmap: Dict[tuple, int] = {}
    sig = _open_sig(rounds, zmap)
    z_by_index = {zi: z for z, zi in zmap.items()}
    group_list = _open_groups(sig)

    zs_args = {
        zi: jnp.asarray(np.array(z_by_index[zi], np.uint32))
        for _lh, zi in dict(group_list)
    }
    # units: (domain_log, domain_shift, zi, members) - members keep their
    # (r, i, pi) identity for value assembly.
    units = []
    for (log_h, zi), members in group_list:
        normal = [(r, i, pi) for r, i, pi in members if not rounds[r][0].lowmem]
        if normal:
            units.append((log_h, GENERATOR, zi, tuple(normal), False))
        by_dom: Dict[tuple, list] = {}
        for r, i, pi in members:
            if rounds[r][0].lowmem:
                log_n, shift, _w = rounds[r][0].sig[i]
                by_dom.setdefault((log_n, shift), []).append((r, i, pi))
        for (log_n, shift), ms in sorted(by_dom.items()):
            units.append((log_n, shift, zi, tuple(ms), True))

    eval_pieces = []
    for log_m, shift, zi, members, lowmem in units:
        mats = tuple(
            rounds[r][0].evals[i] if lowmem else rounds[r][0].ldes[i]
            for r, i, _pi in members
        )
        widths = tuple(int(m.shape[1]) for m in mats)
        eval_pieces.append(
            _open_eval_group_program((log_m, shift), widths)(
                mats, zs_args[zi], _domain_points_dev(log_m, shift)
            )
        )

    opened_values = [
        [[None] * len(pts) for pts in points_per_mat] for _, points_per_mat in rounds
    ]
    # ONE blocking transfer; host applies the scalar barycentric factor.
    factor_cache: Dict[tuple, tuple] = {}
    for ys_raw, (log_m, shift, zi, members, _lm) in zip(
        fetch_all(list(eval_pieces)), units
    ):
        key = (log_m, shift, zi)
        if key not in factor_cache:
            factor_cache[key] = _bary_factor(log_m, shift, z_by_index[zi])
        factor = factor_cache[key]
        off = 0
        for r, i, pi in members:
            w = rounds[r][0].sig[i][2]
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

    # 3. Build per-height reduced openings: one small program per
    # (height, point) group, chained per height.
    alpha_pows_host = _ef_powers_host(alpha, _total_alpha_budget(rounds))
    ro_plan = _ro_plan(sig)

    ro_arrays: Dict[int, jnp.ndarray] = {}
    _dummy = jnp.zeros((1, 4), jnp.uint32)
    for log_h, zi, members, c0, _w_total in ro_plan:
        # split the group into per-evaluation-domain sub-units, each with its
        # members' own alpha-power slices and partial sum S (exact division
        # holds per sub-unit: S_sub = g_sub(z)).
        sub_units: Dict[tuple, list] = {}
        off = c0
        for r, i, pi, w in members:
            if rounds[r][0].lowmem:
                log_n, shift, _w2 = rounds[r][0].sig[i]
                key = ("src", log_n, shift)
            else:
                key = ("lde",)
            sub_units.setdefault(key, []).append((r, i, pi, w, off))
            off += w
        for key, ms in sorted(sub_units.items()):
            s = efh.ZERO
            for r, i, pi, w, m_off in ms:
                k = m_off
                for y in opened_values[r][i][pi]:
                    s = efh.add(s, efh.mul(alpha_pows_host[k], y))
                    k += 1
            aps = tuple(
                jnp.asarray(
                    np.array(alpha_pows_host[m_off : m_off + w], np.uint32)
                )
                for _r, _i, _pi, w, m_off in ms
            )
            widths = tuple(w for _r, _i, _pi, w, _o in ms)
            s_arg = jnp.asarray(np.array(s, np.uint32))
            first = log_h not in ro_arrays
            ro_in = ro_arrays.get(log_h, _dummy)
            if key[0] == "lde":
                mats = tuple(rounds[r][0].ldes[i] for r, i, _pi, _w, _o in ms)
                ro_arrays[log_h] = _ro_group_program(log_h, widths, first)(
                    ro_in, mats, aps, s_arg, zs_args[zi], _lde_points_dev(log_h)
                )
            else:
                _tag, log_n, shift = key
                mats = tuple(rounds[r][0].evals[i] for r, i, _pi, _w, _o in ms)
                ro_arrays[log_h] = _ro_src_group_program(
                    log_n, shift, widths, first
                )(
                    ro_in,
                    mats,
                    aps,
                    s_arg,
                    zs_args[zi],
                    _domain_points_dev(log_n, shift),
                    _commit_aux(((log_n, shift, 4),)),
                )
    ro: Dict[int, tuple] = {log_h: xe.from_array(v) for log_h, v in ro_arrays.items()}
    _log.debug("open: reduced openings in %.3fs", _time.time() - _t0)
    _phases.add("reduced_open", _time.time() - _t0); _t0 = _time.time()

    # 4. FRI.
    fri_proof, indices = fri_prove(ro, challenger, LOG_BLOWUP, num_queries, pow_bits)
    _log.debug("open: fri_prove in %.3fs", _time.time() - _t0); _t0 = _time.time()

    # 5. Input-batch openings at the query indices.  Normal rounds: ONE
    # gather program + ONE blocking transfer.  Low-memory rounds: rebuild
    # the round's LDE blocks + digest layers + tree flat (same deterministic
    # programs as the commit - the recomputed root is asserted against the
    # committed one), gather, fetch, and FREE before the next round, so at
    # most one round's LDEs are ever resident.
    from ..utils.transfer import fetch_all

    log_global = max(ro.keys())
    idx = np.asarray(indices, np.int64)
    per_round: List[Optional[Tuple[List[np.ndarray], np.ndarray]]] = [None] * len(
        rounds
    )

    normal_ids = [r for r, (d, _p) in enumerate(rounds) if not d.lowmem]
    if normal_ids:
        opened_many = mk.open_many_device(
            [rounds[r][0].tree for r in normal_ids],
            [
                idx
                >> (
                    log_global
                    - (rounds[r][0].tree.max_height.bit_length() - 1)
                )
                for r in normal_ids
            ],
        )
        pieces: List = []
        piece_plan: List[int] = []
        for rows_dev, paths_dev in opened_many:
            pieces.extend(rows_dev)
            pieces.append(paths_dev)
            piece_plan.append(len(rows_dev))
        fetched = fetch_all(pieces)
        off = 0
        for r, n_rows in zip(normal_ids, piece_plan):
            per_round[r] = (fetched[off : off + n_rows], fetched[off + n_rows])
            off += n_rows + 1

    for r, (data, _pts) in enumerate(rounds):
        if not data.lowmem:
            continue
        per_round[r] = _lowmem_round_openings(data, idx, log_global)

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


def _lowmem_round_openings(
    data: PcsProverData, idx: np.ndarray, log_global: int
):
    """Rebuild one LOW-MEMORY round's commitment and gather its query rows +
    sibling paths.  Returns (rows per matrix (Q, W_i), paths (Q, L, 8))."""
    from ..utils.transfer import fetch_all

    sig = data.sig
    heights = tuple(1 << (ln + LOG_BLOWUP) for ln, _s, _w in sig)
    block_lists: Dict[int, list] = {}
    digests: Dict[int, jnp.ndarray] = {}
    for log_lde, members in _group_sigs(sig):
        group_blocks = []
        for i, (log_n, shift, w) in members:
            aux1 = _commit_aux(((log_n, shift, w),))
            blocks = [
                _lde_block_program(log_n, shift, w, c0, c1)(data.evals[i], aux1)
                for c0, c1 in _lde_spans(log_n, w)
            ]
            block_lists[i] = blocks
            group_blocks.extend(blocks)
        digests[1 << log_lde] = _digest_program(
            log_lde, tuple(int(b.shape[1]) for b in group_blocks)
        )(tuple(group_blocks), _rev_dev(log_lde))
        del group_blocks
    plan, tree_fn = _tree_program(heights)
    flat, root_dev = tree_fn(digests)
    del digests

    # transient tree whose "matrices" are ALL blocks in matrix order (block
    # heights equal their matrix's, so per-block row indices are identical)
    all_blocks = []
    n_blocks = []
    for i in range(len(sig)):
        all_blocks.extend(block_lists[i])
        n_blocks.append(len(block_lists[i]))
    tree = mk.MerkleTree(
        matrices=all_blocks, plan=plan, flat=flat, root=None, bitrev=True
    )
    rows_dev, paths_dev = mk.open_many_device(
        [tree], [idx >> (log_global - plan.log_max)]
    )[0]
    fetched = fetch_all(list(rows_dev) + [paths_dev, root_dev])
    block_rows, paths, root = fetched[:-2], fetched[-2], fetched[-1]
    assert [int(x) for x in root] == [int(x) for x in data.tree.root], (
        "low-memory rebuild produced a different Merkle root"
    )
    rows: List[np.ndarray] = []
    off = 0
    for nb in n_blocks:
        rows.append(
            block_rows[off]
            if nb == 1
            else np.concatenate(block_rows[off : off + nb], axis=1)
        )
        off += nb
    return rows, paths


def _total_alpha_budget(rounds) -> int:
    per_height: Dict[int, int] = {}
    for data, points_per_mat in rounds:
        for (log_n, _s, w), pts in zip(data.sig, points_per_mat):
            log_h = log_n + LOG_BLOWUP
            per_height[log_h] = per_height.get(log_h, 0) + w * len(pts)
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
