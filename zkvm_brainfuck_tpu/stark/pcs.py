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
from functools import lru_cache, partial
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
from .fri import FriProof, VerificationFailure, fri_check_query, fri_prove, fri_verify_transcript

LOG_BLOWUP = 1


@dataclass
class PcsProverData:
    domains: List[Domain]
    evals: List[jnp.ndarray]  # original evals, natural order, Monty
    coeffs: List[jnp.ndarray]  # coefficient matrices (n, W), Monty
    ldes: List[jnp.ndarray]  # LDE evals over GENERATOR*H_2n, natural, Monty
    tree: mk.MerkleTree  # commits bit-reversed LDE rows

    @property
    def root(self) -> np.ndarray:
        return self.tree.root


def pcs_commit(domains_and_evals: Sequence[Tuple[Domain, jnp.ndarray]]) -> Tuple[np.ndarray, PcsProverData]:
    """Commit a batch. evals: (2^log_n, W) canonical-or-monty? -> Monty expected."""
    domains, coeffs, ldes, committed = [], [], [], []
    for domain, evals in domains_and_evals:
        assert evals.shape[0] == domain.size
        c = nt.intt(evals)
        lde_shift = GENERATOR * pow(domain.shift, P - 2, P) % P
        lde = nt.coset_lde(evals, LOG_BLOWUP, lde_shift)
        domains.append(domain)
        coeffs.append(c)
        ldes.append(lde)
        committed.append(nt.bit_reverse_rows(lde))
    tree = mk.commit(committed)
    data = PcsProverData(
        domains=domains,
        evals=[e for _, e in domains_and_evals],
        coeffs=coeffs,
        ldes=ldes,
        tree=tree,
    )
    return tree.root, data


# ---------------------------------------------------------------------------
# Opening-value evaluation from coefficients (device)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n",))
def _zeta_powers_dev(lo_canon: jnp.ndarray, hi_canon: jnp.ndarray, n: int):
    """One broadcasted EF multiply: powers[a*m + j] = z^{a*m} * z^j."""
    m = lo_canon.shape[0]
    lo = xe.from_array(xf.to_monty(lo_canon))  # (m,) planes: z^0..z^{m-1}
    hi = xe.from_array(xf.to_monty(hi_canon))  # (n//m,) planes: z^{0,m,2m,...}
    prod = xe.emul(
        tuple(h[:, None] for h in hi), tuple(l[None, :] for l in lo)
    )
    return tuple(p.reshape(-1)[:n] for p in prod)


def _zeta_powers(zeta: tuple, n: int):
    """EF4 plane tuple of (n,) Monty powers z^0..z^{n-1}.

    The two sqrt(n)-sized power tables are exact host EF4 arithmetic; the
    device does a single outer-product emul (tiny traced graph, vs the
    associative_scan version whose lowering took tens of seconds to compile).
    """
    m = 1 << ((max(n, 2).bit_length() - 1 + 1) // 2)  # ~sqrt(n), power of two
    m = min(m, n)
    lo = [efh.ONE]
    for _ in range(m - 1):
        lo.append(efh.mul(lo[-1], zeta))
    zm = efh.mul(lo[-1], zeta) if m > 1 else zeta
    n_hi = (n + m - 1) // m
    hi = [efh.ONE]
    for _ in range(n_hi - 1):
        hi.append(efh.mul(hi[-1], zm))
    return _zeta_powers_dev(
        jnp.asarray(np.array(lo, np.uint32)),
        jnp.asarray(np.array(hi, np.uint32)),
        n,
    )


def _fsum_rows(x):
    """Exact mod-p sum over axis 0 by pairwise tree reduction."""
    n = x.shape[0]
    while n > 1:
        if n % 2 == 1:
            x = jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)
            n += 1
        x = xf.fadd(x[0::2], x[1::2])
        n = x.shape[0]
    return x[0]


@jax.jit
def _eval_matrix_at_point_dev(coeffs: jnp.ndarray, zpows) -> jnp.ndarray:
    n, w = coeffs.shape
    chunk = min(n, 1 << 15)
    acc = [jnp.zeros((w,), jnp.uint32) for _ in range(4)]
    for start in range(0, n, chunk):
        cc = coeffs[start : start + chunk]
        for k in range(4):
            t = xf.fmul(cc, zpows[k][start : start + chunk, None])
            acc[k] = xf.fadd(acc[k], _fsum_rows(t))
    return xf.from_monty(jnp.stack(acc, axis=-1))


def eval_matrix_at_point(coeffs: jnp.ndarray, zpows) -> np.ndarray:
    """f_col(z) for all columns: (n, W) x planes (n,) -> (W, 4) canonical host."""
    return np.asarray(_eval_matrix_at_point_dev(coeffs, zpows))


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


def pcs_open(
    rounds: Sequence[Tuple[PcsProverData, List[List[tuple]]]],
    challenger: DuplexChallenger,
    num_queries: int,
    pow_bits: int,
):
    """Open rounds at EF points.

    rounds: (data, points_per_matrix) where points_per_matrix[i] is the list
    of EF4 host tuples for matrix i.
    Returns (opened_values, PcsProof); opened_values[r][i][p] = list of EF
    tuples per column.
    """
    # 1. Evaluate all openings from coefficients.  Matrices sharing
    # (height, shift, point) are evaluated in one fused kernel (concatenated
    # columns) to keep the number of compiled shapes small.
    from ..utils.transfer import fetch_all

    opened_values = [
        [[None] * len(pts) for pts in points_per_mat] for _, points_per_mat in rounds
    ]
    zpow_cache: Dict[Tuple[tuple, int], jnp.ndarray] = {}
    eval_pieces: List[jnp.ndarray] = []
    eval_plan: List[Tuple[int, list]] = []
    for r, (data, points_per_mat) in enumerate(rounds):
        groups: Dict[tuple, list] = {}
        for i, (domain, coeffs, pts) in enumerate(
            zip(data.domains, data.coeffs, points_per_mat)
        ):
            for pi, z in enumerate(pts):
                groups.setdefault((domain.log_n, domain.shift, z), []).append((i, pi))
        for (log_n, shift, z), members in groups.items():
            # intt over a shifted domain yields coefficients of q(shift*y):
            # evaluate the real polynomial q at z via q~(z / shift).
            zs = efh.mul_base(z, pow(shift, P - 2, P))
            n = 1 << log_n
            key = (zs, n)
            if key not in zpow_cache:
                zpow_cache[key] = _zeta_powers(zs, n)
            cat = jnp.concatenate([data.coeffs[i] for i, _ in members], axis=1)
            eval_pieces.append(_eval_matrix_at_point_dev(cat, zpow_cache[key]))
            eval_plan.append((r, members))
    # ONE blocking transfer for every opened value in every round.
    for ys, (r, members) in zip(fetch_all(eval_pieces), eval_plan):
        data = rounds[r][0]
        off = 0
        for i, pi in members:
            w = data.coeffs[i].shape[1]
            opened_values[r][i][pi] = [
                tuple(int(x) for x in y) for y in ys[off : off + w]
            ]
            off += w

    # 2. Bind opened values, then sample the combination challenge.
    for round_vals in opened_values:
        for mat_vals in round_vals:
            for pt_vals in mat_vals:
                for y in pt_vals:
                    challenger.observe_slice(list(y))
    alpha = challenger.sample_ext()

    # 3. Build per-height reduced openings on device.
    max_alpha_pows = 0
    for (data, points_per_mat), round_vals in zip(rounds, opened_values):
        for lde, pts in zip(data.ldes, points_per_mat):
            max_alpha_pows = max(max_alpha_pows, lde.shape[1] * len(pts) * 2)
    alpha_pows_host = _ef_powers_host(alpha, _total_alpha_budget(rounds))

    # Alpha-power counters are per (height, point): quotients at DIFFERENT
    # points have distinct poles, so their contributions cannot cancel even
    # with shared alpha powers; columns at the SAME point always get distinct
    # consecutive powers.  Matrices sharing (height, point) within a round are
    # reduced in one fused kernel over concatenated columns.
    ro: Dict[int, jnp.ndarray] = {}
    counters: Dict[Tuple[int, tuple], int] = {}
    inv_cache: Dict[Tuple[tuple, int], jnp.ndarray] = {}
    for (data, points_per_mat), round_vals in zip(rounds, opened_values):
        groups: Dict[tuple, list] = {}
        for i, (lde, pts) in enumerate(zip(data.ldes, points_per_mat)):
            log_h = lde.shape[0].bit_length() - 1
            for pi, z in enumerate(pts):
                groups.setdefault((log_h, z), []).append((i, pi))
        for (log_h, z), members in groups.items():
            h = 1 << log_h
            if log_h not in ro:
                ro[log_h] = xe.ezeros((h,))
            key = (z, log_h)
            if key not in inv_cache:
                inv_cache[key] = _inv_x_minus_z(log_h, z)
            cat = jnp.concatenate([data.ldes[i] for i, _ in members], axis=1)
            ys_cat = [y for i, pi in members for y in round_vals[i][pi]]
            c0 = counters.get((log_h, z), 0)
            w = cat.shape[1]
            s = efh.ZERO
            for k in range(w):
                s = efh.add(s, efh.mul(alpha_pows_host[c0 + k], ys_cat[k]))
            ap = np.array(alpha_pows_host[c0 : c0 + w], np.uint32)  # (w,4)
            ro[log_h] = _ro_accum(
                ro[log_h],
                cat,
                jnp.asarray(ap),
                jnp.asarray(np.array(s, np.uint32)),
                inv_cache[key],
            )
            counters[(log_h, z)] = c0 + w

    # 4. FRI.
    fri_proof, indices = fri_prove(ro, challenger, LOG_BLOWUP, num_queries, pow_bits)

    # 5. Input-batch openings at the query indices: device gathers for all
    # rounds, then ONE blocking transfer.
    from ..utils.transfer import fetch_all

    log_global = max(ro.keys())
    idx = np.asarray(indices, np.int64)
    pieces: List = []
    piece_plan: List[int] = []
    for data, _pts in rounds:
        log_batch = data.tree.max_height.bit_length() - 1
        rows_dev, paths_dev = mk.open_batch_device(
            data.tree, idx >> (log_global - log_batch)
        )
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


@jax.jit
def _ro_accum(ro, lde, alpha_pows_canon, s_canon, inv_xz):
    """ro += (sum_k alpha^k f_k(x) - S) / (x - z), one fused program.

    ro/inv_xz: EF plane tuples of (h,); alpha_pows_canon (w,4); s_canon (4,).
    The alpha-weighted column fold is 4 whole-matrix mod-p multiplies plus a
    pairwise tree reduction (constant-size traced graph in the width).
    """
    h, w = lde.shape
    ap = xf.to_monty(alpha_pows_canon)  # (w, 4)
    a = tuple(_fsum_cols(xf.fmul(lde, ap[None, :, t])) for t in range(4))
    s_dev = xe.from_array(xf.to_monty(s_canon))
    diff = xe.esub(a, tuple(jnp.broadcast_to(s_dev[t], (h,)) for t in range(4)))
    return xe.eadd(ro, xe.emul(diff, inv_xz))


def _fsum_cols(x):
    """Exact mod-p sum over the last axis by pairwise tree reduction."""
    n = x.shape[-1]
    while n > 1:
        if n % 2 == 1:
            x = jnp.concatenate([x, jnp.zeros_like(x[..., :1])], axis=-1)
            n += 1
        x = xf.fadd(x[..., 0::2], x[..., 1::2])
        n = x.shape[-1]
    return x[..., 0]


@partial(jax.jit, static_argnames=("log_h",))
def _inv_x_minus_z_dev(z_canon, log_h: int):
    x = _lde_points_host(log_h)
    xm = xf.to_monty(jnp.asarray(x))
    z_dev = xe.from_array(xf.to_monty(z_canon))
    xz = xe.esub(
        xe.from_base(xm), tuple(jnp.broadcast_to(z_dev[t], (len(x),)) for t in range(4))
    )
    return xe.einv(xz)


def _inv_x_minus_z(log_h: int, z: tuple) -> jnp.ndarray:
    """1/(x - z) for all x in GENERATOR*H_h, natural order, Monty (h,4)."""
    return _inv_x_minus_z_dev(jnp.asarray(np.array(z, np.uint32)), log_h)


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

    # 3. Per-query checks.
    for q, index in enumerate(indices):
        input_openings = proof.query_input_openings[q]
        if len(input_openings) != len(rounds):
            raise VerificationFailure("wrong number of round openings")

        # Verify batch Merkle proofs and collect opened rows per matrix.
        rows_by_round = []
        for (root, mats), opening in zip(rounds, input_openings):
            log_batch = max(d.log_n for d, _ in mats) + LOG_BLOWUP
            dims = [(1 << (d.log_n + LOG_BLOWUP), len(_first_ys(pts))) for d, pts in mats]
            idx_b = index >> (log_global - log_batch)
            ok = mk.verify_batch(
                root,
                dims,
                idx_b,
                [list(r) for r in opening.opened_rows],
                opening.proof,
            )
            if not ok:
                raise VerificationFailure(f"query {q}: bad input Merkle proof")
            rows_by_round.append(opening.opened_rows)

        # Reconstruct reduced openings per height at this query point.
        # Alpha-power counters per (height, point), matching the prover.
        ro_val: Dict[int, tuple] = {}
        counters: Dict[tuple, int] = {}
        inv_xz_cache: Dict[tuple, tuple] = {}
        for (root, mats), rows in zip(rounds, rows_by_round):
            for (domain, pts), row in zip(mats, rows):
                log_h = domain.log_n + LOG_BLOWUP
                idx_h = index >> (log_global - log_h)
                x = _lde_points_host(log_h)[nt.bit_reversal_perm(log_h)[idx_h]]
                ro_val.setdefault(log_h, efh.ZERO)
                for z, ys in pts:
                    c0 = counters.get((log_h, z), 0)
                    ck = (log_h, z, int(x))
                    if ck not in inv_xz_cache:
                        inv_xz_cache[ck] = efh.inv(efh.add_base(efh.neg(z), int(x)))
                    inv_xz = inv_xz_cache[ck]
                    acc = efh.ZERO
                    for k, y in enumerate(ys):
                        diff = efh.add_base(efh.neg(y), int(row[k]))
                        acc = efh.add(acc, efh.mul(alpha_pows[c0 + k], diff))
                    ro_val[log_h] = efh.add(ro_val[log_h], efh.mul(acc, inv_xz))
                    counters[(log_h, z)] = c0 + len(ys)

        fri_check_query(
            proof.fri,
            q,
            index,
            betas,
            log_global,
            LOG_BLOWUP,
            lambda lh: ro_val.get(lh),
        )


def _first_ys(pts):
    return pts[0][1] if pts else []
