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


def _zeta_powers(zeta: tuple, n: int) -> jnp.ndarray:
    """(n, 4) Monty powers z^0..z^{n-1} via parallel scan."""
    z = xf.to_monty(jnp.asarray(np.array(zeta, np.uint32)))
    base = jnp.broadcast_to(z, (n, 4))
    one = xe.eones(())
    stacked = jnp.concatenate([one[None], base[: n - 1]], axis=0)
    return jax.lax.associative_scan(xe.emul, stacked, axis=0)


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


def eval_matrix_at_point(coeffs: jnp.ndarray, zpows: jnp.ndarray) -> np.ndarray:
    """f_col(z) for all columns: (n, W) x (n, 4) -> (W, 4) canonical host."""
    n, w = coeffs.shape
    chunk = min(n, 1 << 15)
    acc = jnp.zeros((w, 4), jnp.uint32)
    for start in range(0, n, chunk):
        t = xf.fmul(coeffs[start : start + chunk, :, None], zpows[start : start + chunk, None, :])
        acc = xf.fadd(acc, _fsum_rows(t))
    return np.asarray(xf.from_monty(acc))


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
    # 1. Evaluate all openings from coefficients.
    opened_values = []
    zpow_cache: Dict[Tuple[tuple, int], jnp.ndarray] = {}
    for data, points_per_mat in rounds:
        round_vals = []
        for domain, coeffs, pts in zip(data.domains, data.coeffs, points_per_mat):
            n = coeffs.shape[0]
            # intt over a shifted domain yields coefficients of q(shift*y):
            # evaluate the real polynomial q at z via q~(z / shift).
            shift_inv = pow(domain.shift, P - 2, P)
            mat_vals = []
            for z in pts:
                zs = efh.mul_base(z, shift_inv)
                key = (zs, n)
                if key not in zpow_cache:
                    zpow_cache[key] = _zeta_powers(zs, n)
                ys = eval_matrix_at_point(coeffs, zpow_cache[key])
                mat_vals.append([tuple(int(x) for x in y) for y in ys])
            round_vals.append(mat_vals)
        opened_values.append(round_vals)

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

    ro: Dict[int, jnp.ndarray] = {}
    counters: Dict[int, int] = {}
    inv_cache: Dict[Tuple[tuple, int], jnp.ndarray] = {}
    for (data, points_per_mat), round_vals in zip(rounds, opened_values):
        for lde, pts, mat_vals in zip(data.ldes, points_per_mat, round_vals):
            h = lde.shape[0]
            log_h = h.bit_length() - 1
            if log_h not in ro:
                ro[log_h] = xe.ezeros((h,))
                counters[log_h] = 0
            for z, ys in zip(pts, mat_vals):
                c0 = counters[log_h]
                w = lde.shape[1]
                key = (z, log_h)
                if key not in inv_cache:
                    inv_cache[key] = _inv_x_minus_z(log_h, z)
                # A(x) = sum_k alpha^{c0+k} f_k(x) ; S = sum_k alpha^{c0+k} y_k
                a = xe.ezeros((h,))
                s = efh.ZERO
                for k in range(w):
                    ap = alpha_pows_host[c0 + k]
                    ap_dev = xf.to_monty(jnp.asarray(np.array(ap, np.uint32)))
                    a = xe.eadd(a, xf.fmul(ap_dev[None, :], lde[:, k][:, None]))
                    s = efh.add(s, efh.mul(ap, ys[k]))
                s_dev = xf.to_monty(jnp.asarray(np.array(s, np.uint32)))
                diff = xe.esub(a, jnp.broadcast_to(s_dev, (h, 4)))
                ro[log_h] = xe.eadd(ro[log_h], xe.emul(diff, inv_cache[key]))
                counters[log_h] += w

    # 4. FRI.
    fri_proof, indices = fri_prove(ro, challenger, LOG_BLOWUP, num_queries, pow_bits)

    # 5. Input-batch openings at the query indices.
    log_global = max(ro.keys())
    idx = np.asarray(indices, np.int64)
    per_round: List[Tuple[List[np.ndarray], np.ndarray]] = []
    for data, _pts in rounds:
        log_batch = data.tree.max_height.bit_length() - 1
        rows, paths = mk.open_batch(data.tree, idx >> (log_global - log_batch))
        per_round.append((rows, paths))
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


def _inv_x_minus_z(log_h: int, z: tuple) -> jnp.ndarray:
    """1/(x - z) for all x in GENERATOR*H_h, natural order, Monty (h,4)."""
    x = _lde_points_host(log_h)
    xm = xf.to_monty(jnp.asarray(x))
    z_dev = xf.to_monty(jnp.asarray(np.array(z, np.uint32)))
    xz = xe.esub(xe.from_base(xm), jnp.broadcast_to(z_dev, (len(x), 4)))
    return xe.einv(xz)


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
        ro_val: Dict[int, tuple] = {}
        counters: Dict[int, int] = {}
        for (root, mats), rows in zip(rounds, rows_by_round):
            for (domain, pts), row in zip(mats, rows):
                log_h = domain.log_n + LOG_BLOWUP
                idx_h = index >> (log_global - log_h)
                x = _lde_points_host(log_h)[nt.bit_reversal_perm(log_h)[idx_h]]
                ro_val.setdefault(log_h, efh.ZERO)
                counters.setdefault(log_h, 0)
                for z, ys in pts:
                    c0 = counters[log_h]
                    inv_xz = efh.inv(efh.add_base(efh.neg(z), int(x)))
                    acc = efh.ZERO
                    for k, y in enumerate(ys):
                        diff = efh.add_base(efh.neg(y), int(row[k]))
                        acc = efh.add(acc, efh.mul(alpha_pows[c0 + k], diff))
                    ro_val[log_h] = efh.add(ro_val[log_h], efh.mul(acc, inv_xz))
                    counters[log_h] += len(ys)

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
