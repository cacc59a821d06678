"""FRI low-degree test: device-side commit phase, host-side query checks.

Protocol shape mirrors p3's TwoAdicFriPcs FRI (two-adic, arity-2 folds,
commit-per-layer, final constant, PoW grind, per-query sibling walks):

- Vectors are evaluations over pretend subgroups H_h (the uniform GENERATOR
  coset shift of every committed LDE is absorbed into the polynomial - FRI
  tests f~(x) = f(G x), same degree).  Natural order on device; committed
  layers pair (f(x), f(-x)) at bit-reversed positions as a width-8 base
  matrix (EF4 flattened).
- fold: f'(x^2) = (f(x)+f(-x))/2 + beta * (f(x)-f(-x))/(2x), one fused
  device expression per layer; queries then walk index >> 1 per layer.
- Reduced-opening inputs at smaller heights join right after the fold that
  reaches their height (p3 commit-phase semantics).

Security parameters from the reference config (kb31_poseidon2.rs:53-64):
log_blowup 1, 84 queries (FRI_QUERIES env), 16 PoW bits.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ext as xe
from ..ops import field as xf
from ..ops import merkle as mk
from ..ops import ntt as nt
from ..ops.field import P
from . import ef_host as efh
from .challenger import DuplexChallenger


@lru_cache(maxsize=None)
def _half_xinv(log_h: int):
    """half * g_h^{-i} for i < h/2, Montgomery DEVICE array (generated on
    device - no host upload; see ops/ntt.py powers_traced)."""
    from ..ops import ntt as nt

    g_inv = pow(xf.two_adic_root(log_h), P - 2, P)
    half = pow(2, P - 2, P)
    return jax.jit(
        lambda: xf.fmul(
            nt.powers_traced(g_inv, log_h - 1), jnp.uint32(xf.monty_of(half))
        )
    )()


def _fold_traced(v, beta_canon, half_xinv):
    """One FRI fold on a natural-order EF4 plane-tuple layer: h -> h/2."""
    h = v[0].shape[0]
    u = tuple(x[: h // 2] for x in v)
    w = tuple(x[h // 2 :] for x in v)
    half = jnp.uint32(xf.monty_of(pow(2, P - 2, P)))
    s = xe.emul_base(xe.eadd(u, w), half)
    d = xe.emul_base(xe.esub(u, w), half_xinv)
    beta_p = xe.from_array(xf.to_monty(beta_canon))
    return xe.eadd(s, xe.emul(tuple(jnp.broadcast_to(b, (h // 2,)) for b in beta_p), d))


def _pair_commit_traced(v, rev):
    """Pair+commit a natural-order layer: (h,) planes -> (mat, flat, root)."""
    arr = xe.to_array(v)  # (h, 4)
    mat = arr[rev].reshape(arr.shape[0] // 2, 8)  # bit-reversed (f(x), f(-x))
    plan = mk.make_plan((mat.shape[0],))
    digest = mk.sponge_rows_traced([mat])
    flat = mk.build_tree_traced(plan, {mat.shape[0]: digest})
    return mat, flat, mk.root_of(plan, flat)


@lru_cache(maxsize=None)
def _layer0_jit(log_h: int):
    """First commit-phase program: pair+commit the top layer."""
    from ..utils.aot import jit_aot

    return jit_aot(("fri_layer0", log_h), lambda v, rev: _pair_commit_traced(v, rev))


@lru_cache(maxsize=None)
def _fold_commit_jit(log_h: int, has_input: bool, commit_next: bool):
    """Fused per-layer program: fold at log_h (+ inject the reduced-opening
    input arriving at log_h-1), then pair+commit the folded layer."""
    from ..utils.aot import jit_aot

    def impl(v, beta_canon, half_xinv, inp, rev_next):
        folded = _fold_traced(v, beta_canon, half_xinv)
        if has_input:
            folded = xe.eadd(folded, inp)
        if not commit_next:
            return folded
        return (folded,) + _pair_commit_traced(folded, rev_next)

    return jit_aot(("fri_fold", log_h, has_input, commit_next), impl)


def warm_fri(input_heights, log_blowup: int) -> None:
    """Compile (without executing) every FRI layer program this input-height
    set will need - the exact layer sequence fri_prove will walk."""
    from ..utils.aot import sds

    from .pcs import _rev_dev

    input_heights = set(input_heights)
    log_max = max(input_heights)
    _layer0_jit(log_max).warm(
        tuple(sds((1 << log_max,)) for _ in range(4)), _rev_dev(log_max)
    )
    for log_h in range(log_max, log_blowup + 1, -1):
        has_input = (log_h - 1) in input_heights and (log_h - 1) != log_max
        commit_next = (log_h - 1) > log_blowup
        inp_n = (1 << (log_h - 1)) if has_input else 1
        _fold_commit_jit(log_h, has_input, commit_next).warm(
            tuple(sds((1 << log_h,)) for _ in range(4)),
            sds((4,)),
            _half_xinv(log_h),
            tuple(sds((inp_n,)) for _ in range(4)),
            _rev_dev(log_h - 1),
        )


@dataclass
class FriProof:
    commit_phase_commits: List[np.ndarray]  # (8,) roots
    final_poly: Tuple[int, int, int, int]
    pow_witness: int
    # per query: list over layers of (pair_row(8 ints), path (L,8))
    query_commit_openings: List[List[Tuple[np.ndarray, np.ndarray]]]


def fri_prove(
    inputs: Dict[int, jnp.ndarray],  # log_h -> (h,4) Monty EF natural order
    challenger: DuplexChallenger,
    log_blowup: int,
    num_queries: int,
    pow_bits: int,
):
    """Returns (FriProof, query_indices)."""
    import logging
    import time as _time

    _log = logging.getLogger("zkbf.fri")
    _t0 = _time.time()
    from ..stark.pcs import _rev_dev  # device bit-reversal tables

    heights = sorted(inputs.keys(), reverse=True)
    log_max = heights[0]
    current = inputs[log_max]

    trees: List[mk.MerkleTree] = []
    roots: List[np.ndarray] = []
    betas: List[tuple] = []

    log_h = log_max
    mat, flat, root_dev = _layer0_jit(log_h)(current, _rev_dev(log_h))
    while True:
        tree = mk.MerkleTree(
            matrices=[mat], plan=mk.make_plan((1 << (log_h - 1),)), flat=flat,
            root=np.asarray(root_dev),
        )
        trees.append(tree)
        roots.append(tree.root)
        challenger.observe_commitment([int(x) for x in tree.root])
        beta = challenger.sample_ext()
        betas.append(beta)
        has_input = (log_h - 1) in inputs and (log_h - 1) != log_max
        commit_next = (log_h - 1) > log_blowup
        fn = _fold_commit_jit(log_h, has_input, commit_next)
        inp = inputs.get(log_h - 1) if has_input else xe.ezeros((1,))
        out = fn(
            current,
            jnp.asarray(np.array(beta, np.uint32)),
            _half_xinv(log_h),
            inp,
            _rev_dev(log_h - 1),
        )
        log_h -= 1
        if commit_next:
            current, mat, flat, root_dev = out
        else:
            current = out
            break

    _log.debug("fri: commit phase (%d layers) in %.3fs", len(trees), _time.time() - _t0); _t0 = _time.time()
    final_host = np.asarray(xf.from_monty(xe.to_array(current)))
    final_poly = tuple(int(x) for x in final_host[0])
    for v in final_host:
        assert tuple(int(x) for x in v) == final_poly, "final layer not constant"
    for c in final_poly:
        challenger.observe(c)
    _log.debug("fri: final poly in %.3fs", _time.time() - _t0); _t0 = _time.time()
    pow_witness = challenger.grind(pow_bits)
    _log.debug("fri: grind in %.3fs", _time.time() - _t0); _t0 = _time.time()
    indices = [challenger.sample_bits(log_max) for _ in range(num_queries)]

    # Commit-phase query openings: all gathers in ONE program, one transfer.
    from ..utils.transfer import fetch_all

    idx = np.asarray(indices, np.int64)
    opened = mk.open_many_device(
        trees, [idx >> (l + 1) for l in range(len(trees))]
    )
    pieces = []
    for rows, proofs in opened:
        pieces.append(rows[0])
        pieces.append(proofs)
    fetched = fetch_all(pieces)
    per_layer = [(fetched[2 * l], fetched[2 * l + 1]) for l in range(len(trees))]
    query_commit_openings = []
    for q in range(num_queries):
        query_commit_openings.append(
            [(per_layer[l][0][q], per_layer[l][1][q]) for l in range(len(trees))]
        )

    return (
        FriProof(
            commit_phase_commits=roots,
            final_poly=final_poly,
            pow_witness=pow_witness,
            query_commit_openings=query_commit_openings,
        ),
        indices,
    )


def fri_verify_transcript(
    proof: FriProof,
    challenger: DuplexChallenger,
    log_max: int,
    num_queries: int,
    pow_bits: int,
):
    """Replay the FRI transcript; returns (betas, query_indices) or raises."""
    betas = []
    for root in proof.commit_phase_commits:
        challenger.observe_commitment([int(x) for x in root])
        betas.append(challenger.sample_ext())
    for c in proof.final_poly:
        challenger.observe(int(c))
    if not challenger.check_witness(pow_bits, proof.pow_witness):
        raise VerificationFailure("FRI proof-of-work check failed")
    indices = [challenger.sample_bits(log_max) for _ in range(num_queries)]
    return betas, indices


@lru_cache(maxsize=None)
def _rev(log_n: int):
    return nt.bit_reversal_perm(log_n)


def fri_check_query(
    proof: FriProof,
    q: int,
    index: int,
    betas,
    log_max: int,
    log_blowup: int,
    ro_at_height,  # callable: log_h -> EF value of the reduced opening at this query
):
    """Walk one query's fold chain (host EF); raises on mismatch."""
    openings = proof.query_commit_openings[q]
    half = pow(2, P - 2, P)
    e = ro_at_height(log_max)
    idx = index
    log_h = log_max
    for l, (root, (pair_row, path)) in enumerate(zip(proof.commit_phase_commits, openings)):
        pair = [int(x) for x in pair_row]
        if not mk.verify_batch(
            root, [(1 << (log_h - 1), 8)], idx >> 1, [pair], path
        ):
            raise VerificationFailure(f"FRI query {q}: bad Merkle path at layer {l}")
        e0 = tuple(pair[0:4])
        e1 = tuple(pair[4:8])
        mine = e1 if idx & 1 else e0
        if mine != e:
            raise VerificationFailure(f"FRI query {q}: folded value mismatch at layer {l}")
        # x~ = g_h^{rev_h(idx & ~1)}
        xt = pow(xf.two_adic_root(log_h), int(_rev(log_h)[idx & ~1]), P)
        s = efh.mul_base(efh.add(e0, e1), half)
        d = efh.mul_base(efh.sub(e0, e1), half * pow(xt, P - 2, P) % P)
        e = efh.add(s, efh.mul(betas[l], d))
        idx >>= 1
        log_h -= 1
        ro = ro_at_height(log_h)
        if ro is not None:
            e = efh.add(e, ro)
    if e != tuple(int(x) for x in proof.final_poly):
        raise VerificationFailure(f"FRI query {q}: final value != final_poly")


class VerificationFailure(Exception):
    pass
