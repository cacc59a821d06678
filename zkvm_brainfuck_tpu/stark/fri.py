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
from ..ops import poseidon2 as p2
from ..ops import ntt as nt
from ..ops.field import P
from . import ef_host as efh
from .challenger import DuplexChallenger
from .errors import (
    InvalidOpeningArgument,
    InvalidPowWitness,
    VerificationFailure,
)


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


def _fold_traced(v, beta_m, half_xinv):
    """One FRI fold on a natural-order EF4 plane-tuple layer: h -> h/2.

    beta_m: (4,) MONTY EF coefficients (device - produced by the on-device
    challenger, so the fold chains layer-to-layer without a host round trip).
    """
    h = v[0].shape[0]
    u = tuple(x[: h // 2] for x in v)
    w = tuple(x[h // 2 :] for x in v)
    half = jnp.uint32(xf.monty_of(pow(2, P - 2, P)))
    s = xe.emul_base(xe.eadd(u, w), half)
    d = xe.emul_base(xe.esub(u, w), half_xinv)
    beta_p = xe.from_array(beta_m)
    return xe.eadd(s, xe.emul(tuple(jnp.broadcast_to(b, (h // 2,)) for b in beta_p), d))


def _pair_commit_traced(v, rev):
    """Pair+commit a natural-order layer: (h,) planes ->
    (mat, flat, root_canon, root_row_monty)."""
    arr = xe.to_array(v)  # (h, 4)
    mat = arr[rev].reshape(arr.shape[0] // 2, 8)  # bit-reversed (f(x), f(-x))
    plan = mk.make_plan((mat.shape[0],))
    digest = mk.sponge_rows_traced([mat])
    flat = mk.build_tree_traced(plan, {mat.shape[0]: digest})
    root_row_m = flat[plan.level_off[plan.log_max]]
    return mat, flat, mk.root_of(plan, flat), root_row_m


def _absorb_root_traced(state_m, root_row_m):
    """Device duplex-challenger step for one commit-phase layer.

    Exactly mirrors the host DuplexChallenger for this phase's fixed
    observe/sample pattern: observing an 8-element commitment clears the
    output buffer and fills the rate prefix, the 8th observe duplexes
    (permutes), and sample_ext pops outputs end-first - so beta =
    (state[7], state[6], state[5], state[4]) of the permuted state.  The
    host replays the same observes/samples after the commit phase and
    asserts bit-equality (fri_prove).
    """
    st = jnp.concatenate([root_row_m, state_m[8:]])
    st = p2.permute(st[None, :])[0]
    beta_m = jnp.stack([st[7], st[6], st[5], st[4]])
    return st, beta_m


@lru_cache(maxsize=None)
def _layer0_jit(log_h: int):
    """First commit-phase program: pair+commit the top layer, then absorb
    the root into the device challenger state."""
    from ..utils.aot import jit_aot

    def impl(v, rev, state_m):
        mat, flat, root, root_row_m = _pair_commit_traced(v, rev)
        state_m, beta_m = _absorb_root_traced(state_m, root_row_m)
        return mat, flat, root, state_m, beta_m

    return jit_aot(("fri_layer0", log_h), impl)


@lru_cache(maxsize=None)
def _fold_commit_jit(log_h: int, has_input: bool, commit_next: bool):
    """Fused per-layer program: fold at log_h (+ inject the reduced-opening
    input arriving at log_h-1), then pair+commit the folded layer and absorb
    its root into the device challenger."""
    from ..utils.aot import jit_aot

    def impl(v, beta_m, half_xinv, inp, rev_next, state_m):
        folded = _fold_traced(v, beta_m, half_xinv)
        if has_input:
            folded = xe.eadd(folded, inp)
        if not commit_next:
            return folded
        mat, flat, root, root_row_m = _pair_commit_traced(folded, rev_next)
        state_m, beta_next = _absorb_root_traced(state_m, root_row_m)
        return folded, mat, flat, root, state_m, beta_next

    return jit_aot(("fri_fold", log_h, has_input, commit_next), impl)


def warm_fri(input_heights, log_blowup: int) -> None:
    """Compile (without executing) every FRI layer program this input-height
    set will need - the exact layer sequence fri_prove will walk."""
    from ..utils.aot import sds

    from .pcs import _rev_dev

    input_heights = set(input_heights)
    log_max = max(input_heights)
    _layer0_jit(log_max).warm(
        tuple(sds((1 << log_max,)) for _ in range(4)),
        _rev_dev(log_max),
        sds((16,)),
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
            sds((16,)),
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

    # The commit phase chains ENTIRELY on device: each layer's program
    # commits the paired layer, absorbs the root into a device-resident
    # duplex-challenger state, and produces the next beta as a device array
    # consumed by the next fold - so the ~log_n sequential layers dispatch
    # asynchronously with ZERO blocking host round trips (the round-3
    # latency floor: ~20 x ~50 ms tunnel RTTs per prove).  Roots and betas
    # come back in ONE transfer at the end; the host challenger then replays
    # the same observe/sample schedule and asserts bit-equality, keeping the
    # transcript contract exactly as the reference orders it
    # (prover.rs:266-415).
    assert not challenger.input_buffer, "pending transcript inputs at FRI entry"
    state_m = xf.to_monty(jnp.asarray(np.array(challenger.state, np.uint32)))

    trees: List[mk.MerkleTree] = []
    roots_dev: List = []
    betas_dev: List = []

    log_h = log_max
    mat, flat, root_dev, state_m, beta_m = _layer0_jit(log_h)(
        current, _rev_dev(log_h), state_m
    )
    while True:
        trees.append(
            mk.MerkleTree(
                matrices=[mat], plan=mk.make_plan((1 << (log_h - 1),)), flat=flat,
                root=None,
            )
        )
        roots_dev.append(root_dev)
        betas_dev.append(beta_m)
        has_input = (log_h - 1) in inputs and (log_h - 1) != log_max
        commit_next = (log_h - 1) > log_blowup
        fn = _fold_commit_jit(log_h, has_input, commit_next)
        inp = inputs.get(log_h - 1) if has_input else xe.ezeros((1,))
        out = fn(
            current, beta_m, _half_xinv(log_h), inp, _rev_dev(log_h - 1), state_m
        )
        # each reduced-opening input is consumed exactly once: drop the dict's
        # reference so its buffer frees as soon as the fold executes (the
        # inputs total ~0.25 GB at the 2^22 scale)
        if has_input:
            inputs[log_h - 1] = None
        if log_h == log_max:
            inputs[log_max] = None
        del inp
        log_h -= 1
        if commit_next:
            current, mat, flat, root_dev, state_m, beta_m = out
        else:
            current = out
            break

    # ONE blocking transfer: all roots + all betas + the final constant layer.
    from ..utils.transfer import fetch_all as _fetch_all

    n_layers = len(trees)
    fetched = _fetch_all(
        list(roots_dev)
        + [xf.from_monty(b) for b in betas_dev]
        + [xf.from_monty(xe.to_array(current))]
    )
    roots = [fetched[i] for i in range(n_layers)]
    betas_device = [
        tuple(int(x) for x in fetched[n_layers + i]) for i in range(n_layers)
    ]
    final_host = fetched[2 * n_layers]

    # Host transcript replay: bit-identical to the sequential reference order.
    betas: List[tuple] = []
    for root, beta_dev in zip(roots, betas_device):
        challenger.observe_commitment([int(x) for x in root])
        beta = challenger.sample_ext()
        assert beta == beta_dev, "device challenger diverged from host transcript"
        betas.append(beta)
    for tree, root in zip(trees, roots):
        tree.root = np.asarray(root)

    _log.debug("fri: commit phase (%d layers) in %.3fs", len(trees), _time.time() - _t0)
    from ..utils import phases as _phases

    _phases.add("fri_commit", _time.time() - _t0); _t0 = _time.time()
    final_poly = tuple(int(x) for x in final_host[0])
    for v in final_host:
        assert tuple(int(x) for x in v) == final_poly, "final layer not constant"
    for c in final_poly:
        challenger.observe(c)
    _log.debug("fri: final poly in %.3fs", _time.time() - _t0); _t0 = _time.time()
    pow_witness = challenger.grind(pow_bits)
    _log.debug("fri: grind in %.3fs", _time.time() - _t0)
    _phases.add("grind", _time.time() - _t0); _t0 = _time.time()
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
        raise InvalidPowWitness("FRI proof-of-work check failed")
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
            raise InvalidOpeningArgument(f"FRI query {q}: bad Merkle path at layer {l}")
        e0 = tuple(pair[0:4])
        e1 = tuple(pair[4:8])
        mine = e1 if idx & 1 else e0
        if mine != e:
            raise InvalidOpeningArgument(f"FRI query {q}: folded value mismatch at layer {l}")
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
        raise InvalidOpeningArgument(f"FRI query {q}: final value != final_poly")



# ---------------------------------------------------------------------------
# Vectorized (numpy) query verification - all queries in one pass.
# ---------------------------------------------------------------------------

_U64P = np.uint64(P)


def _pow_base_vec(g: int, k: np.ndarray) -> np.ndarray:
    """Vectorized g^k mod P for (Q,) exponent arrays (square-and-multiply)."""
    r = np.ones(len(k), dtype=np.uint64)
    b = np.uint64(g % P)
    kk = np.asarray(k, dtype=np.int64).copy()
    while (kk > 0).any():
        r = np.where(kk & 1 == 1, r * b % _U64P, r)
        b = b * b % _U64P
        kk >>= 1
    return r


def fri_check_queries_np(
    proof: FriProof,
    indices,
    betas,
    log_max: int,
    log_blowup: int,
    ro_by_height,  # dict: log_h -> (Q, 4) uint64 reduced-opening values
):
    """Walk ALL queries' fold chains in one vectorized pass (the scalar
    `fri_check_query` is the per-query reference; this is what the verifier
    runs - 84 scalar walks cost ~seconds, this costs milliseconds)."""
    q_n = len(indices)
    idx = np.asarray(indices, dtype=np.int64).copy()
    half = pow(2, P - 2, P)
    e = np.asarray(ro_by_height[log_max], dtype=np.uint64) % _U64P
    log_h = log_max
    betas_arr = np.asarray(betas, dtype=np.uint64)  # (L, 4)
    for l, root in enumerate(proof.commit_phase_commits):
        try:
            pairs = np.stack(
                [
                    np.asarray(proof.query_commit_openings[q][l][0], dtype=np.uint64)
                    for q in range(q_n)
                ]
            )
            paths = np.stack(
                [
                    np.asarray(proof.query_commit_openings[q][l][1], dtype=np.uint64)
                    for q in range(q_n)
                ]
            )
        except (ValueError, IndexError) as err:
            from .errors import OpeningShapeError

            raise OpeningShapeError(f"malformed FRI query openings: {err}") from err
        if pairs.shape != (q_n, 8) or paths.shape[0] != q_n:
            from .errors import OpeningShapeError

            raise OpeningShapeError("malformed FRI query opening shapes")
        ok = mk.verify_batch_np(root, [(1 << (log_h - 1), 8)], idx >> 1, [pairs], paths)
        if not ok.all():
            raise InvalidOpeningArgument(
                f"FRI query {int(np.argmin(ok))}: bad Merkle path at layer {l}"
            )
        e0 = pairs[:, :4]
        e1 = pairs[:, 4:]
        odd = (idx & 1).astype(bool)
        mine = np.where(odd[:, None], e1, e0)
        okv = (mine == e).all(axis=1)
        if not okv.all():
            raise InvalidOpeningArgument(
                f"FRI query {int(np.argmin(okv))}: folded value mismatch at layer {l}"
            )
        # x~ = g_h^{rev_h(idx & ~1)}
        rev = _rev(log_h)
        xt = _pow_base_vec(xf.two_adic_root(log_h), np.asarray(rev[idx & ~1]))
        from . import ef_host as _efh

        s = _efh.v_mul_base(_efh.v_add(e0, e1), np.uint64(half))
        d = _efh.v_mul_base(
            _efh.v_mul_base(_efh.v_sub(e0, e1), np.uint64(half)),
            _efh.v_base_inv(xt),
        )
        e = _efh.v_add(s, _efh.v_mul(betas_arr[l][None, :], d))
        idx >>= 1
        log_h -= 1
        ro = ro_by_height.get(log_h)
        if ro is not None:
            e = _efh.v_add(e, np.asarray(ro, dtype=np.uint64))
    final = np.asarray(proof.final_poly, dtype=np.uint64)
    okf = (e == final[None, :]).all(axis=1)
    if not okf.all():
        raise InvalidOpeningArgument(
            f"FRI query {int(np.argmin(okf))}: final value != final_poly"
        )
