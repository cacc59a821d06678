"""Row-sharded proving kernels over a device mesh (shard_map + collectives).

Multi-chip mapping of the prover's hot phases; every function here takes a
row-sharded trace block per device and cooperates via ICI collectives:

- `sharded_leaf_digests`: Merkle leaf hashing is embarrassingly row-parallel;
  tree tops are reduced after an all_gather of per-device subtree roots.
- `sharded_logup_scan`: LogUp running sum = local inclusive scan + exclusive
  cross-device offset (all_gather of per-device totals), the distributed
  replacement for rayon_scan (reference permutation.rs:137).
- `sharded_transition_check`: next-row (transition) constraints need one halo
  row from the right neighbor - a ppermute ring exchange, the STARK analogue
  of context-parallel halo exchange.
- `sharded_prove_step`: one jit-compiled "training step" composing all three
  on a mesh - the function `__graft_entry__.dryrun_multichip` compiles.
- `logup_phi_sharded`: the REAL pipeline's LogUp running sum on a mesh
  (wired into stark/permutation.py; local scan + all_gather'd offsets).
- `sharded_ntt`: explicit-collective distributed NTT (4-step algorithm,
  3 all_to_alls + local NTTs), bit-exact with the single-device transform.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
try:
    from jax import shard_map as _shard_map_new

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        # jax >= 0.8: check_rep was renamed check_vma
        return _shard_map_new(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep,
        )
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..ops import ext as xe
from ..ops import field as xf
from ..ops import poseidon2 as p2
from .mesh import ROWS_AXIS


def _leaf_digests_local(block):
    """(rows_local, W) Monty -> (rows_local, 8) digests."""
    return p2.hash_rows(block)


def _subtree_root_local(digests):
    """Reduce local digests to one subtree root by pairwise compression."""
    n = digests.shape[0]
    while n > 1:
        digests = p2.compress(digests[0::2], digests[1::2])
        n //= 2
    return digests  # (1, 8)


def sharded_prove_step(mesh, trace, alpha, beta):
    """One multi-chip step over a row-sharded trace.

    trace: (N, W) canonical uint32, sharded over rows.
    alpha/beta: (4,) canonical uint32 EF challenges (replicated).

    Returns (root_digest (8,), cumulative_sum (4,), transition_residual (N,)),
    computed cooperatively across the mesh:
      * Poseidon2 Merkle root of the trace rows (leaf hash local, subtree
        roots all_gathered and folded),
      * a LogUp-style cumulative sum with cross-device scan offsets,
      * a next-row constraint (row chaining) evaluated with a ppermute halo.
    """

    def step(trace_blk, alpha_r, beta_r):
        nd = jax.lax.psum(1, ROWS_AXIS)
        me = jax.lax.axis_index(ROWS_AXIS)

        tm = xf.to_monty(trace_blk)

        # --- Merkle: local leaves + local subtree root, gather + fold tops.
        digests = _leaf_digests_local(tm)
        sub_root = _subtree_root_local(digests)  # (1, 8)
        tops = jax.lax.all_gather(sub_root[0], ROWS_AXIS)  # (nd, 8)
        while tops.shape[0] > 1:
            tops = p2.compress(tops[0::2], tops[1::2])
        root = tops[0]

        # --- LogUp: term_i = 1 / (alpha + beta * row_fingerprint_i).
        am = xe.from_array(xf.to_monty(alpha_r))
        bm = xe.from_array(xf.to_monty(beta_r))
        fp = tm[:, 0]
        for c in range(1, trace_blk.shape[1]):
            fp = xf.fadd(xf.fmul(fp, jnp.uint32(xf.monty_of(257))), tm[:, c])
        denom = xe.eadd(
            tuple(jnp.broadcast_to(a, fp.shape) for a in am),
            xe.emul_base(bm, fp),
        )
        terms = xe.to_array(xe.einv(denom))  # (rows_local, 4)
        local_scan = jax.lax.associative_scan(xf.fadd, terms, axis=0)
        local_total = local_scan[-1]  # (4,)
        totals = jax.lax.all_gather(local_total, ROWS_AXIS)  # (nd, 4)
        mask = (jnp.arange(nd) < me).astype(jnp.uint32)[:, None]
        # exclusive prefix offset of earlier devices (mod-p masked tree sum)
        offset = totals[0] * 0
        for d in range(totals.shape[0]):
            offset = xf.fadd(offset, jnp.where(mask[d] != 0, totals[d], 0))
        running = xf.fadd(local_scan, offset[None, :])
        cumulative = jax.lax.all_gather(running[-1], ROWS_AXIS)[-1]

        # --- Halo exchange: bring next block's first row for row chaining.
        first_row = trace_blk[0]
        next_first = jax.lax.ppermute(
            first_row, ROWS_AXIS, [((i + 1) % nd, i) for i in range(nd)]
        )
        shifted = jnp.concatenate([trace_blk[1:], next_first[None]], axis=0)
        transition = xf.fsub(shifted[:, 0], trace_blk[:, 0])

        return root, cumulative, transition

    spec_rows = P(ROWS_AXIS)
    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(spec_rows, P(), P()),
        out_specs=(P(), P(), spec_rows),
        check_rep=False,
    )
    return fn(trace, alpha, beta)


def jit_sharded_prove_step(mesh):
    return jax.jit(partial(sharded_prove_step, mesh))


# ---------------------------------------------------------------------------
# Explicit-collective LogUp scan used by the REAL pipeline (permutation.py)
# ---------------------------------------------------------------------------


def logup_phi_sharded(mesh, ents, rss):
    """Row-sharded LogUp running sum with an explicit cross-device offset
    exchange - the distributed replacement for rayon_scan
    (reference permutation.rs:131-145), wired into the real prover
    (stark/permutation.py) whenever a mesh is active.

    ents: (N, NB, 4) Monty batched entries, row-sharded.
    rss:  (N, 4) Monty per-row sums, row-sharded.
    Returns (perm_trace (N, NB+1, 4) row-sharded, cumulative_sum (4,)
    replicated) - bit-identical to the single-device associative_scan
    (test_sharded asserts proof-byte equality).
    """
    n_dev = mesh.devices.size

    def step(ents_blk, rss_blk):
        me = jax.lax.axis_index(ROWS_AXIS)
        local = jax.lax.associative_scan(xf.fadd, rss_blk, axis=0)  # (n/nd, 4)
        totals = jax.lax.all_gather(local[-1], ROWS_AXIS)  # (nd, 4)
        # exclusive prefix of earlier devices' totals (mod-p masked sum)
        mask = (jnp.arange(n_dev) < me).astype(jnp.uint32)[:, None]
        offset = jnp.zeros((4,), jnp.uint32)
        for d in range(n_dev):
            offset = xf.fadd(offset, jnp.where(mask[d] != 0, totals[d], 0))
        phi = xf.fadd(local, offset[None, :])
        # global cumulative sum: mod-p sum of ALL device totals (replicated)
        csum = jnp.zeros((4,), jnp.uint32)
        for d in range(n_dev):
            csum = xf.fadd(csum, totals[d])
        perm = jnp.concatenate([ents_blk, phi[:, None, :]], axis=1)
        return perm, csum

    spec_rows = P(ROWS_AXIS)
    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(spec_rows, spec_rows),
        out_specs=(spec_rows, P()),
        check_rep=False,
    )
    return fn(ents, rss)


# ---------------------------------------------------------------------------
# Explicit-collective distributed NTT (4-step / transpose algorithm)
# ---------------------------------------------------------------------------


def sharded_ntt(mesh, x, inverse: bool = False):
    """Distributed radix-split NTT over a d-device rows mesh with EXPLICIT
    all_to_all collectives - the ICI-native replacement for the reference's
    shared-memory `Radix2DitParallel` (SURVEY §2.5 "Parallel NTT"), and the
    explicit-collective counterpart of the GSPMD-propagated NTT the prover
    uses today.

    x: (n, w) natural-order Montgomery, row-sharded (n = d * m, both powers
    of two, d <= m).  Returns NTT(x) (natural order, row-sharded), bit-exact
    with the single-device `ops/ntt.ntt_traced` (tests/test_sharded.py).

    Factorization i = p*m + t, j = q' + d*r' (w = g_n, so w^(p*m*d*r') = 1):

        F[q' + d r'] = sum_t w_m^{t r'} * [ w_n^{t q'} * sum_p x[p m + t] w_d^{p q'} ]

    Steps (3 all_to_alls, everything else local):
      1. all_to_all: make the device axis p local (device q owns t-chunk q);
      2. local size-d DFT over p  ->  Y[q'][t_chunk];
      3. local twiddle by w_n^{t q'};
      4. all_to_all: give device q' ALL t for its q'  ->  Z[t];
      5. local size-m NTT over t  ->  F[q' + d r'] for all r';
      6. all_to_all + interleave: strided output j = q' + d r' back to
         contiguous row sharding.

    The two-adic generator tower is consistent (g_n^d = g_{n/d}), so the
    local NTT reuses the standard twiddle blob for log_m.
    """
    from ..ops import ntt as nt
    from ..ops.field import P as _P

    n, w = int(x.shape[0]), int(x.shape[1])
    d = mesh.devices.size
    m = n // d
    log_n = n.bit_length() - 1
    log_m = m.bit_length() - 1
    assert d * m == n and (1 << log_n) == n and d <= m
    mc = m // d

    w_n = xf.two_adic_root(log_n)
    if inverse:
        w_n = pow(w_n, _P - 2, _P)
    # size-d DFT matrix V[q', p] = w_d^{p q'}, w_d = w_n^m (Monty, host-built:
    # d^2 <= 256 values)
    import numpy as _np

    w_d = pow(w_n, m, _P)
    v_np = _np.empty((d, d), dtype=_np.uint32)
    for qp in range(d):
        for p in range(d):
            v_np[qp, p] = pow(w_d, (p * qp) % n, _P)
    v_m = xf.np_to_monty(v_np)

    tw_blob = nt.twiddle_blob_traced(log_m, inverse)
    rev_m = nt.bitrev_traced(log_m)

    def step(xb, v, tw, rev):
        q = jax.lax.axis_index(ROWS_AXIS)

        # 1. bring the device axis local: chunk c of my rows -> device c
        a = xb.reshape(d, mc, w)
        a = jax.lax.all_to_all(a, ROWS_AXIS, split_axis=0, concat_axis=0, tiled=False)
        # a[p][u] = x[p*m + q*mc + u]

        # 2. local size-d DFT over p
        ys = []
        for qp in range(d):
            acc = xf.fmul(a[0], v[qp, 0])
            for p in range(1, d):
                acc = xf.fadd(acc, xf.fmul(a[p], v[qp, p]))
            ys.append(acc)
        y = jnp.stack(ys, axis=0)  # (d=q', mc, w)

        # 3. twiddle by w_n^{t q'}, t = q*mc + u (q is this device's chunk)
        #    base = w_n^t via powers of w_n (u part) times w_n^(q*mc) (traced
        #    scalar power: square-multiply over the bits of q)
        pu = nt.powers_traced(w_n, log_m - (d.bit_length() - 1))  # (mc,) w_n^u
        base_qmc = pow(w_n, mc, _P)  # w_n^(mc), host int
        sq = jnp.uint32(xf.monty_of(1))
        b = jnp.uint32(xf.monty_of(base_qmc))
        qq = q
        for _ in range(max(d.bit_length() - 1, 1)):
            sq = jnp.where((qq & 1) == 1, xf.fmul(sq, b), sq)
            b = xf.fmul(b, b)
            qq = qq >> 1
        p1 = xf.fmul(pu, sq)  # (mc,) w_n^t for my t-range
        zs = []
        for qp in range(d):
            # w_n^{t * qp} = p1^qp (qp static, square-multiply)
            e = qp
            acc = jnp.full((mc,), jnp.uint32(xf.monty_of(1)))
            basev = p1
            while e:
                if e & 1:
                    acc = xf.fmul(acc, basev)
                basev = xf.fmul(basev, basev)
                e >>= 1
            zs.append(xf.fmul(y[qp], acc[:, None]))
        z = jnp.stack(zs, axis=0)  # (d=q', mc, w)

        # 4. give device q' all t for its q'
        z = jax.lax.all_to_all(z, ROWS_AXIS, split_axis=0, concat_axis=0, tiled=False)
        # z[src_q][u] = Z_{q'=me}[t = src_q*mc + u]  ->  flatten to (m, w)
        zt = z.reshape(m, w)

        # 5. local size-m NTT over t (no 1/n scaling here - the inverse
        # scaling is applied once at the end for the full size n)
        fm = nt.ntt_traced(zt, tw, rev, log_m, False)  # (m, w): F[me + d*r']

        # 6. route j = me + d*r' back to contiguous rows: chunk c of r'
        # belongs to device c at local offset me + d*u''
        fm = fm.reshape(d, mc, w)
        fm = jax.lax.all_to_all(fm, ROWS_AXIS, split_axis=0, concat_axis=0, tiled=False)
        # fm[src_qp][u''] -> local row src_qp + d*u''
        out = jnp.transpose(fm, (1, 0, 2)).reshape(m, w)
        if inverse:
            out = xf.fmul(out, jnp.uint32(xf.monty_of(pow(n, _P - 2, _P))))
        return out

    spec_rows = P(ROWS_AXIS)
    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(spec_rows, P(), P(), P()),
        out_specs=spec_rows,
        check_rep=False,
    )
    return fn(x, jnp.asarray(v_m), tw_blob, rev_m)
