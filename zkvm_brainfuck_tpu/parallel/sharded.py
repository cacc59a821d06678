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
