"""Pallas TPU kernel: fuse the first k NTT stages into ONE HBM pass.

Why (round-4 roofline, tools/roofline.py): the stage-per-pass XLA NTT
achieves only 9-16% of the measured mul roofline because every one of the
log_n stages streams the whole matrix through HBM.  After bit-reversal,
stage s pairs rows within contiguous blocks of 2^s rows - so stages 1..k
stay entirely inside row-blocks of 2^k rows.  This kernel grids over such
blocks, loads (2^k, W) into VMEM once, runs all k stages on-chip, and
writes once: k stages for one HBM pass instead of k passes.

Mosaic-friendly formulation (3-D reshapes of narrow vectors are
unsupported): each stage works on the flat (2^k, W) block with
  t   = x * Ts          (Ts[r] = twiddle for v-rows, Montgomery one for u-rows)
  up  = roll(t, -half)  (partner tw*v for u-rows)
  dn  = roll(t, +half)  (partner u for v-rows)
  out = where(v_row, dn - t, t + up)
The per-row twiddle/mask tables are built OUTSIDE the kernel from the
standard twiddle blob (device-generated, ops/ntt.py) - (k*2^k, 1) u32, a
few tens of KB.

DECISION (round 4, measured on the v5e-lite chip, tools/roofline.py
methodology): hybrid = 0.99x at 2^18x64, 1.11x at 2^21x40 vs the XLA NTT -
BELOW the 1.3x keep threshold, so the prover does NOT use this kernel (XLA
already fuses adjacent elementwise stages well enough that the extra HBM
passes the analysis predicted are not all real).  The kernel stays as a
correct, tested prototype (ZKBF_PALLAS_NTT=1 enables it for experiments);
numbers recorded in BASELINE.md.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import field as f

# block = 2^BLOCK_LOG rows; VMEM footprint ~ 4 * 2^BLOCK_LOG * W * 4 bytes
BLOCK_LOG = 10


def enabled() -> bool:
    return os.environ.get("ZKBF_PALLAS_NTT", "0") == "1"


@functools.lru_cache(maxsize=None)
def _stage_kernel(k: int, w: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bk = 1 << k

    def kernel(tws_ref, mask_ref, x_ref, out_ref):
        x = x_ref[:]  # (bk, w) uint32 Montgomery, bit-reversed order
        for s in range(1, k + 1):
            half = 1 << (s - 1)
            ts = tws_ref[(s - 1) * bk : s * bk, :]  # (bk, 1)
            mv = mask_ref[(s - 1) * bk : s * bk, :]  # (bk, 1), 1 on v-rows
            t = f.fmul(x, ts)
            # roll requires non-negative shifts: -half == bk - half (circular)
            up = pltpu.roll(t, bk - half, 0)
            dn = pltpu.roll(t, half, 0)
            x = jnp.where(mv != 0, f.fsub(dn, t), f.fadd(t, up))
        out_ref[:] = x

    def call(x, tws, mask):
        n = x.shape[0]
        grid = (n // bk,)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, w), x.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((k * bk, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k * bk, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bk, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            # the CPU test backend runs the kernel in interpreter mode
            interpret=jax.default_backend() == "cpu",
        )(tws, mask, x)

    return call


@functools.lru_cache(maxsize=None)
def _mask_np(k: int) -> np.ndarray:
    """(k*2^k, 1) uint32: 1 where row r has stage-s 'v' role (bit s-1 set)."""
    bk = 1 << k
    rows = np.arange(bk)
    return np.concatenate(
        [((rows >> (s - 1)) & 1).astype(np.uint32) for s in range(1, k + 1)]
    ).reshape(-1, 1)


def _row_twiddles(tw_blob: jnp.ndarray, k: int) -> jnp.ndarray:
    """(k*2^k, 1) Montgomery per-row twiddle (one on u-rows), traced from the
    standard blob so no host upload happens."""
    bk = 1 << k
    rows = jnp.arange(bk, dtype=jnp.int32)
    parts = []
    one = jnp.uint32(f.R1)
    for s in range(1, k + 1):
        half = 1 << (s - 1)
        idx = (half - 1) + (rows & (half - 1))
        tw = tw_blob[idx]
        v_row = (rows & half) != 0
        parts.append(jnp.where(v_row, tw, one))
    return jnp.concatenate(parts).reshape(-1, 1)


def ntt_first_stages(x_bitrev: jnp.ndarray, tw_blob: jnp.ndarray, k: int) -> jnp.ndarray:
    """Run NTT stages 1..k on a bit-reversed (n, w) Monty matrix in one
    Pallas pass.  tw_blob: ops/ntt.py layout (stage s at offset 2^(s-1)-1)."""
    n, w = x_bitrev.shape
    bk = 1 << k
    assert n % bk == 0 and n >= bk
    tws = _row_twiddles(tw_blob, k)
    mask = jnp.asarray(_mask_np(k))
    return _stage_kernel(k, w)(x_bitrev, tws, mask)
