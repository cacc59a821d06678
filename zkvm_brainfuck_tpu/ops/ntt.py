"""Radix-2 NTT / LDE over KoalaBear for column batches, TPU-shaped.

Replaces the reference's `Radix2DitParallel` DFT (kb31_poseidon2.rs:30).

Data layout: matrices are (rows, cols) uint32 Montgomery; the transform runs
down the row axis for all columns at once.  Each butterfly stage is one
reshape + constant-multiply + add/sub over the whole matrix - pure VPU work
that XLA fuses across stages inside a single jit.  Twiddle tables are computed
host-side once per size and cached on device.

Conventions (matching p3 two-adic domains):
- `ntt(coeffs)` returns evaluations in NATURAL order over H_n
  (points g^0, g^1, ..., g = two_adic_generator(log_n)); `intt` inverts.
- `coset_lde(evals, log_blowup, shift)` maps evaluations over H_n to
  evaluations over shift*H_{n<<b} in natural order (the PCS commits these in
  bit-reversed row order; see ops/merkle.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from . import field as f
from .field import P


@lru_cache(maxsize=None)
def bit_reversal_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@lru_cache(maxsize=None)
def _twiddles(log_n: int, inverse: bool):
    """Per-stage twiddle tables (monty numpy), stage s has 2^(s-1) entries."""
    tables = []
    for s in range(1, log_n + 1):
        m = 1 << s
        w = f.two_adic_root(s)
        if inverse:
            w = pow(w, m - 1, P)  # w^-1
        tw = f.powers_host(w, m // 2)
        tables.append(f.np_to_monty(tw))
    return tables


@lru_cache(maxsize=None)
def twiddle_blob(log_n: int, inverse: bool) -> np.ndarray:
    """All stage tables concatenated: stage s at offset 2^(s-1)-1, length
    2^(s-1).  Passed to traced NTTs as a device ARGUMENT so multi-MB tables
    never get embedded in the HLO (compile/cache-key bloat)."""
    if log_n == 0:
        return np.zeros(1, np.uint32)
    return np.concatenate(_twiddles(log_n, inverse))


# ---------------------------------------------------------------------------
# Device-side table generation.
#
# The big argument tables (twiddle blobs, bit-reversal permutations, power
# series) used to be computed host-side and uploaded; on a tunneled TPU the
# host<->device link is the scarcest resource (a 2^20-cycle prove needs
# >100 MB of tables), so they are generated ON DEVICE from a few scalar
# constants instead: a power series is log_n doubling steps (each one
# whole-vector multiply), a bit-reversal is log_n shift/or passes over iota.
# ---------------------------------------------------------------------------


def powers_traced(base: int, log_n: int):
    """(2^log_n,) Montgomery device array [1, b, b^2, ...]; b a host int."""
    import jax.numpy as jnp

    p = jnp.full((1,), f.R1, jnp.uint32)
    for s in range(log_n):
        scalar = f.monty_of(pow(base, 1 << s, P))
        p = jnp.concatenate([p, f.fmul(p, jnp.uint32(scalar))])
    return p


def bitrev_traced(log_n: int):
    """(2^log_n,) int32 bit-reversal permutation, built on device."""
    import jax.numpy as jnp

    idx = jnp.arange(1 << log_n, dtype=jnp.uint32)
    rev = jnp.zeros_like(idx)
    for b in range(log_n):
        rev = rev | (((idx >> b) & 1) << (log_n - 1 - b))
    return rev.astype(jnp.int32)


def twiddle_blob_traced(log_n: int, inverse: bool):
    """Device twiddle blob (same layout as `twiddle_blob`), no upload."""
    import jax.numpy as jnp

    if log_n == 0:
        return jnp.zeros(1, jnp.uint32)
    stages = []
    for s in range(1, log_n + 1):
        w = f.two_adic_root(s)
        if inverse:
            w = pow(w, (1 << s) - 1, P)
        stages.append(powers_traced(w, s - 1))
    return jnp.concatenate(stages)


def ntt_traced(x, tw_blob, rev, log_n: int, inverse: bool):
    """Traceable NTT down axis 0 with twiddles/permutation as arguments.

    x: (2^log_n, ...) Monty; tw_blob covers at least log_n stages; rev is the
    bit-reversal permutation (device arg, so multi-MB tables never get
    embedded in the HLO).  Natural order in and out.
    """
    n = 1 << log_n
    if log_n == 0:
        return x
    orig_shape = x.shape
    x = x.reshape(n, -1)
    cols = x.shape[1]
    x = x[rev]
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m // 2
        tw = jax.lax.dynamic_slice_in_dim(tw_blob, half - 1, half)
        y = x.reshape(n // m, m, cols)
        u = y[:, :half, :]
        v = f.fmul(y[:, half:, :], tw[None, :, None])
        x = jnp.concatenate([f.fadd(u, v), f.fsub(u, v)], axis=1).reshape(n, cols)
    if inverse:
        n_inv = f.monty_of(pow(n, P - 2, P))
        x = f.fmul(x, jnp.uint32(n_inv))
    return x.reshape(orig_shape)


def bit_reverse_rows(x):
    n = x.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    return x[bitrev_traced(log_n)]


@partial(jax.jit, static_argnames=("inverse",))
def _ntt_jit(x, inverse: bool):
    n = x.shape[0]
    log_n = n.bit_length() - 1
    orig_shape = x.shape
    x = x.reshape(n, -1)
    cols = x.shape[1]
    x = x[bitrev_traced(log_n)]
    tws = _twiddles(log_n, inverse)
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m // 2
        y = x.reshape(n // m, m, cols)
        u = y[:, :half, :]
        v = f.fmul(y[:, half:, :], tws[s - 1][None, :, None])
        x = jnp.concatenate([f.fadd(u, v), f.fsub(u, v)], axis=1).reshape(n, cols)
    if inverse:
        n_inv = f.monty_of(pow(n, P - 2, P))
        x = f.fmul(x, jnp.uint32(n_inv))
    return x.reshape(orig_shape)


def ntt(coeffs):
    """Coefficients -> evaluations over H_n (natural order). Shape (n, ...)."""
    if coeffs.shape[0] == 1:
        return coeffs
    return _ntt_jit(coeffs, False)


def intt(evals):
    """Evaluations over H_n (natural order) -> coefficients."""
    if evals.shape[0] == 1:
        return evals
    return _ntt_jit(evals, True)


@lru_cache(maxsize=None)
def _shift_powers(shift: int, n: int):
    return f.np_to_monty(f.powers_host(shift, n))  # numpy: jit-trace safe


@partial(jax.jit, static_argnames=("log_blowup", "shift"))
def coset_lde(evals, log_blowup: int, shift: int = f.GENERATOR):
    """Evals over H_n -> evals over shift*H_{n<<log_blowup} (natural order).

    p(shift*x) over the larger subgroup: coeffs scaled by shift^i, zero-padded.
    """
    n = evals.shape[0]
    coeffs = intt(evals)
    sp = _shift_powers(shift, n)
    coeffs = f.fmul(coeffs, sp.reshape((n,) + (1,) * (evals.ndim - 1)))
    pad = [(0, n * ((1 << log_blowup) - 1))] + [(0, 0)] * (evals.ndim - 1)
    coeffs = jnp.pad(coeffs, pad)
    return ntt(coeffs)


