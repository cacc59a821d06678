"""KoalaBear base-field arithmetic on TPU (uint32 lanes, Montgomery form).

The proving field is KoalaBear: p = 2^31 - 2^24 + 1 = 0x7f000001
(reference: crates/stark/src/kb31_poseidon2.rs:20, the zkMIPS Plonky3 fork's
`p3_koala_bear::KoalaBear`).

TPU design notes
----------------
TPU VPU lanes have no 64-bit integer multiply, so a 31-bit modular multiply is
built from 16-bit limb products that each fit in uint32, followed by a
Montgomery reduction (R = 2^32).  The modulus's low 16-bit limb is 1
(p = 0x7f00_0001), which collapses the `m*p` recombination to two real
multiplies - a KoalaBear-specific speedup.  Total cost: 7 uint32 multiplies
plus shifts/adds per field multiply, fully vectorizable on the 8x128 VPU and
fusable by XLA into surrounding element-wise work.

All *device* field values are kept in Montgomery form (`x_mont = x * 2^32 mod
p`) as canonical uint32 arrays (< p).  Host <-> device boundaries convert with
`to_monty` / `from_monty`.  Host-side transcript code (stark/challenger.py)
uses exact Python ints instead and is bit-compatible at the canonical-value
level.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Constants
# ---------------------------------------------------------------------------

P = 0x7F000001  # KoalaBear modulus
MU = 0x7EFFFFFF  # -p^{-1} mod 2^32 (REDC constant)
R1 = 0x01FFFFFE  # 2^32 mod p  (Montgomery form of 1)
R2 = 0x17F7EFE4  # (2^32)^2 mod p (to_monty multiplier)
GENERATOR = 3  # multiplicative generator of F_p^*
TWO_ADICITY = 24  # p - 1 = 2^24 * 127
TWO_ADIC_GENERATOR = 1791270792  # 3^127 mod p, order 2^24
W_EF4 = 3  # EF4 = F_p[x] / (x^4 - 3), matching BinomialExtensionField<KoalaBear, 4>

_P_HI = P >> 16  # 0x7f00
_U32 = jnp.uint32


def _u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=_U32)


# ---------------------------------------------------------------------------
# Core modular ops (Montgomery form in, Montgomery form out)
# ---------------------------------------------------------------------------


def fadd(a, b):
    """a + b mod p. Inputs canonical (< p) uint32."""
    s = a + b
    return jnp.where(s >= P, s - P, s)


def fsub(a, b):
    """a - b mod p."""
    d = a - b  # wraps mod 2^32 when a < b
    return jnp.where(a >= b, d, d + P)


def fneg(a):
    return jnp.where(a == 0, a, _u32(P) - a)


RINV = pow(1 << 32, -1, P)  # 2^-32 mod p


@functools.lru_cache(maxsize=None)
def _fast_u64() -> bool:
    """True on backends with native 64-bit integer ops (CPU test runs).

    The 16-bit-limb Montgomery product is 18 primitive ops; on the XLA CPU
    backend that inflates traced graphs (and compile time, the dominant test
    cost) ~3x over the native-u64 form.  TPU lanes have no 64-bit multiply,
    so the limb path stays the device implementation there.
    """
    import jax

    return jax.default_backend() == "cpu" and jax.config.jax_enable_x64


def fmul(a, b):
    """Montgomery product: a * b * 2^-32 mod p, for canonical uint32 inputs.

    16-bit limb decomposition keeps every partial product inside uint32;
    the REDC `m*p` recombination uses p_lo == 1 so it needs only 2 multiplies.
    """
    if _fast_u64():
        t = jnp.asarray(a, jnp.uint64) * jnp.asarray(b, jnp.uint64)
        return ((t % P) * RINV % P).astype(_U32)
    a = _u32(a)
    b = _u32(b)
    mask = _u32(0xFFFF)
    a0 = a & mask
    a1 = a >> 16
    b0 = b & mask
    b1 = b >> 16

    lo_p = a0 * b0
    mid = a0 * b1 + a1 * b0  # < 2^32, no overflow
    hi_p = a1 * b1

    t = (mid & mask) << 16
    lo = lo_p + t  # uint32 wrap-around add
    carry = (lo < lo_p).astype(_U32)
    hi = hi_p + (mid >> 16) + carry

    # REDC: m = lo * MU mod 2^32 ; res = hi + hi32(m*p) + (lo != 0)
    m = lo * _u32(MU)  # wrapping multiply
    m0 = m & mask
    m1 = m >> 16
    mid2 = m0 * _u32(_P_HI) + m1
    mp_hi = m1 * _u32(_P_HI) + (mid2 >> 16)
    carry2 = (lo != 0).astype(_U32)

    res = hi + mp_hi + carry2  # < 2p < 2^32
    return jnp.where(res >= P, res - P, res)


def fsquare(a):
    return fmul(a, a)


def to_monty(x):
    """Canonical integer (< p) -> Montgomery form."""
    return fmul(_u32(x), _u32(R2))


def from_monty(x):
    """Montgomery form -> canonical integer."""
    return fmul(x, _u32(1))


def fpow(a, e: int):
    """a^e for a in Montgomery form, static integer exponent (square & multiply)."""
    result = None
    base = a
    ee = int(e)
    while ee > 0:
        if ee & 1:
            result = base if result is None else fmul(result, base)
        ee >>= 1
        if ee:
            base = fsquare(base)
    if result is None:
        return jnp.full(jnp.shape(a), R1, dtype=_U32)  # one in Montgomery form
    return result


def finv(a):
    """a^-1 mod p via Fermat (a must be nonzero; 0 maps to 0 like p3's debug use).

    p - 2 = 0b0111111_0_111111111111111111111111: square-and-multiply with the
    two all-ones runs rolled into fori_loops, so the traced graph is ~10x
    smaller than a fully unrolled ladder while the op count is identical.
    (An unrolled chain would let XLA fuse all ~60 passes into one; the loops
    trade ~30 extra elementwise passes for fast tracing - inversion inputs are
    always O(trace) sized, so this stays far off the HBM-bandwidth floor.)
    """

    def sq_mul(_, r):
        return fmul(fsquare(r), a)

    r = jax.lax.fori_loop(0, 5, sq_mul, a)  # bits 29..25 (five 1s after MSB)
    r = fsquare(r)  # bit 24 (the single 0)
    return jax.lax.fori_loop(0, 24, sq_mul, r)  # bits 23..0 (24 ones)


def fhalve(a):
    """a / 2 mod p."""
    odd = (a & 1).astype(jnp.bool_)
    return jnp.where(odd, (a >> 1) + ((P + 1) >> 1), a >> 1)


# 2^48 mod p: Montgomery factor recombining a 16-bit-shifted partial sum
# (fmul(hi, _SHIFT16_M) == hi * 2^16 mod p for canonical/Monty hi).
_SHIFT16_M = (1 << 48) % P
# Max chunk rows for exact u32 split sums: 2^13 * (2^16 - 1) < 2^29.
_FSUM_CHUNK = 1 << 13


def fsum_rows(x):
    """Exact mod-p sum over axis 0 of (N, ...) canonical/Monty u32 arrays.

    Native `jnp.sum` reductions of 16-bit lo/hi halves over <=2^13-row
    chunks (exact in u32), then a mod-p recombination of the tiny partials.
    Replaces the former pairwise fadd tree: the tree's log(N) full-array
    passes ran at 1.5-8 GB/s on TPU; this runs at ~20-23 GB/s (round-5
    measurement, tools history), a 2.4-15x kernel win in the opened-value
    and reduced-opening programs.
    """
    n = x.shape[0]
    if n == 1:
        return x[0]
    c = min(_FSUM_CHUNK, n)
    xr = x.reshape((n // c, c) + x.shape[1:])
    lo = jnp.sum(xr & _u32(0xFFFF), axis=1, dtype=jnp.uint32)  # < 2^29
    hi = jnp.sum(xr >> 16, axis=1, dtype=jnp.uint32)  # < 2^28
    part = fadd(lo % _u32(P), fmul(hi % _u32(P), _u32(_SHIFT16_M)))
    while part.shape[0] > 1:
        part = fadd(part[0::2], part[1::2])
    return part[0]


def fsum_small(x, axis=-1):
    """Exact mod-p sum over one SMALL axis (dim <= 2^13) of canonical/Monty
    u32 arrays: one native lo/hi split reduction + mod recombination."""
    assert x.shape[axis] <= _FSUM_CHUNK
    lo = jnp.sum(x & _u32(0xFFFF), axis=axis, dtype=jnp.uint32)
    hi = jnp.sum(x >> 16, axis=axis, dtype=jnp.uint32)
    return fadd(lo % _u32(P), fmul(hi % _u32(P), _u32(_SHIFT16_M)))


# ---------------------------------------------------------------------------
# Host-side exact scalar helpers (Python ints, canonical form)
# ---------------------------------------------------------------------------


def h_add(a: int, b: int) -> int:
    return (a + b) % P


def h_sub(a: int, b: int) -> int:
    return (a - b) % P


def h_mul(a: int, b: int) -> int:
    return (a * b) % P


def h_inv(a: int) -> int:
    return pow(a, P - 2, P)


@functools.lru_cache(maxsize=None)
def monty_of(x: int) -> int:
    return (x << 32) % P


def np_to_monty(x: np.ndarray) -> np.ndarray:
    """numpy canonical uint32 -> Montgomery form (host, exact via uint64)."""
    return ((x.astype(np.uint64) << np.uint64(32)) % np.uint64(P)).astype(np.uint32)


def np_from_monty(x: np.ndarray) -> np.ndarray:
    rinv = pow(1 << 32, -1, P)
    return ((x.astype(object) * rinv) % P).astype(np.uint32)


# ---------------------------------------------------------------------------
# Two-adic roots of unity
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def two_adic_root(log_n: int) -> int:
    """Canonical generator of the order-2^log_n subgroup (host int)."""
    assert 0 <= log_n <= TWO_ADICITY
    return pow(TWO_ADIC_GENERATOR, 1 << (TWO_ADICITY - log_n), P)


@functools.lru_cache(maxsize=None)
def _host_powers(base: int, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint32)
    acc = 1
    for i in range(n):
        out[i] = acc
        acc = (acc * base) % P
    return out


def powers_host(base: int, n: int) -> np.ndarray:
    """[1, base, base^2, ...] canonical, computed host-side (cached)."""
    return _host_powers(base % P, n)
