"""Quartic extension field EF4 = F_p[x]/(x^4 - 3) over KoalaBear, on TPU.

Matches the reference's challenge field `BinomialExtensionField<KoalaBear, 4>`
(crates/stark/src/kb31_poseidon2.rs:21).

Representation: an EF4 value is a TUPLE of 4 base-field planes (uint32
Montgomery arrays of identical shape).  Keeping coefficients as separate
arrays - instead of a trailing axis built with jnp.stack - matters a lot:
stack/slice chains inside deep multiply graphs send XLA's CPU pipeline into
pathological compile times, while plain elementwise planes compile in
milliseconds and fuse cleanly on the TPU VPU.  Convert to/from the packed
(..., 4) storage layout only at kernel boundaries with `to_array`/`from_array`.

Inverse uses the norm map: a^-1 = (sigma(a) sigma^2(a) sigma^3(a)) / N(a),
sigma the Frobenius acting diagonally via powers of c = W^((p-1)/4); cost is
2 EF multiplies + one base-field Fermat inversion, fully vectorized.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import field as f
from .field import P, W_EF4

_U32 = jnp.uint32

# c = W^((p-1)/4) mod p: the 4th root of unity scaling Frobenius.
FROB_C = 2113994754
_FROB_POWERS = [[pow(FROB_C, (i * k) % 4, P) for i in range(4)] for k in range(4)]

D = 4  # extension degree


def ezeros(shape=()):
    z = jnp.zeros(shape, dtype=_U32)
    return (z, z, z, z)


def eones(shape=()):
    return (jnp.full(shape, f.R1, dtype=_U32), *(jnp.zeros(shape, dtype=_U32),) * 3)


def from_base(a):
    a = jnp.asarray(a, _U32)
    z = jnp.zeros_like(a)
    return (a, z, z, z)


def from_coeffs(c0, c1, c2, c3):
    return tuple(jnp.asarray(x, _U32) for x in (c0, c1, c2, c3))


def to_array(a):
    """Planes -> packed (..., 4) array (storage/commit layout)."""
    return jnp.stack(list(a), axis=-1)


def from_array(arr):
    """Packed (..., 4) array -> planes."""
    return tuple(arr[..., i] for i in range(4))


def eadd(a, b):
    return tuple(f.fadd(x, y) for x, y in zip(a, b))


def esub(a, b):
    return tuple(f.fsub(x, y) for x, y in zip(a, b))


def eneg(a):
    return tuple(f.fneg(x) for x in a)


def _triple(x):
    return f.fadd(f.fadd(x, x), x)


def emul(a, b):
    """Full EF4 product mod (x^4 - 3).

    On the TPU limb path a base mul is ~30 primitive ops while an add is 3,
    so two-level Karatsuba (9 muls + ~33 adds) beats schoolbook (16 muls +
    ~12 adds) on traced-graph size AND compute; with native-u64 muls (CPU
    tests) schoolbook is smaller, so pick per backend.
    """
    a0, a1, a2, a3 = a
    b0, b1, b2, b3 = b
    m = f.fmul
    add = f.fadd
    if f._fast_u64():
        c0 = add(m(a0, b0), _triple(add(add(m(a1, b3), m(a2, b2)), m(a3, b1))))
        c1 = add(add(m(a0, b1), m(a1, b0)), _triple(add(m(a2, b3), m(a3, b2))))
        c2 = add(add(m(a0, b2), add(m(a1, b1), m(a2, b0))), _triple(m(a3, b3)))
        c3 = add(add(m(a0, b3), m(a1, b2)), add(m(a2, b1), m(a3, b0)))
        return (c0, c1, c2, c3)
    sub = f.fsub

    def kara2(u0, u1, v0, v1):
        """(u0 + u1 x)(v0 + v1 x) -> 3 coeffs, 3 muls."""
        k0 = m(u0, v0)
        k2 = m(u1, v1)
        k1 = sub(sub(m(add(u0, u1), add(v0, v1)), k0), k2)
        return k0, k1, k2

    # P = P0 + P1 x^2, M0 = P0 Q0, M2 = P1 Q1, M1 = (P0+P1)(Q0+Q1) - M0 - M2
    m00, m01, m02 = kara2(a0, a1, b0, b1)
    m20, m21, m22 = kara2(a2, a3, b2, b3)
    s0, s1 = add(a0, a2), add(a1, a3)
    t0, t1 = add(b0, b2), add(b1, b3)
    k0, k1, k2 = kara2(s0, s1, t0, t1)
    m10 = sub(sub(k0, m00), m20)
    m11 = sub(sub(k1, m01), m21)
    m12 = sub(sub(k2, m02), m22)
    # PQ = M0 + M1 x^2 + M2 x^4, with x^4 = 3.
    c0 = add(m00, _triple(add(m12, m20)))
    c1 = add(m01, _triple(m21))
    c2 = add(add(m02, m10), _triple(m22))
    c3 = m11
    return (c0, c1, c2, c3)


def emul_base(a, s):
    """EF4 * base scalar/array (both Montgomery)."""
    s = jnp.asarray(s, _U32)
    return tuple(f.fmul(x, s) for x in a)


def eadd_base(a, s):
    """EF4 + base: adds into coefficient 0."""
    return (f.fadd(a[0], jnp.asarray(s, _U32)), a[1], a[2], a[3])


def esquare(a):
    return emul(a, a)


def epow(a, e: int):
    result = None
    base = a
    ee = int(e)
    while ee > 0:
        if ee & 1:
            result = base if result is None else emul(result, base)
        ee >>= 1
        if ee:
            base = esquare(base)
    if result is None:
        return eones(jnp.shape(a[0]))
    return result


def _frobenius(a, k: int):
    """a^(p^k): coefficient i scaled by c^(i*k)."""
    return tuple(
        f.fmul(a[i], jnp.uint32(f.monty_of(_FROB_POWERS[k % 4][i]))) for i in range(4)
    )


def einv(a):
    """EF4 inverse (a != 0). Vectorized; 0 maps to 0."""
    s1 = _frobenius(a, 1)
    s2 = _frobenius(a, 2)
    s3 = _frobenius(a, 3)
    b = emul(emul(s1, s2), s3)  # product of conjugates
    norm = emul(a, b)[0]  # N(a) lands in the base field (coeff 0)
    return emul_base(b, f.finv(norm))


def monomial(k: int, shape=()):
    """x^k basis element as EF4 planes."""
    assert 0 <= k < 4
    planes = [jnp.zeros(shape, dtype=_U32) for _ in range(4)]
    planes[k] = jnp.full(shape, f.R1, dtype=_U32)
    return tuple(planes)
