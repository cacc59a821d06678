"""Quartic extension field EF4 = F_p[x]/(x^4 - 3) over KoalaBear, on TPU.

Matches the reference's challenge field `BinomialExtensionField<KoalaBear, 4>`
(crates/stark/src/kb31_poseidon2.rs:21).  Elements are uint32 arrays with a
trailing axis of length 4 (coefficients in the monomial basis, Montgomery
form).  All ops are elementwise over leading axes so XLA vectorizes them on
the VPU and fuses them with neighbours.

Inverse uses the norm map: a^-1 = (sigma(a) sigma^2(a) sigma^3(a)) / N(a)
where sigma is the Frobenius x -> x^p, acting diagonally on coefficients via
powers of c = W^((p-1)/4).  This costs 2 EF multiplies + one base-field
Fermat inversion - far cheaper than a direct p^4-2 power ladder.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import field as f
from .field import P, W_EF4

_U32 = jnp.uint32

# c = W^((p-1)/4) mod p: the 4th root of unity scaling Frobenius.
FROB_C = 2113994754
_FROB_POWERS = [[pow(FROB_C, (i * k) % 4, P) for i in range(4)] for k in range(4)]  # c^4 == 1
# _FROB_POWERS[k][i] = c^(i*k) canonical; k = Frobenius iterate.

D = 4  # extension degree


def ezeros(shape=()):
    return jnp.zeros(tuple(shape) + (4,), dtype=_U32)


def eones(shape=()):
    z = np.zeros(tuple(shape) + (4,), dtype=np.uint32)
    z[..., 0] = f.R1  # one in Montgomery form
    return jnp.asarray(z)


def from_base(a):
    """Embed base-field array (Montgomery) into EF4: coefficient 0."""
    a = jnp.asarray(a, _U32)
    return jnp.stack([a, jnp.zeros_like(a), jnp.zeros_like(a), jnp.zeros_like(a)], axis=-1)


def from_coeffs(c0, c1, c2, c3):
    return jnp.stack([jnp.asarray(x, _U32) for x in (c0, c1, c2, c3)], axis=-1)


def eadd(a, b):
    return f.fadd(a, b)


def esub(a, b):
    return f.fsub(a, b)


def eneg(a):
    return f.fneg(a)


def _triple(x):
    return f.fadd(f.fadd(x, x), x)


def emul(a, b):
    """Full EF4 product (schoolbook, 16 base muls; W=3 folds are adds)."""
    a0, a1, a2, a3 = (a[..., i] for i in range(4))
    b0, b1, b2, b3 = (b[..., i] for i in range(4))
    m = f.fmul
    add = f.fadd
    c0 = add(m(a0, b0), _triple(add(add(m(a1, b3), m(a2, b2)), m(a3, b1))))
    c1 = add(add(m(a0, b1), m(a1, b0)), _triple(add(m(a2, b3), m(a3, b2))))
    c2 = add(add(m(a0, b2), add(m(a1, b1), m(a2, b0))), _triple(m(a3, b3)))
    c3 = add(add(m(a0, b3), m(a1, b2)), add(m(a2, b1), m(a3, b0)))
    return jnp.stack([c0, c1, c2, c3], axis=-1)


def emul_base(a, s):
    """EF4 * base scalar (both Montgomery); s broadcasts across the coeff axis."""
    return f.fmul(a, jnp.asarray(s, _U32)[..., None])


def eadd_base(a, s):
    """EF4 + base scalar: adds into coefficient 0."""
    out0 = f.fadd(a[..., 0], jnp.asarray(s, _U32))
    return jnp.concatenate([out0[..., None], a[..., 1:]], axis=-1)


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
        return eones(jnp.shape(a)[:-1])
    return result


def _frobenius(a, k: int):
    """a^(p^k): coefficient i scaled by c^(i*k)."""
    scales = jnp.asarray(
        [f.monty_of(_FROB_POWERS[k % 4][i]) for i in range(4)], dtype=_U32
    )
    return f.fmul(a, scales)


def einv(a):
    """EF4 inverse (a != 0). Vectorized; 0 maps to 0."""
    s1 = _frobenius(a, 1)
    s2 = _frobenius(a, 2)
    s3 = _frobenius(a, 3)
    b = emul(emul(s1, s2), s3)  # product of conjugates
    norm = emul(a, b)[..., 0]  # N(a) lands in the base field (coeff 0)
    return emul_base(b, f.finv(norm))


def monomial(k: int, shape=()):
    """x^k basis element as an EF4 constant array."""
    z = np.zeros(tuple(shape) + (4,), dtype=np.uint32)
    z[..., k % 4] = f.R1 if k < 4 else 0
    assert 0 <= k < 4
    return jnp.asarray(z)
