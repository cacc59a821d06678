"""Two-adic multiplicative coset domains + Lagrange selectors.

Counterpart of p3's TwoAdicMultiplicativeCoset as used by the reference PCS
(natural_domain_for_degree, create_disjoint_domain, split_domains,
selectors_at_point / selectors_on_coset, zp_at_point, next_point).

A domain is (log_n, shift): the points shift * g^i, g = two_adic_generator.
Selectors follow p3's unshifted convention: with u = x / shift,
Z(u) = u^n - 1, first = Z/(u-1), last = Z/(u - g^{-1}), transition = u - g^{-1}.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..ops import ext as xe
from ..ops import field as xf
from ..ops.field import GENERATOR, P
from . import ef_host as efh


@dataclass(frozen=True)
class Domain:
    log_n: int
    shift: int = 1

    @property
    def size(self) -> int:
        return 1 << self.log_n

    @property
    def gen(self) -> int:
        return xf.two_adic_root(self.log_n)

    def first_point(self) -> int:
        return self.shift

    def next_point_ef(self, zeta):
        """g * zeta for an EF4 point (host tuple)."""
        return efh.mul_base(zeta, self.gen)

    def create_disjoint_domain(self, min_size: int) -> "Domain":
        return Domain(
            log_n=(min_size - 1).bit_length(),
            shift=self.shift * GENERATOR % P,
        )

    def split_domains(self, n_chunks: int) -> list:
        log_chunks = n_chunks.bit_length() - 1
        g = self.gen
        return [
            Domain(self.log_n - log_chunks, self.shift * pow(g, k, P) % P)
            for k in range(n_chunks)
        ]

    # -- host (EF point) selectors ---------------------------------------

    def zp_at_point_ef(self, point):
        """Z(point) = (point/shift)^n - 1 for an EF4 point."""
        u = efh.mul_base(point, pow(self.shift, P - 2, P))
        return efh.add_base(efh.epow(u, self.size), P - 1)

    def selectors_at_point_ef(self, point):
        u = efh.mul_base(point, pow(self.shift, P - 2, P))
        z_h = efh.add_base(efh.epow(u, self.size), P - 1)
        g_inv = pow(self.gen, P - 2, P)
        first_den = efh.add_base(u, P - 1)
        last_den = efh.add_base(u, P - g_inv)
        return {
            "is_first_row": efh.mul(z_h, efh.inv(first_den)),
            "is_last_row": efh.mul(z_h, efh.inv(last_den)),
            "is_transition": last_den,
            "inv_zeroifier": efh.inv(z_h),
        }

    # -- device (whole-coset) selectors ----------------------------------

    def points_host(self) -> np.ndarray:
        """All domain points, natural order, canonical uint32."""
        pows = xf.powers_host(self.gen, self.size)
        return (pows.astype(np.uint64) * self.shift % P).astype(np.uint32)


@lru_cache(maxsize=None)
def selector_inputs_on_coset(trace_log_n: int, coset_log_n: int, coset_shift: int):
    """Host (numpy canonical) selector ingredients - jit-trace safe to cache."""
    assert coset_shift != 1
    n = 1 << trace_log_n
    coset = Domain(coset_log_n, coset_shift)
    x = coset.points_host().astype(np.uint64)  # u = x (trace shift 1)
    z_h = (
        pow(coset_shift, n, P) * pow_array(xf.two_adic_root(coset_log_n), n, coset.size)
        - 1
    ) % P
    g_inv = pow(xf.two_adic_root(trace_log_n), P - 2, P)
    first_den = (x + P - 1) % P
    last_den = (x + P - g_inv) % P
    return (
        xf.np_to_monty(z_h.astype(np.uint32)),
        xf.np_to_monty(first_den.astype(np.uint32)),
        xf.np_to_monty(last_den.astype(np.uint32)),
    )


def np_finv(x: np.ndarray) -> np.ndarray:
    """Vectorized Fermat inversion on canonical uint64 numpy (exact).

    Square-and-multiply for p-2 = 0b0111111_0_1^24; products stay < 2^62.
    """
    x = x % P
    r = x.copy()
    for _ in range(5):
        r = (r * r % P) * x % P
    r = r * r % P
    for _ in range(24):
        r = (r * r % P) * x % P
    return r


@lru_cache(maxsize=None)
def selectors_on_coset(trace_log_n: int, coset_log_n: int, coset_shift: int):
    """Selectors of the trace domain H_n (shift 1) over a larger coset.

    Matches p3 selectors_on_coset (quotient.rs usage).  Computed ONCE per
    domain signature (cached) in exact host numpy: callers inside jit traces
    see plain constants, so the three field inversions never inflate per-chip
    quotient graphs and no tracer can leak into the cache.
    """
    assert coset_shift != 1
    n = 1 << trace_log_n
    coset = Domain(coset_log_n, coset_shift)
    x = coset.points_host().astype(np.uint64)
    z_h = (
        pow(coset_shift, n, P) * pow_array(xf.two_adic_root(coset_log_n), n, coset.size)
        - 1
    ) % P
    g_inv = pow(xf.two_adic_root(trace_log_n), P - 2, P)
    first_den = (x + P - 1) % P
    last_den = (x + P - g_inv) % P
    to_m = lambda a: xf.np_to_monty(a.astype(np.uint32))
    return {
        "is_first_row": to_m(z_h * np_finv(first_den) % P),
        "is_last_row": to_m(z_h * np_finv(last_den) % P),
        "is_transition": to_m(last_den),
        "inv_zeroifier": to_m(np_finv(z_h)),
    }


@lru_cache(maxsize=None)
def selectors_on_coset_dev(trace_log_n: int, coset_log_n: int, coset_shift: int):
    """Device-generated Monty selector arrays (one tiny jit per signature).

    Same values as `selectors_on_coset`, but built ON DEVICE from scalar
    constants: the four coset-sized tables (4 x 8 MB at 2^21) never cross
    the host->device link.  z_h is periodic with period = blowup, so its
    (and the zeroifier-inverse's) Fermat inversion runs on `blowup` lanes.
    """
    assert coset_shift != 1
    import jax
    import jax.numpy as jnp

    from ..ops import ntt as nt

    def build():
        n = 1 << trace_log_n
        g_c = xf.two_adic_root(coset_log_n)
        x = xf.fmul(
            nt.powers_traced(g_c, coset_log_n),
            jnp.uint32(xf.monty_of(coset_shift)),
        )
        log_per = coset_log_n - trace_log_n
        zh_short = xf.fsub(
            xf.fmul(
                nt.powers_traced(pow(g_c, n, P), log_per),
                jnp.uint32(xf.monty_of(pow(coset_shift, n, P))),
            ),
            jnp.uint32(xf.monty_of(1)),
        )
        g_inv = pow(xf.two_adic_root(trace_log_n), P - 2, P)
        first_den = xf.fadd(x, jnp.uint32(xf.monty_of(P - 1)))
        last_den = xf.fadd(x, jnp.uint32(xf.monty_of(P - g_inv)))
        reps = 1 << trace_log_n
        return {
            "is_first_row": xf.fmul(jnp.tile(zh_short, reps), xf.finv(first_den)),
            "is_last_row": xf.fmul(jnp.tile(zh_short, reps), xf.finv(last_den)),
            "is_transition": last_den,
            "inv_zeroifier": jnp.tile(xf.finv(zh_short), reps),
        }

    return jax.jit(build)()


def pow_array(g: int, e: int, size: int) -> np.ndarray:
    """(g^e)^i for i in 0..size (uint64). g^e has small order: tiled."""
    ge = pow(g, e, P)
    order = 1
    acc = ge
    while acc != 1:
        acc = acc * ge % P
        order += 1
        if order > size:
            break
    base = xf.powers_host(ge, min(order, size)).astype(np.uint64)
    reps = (size + len(base) - 1) // len(base)
    return np.tile(base, reps)[:size]
