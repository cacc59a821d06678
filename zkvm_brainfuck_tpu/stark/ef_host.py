"""Exact host-side EF4 scalar arithmetic (4-tuples of canonical ints).

Used by the verifier and transcript logic where values are single field
elements, not arrays.  Mirrors ops/ext.py (x^4 = 3)."""

from __future__ import annotations

from ..ops.field import P

W = 3

ZERO = (0, 0, 0, 0)
ONE = (1, 0, 0, 0)


def from_base(c: int):
    return (c % P, 0, 0, 0)


def add(a, b):
    return tuple((x + y) % P for x, y in zip(a, b))


def sub(a, b):
    return tuple((x - y) % P for x, y in zip(a, b))


def neg(a):
    return tuple((-x) % P for x in a)


def mul(a, b):
    c = [0] * 7
    for i in range(4):
        ai = a[i]
        if ai:
            for j in range(4):
                c[i + j] += ai * b[j]
    for k in range(6, 3, -1):
        c[k - 4] += W * c[k]
    return tuple(x % P for x in c[:4])


def mul_base(a, s: int):
    return tuple(x * s % P for x in a)


def add_base(a, s: int):
    return ((a[0] + s) % P, a[1], a[2], a[3])


def epow(a, e: int):
    r = ONE
    while e:
        if e & 1:
            r = mul(r, a)
        a = mul(a, a)
        e >>= 1
    return r


def inv(a):
    # a^(p^4 - 2); fine at verifier scale
    assert a != ZERO
    return epow(a, P**4 - 2)


def monomial(k: int):
    t = [0, 0, 0, 0]
    t[k] = 1
    return tuple(t)
