"""Property tests for KoalaBear base/extension arithmetic vs exact Python ints."""

import numpy as np
import jax.numpy as jnp

from zkvm_brainfuck_tpu.ops import field as f
from zkvm_brainfuck_tpu.ops import ext as e

P = f.P
RNG = np.random.default_rng(0)


def rand_field(n):
    return RNG.integers(0, P, size=n, dtype=np.uint32)


def test_monty_roundtrip():
    x = rand_field(1000)
    xm = f.to_monty(x)
    back = np.asarray(f.from_monty(xm))
    assert np.array_equal(back, x)
    # host conversion agrees with device conversion
    assert np.array_equal(np.asarray(xm), f.np_to_monty(x))


def test_fmul_matches_ints():
    a = rand_field(4096)
    b = rand_field(4096)
    am, bm = f.to_monty(a), f.to_monty(b)
    got = np.asarray(f.from_monty(f.fmul(am, bm)))
    want = (a.astype(object) * b.astype(object)) % P
    assert np.array_equal(got.astype(object), want)


def test_fmul_edge_cases():
    edge = np.array([0, 1, 2, P - 1, P - 2, 0xFFFF, 0x10000, P >> 1], dtype=np.uint32)
    a, b = np.meshgrid(edge, edge)
    a, b = a.ravel(), b.ravel()
    am, bm = f.to_monty(a), f.to_monty(b)
    got = np.asarray(f.from_monty(f.fmul(am, bm))).astype(object)
    want = (a.astype(object) * b.astype(object)) % P
    assert np.array_equal(got, want)


def test_add_sub_neg():
    a = rand_field(4096)
    b = rand_field(4096)
    assert np.array_equal(
        np.asarray(f.fadd(a, b)).astype(object), (a.astype(object) + b) % P
    )
    assert np.array_equal(
        np.asarray(f.fsub(a, b)).astype(object), (a.astype(object) - b) % P
    )
    assert np.array_equal(np.asarray(f.fneg(a)).astype(object), (-a.astype(object)) % P)


def test_inv_and_halve():
    a = rand_field(512)
    a[a == 0] = 1
    am = f.to_monty(a)
    prod = np.asarray(f.from_monty(f.fmul(am, f.finv(am))))
    assert np.all(prod == 1)
    h = np.asarray(f.from_monty(f.fhalve(f.to_monty(a)))).astype(object)
    assert np.array_equal((h * 2) % P, a.astype(object))


def test_two_adic_root():
    g = f.two_adic_root(10)
    assert pow(g, 1 << 10, P) == 1 and pow(g, 1 << 9, P) == P - 1
    assert f.two_adic_root(0) == 1
    assert f.two_adic_root(1) == P - 1


def _ef_int_mul(a, b):
    """Exact EF4 mul on 4-tuples of ints (x^4 = 3)."""
    c = [0] * 7
    for i in range(4):
        for j in range(4):
            c[i + j] = (c[i + j] + a[i] * b[j]) % P
    for k in range(6, 3, -1):
        c[k - 4] = (c[k - 4] + 3 * c[k]) % P
    return tuple(c[:4])


def test_ext_mul_matches_ints():
    n = 512
    a = rand_field(4 * n).reshape(n, 4)
    b = rand_field(4 * n).reshape(n, 4)
    am, bm = e.from_array(f.to_monty(a)), e.from_array(f.to_monty(b))
    got = np.asarray(f.from_monty(e.to_array(e.emul(am, bm))))
    for i in range(0, n, 37):
        want = _ef_int_mul(tuple(int(x) for x in a[i]), tuple(int(x) for x in b[i]))
        assert tuple(int(x) for x in got[i]) == want


def test_ext_inv():
    n = 256
    a = rand_field(4 * n).reshape(n, 4)
    a[0] = [5, 0, 0, 0]  # base-field element embeds correctly
    am = e.from_array(f.to_monty(a))
    inv = e.einv(am)
    prod = np.asarray(f.from_monty(e.to_array(e.emul(am, inv))))
    want = np.zeros((n, 4), dtype=np.uint32)
    want[:, 0] = 1
    assert np.array_equal(prod, want)


def test_ext_base_ops():
    n = 64
    a = e.from_array(f.to_monty(rand_field(4 * n).reshape(n, 4)))
    s = f.to_monty(rand_field(n))
    got = e.emul_base(a, s)
    want = e.emul(a, e.from_base(s))
    assert np.array_equal(np.asarray(e.to_array(got)), np.asarray(e.to_array(want)))
    got2 = e.eadd_base(a, s)
    want2 = e.eadd(a, e.from_base(s))
    assert np.array_equal(np.asarray(e.to_array(got2)), np.asarray(e.to_array(want2)))


def test_epow_matches_square_chain():
    a = e.from_array(f.to_monty(rand_field(4).reshape(1, 4)))
    x9 = e.epow(a, 9)
    manual = e.emul(e.esquare(e.esquare(e.esquare(a))), a)
    assert np.array_equal(np.asarray(e.to_array(x9)), np.asarray(e.to_array(manual)))


def test_fsum_exact_reductions():
    """fsum_rows / fsum_small match an exact host mod-p sum."""
    import numpy as np
    import jax.numpy as jnp
    from zkvm_brainfuck_tpu.ops import field as f

    rng = np.random.default_rng(5)
    for shape, axis in [((1 << 15, 7), 0), ((64, 5), 0), ((1, 3), 0)]:
        x = rng.integers(0, f.P, size=shape, dtype=np.uint32)
        got = np.asarray(f.fsum_rows(jnp.asarray(x)))
        want = (x.astype(np.uint64).sum(axis=0) % f.P).astype(np.uint32)
        assert (got == want).all(), shape
    x = rng.integers(0, f.P, size=(1 << 10, 77), dtype=np.uint32)
    got = np.asarray(f.fsum_small(jnp.asarray(x), axis=-1))
    want = (x.astype(np.uint64).sum(axis=1) % f.P).astype(np.uint32)
    assert (got == want).all()
    got = np.asarray(f.fsum_small(jnp.asarray(x.T), axis=0))
    assert (got == want).all()
