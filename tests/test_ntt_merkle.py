"""NTT/LDE correctness vs naive evaluation; Merkle commit/open/verify."""

import numpy as np
import jax.numpy as jnp

from zkvm_brainfuck_tpu.ops import field as f
from zkvm_brainfuck_tpu.ops import ntt as nt
from zkvm_brainfuck_tpu.ops import merkle as mk

P = f.P
RNG = np.random.default_rng(3)


def naive_eval(coeffs, points):
    out = []
    for x in points:
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + int(c)) % P
        out.append(acc)
    return out


def test_ntt_matches_naive():
    log_n = 4
    n = 1 << log_n
    coeffs = RNG.integers(0, P, size=(n, 3), dtype=np.uint32)
    evals = np.asarray(f.from_monty(nt.ntt(f.to_monty(jnp.asarray(coeffs)))))
    g = f.two_adic_root(log_n)
    pts = [pow(g, i, P) for i in range(n)]
    for c in range(3):
        want = naive_eval([int(x) for x in coeffs[:, c]], pts)
        assert [int(x) for x in evals[:, c]] == want


def test_intt_roundtrip():
    n = 64
    coeffs = f.to_monty(jnp.asarray(RNG.integers(0, P, size=(n, 5), dtype=np.uint32)))
    back = nt.intt(nt.ntt(coeffs))
    assert np.array_equal(np.asarray(back), np.asarray(coeffs))


def test_coset_lde():
    log_n, blowup = 3, 1
    n = 1 << log_n
    coeffs = RNG.integers(0, P, size=(n, 2), dtype=np.uint32)
    evals = nt.ntt(f.to_monty(jnp.asarray(coeffs)))
    lde = np.asarray(f.from_monty(nt.coset_lde(evals, blowup, f.GENERATOR)))
    g2 = f.two_adic_root(log_n + blowup)
    pts = [(f.GENERATOR * pow(g2, i, P)) % P for i in range(n << blowup)]
    for c in range(2):
        want = naive_eval([int(x) for x in coeffs[:, c]], pts)
        assert [int(x) for x in lde[:, c]] == want


def test_bit_reverse_rows():
    x = jnp.arange(8, dtype=jnp.uint32)[:, None]
    got = np.asarray(nt.bit_reverse_rows(x))[:, 0]
    assert list(got) == [0, 4, 2, 6, 1, 5, 3, 7]


def test_merkle_single_matrix():
    m = RNG.integers(0, P, size=(16, 5), dtype=np.uint32)
    tree = mk.commit([f.to_monty(jnp.asarray(m))])
    idxs = np.array([0, 3, 15])
    opened, proof = mk.open_batch(tree, idxs)
    for q, idx in enumerate(idxs):
        assert np.array_equal(opened[0][q], m[idx])
        ok = mk.verify_batch(tree.root, [(16, 5)], int(idx), [opened[0][q]], proof[q])
        assert ok
    # tampered row fails
    bad = opened[0][0].copy()
    bad[0] ^= 1
    assert not mk.verify_batch(tree.root, [(16, 5)], 0, [bad], proof[0])


def test_merkle_multi_height():
    m1 = RNG.integers(0, P, size=(16, 3), dtype=np.uint32)
    m2 = RNG.integers(0, P, size=(4, 7), dtype=np.uint32)
    m3 = RNG.integers(0, P, size=(16, 2), dtype=np.uint32)
    mats = [f.to_monty(jnp.asarray(x)) for x in (m1, m2, m3)]
    tree = mk.commit(mats)
    dims = [(16, 3), (4, 7), (16, 2)]
    idxs = np.arange(16)
    opened, proof = mk.open_batch(tree, idxs)
    for q in range(16):
        rows = [opened[k][q] for k in range(3)]
        assert mk.verify_batch(tree.root, dims, q, rows, proof[q])
        assert np.array_equal(opened[1][q], m2[q >> 2])  # height-4 matrix row map


def test_pallas_ntt_first_stages_matches_xla():
    """The Pallas fused-first-stages NTT prototype (ops/ntt_pallas.py; NOT
    wired into the prover - measured 0.99-1.11x vs XLA, below the 1.3x keep
    bar, see BASELINE.md) must stay bit-exact with the XLA stage loop."""
    import jax

    from zkvm_brainfuck_tpu.ops import ntt_pallas as ntp

    log_n, w, k = 8, 5, 6
    n = 1 << log_n
    rng = np.random.default_rng(3)
    x = f.to_monty(jnp.asarray(rng.integers(0, f.P, size=(n, w), dtype=np.uint32)))
    tw = jax.jit(lambda: nt.twiddle_blob_traced(log_n, False))()
    rev = jax.jit(lambda: nt.bitrev_traced(log_n))()
    ref = jax.jit(lambda x: nt.ntt_traced(x, tw, rev, log_n, False))(x)

    def hybrid(x):
        xb = x[rev]
        xb = ntp.ntt_first_stages(xb, tw, k)
        cols = xb.shape[1]
        for s in range(k + 1, log_n + 1):
            m = 1 << s
            half = m // 2
            tws = jax.lax.dynamic_slice_in_dim(tw, half - 1, half)
            y = xb.reshape(n // m, m, cols)
            u = y[:, :half, :]
            v = f.fmul(y[:, half:, :], tws[None, :, None])
            xb = jnp.concatenate([f.fadd(u, v), f.fsub(u, v)], axis=1).reshape(n, cols)
        return xb

    out = jax.jit(hybrid)(x)
    assert (np.asarray(out) == np.asarray(ref)).all()
