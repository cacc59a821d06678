"""Poseidon2 host/device agreement + sponge/compress/challenger semantics."""

import numpy as np
import jax.numpy as jnp

from zkvm_brainfuck_tpu.ops import field as f
from zkvm_brainfuck_tpu.ops import poseidon2 as p2
from zkvm_brainfuck_tpu.stark.challenger import DuplexChallenger

P = f.P
RNG = np.random.default_rng(7)


def test_permute_host_device_agree():
    states = RNG.integers(0, P, size=(32, 16), dtype=np.uint32)
    dev = np.asarray(f.from_monty(p2.permute(f.to_monty(jnp.asarray(states)))))
    for i in range(0, 32, 5):
        host = p2.permute_host([int(x) for x in states[i]])
        assert [int(x) for x in dev[i]] == host


# Pinned known-answer vectors for the full hash-parameter set: RC_16_30 round
# constants (reference crates/primitives/src/lib.rs:13) + the Plonky3
# KoalaBear-16 internal diagonal (zkMIPS/Plonky3 @ 93967fce, see
# ops/poseidon2.py).  Any drift in constants, diagonal, linear layers, or
# round structure fails these hard equalities.
PERMUTE_0_15_KAT = [
    1635930443, 1105042214, 1882043429, 1844048402, 1473750845, 312930215,
    1730043656, 527466685, 315587567, 16091010, 1900299987, 511572576,
    308360161, 643372060, 611592657, 1241962896,
]
HASH_0_16_KAT = [
    1082882034, 244805241, 625444968, 1281638361, 2007358707, 1894918424,
    2090591859, 494909322,
]
COMPRESS_KAT = [
    94054604, 837003546, 1213899664, 1951709641, 767324975, 1194706745,
    1901375086, 1958278263,
]
CHALLENGER_KAT = [1996372297, 146816208, 1377854112, 708914315]


def test_permute_known_answer():
    out = p2.permute_host(list(range(16)))
    assert out == PERMUTE_0_15_KAT
    # Device agrees
    dev = np.asarray(
        f.from_monty(p2.permute(f.to_monty(jnp.asarray(np.arange(16, dtype=np.uint32)[None]))))
    )[0]
    assert [int(x) for x in dev] == out


def test_sponge_compress_known_answer():
    # PaddingFreeSponge 16/8/8 over 17 values (3 permutation calls).
    assert p2.hash_host(list(range(17))) == HASH_0_16_KAT
    # TruncatedPermutation<2,8,16> on distinct halves.
    assert (
        p2.compress_host(list(range(8)), [7, 11, 13, 17, 19, 23, 29, 31])
        == COMPRESS_KAT
    )


def test_challenger_known_answer():
    # observe 1..8 (fires one duplex), then sample an EF4 element.
    c = DuplexChallenger()
    c.observe_slice(list(range(1, 9)))
    assert [c.sample() for _ in range(4)] == CHALLENGER_KAT


MERKLE_16x4_KAT = [
    661788541, 385195581, 1055546600, 1394939986, 1454877516, 1535826637,
    1070699235, 1644909816,
]


def test_merkle_root_known_answer():
    from zkvm_brainfuck_tpu.ops import merkle as mk

    m = np.arange(64, dtype=np.uint32).reshape(16, 4)
    tree = mk.commit([f.to_monty(jnp.asarray(m))])
    assert [int(x) for x in tree.root] == MERKLE_16x4_KAT
    # host-side replay of the same tree agrees
    digests = [p2.hash_host([int(v) for v in row]) for row in m]
    while len(digests) > 1:
        digests = [
            p2.compress_host(digests[i], digests[i + 1])
            for i in range(0, len(digests), 2)
        ]
    assert digests[0] == MERKLE_16x4_KAT


def test_hash_rows_matches_host_sponge():
    for w in (3, 8, 11, 16, 29):
        m = RNG.integers(0, P, size=(6, w), dtype=np.uint32)
        dev = np.asarray(f.from_monty(p2.hash_rows(f.to_monty(jnp.asarray(m)))))
        for r in range(6):
            host = p2.hash_host([int(x) for x in m[r]])
            assert [int(x) for x in dev[r]] == host


def test_compress_matches_host():
    l = RNG.integers(0, P, size=(4, 8), dtype=np.uint32)
    r = RNG.integers(0, P, size=(4, 8), dtype=np.uint32)
    dev = np.asarray(
        f.from_monty(p2.compress(f.to_monty(jnp.asarray(l)), f.to_monty(jnp.asarray(r))))
    )
    for i in range(4):
        host = p2.compress_host([int(x) for x in l[i]], [int(x) for x in r[i]])
        assert [int(x) for x in dev[i]] == host


def test_challenger_duplex_semantics():
    c = DuplexChallenger()
    for i in range(8):
        c.observe(i + 1)
    # duplexing fired: output buffer full, first sample pops state[7]
    s1 = c.sample()
    state_after = p2.permute_host([1, 2, 3, 4, 5, 6, 7, 8] + [0] * 8)
    assert s1 == state_after[7]
    assert c.sample() == state_after[6]
    # observing clears pending outputs
    c2 = DuplexChallenger()
    c2.observe(42)
    x = c2.sample()
    c2b = DuplexChallenger()
    c2b.observe(42)
    c2b.observe(42)  # different transcript
    assert isinstance(x, int) and 0 <= x < P


def test_challenger_determinism_and_ext():
    a, b = DuplexChallenger(), DuplexChallenger()
    for c in (a, b):
        c.observe_slice([5, 6, 7])
    ea, eb = a.sample_ext(), b.sample_ext()
    assert ea == eb and len(ea) == 4


def test_grind():
    c = DuplexChallenger()
    c.observe_slice(list(range(5)))
    check = c.clone()
    w = c.grind(10)
    # witness validates against the pre-grind transcript clone
    assert check.check_witness(10, w)


def test_soa_branch_equivalence_on_cpu():
    """Force the TPU structure-of-arrays permutation branch on the CPU test
    backend (ADVICE r3: _use_soa() is False on CPU, so the SoA path - the one
    production TPU proving actually runs - was otherwise only exercised on
    real hardware).  Checks permute_cols, the sponge, and the Merkle
    leaf-sponge scan against the exact host permutation."""
    from zkvm_brainfuck_tpu.ops import merkle as mk

    states = RNG.integers(0, P, size=(16, 16), dtype=np.uint32)
    mat = RNG.integers(0, P, size=(32, 19), dtype=np.uint32)

    p2._use_soa.cache_clear()
    orig = p2._use_soa.__wrapped__
    try:
        p2._use_soa.cache_clear()
        # lru_cache wraps the function; patch by replacing the cached value
        p2._use_soa = lambda: True

        cols = [f.to_monty(jnp.asarray(states[:, i])) for i in range(16)]
        out_cols = p2.permute_cols(cols)
        dev = np.stack([np.asarray(f.from_monty(c)) for c in out_cols], axis=1)
        for i in range(states.shape[0]):
            assert [int(x) for x in dev[i]] == p2.permute_host(
                [int(x) for x in states[i]]
            )

        # permute() dispatches through the SoA branch too
        dev2 = np.asarray(f.from_monty(p2.permute(f.to_monty(jnp.asarray(states)))))
        assert (dev2 == dev).all()

        # Merkle leaf sponge (the lax.scan-over-chunks path) in SoA form
        digests = np.asarray(
            f.from_monty(mk.sponge_rows_traced([f.to_monty(jnp.asarray(mat))]))
        )
        for i in range(0, mat.shape[0], 7):
            assert [int(x) for x in digests[i]] == p2.hash_host(
                [int(x) for x in mat[i]]
            )
    finally:
        from functools import lru_cache

        p2._use_soa = lru_cache(maxsize=None)(orig)
