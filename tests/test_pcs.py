"""PCS + FRI roundtrip: commit -> open -> verify, including negative cases."""

import numpy as np
import jax.numpy as jnp
import pytest

from zkvm_brainfuck_tpu.ops import field as f
from zkvm_brainfuck_tpu.stark import ef_host as efh
from zkvm_brainfuck_tpu.stark.challenger import DuplexChallenger
from zkvm_brainfuck_tpu.stark.domains import Domain
from zkvm_brainfuck_tpu.stark.fri import VerificationFailure
from zkvm_brainfuck_tpu.stark.pcs import pcs_commit, pcs_open, pcs_verify

RNG = np.random.default_rng(11)
NQ = 12  # reduced query count for test speed (FRI_QUERIES equivalent)


def _mats(specs):
    out = []
    for log_n, w, shift in specs:
        evals = RNG.integers(0, f.P, size=(1 << log_n, w), dtype=np.uint32)
        out.append((Domain(log_n, shift), f.to_monty(jnp.asarray(evals))))
    return out


def _roundtrip(rounds_specs, points_spec, tamper=None):
    datas = []
    roots = []
    for specs in rounds_specs:
        root, data = pcs_commit(_mats(specs))
        datas.append(data)
        roots.append([int(x) for x in root])

    ch = DuplexChallenger()
    ch.observe(123)
    zeta = ch.sample_ext()
    points = []
    for data, per_mat in zip(datas, points_spec):
        points.append([[zeta] * npts for npts in per_mat])

    prover_ch = ch.clone()
    opened, proof = pcs_open(
        list(zip(datas, points)), prover_ch, num_queries=NQ, pow_bits=8
    )

    rounds_v = []
    for root, data, pts_per_mat, opened_r in zip(roots, datas, points, opened):
        mats = []
        for domain, pts, vals in zip(data.domains, pts_per_mat, opened_r):
            mats.append((domain, list(zip(pts, vals))))
        rounds_v.append((root, mats))

    if tamper:
        tamper(rounds_v, proof)

    verifier_ch = ch.clone()
    pcs_verify(rounds_v, proof, verifier_ch, num_queries=NQ, pow_bits=8)
    return opened


def test_single_matrix_roundtrip():
    opened = _roundtrip([[(4, 3, 1)]], [[2]])
    assert len(opened[0][0]) == 2  # two points
    assert len(opened[0][0][0]) == 3  # three columns


def test_multi_round_multi_height_roundtrip():
    # round 0: two matrices of different heights; round 1: one shifted domain
    _roundtrip(
        [
            [(5, 2, 1), (3, 4, 1)],
            [(4, 4, (f.GENERATOR * f.two_adic_root(4)) % f.P)],
        ],
        [[2, 1], [1]],
    )


def test_opened_value_is_polynomial_eval():
    # Commit a known low-degree polynomial and check the opened value.
    log_n, w = 3, 1
    coeffs = [5, 7, 11, 13, 17, 19, 23, 29]
    g = f.two_adic_root(log_n)
    evals = np.array(
        [[sum(c * pow(g, i * k, f.P) for k, c in enumerate(coeffs)) % f.P] for i in range(8)],
        dtype=np.uint32,
    )
    root, data = pcs_commit([(Domain(log_n, 1), f.to_monty(jnp.asarray(evals)))])
    ch = DuplexChallenger()
    zeta = ch.sample_ext()
    opened, proof = pcs_open([(data, [[zeta]])], ch.clone(), num_queries=4, pow_bits=4)
    want = efh.ZERO
    for k in reversed(range(8)):
        want = efh.add_base(efh.mul(want, zeta), coeffs[k])
    assert opened[0][0][0][0] == want


def test_tampered_value_fails():
    def tamper(rounds_v, proof):
        root, mats = rounds_v[0]
        domain, pts = mats[0]
        z, ys = pts[0]
        bad = list(ys)
        bad[0] = efh.add_base(bad[0], 1)
        pts[0] = (z, bad)

    with pytest.raises(VerificationFailure):
        _roundtrip([[(4, 2, 1)]], [[1]], tamper=tamper)


def test_tampered_final_poly_fails():
    def tamper(rounds_v, proof):
        fp = list(proof.fri.final_poly)
        fp[0] = (fp[0] + 1) % f.P
        proof.fri.final_poly = tuple(fp)

    with pytest.raises(VerificationFailure):
        _roundtrip([[(4, 2, 1)]], [[1]], tamper=tamper)


def test_blocked_commit_matches_unblocked(monkeypatch):
    """The huge-height blocked commit path (per-column-block LDE programs,
    ZKBF_BLK_LOG gate) must produce bit-identical roots and LDEs."""
    specs = [(6, 11, 1), (6, 3, 1), (5, 5, 1)]
    mats = _mats(specs)
    root_a, data_a = pcs_commit(mats)
    monkeypatch.setenv("ZKBF_BLK_LOG", "6")  # LDE heights 2^6+ go blocked
    monkeypatch.setenv("ZKBF_BLK_W", "4")
    root_b, data_b = pcs_commit(mats)
    assert [int(x) for x in root_a] == [int(x) for x in root_b]
    for la, lb in zip(data_a.ldes, data_b.ldes):
        assert (np.asarray(la) == np.asarray(lb)).all()
