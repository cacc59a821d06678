"""Single-chip "uni-stark" prove/verify (no lookup argument).

Counterpart of the reference's p3_uni_stark test path
(utils/prove.rs:99-159): prove one AIR's constraints over one main trace -
lookups become no-ops (EmptyMessageBuilder semantics) - then verify the OOD
quotient identity and the FRI opening.  Used by chip-level tests to exercise
trace generation + constraint evaluation + PCS without the 8-chip machine.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ext as xe
from ..ops import field as xf
from . import ef_host as efh
from .builder import HostEFBackend, JnpBackend, NumericBuilder, SymbolicBuilder, V
from .challenger import DuplexChallenger
from .chip import Chip, _wire_views
from .domains import Domain, selectors_on_coset
from .fri import VerificationFailure
from .pcs import pcs_commit, pcs_open, pcs_verify


@dataclass
class UniProof:
    main_commit: List[int]
    quotient_commit: List[int]
    main_local: list
    main_next: list
    quotient: list  # 2^log_qd chunks x 4 EF values
    log_degree: int
    pcs_proof: object


def _air_constraints_degree(chip: Chip) -> int:
    return max(chip.max_constraint_degree, 2)


def uni_stark_prove(
    chip: Chip, trace, challenger: DuplexChallenger, num_queries: int = 12
) -> UniProof:
    trace_m = xf.to_monty(jnp.asarray(trace))
    n = trace_m.shape[0]
    log_n = n.bit_length() - 1
    tdomain = Domain(log_n, 1)
    log_qd = max((_air_constraints_degree(chip) - 1 - 1).bit_length(), 1)

    root, data = pcs_commit([(tdomain, trace_m)])
    challenger.observe_commitment([int(x) for x in root])
    alpha = challenger.sample_ext()

    qdomain = tdomain.create_disjoint_domain(1 << (log_n + log_qd))
    qvals = _uni_quotient(chip, tdomain, qdomain, data.ldes[0], alpha)
    chunks = [qvals[k :: 1 << log_qd].reshape(-1, 4) for k in range(1 << log_qd)]
    sub_domains = qdomain.split_domains(1 << log_qd)
    qroot, qdata = pcs_commit(list(zip(sub_domains, chunks)))
    challenger.observe_commitment([int(x) for x in qroot])
    zeta = challenger.sample_ext()

    opened, pcs_proof = pcs_open(
        [
            (data, [[zeta, tdomain.next_point_ef(zeta)]]),
            (qdata, [[zeta]] * len(chunks)),
        ],
        challenger,
        num_queries=num_queries,
        pow_bits=8,
    )
    return UniProof(
        main_commit=[int(x) for x in root],
        quotient_commit=[int(x) for x in qroot],
        main_local=opened[0][0][0],
        main_next=opened[0][0][1],
        quotient=[opened[1][k][0] for k in range(len(chunks))],
        log_degree=log_n,
        pcs_proof=pcs_proof,
    )


_UNI_QJITS = {}
_UNI_FLAGS = {}


def _uni_constraint_flags(chip: Chip):
    """AIR-only ext-flag schedule (no permutation constraints), cached."""
    key = id(chip)
    if key not in _UNI_FLAGS:
        be = HostEFBackend
        flags = []
        one = efh.from_base(1)
        b = NumericBuilder(
            backend=be,
            main_local=lambda i: V(be, one),
            main_next=lambda i: V(be, one),
            prep_local=(lambda i: V(be, one)) if chip.preprocessed_width else None,
            prep_next=(lambda i: V(be, one)) if chip.preprocessed_width else None,
            is_first_row=V(be, one),
            is_last_row=V(be, one),
            is_transition=V(be, one),
            on_constraint=lambda v: flags.append(v.ext),
        )
        chip.eval(b)
        _UNI_FLAGS[key] = flags
    return _UNI_FLAGS[key]


def _uni_quotient(chip: Chip, tdomain, qdomain, main_lde, alpha_host):
    from .quotient import _fsum_axis0

    flags = _uni_constraint_flags(chip)
    k_total = len(flags)
    pows = [efh.ONE]
    for _ in range(k_total - 1):
        pows.append(efh.mul(pows[-1], alpha_host))
    base_w = np.array(
        [pows[k_total - 1 - j] for j, ext in enumerate(flags) if not ext], np.uint32
    ).reshape(-1, 4)
    ext_w = np.array(
        [pows[k_total - 1 - j] for j, ext in enumerate(flags) if ext], np.uint32
    ).reshape(-1, 4)

    key = (id(chip), tdomain, qdomain)
    if key not in _UNI_QJITS:

        def impl(lde, bw_c, ew_c):
            nq = qdomain.size
            next_step = 1 << (qdomain.log_n - tdomain.log_n)
            sels = selectors_on_coset(tdomain.log_n, qdomain.log_n, qdomain.shift)
            main_next = jnp.roll(lde, -next_step, axis=0)
            be = JnpBackend
            collected = []
            b = NumericBuilder(
                backend=be,
                main_local=lambda i: V(be, lde[:, i]),
                main_next=lambda i: V(be, main_next[:, i]),
                prep_local=None,
                prep_next=None,
                is_first_row=V(be, sels["is_first_row"]),
                is_last_row=V(be, sels["is_last_row"]),
                is_transition=V(be, sels["is_transition"]),
                on_constraint=lambda v: collected.append((v.p, v.ext)),
            )
            chip.eval(b)
            acc = xe.ezeros((nq,))
            base_payloads = [
                jnp.broadcast_to(p, (nq,)) for (p, ext) in collected if not ext
            ]
            ext_payloads = [
                tuple(jnp.broadcast_to(pl, (nq,)) for pl in p)
                for (p, ext) in collected
                if ext
            ]
            if base_payloads:
                bstack = jnp.stack(base_payloads)
                bw = xf.to_monty(bw_c)
                acc = xe.eadd(
                    acc,
                    tuple(
                        _fsum_axis0(xf.fmul(bstack, bw[:, k][:, None]))
                        for k in range(4)
                    ),
                )
            if ext_payloads:
                estack = tuple(
                    jnp.stack([p[k] for p in ext_payloads]) for k in range(4)
                )
                ew = xf.to_monty(ew_c)
                prod = xe.emul(estack, tuple(ew[:, k][:, None] for k in range(4)))
                acc = xe.eadd(acc, tuple(_fsum_axis0(pl) for pl in prod))
            return jnp.stack(list(xe.emul_base(acc, sels["inv_zeroifier"])), axis=-1)

        _UNI_QJITS[key] = jax.jit(impl)
    return _UNI_QJITS[key](main_lde, jnp.asarray(base_w), jnp.asarray(ext_w))


def uni_stark_verify(
    chip: Chip, proof: UniProof, challenger: DuplexChallenger, num_queries: int = 12
):
    challenger.observe_commitment(proof.main_commit)
    alpha = challenger.sample_ext()
    challenger.observe_commitment(proof.quotient_commit)
    zeta = challenger.sample_ext()

    log_qd = max((_air_constraints_degree(chip) - 1 - 1).bit_length(), 1)
    tdomain = Domain(proof.log_degree, 1)
    qdomain = tdomain.create_disjoint_domain(1 << (proof.log_degree + log_qd))
    qc_domains = qdomain.split_domains(1 << log_qd)

    pcs_verify(
        [
            (
                proof.main_commit,
                [
                    (
                        tdomain,
                        [
                            (zeta, proof.main_local),
                            (tdomain.next_point_ef(zeta), proof.main_next),
                        ],
                    )
                ],
            ),
            (
                proof.quotient_commit,
                [(d, [(zeta, ch)]) for d, ch in zip(qc_domains, proof.quotient)],
            ),
        ],
        proof.pcs_proof,
        challenger,
        num_queries=num_queries,
        pow_bits=8,
    )

    # OOD constraint check (AIR only, alpha-Horner).
    sels = tdomain.selectors_at_point_ef(zeta)
    be = HostEFBackend
    acc = [efh.ZERO]
    b = NumericBuilder(
        backend=be,
        main_local=lambda i: V(be, proof.main_local[i], True),
        main_next=lambda i: V(be, proof.main_next[i], True),
        prep_local=None,
        prep_next=None,
        is_first_row=V(be, sels["is_first_row"], True),
        is_last_row=V(be, sels["is_last_row"], True),
        is_transition=V(be, sels["is_transition"], True),
        on_constraint=lambda v: acc.__setitem__(0, efh.add(efh.mul(acc[0], alpha), v.p)),
    )
    chip.eval(b)
    folded = acc[0]

    from .verifier import recompute_quotient
    from .types import AirOpenedValues, ChipOpenedValues

    opening = ChipOpenedValues(
        preprocessed=AirOpenedValues([], []),
        main=AirOpenedValues(proof.main_local, proof.main_next),
        permutation=AirOpenedValues([], []),
        quotient=proof.quotient,
        cumulative_sum=efh.ZERO,
        log_degree=proof.log_degree,
    )
    quotient = recompute_quotient(opening, qc_domains, zeta)
    if efh.mul(folded, sels["inv_zeroifier"]) != quotient:
        raise VerificationFailure(f"{chip.name}: uni-stark OOD mismatch")
