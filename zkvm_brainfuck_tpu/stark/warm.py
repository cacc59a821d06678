"""Concurrent program warm-up: compile the prove pipeline ahead of use.

Every program a shard proof needs is determined by (chips, trace heights)
the moment traces are generated - but the transcript forces the phases to
RUN serially.  XLA compilation, however, can happen in parallel threads
(compiles release the GIL; on the tunneled-TPU backend they are server-side
RPCs).  So `warm_prove_programs` fires one dummy execution per program into
a thread pool right after trace generation: per-chip LogUp entry programs,
per-chip quotient programs, the three batch-commit programs, and one chained
"open" task (opened-value eval, reduced openings, every FRI layer, the PoW
grind, and the query gathers - serial inside, since each FRI layer depends
on the previous).  By the time the real pipeline reaches a phase, its
program is (being) compiled; the real call is a jit-cache hit.

Disable with ZKBF_WARM=0.  Thread count: ZKBF_WARM_THREADS (default 6).
"""

from __future__ import annotations

import logging
import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

log = logging.getLogger("zkbf.warm")

_POOL: Optional[ThreadPoolExecutor] = None


def _pool() -> ThreadPoolExecutor:
    global _POOL
    if _POOL is None:
        _POOL = ThreadPoolExecutor(
            max_workers=int(os.environ.get("ZKBF_WARM_THREADS", "6")),
            thread_name_prefix="zkbf-warm",
        )
    return _POOL


def enabled() -> bool:
    return os.environ.get("ZKBF_WARM", "1") != "0"


def _z(shape) -> jnp.ndarray:
    return jnp.zeros(shape, jnp.uint32)


def warm_prove_programs(pk, chips, log_degrees, config) -> list:
    """Submit dummy executions of every per-prove program; returns futures.

    chips/log_degrees: in commit order (height desc, name asc) - must match
    what the real pipeline will use.
    """
    if not enabled():
        return []
    from ..ops import poseidon2 as p2
    from . import ef_host as efh
    from .challenger import DuplexChallenger
    from .domains import Domain
    from .pcs import LOG_BLOWUP, PcsProverData, pcs_commit, pcs_open
    from .permutation import generate_permutation_trace
    from .quotient import quotient_values

    futures = []

    def submit(name, fn):
        def run():
            t0 = time.time()
            try:
                fn()
                log.debug("warm %s in %.3fs", name, time.time() - t0)
            except Exception as e:  # warm-up must never break the prover
                log.warning("warm %s failed: %s", name, e)

        futures.append(_pool().submit(run))

    prep_shape = {}
    for name, idx in pk.chip_ordering.items():
        prep_shape[name] = tuple(pk.traces[idx].shape)

    # -- batch commits ------------------------------------------------------
    def commit_of(sig):
        return lambda: pcs_commit(
            [(Domain(ld, shift), _z((1 << ld, w))) for ld, shift, w in sig]
        )

    main_sig = [(ld, 1, chip.width) for chip, ld in zip(chips, log_degrees)]
    perm_sig = [
        (ld, 1, (chip.permutation_width) * 4)
        for chip, ld in zip(chips, log_degrees)
    ]
    quot_sig = []
    for chip, ld in zip(chips, log_degrees):
        qd = Domain(ld, 1).create_disjoint_domain(1 << (ld + chip.log_quotient_degree))
        for sd in qd.split_domains(1 << chip.log_quotient_degree):
            quot_sig.append((sd.log_n, sd.shift, 4))
    # (The real pipeline hits the main commit immediately - no warm needed.)
    submit("commit:perm", commit_of(perm_sig))
    submit("commit:quotient", commit_of(quot_sig))

    # -- per-chip LogUp + quotient programs ---------------------------------
    beta_fake = efh.from_base(2)
    alpha_fake = efh.from_base(3)
    for chip, ld in zip(chips, log_degrees):
        n = 1 << ld
        pw = prep_shape.get(chip.name)

        def warm_perm(chip=chip, n=n, pw=pw):
            prep = _z(pw) if pw else None
            generate_permutation_trace(chip, prep, _z((n, chip.width)), _z((4,)), beta_fake)

        submit(f"perm:{chip.name}", warm_perm)

        def warm_quot(chip=chip, ld=ld, pw=pw):
            td = Domain(ld, 1)
            qdom = td.create_disjoint_domain(1 << (ld + chip.log_quotient_degree))
            nq = qdom.size
            quotient_values(
                chip,
                td,
                qdom,
                _z((nq, pw[1])) if pw else None,
                _z((nq, chip.width)),
                _z((nq, chip.permutation_width * 4)),
                [alpha_fake, beta_fake],
                alpha_fake,
                _z((4,)),
            )

        submit(f"quotient:{chip.name}", warm_quot)

    # -- FRI layer programs (one task each: they compile in parallel) -------
    from ..ops import ext as xe
    from .fri import _fold_commit_jit, _half_xinv, _layer0_jit
    from .pcs import _rev_dev

    input_heights = {ld + LOG_BLOWUP for ld in log_degrees}
    input_heights |= {t.shape[0].bit_length() - 1 + LOG_BLOWUP for t in pk.traces}
    log_max = max(input_heights)

    def warm_layer0(log_max=log_max):
        _layer0_jit(log_max)(xe.ezeros((1 << log_max,)), _rev_dev(log_max))

    submit(f"fri:layer0@{log_max}", warm_layer0)
    for log_h in range(log_max, LOG_BLOWUP + 1, -1):
        has_input = (log_h - 1) in input_heights and (log_h - 1) != log_max
        commit_next = (log_h - 1) > LOG_BLOWUP

        def warm_layer(log_h=log_h, has_input=has_input, commit_next=commit_next):
            inp = xe.ezeros((1 << (log_h - 1),)) if has_input else xe.ezeros((1,))
            _fold_commit_jit(log_h, has_input, commit_next)(
                xe.ezeros((1 << log_h,)),
                _z((4,)),
                jnp.asarray(_half_xinv(log_h)),
                inp,
                _rev_dev(log_h - 1),
            )

        submit(f"fri:fold@{log_h}", warm_layer)

    def warm_grind():
        p2.permute(_z((1 << 17, 16)))  # challenger.grind's candidate batch

    submit("grind", warm_grind)

    # -- the open chain (eval, ro, FRI layers, grind, gathers) --------------
    def warm_open():
        zeta = efh.from_base(5)
        rounds = []
        # preprocessed round (real pk data), then main/perm/quotient shapes.
        prep_points = []
        for trace, lo in zip(pk.traces, pk.local_only):
            d = Domain(trace.shape[0].bit_length() - 1, 1)
            prep_points.append([zeta] if lo else [zeta, d.next_point_ef(zeta)])
        rounds.append((pk.data, prep_points))

        def fake_data(sig):
            domains = [Domain(ld, shift) for ld, shift, _ in sig]
            _root, data = pcs_commit(
                [(d, _z((d.size, w))) for d, (_ld, _s, w) in zip(domains, sig)]
            )
            return data

        main_data = fake_data(main_sig)
        main_points = [
            [zeta] if chip.local_only else [zeta, Domain(ld, 1).next_point_ef(zeta)]
            for chip, ld in zip(chips, log_degrees)
        ]
        perm_data = fake_data(perm_sig)
        perm_points = [
            [zeta, Domain(ld, 1).next_point_ef(zeta)] for ld in log_degrees
        ]
        quot_data = fake_data(quot_sig)
        quot_points = [[zeta] for _ in quot_sig]
        pcs_open(
            [
                (pk.data, prep_points),
                (main_data, main_points),
                (perm_data, perm_points),
                (quot_data, quot_points),
            ],
            DuplexChallenger(),
            num_queries=config.fri.num_queries,
            pow_bits=config.fri.proof_of_work_bits,
        )

    submit("open-chain", warm_open)
    return futures
