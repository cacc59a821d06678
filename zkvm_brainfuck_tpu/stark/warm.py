"""Concurrent COMPILE-ONLY warm-up: build every prove program ahead of use.

Every program a shard proof needs is determined by (chips, trace heights)
the moment traces are generated - but the transcript forces the phases to
RUN serially.  Compilation, however, can happen in parallel threads
(XLA compiles release the GIL; on the tunneled-TPU backend they are
server-side RPCs).  `warm_prove_programs` fires one `.warm()` per program
into a thread pool right after trace generation: per-chip LogUp entry
programs, per-chip quotient programs, the perm/quotient batch-commit
programs, every FRI layer, and the PoW grind.

Warm-up is compile-ONLY (ShapeDtypeStruct skeletons via utils/aot.py): no
dummy executions, no device buffers - round 2's dummy-execution warm-up
roughly doubled peak HBM and is the prime suspect in the bench OOM.  The
per-key locks in utils/aot.py make the real pipeline rendezvous with an
in-flight warm compile instead of duplicating it.

Disable with ZKBF_WARM=0.  Thread count: ZKBF_WARM_THREADS (default 6).
"""

from __future__ import annotations

import logging
import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

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


def warm_prove_programs(pk, chips, log_degrees, config) -> list:
    """Submit compile-only warm-ups of every per-prove program; returns futures.

    chips/log_degrees: in commit order (height desc, name asc) - must match
    what the real pipeline will use.
    """
    if not enabled():
        return []
    from .challenger import warm_grind
    from .domains import Domain
    from .pcs import LOG_BLOWUP, warm_commit
    from .permutation import warm_permutation
    from .quotient import warm_quotient

    import jax

    # XLA:CPU segfaults under concurrent multi-thread compilation (see
    # utils/aot.py _cpu_compile_lock); on the CPU backend warm-ups run
    # INLINE - same compiles, zero thread overlap with the main pipeline.
    # The tunneled-TPU backend keeps the concurrent pool (compiles there are
    # server-side RPCs that overlap the serial transcript).
    inline = jax.default_backend() == "cpu"
    futures = []

    def submit(name, fn, *args):
        def run():
            t0 = time.time()
            try:
                fn(*args)
                log.debug("warm %s in %.3fs", name, time.time() - t0)
            except Exception as e:  # warm-up must never break the prover
                log.warning("warm %s failed: %s", name, e)

        if inline:
            run()
        else:
            futures.append(_pool().submit(run))

    prep_width = {}
    for name, idx in pk.chip_ordering.items():
        prep_width[name] = int(pk.traces[idx].shape[1])

    # -- batch commits (perm + quotient; main is hit immediately anyway) ----
    perm_sig = tuple(
        (ld, 1, chip.permutation_width * 4) for chip, ld in zip(chips, log_degrees)
    )
    quot_sig = []
    for chip, ld in zip(chips, log_degrees):
        qd = Domain(ld, 1).create_disjoint_domain(1 << (ld + chip.log_quotient_degree))
        for sd in qd.split_domains(1 << chip.log_quotient_degree):
            quot_sig.append((sd.log_n, sd.shift, 4))
    submit("commit:perm", warm_commit, perm_sig, True)
    submit("commit:quotient", warm_commit, tuple(quot_sig), True)

    # -- per-chip LogUp + quotient programs ---------------------------------
    for chip, ld in zip(chips, log_degrees):
        pw = prep_width.get(chip.name, 0)
        submit(f"perm:{chip.name}", warm_permutation, chip, ld, pw)
        submit(f"quotient:{chip.name}", warm_quotient, chip, ld, pw)

    # -- FRI layer programs + grind -----------------------------------------
    from .fri import warm_fri

    input_heights = {ld + LOG_BLOWUP for ld in log_degrees}
    input_heights |= {t.shape[0].bit_length() - 1 + LOG_BLOWUP for t in pk.traces}
    submit("fri", warm_fri, frozenset(input_heights), LOG_BLOWUP)
    submit("grind", warm_grind, config.fri.proof_of_work_bits)

    return futures
