"""StarkMachine: chip collection + setup/verify + debug entry points.

Reference: crates/stark/src/machine.rs.  Preprocessed traces are sorted by
(height desc, name asc), committed in one PCS batch; pk/vk carry the root,
ordering, and local-only flags.  The transcript binds the preprocessed root
plus a 7-zero pad exactly like machine.rs:64-69.
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.program import Program
from ..core.record import ExecutionRecord
from ..models.base import ByteDeps, ChipAir
from ..ops import field as xf
from .challenger import DuplexChallenger
from .chip import Chip
from .domains import Domain
from .pcs import PcsProverData, pcs_commit

log = logging.getLogger("zkbf.machine")


@dataclass
class StarkProvingKey:
    commit: np.ndarray  # (8,) canonical root
    traces: List[jnp.ndarray]  # preprocessed traces (Monty), sorted order
    data: PcsProverData
    chip_ordering: Dict[str, int]
    local_only: List[bool]

    def observe_into(self, challenger: DuplexChallenger):
        challenger.observe_commitment([int(x) for x in self.commit])
        for _ in range(7):
            challenger.observe(0)


@dataclass
class StarkVerifyingKey:
    commit: List[int]
    chip_information: List[Tuple[str, Domain, Tuple[int, int]]]  # (name, domain, (h, w))
    chip_ordering: Dict[str, int]

    def observe_into(self, challenger: DuplexChallenger):
        challenger.observe_commitment([int(x) for x in self.commit])
        for _ in range(7):
            challenger.observe(0)


# Typed taxonomy lives in errors.py; re-exported here for reference parity
# (machine.rs:391-416 defines MachineVerificationError in the machine module).
from .errors import MachineVerificationError, VerificationFailure  # noqa: E402


class StarkMachine:
    def __init__(self, config, airs: List[ChipAir]):
        self.config = config
        self.chips: List[Chip] = [Chip(a) for a in airs]

    def shard_chips(self, record: ExecutionRecord) -> List[Chip]:
        return [c for c in self.chips if c.included(record)]

    def shard_chips_ordered(self, chip_ordering: Dict[str, int]) -> List[Chip]:
        present = [c for c in self.chips if c.name in chip_ordering]
        return sorted(present, key=lambda c: chip_ordering[c.name])

    def preprocessed_chip_ids(self) -> List[int]:
        return [i for i, c in enumerate(self.chips) if c.preprocessed_width > 0]

    # -- setup ------------------------------------------------------------

    def setup(self, program: Program) -> Tuple[StarkProvingKey, StarkVerifyingKey]:
        named = []
        for chip in self.chips:
            t0 = time.time()
            prep = chip.air.generate_preprocessed(program)
            if prep is None:
                continue
            assert prep.shape[1] == chip.preprocessed_width, chip.name
            log.debug(
                "generated preprocessed trace for chip %s in %.3fs",
                chip.name,
                time.time() - t0,
            )
            from ..parallel.mesh import place_rows

            named.append((chip.name, chip.local_only, place_rows(xf.to_monty(prep))))

        named.sort(key=lambda t: (-t[2].shape[0], t[0]))

        domains_and_traces = []
        chip_information = []
        for name, _lo, trace in named:
            domain = Domain(trace.shape[0].bit_length() - 1, 1)
            domains_and_traces.append((domain, trace))
            chip_information.append((name, domain, (trace.shape[0], trace.shape[1])))

        root, data = pcs_commit(domains_and_traces)
        chip_ordering = {name: i for i, (name, _, _) in enumerate(named)}
        local_only = [lo for _, lo, _ in named]

        pk = StarkProvingKey(
            commit=root,
            traces=[t for _, _, t in named],
            data=data,
            chip_ordering=chip_ordering,
            local_only=local_only,
        )
        vk = StarkVerifyingKey(
            commit=[int(x) for x in root],
            chip_information=chip_information,
            chip_ordering=dict(chip_ordering),
        )
        return pk, vk

    # -- dependencies (byte-table histograms) ------------------------------

    def generate_dependencies(self, record: ExecutionRecord) -> ByteDeps:
        deps = ByteDeps()
        for chip in self.shard_chips(record):
            chip.air.byte_dependencies(record, deps)
        return deps

    # -- verification ------------------------------------------------------

    def verify(self, vk: StarkVerifyingKey, proof, challenger: DuplexChallenger):
        """Raises a typed `VerificationFailure` subclass on rejection; any
        structural malformation (bad orderings, missing fields) that surfaces
        as a non-verification exception is wrapped in
        `MachineVerificationError` (machine.rs InvalidShardProof)."""
        from .verifier import verify_shard

        vk.observe_into(challenger)
        try:
            chips = self.shard_chips_ordered(proof.shard_proof.chip_ordering)
            verify_shard(self.config, vk, chips, challenger, proof.shard_proof)
        except VerificationFailure:
            raise
        except (KeyError, IndexError, AttributeError, TypeError, ValueError) as e:
            raise MachineVerificationError(
                f"structurally invalid shard proof: {type(e).__name__}: {e}"
            ) from e

    # -- debug -------------------------------------------------------------

    def debug_constraints(self, program: Program, record: ExecutionRecord):
        """Row-by-row constraint + lookup-balance replay (debug feature).

        Mirrors machine.rs:288-387 + debug.rs:24-262: AIR constraints on the
        real traces, THEN two sampled permutation challenges, real LogUp
        permutation traces, the permutation constraints row-by-row, and the
        global cumulative-sum-zero check.
        """
        if os.environ.get("SKIP_CONSTRAINTS"):
            return
        import jax.numpy as jnp

        from ..ops import field as xf
        from .debug import check_constraints, debug_lookup_balance
        from .permutation import generate_permutation_trace

        deps = self.generate_dependencies(record)
        triples = []
        for chip in self.shard_chips(record):
            prep = chip.air.generate_preprocessed(program)
            prep_np = np.asarray(prep) if prep is not None else None
            main_np = np.asarray(chip.air.generate_trace(record, deps))
            triples.append((chip, prep_np, main_np))
            fails = check_constraints(chip, main_np, prep_np)
            if fails:
                raise AssertionError(f"constraint failures: {fails}")
        imbalance = debug_lookup_balance(triples)
        if imbalance:
            raise AssertionError(
                f"lookup imbalance ({len(imbalance)} keys): "
                f"{dict(list(imbalance.items())[:10])}"
            )

        # Permutation replay: sample 2 challenges, build the real LogUp
        # traces, re-check AIR + permutation constraints per row, and assert
        # the cumulative sums cancel (machine.rs:331-387).
        challenger = DuplexChallenger()
        challenger.observe_slice(list(range(8)))
        perm_challenges = [challenger.sample_ext(), challenger.sample_ext()]
        alpha_dev = xf.to_monty(
            jnp.asarray(np.array(perm_challenges[0], np.uint32))
        )
        from . import ef_host as efh

        total = efh.ZERO
        for chip, prep_np, main_np in triples:
            prep_dev = (
                xf.to_monty(jnp.asarray(prep_np))
                if prep_np is not None and prep_np.shape[1] > 0
                else None
            )
            main_dev = xf.to_monty(jnp.asarray(main_np))
            perm, csum = generate_permutation_trace(
                chip, prep_dev, main_dev, alpha_dev, perm_challenges[1]
            )
            perm_np = np.asarray(xf.from_monty(perm))  # (N, PW, 4) canonical
            csum_host = tuple(int(x) for x in np.asarray(xf.from_monty(csum)))
            fails = check_constraints(
                chip, main_np, prep_np, perm_np, perm_challenges, csum_host
            )
            if fails:
                raise AssertionError(f"permutation constraint failures: {fails}")
            total = efh.add(total, csum_host)
        if total != efh.ZERO:
            raise AssertionError(f"cumulative sums do not cancel: {total}")
