"""Machine prover: the full shard proving pipeline on TPU.

Reference pipeline (crates/stark/src/prover.rs:560-583, 242-553):
generate traces -> main commit -> 2 permutation challenges -> LogUp traces +
cumulative sums -> permutation commit -> alpha -> quotient evaluation on
disjoint cosets -> quotient commit -> zeta -> one 4-round PCS opening
[preprocessed, main, permutation, quotient].

Device/host split: trace/permutation/quotient/NTT/Merkle/FRI-fold work is
batched JAX on the TPU; the duplex challenger is host-side and touches only
roots, cumulative sums, and opened values (the designed host<->device
boundary, mirroring the reference's MachineProver DeviceMatrix seam).
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
from ..utils import phases
from ..core.record import ExecutionRecord
from ..ops import field as xf
from .challenger import DuplexChallenger
from .chip import Chip
from .domains import Domain
from .machine import StarkMachine, StarkProvingKey
from .pcs import pcs_commit, pcs_open
from .permutation import generate_permutation_trace
from .quotient import quotient_values, split_quotient_chunks
from .types import (
    AirOpenedValues,
    ChipOpenedValues,
    MachineProof,
    ShardCommitment,
    ShardProof,
)

log = logging.getLogger("zkbf.prover")


def _ext_to_dev(ef: tuple) -> jnp.ndarray:
    return xf.to_monty(jnp.asarray(np.array(ef, np.uint32)))


# Mesh state lives in parallel.mesh (set_shard_mesh/current_mesh); re-export
# for callers that configure sharding through the prover module.
from ..parallel.mesh import place_rows, set_shard_mesh  # noqa: F401


@dataclass
class HostProvingKey:
    """Host-resident proving key: the portable half of the MachineProver
    device seam (reference DeviceProvingKey / pk_to_host, prover.rs:40-55).

    Carries canonical (non-Montgomery) numpy preprocessed traces; device
    PCS data (LDEs, Merkle tree) is recomputed by `pk_to_device`."""

    commit: np.ndarray
    traces: List[np.ndarray]
    chip_ordering: Dict[str, int]
    local_only: List[bool]


class MachineProver:
    """Hardware-abstraction seam (reference `MachineProver` trait,
    crates/stark/src/prover.rs:27-150).

    Subclasses own the device representation of traces and proving keys;
    the Fiat-Shamir transcript only ever crosses this boundary as host
    integers (roots, cumulative sums, opened values).  `prove` is the
    backend-independent pipeline (prover.rs:560-583); `generate_traces`,
    `commit`, and `open` are the backend's hot entry points.
    """

    def __init__(self, machine: StarkMachine):
        self.machine = machine

    @property
    def config(self):
        return self.machine.config

    def setup(self, program: Program):
        return self.machine.setup(program)

    # -- device residency (pk_to_device / pk_to_host, prover.rs:47-55) -----

    def pk_to_host(self, pk: StarkProvingKey) -> HostProvingKey:
        from ..utils.transfer import fetch_all

        host_traces = fetch_all([xf.from_monty(t) for t in pk.traces])
        return HostProvingKey(
            commit=np.asarray(pk.commit),
            traces=host_traces,
            chip_ordering=dict(pk.chip_ordering),
            local_only=list(pk.local_only),
        )

    def pk_to_device(self, host_pk: HostProvingKey) -> StarkProvingKey:
        from .pcs import pcs_commit

        traces = [xf.to_monty(jnp.asarray(t)) for t in host_pk.traces]
        domains_and_traces = [
            (Domain(t.shape[0].bit_length() - 1, 1), t) for t in traces
        ]
        root, data = pcs_commit(domains_and_traces)
        assert [int(x) for x in root] == [int(x) for x in host_pk.commit], (
            "preprocessed commitment mismatch moving pk to device"
        )
        return StarkProvingKey(
            commit=root,
            traces=traces,
            data=data,
            chip_ordering=dict(host_pk.chip_ordering),
            local_only=list(host_pk.local_only),
        )

    # -- backend entry points ----------------------------------------------

    def generate_traces(self, record: ExecutionRecord):
        raise NotImplementedError

    def commit(self, named_traces):
        raise NotImplementedError

    def open(self, pk, shard_data, challenger) -> ShardProof:
        raise NotImplementedError

    def prewarm(self, pk, chips, log_degrees) -> None:
        """Hook: overlap program compilation with the serial transcript."""

    def prove(
        self,
        pk: StarkProvingKey,
        record: ExecutionRecord,
        challenger: DuplexChallenger,
    ) -> MachineProof:
        pk.observe_into(challenger)
        t0 = time.time()
        t_ph = time.time()
        named_traces = self.generate_traces(record)
        phases.add("trace_gen", time.time() - t_ph)

        named_sorted = sorted(named_traces, key=lambda t: (-t[1].shape[0], t[0]))
        chips_sorted = self.machine.shard_chips_ordered(
            {name: i for i, (name, _) in enumerate(named_sorted)}
        )
        self.prewarm(
            pk,
            chips_sorted,
            [t.shape[0].bit_length() - 1 for _, t in named_sorted],
        )

        t_ph = time.time()
        shard_data = self.commit(named_traces)
        phases.add("main_commit", time.time() - t_ph)
        # Drop the outer references to the main eval matrices NOW: open()
        # frees shard_data["traces"] after LogUp generation, and at 2^22 rows
        # (~1.5 GB) that free only takes effect if no other reference keeps
        # the buffers alive (the round-4 OOM lesson).
        del named_traces, named_sorted
        proof = self.open(pk, shard_data, challenger)
        log.debug("prove_shard in %.3fs", time.time() - t0)
        return MachineProof(shard_proof=proof)


class TpuProver(MachineProver):
    """The hardware prover (reference CpuProver counterpart, prover.rs:162)."""

    # -- phase 1: traces ---------------------------------------------------

    def generate_traces(self, record: ExecutionRecord):
        deps = self.machine.generate_dependencies(record)
        named = []
        for chip in self.machine.shard_chips(record):
            t0 = time.time()
            trace = chip.air.generate_trace(record, deps)
            trace = place_rows(xf.to_monty(trace))
            named.append((chip.name, trace))
            log.debug("generated trace for chip %s in %.3fs", chip.name, time.time() - t0)
        return named

    # -- phase 2: main commit ---------------------------------------------

    def commit(self, named_traces):
        named_traces = sorted(named_traces, key=lambda t: (-t[1].shape[0], t[0]))
        domains_and_traces = [
            (Domain(t.shape[0].bit_length() - 1, 1), t) for _, t in named_traces
        ]
        root, data = pcs_commit(domains_and_traces)
        chip_ordering = {name: i for i, (name, _) in enumerate(named_traces)}
        return {
            "traces": [t for _, t in named_traces],
            "root": root,
            "data": data,
            "chip_ordering": chip_ordering,
        }

    # -- phase 3: open -----------------------------------------------------

    def open(
        self,
        pk: StarkProvingKey,
        shard_data,
        challenger: DuplexChallenger,
    ) -> ShardProof:
        config = self.config
        chips = self.machine.shard_chips_ordered(shard_data["chip_ordering"])
        traces = shard_data["traces"]
        main_data = shard_data["data"]

        degrees = [t.shape[0] for t in traces]
        log_degrees = [d.bit_length() - 1 for d in degrees]
        trace_domains = [Domain(ld, 1) for ld in log_degrees]

        log.debug("main root: %s", [int(x) for x in shard_data["root"]])
        challenger.observe_commitment([int(x) for x in shard_data["root"]])
        perm_challenges = [challenger.sample_ext() for _ in range(2)]
        alpha_dev = _ext_to_dev(perm_challenges[0])

        # Permutation traces (device), flattened EF -> base columns.
        t0 = time.time()
        perm_traces = []
        cumulative_sums = []
        for chip, trace in zip(chips, traces):
            prep = None
            if chip.name in pk.chip_ordering:
                prep = pk.traces[pk.chip_ordering[chip.name]]
            perm, csum = generate_permutation_trace(
                chip, prep, trace, alpha_dev, perm_challenges[1]
            )
            perm_traces.append(perm)
            cumulative_sums.append(csum)
        from ..utils.transfer import fetch_all

        cumulative_sums_host = [
            tuple(int(x) for x in c)
            for c in fetch_all([xf.from_monty(c) for c in cumulative_sums])
        ]
        log.debug("generated permutation traces in %.3fs", time.time() - t0)
        phases.add("perm_trace", time.time() - t0)

        trace_widths = [t.shape[1] for t in traces]
        for i, chip in enumerate(chips):
            log.debug(
                "%-12s | Main Cols = %3d | Pre Cols = %3d | Perm Cols = %3d | Rows = %7d",
                chip.name,
                trace_widths[i],
                chip.preprocessed_width,
                perm_traces[i].shape[1] * 4,
                degrees[i],
            )

        # The main eval matrices are no longer read (quotient uses the LDEs,
        # openings use the coefficients): free them now - at 2^22 rows they
        # are ~1.5 GB of HBM the rest of the pipeline should have.
        traces = None
        shard_data["traces"] = None

        t0 = time.time()
        perm_flat = [p.reshape(p.shape[0], -1) for p in perm_traces]
        perm_root, perm_data = pcs_commit(
            [(d, p) for d, p in zip(trace_domains, perm_flat)],
            donate_inputs=True,
        )
        # the committed round keeps coeffs+LDEs; the eval-form permutation
        # matrices (~0.5 GB at 2^22) are no longer read
        perm_traces = None
        perm_flat = None
        log.debug("committed permutation traces in %.3fs", time.time() - t0)
        phases.add("perm_commit", time.time() - t0)

        log.debug("perm root: %s", [int(x) for x in perm_root])
        log.debug("cumulative sums: %s", cumulative_sums_host)
        challenger.observe_commitment([int(x) for x in perm_root])
        for csum in cumulative_sums_host:
            challenger.observe_slice(list(csum))

        alpha = challenger.sample_ext()

        # Quotient evaluation per chip on its disjoint coset.
        t0 = time.time()
        quotient_mats = []
        quotient_domains_flat = []
        chunk_counts = []
        for i, chip in enumerate(chips):
            log_qd = chip.log_quotient_degree
            qdomain = trace_domains[i].create_disjoint_domain(1 << (log_degrees[i] + log_qd))
            # With blowup == log_qd == 1 the quotient domain IS the LDE domain.
            assert qdomain.log_n == log_degrees[i] + 1 and qdomain.shift == xf.GENERATOR
            prep_lde = None
            if chip.name in pk.chip_ordering:
                prep_lde = pk.data.lde_blocks(pk.chip_ordering[chip.name])
            # normal mode: the resident LDE (single block); low-memory mode:
            # recomputed column blocks that die when this chip's quotient
            # scan completes
            main_lde = main_data.lde_blocks(i)
            perm_lde = perm_data.lde_blocks(i)
            qvals = quotient_values(
                chip,
                trace_domains[i],
                qdomain,
                prep_lde,
                main_lde,
                perm_lde,
                perm_challenges,
                alpha,
                cumulative_sums[i],
            )
            chunks = split_quotient_chunks(qdomain, qvals, 1 << log_qd)
            sub_domains = qdomain.split_domains(1 << log_qd)
            for sd, ch in zip(sub_domains, chunks):
                quotient_domains_flat.append(sd)
                quotient_mats.append(ch)
            chunk_counts.append(1 << log_qd)
        log.debug("computed quotient values in %.3fs", time.time() - t0)
        phases.add("quotient", time.time() - t0)

        t0 = time.time()
        quotient_root, quotient_data = pcs_commit(
            list(zip(quotient_domains_flat, quotient_mats)),
            donate_inputs=True,
        )
        n_quotient_mats = len(quotient_mats)
        quotient_mats = None  # eval-form chunks (~1 GB at 2^22) now unused
        log.debug("committed quotient in %.3fs", time.time() - t0)
        phases.add("quotient_commit", time.time() - t0)
        log.debug("quotient root: %s", [int(x) for x in quotient_root])
        challenger.observe_commitment([int(x) for x in quotient_root])

        zeta = challenger.sample_ext()

        # Opening points per round.
        prep_points = []
        for trace, lo in zip(pk.traces, pk.local_only):
            d = Domain(trace.shape[0].bit_length() - 1, 1)
            prep_points.append([zeta] if lo else [zeta, d.next_point_ef(zeta)])
        main_points = [
            [zeta] if chip.local_only else [zeta, td.next_point_ef(zeta)]
            for chip, td in zip(chips, trace_domains)
        ]
        perm_points = [[zeta, td.next_point_ef(zeta)] for td in trace_domains]
        quotient_points = [[zeta] for _ in range(n_quotient_mats)]

        t0 = time.time()
        opened, pcs_proof = pcs_open(
            [
                (pk.data, prep_points),
                (main_data, main_points),
                (perm_data, perm_points),
                (quotient_data, quotient_points),
            ],
            challenger,
            num_queries=config.fri.num_queries,
            pow_bits=config.fri.proof_of_work_bits,
        )
        log.debug("opened multi batches in %.3fs", time.time() - t0)
        phases.add("pcs_open_total", time.time() - t0)

        prep_vals, main_vals, perm_vals, quot_vals = opened

        # Assemble per-chip opened values.
        def air_vals(mat_vals, local_only_flag, width):
            if local_only_flag:
                return AirOpenedValues(local=mat_vals[0], next=[(0, 0, 0, 0)] * width)
            return AirOpenedValues(local=mat_vals[0], next=mat_vals[1])

        opened_chips = []
        qi = 0
        for i, chip in enumerate(chips):
            if chip.name in pk.chip_ordering:
                pidx = pk.chip_ordering[chip.name]
                prep_open = air_vals(
                    prep_vals[pidx], pk.local_only[pidx], pk.traces[pidx].shape[1]
                )
            else:
                prep_open = AirOpenedValues(local=[], next=[])
            main_open = air_vals(main_vals[i], chip.local_only, trace_widths[i])
            perm_open = AirOpenedValues(local=perm_vals[i][0], next=perm_vals[i][1])
            chunks = []
            for _ in range(chunk_counts[i]):
                chunks.append(quot_vals[qi][0])
                qi += 1
            opened_chips.append(
                ChipOpenedValues(
                    preprocessed=prep_open,
                    main=main_open,
                    permutation=perm_open,
                    quotient=chunks,
                    cumulative_sum=cumulative_sums_host[i],
                    log_degree=log_degrees[i],
                )
            )

        return ShardProof(
            commitment=ShardCommitment(
                main_commit=[int(x) for x in shard_data["root"]],
                permutation_commit=[int(x) for x in perm_root],
                quotient_commit=[int(x) for x in quotient_root],
            ),
            opened_values=opened_chips,
            opening_proof=pcs_proof,
            chip_ordering=dict(shard_data["chip_ordering"]),
        )

    # -- compile overlap ---------------------------------------------------

    def prewarm(self, pk, chips, log_degrees) -> None:
        # Fire concurrent COMPILE-ONLY warm-ups for every downstream program
        # (the transcript forces the PHASES serial; the COMPILES need not be).
        from .warm import warm_prove_programs

        warm_prove_programs(pk, chips, log_degrees, self.config)


# Reference-compatible alias: the "CPU prover" name maps to the default
# hardware prover in this framework.
CpuProver = TpuProver
