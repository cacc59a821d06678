"""End-to-end prover orchestration (reference: crates/prover/).

`BfProver` ties the executor front-end to the STARK machine: setup parses the
guest source into keys, execute runs the interpreter only, prove runs the full
pipeline and logs the summary line (cycles / e2e ms / kHz / proof size,
matching utils/prove.rs:50-56), verify enforces the CPU-chip presence and the
2^22 max log degree (crates/prover/src/verify.rs:16-28).
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass
from typing import Optional, Tuple

from .core.executor import execute
from .core.program import Program
from .models.machine_def import brainfuck_chips
from .stark.config import KoalaBearPoseidon2
from .stark.errors import (
    CpuLogDegreeTooLarge,
    MissingCpuChip,
    VerificationFailure,
)
from .stark.machine import StarkMachine, StarkProvingKey, StarkVerifyingKey
from .stark.prover import TpuProver
from .stark.types import MachineProof
from .utils.report import generate_execution_report

log = logging.getLogger("zkbf.prover")

# Max CPU trace log-degree: lookup multiplicity overflow bound
# (reference crates/core/machine/src/cpu/mod.rs:8).
MAX_CPU_LOG_DEGREE = 22


@dataclass
class BfVerifyingKey:
    vk: StarkVerifyingKey

    def to_bytes(self) -> bytes:
        """Serialize (reference StarkVerifyingKey serde, machine.rs:73-75):
        verification no longer needs the process that ran setup."""
        from .stark.serial import encode_vk

        return encode_vk(self.vk)

    @classmethod
    def from_bytes(cls, data: bytes) -> "BfVerifyingKey":
        from .stark.serial import decode_vk

        return cls(vk=decode_vk(data))


@dataclass
class BfProvingKey:
    pk: StarkProvingKey
    elf: str
    vk: BfVerifyingKey

    def to_bytes(self) -> bytes:
        """Serialize by carrying the guest source, like the reference
        BfProvingKey carries the ELF (crates/prover/src/types.rs:9-14).

        The device-resident PCS data (preprocessed traces, LDEs, Merkle
        tree) is deliberately NOT serialized: it is recomputed
        deterministically from the source on load - the TPU-native analogue
        of the reference re-parsing pk.elf on every prove - and the
        recomputed commitment is checked against the stored vk.
        """
        elf_b = self.elf.encode("utf-8")
        vk_b = self.vk.to_bytes()
        import struct

        return struct.pack("<II", len(elf_b), len(vk_b)) + elf_b + vk_b

    @classmethod
    def from_bytes(cls, data: bytes, prover: "BfProver") -> "BfProvingKey":
        import struct

        if len(data) < 8:
            raise VerificationFailure("truncated proving key bytes")
        n_elf, n_vk = struct.unpack("<II", data[:8])
        if 8 + n_elf + n_vk != len(data):
            raise VerificationFailure("bad proving key framing")
        elf = data[8 : 8 + n_elf].decode("utf-8")
        stored_vk = BfVerifyingKey.from_bytes(data[8 + n_elf :])
        pk, vk = prover.setup(elf)
        if vk.vk.commit != stored_vk.vk.commit:
            raise VerificationFailure(
                "recomputed preprocessed commitment does not match stored vk"
            )
        return pk


@dataclass
class BfCoreProof:
    proof: MachineProof
    stdin: bytes
    public_values: bytes
    cycles: int


class BfProver:
    def __init__(self, config: Optional[KoalaBearPoseidon2] = None):
        self.config = config or KoalaBearPoseidon2()
        self.machine = StarkMachine(self.config, brainfuck_chips())
        self.core_prover = TpuProver(self.machine)

    def setup(self, elf: str) -> Tuple[BfProvingKey, BfVerifyingKey]:
        program = Program.from_source(elf)
        pk, vk = self.core_prover.setup(program)
        bf_vk = BfVerifyingKey(vk=vk)
        return BfProvingKey(pk=pk, elf=elf, vk=bf_vk), bf_vk

    def execute(self, elf: str, stdin: bytes) -> bytes:
        program = Program.from_source(elf)
        record = execute(program, stdin)
        return record.output_stream

    def prove(self, pk: BfProvingKey, stdin: bytes) -> BfCoreProof:
        from .utils import phases

        program = Program.from_source(pk.elf)
        t_ex = time.time()
        record = execute(program, stdin)
        phases.add("execute", time.time() - t_ex)

        challenger = self.config.challenger()
        # ZKBF_PROFILE=<dir>: capture a jax.profiler trace of the whole prove
        # (the TPU analogue of the reference's tracing spans, SURVEY §5.1;
        # per-phase wall-times are logged by TpuProver regardless).
        profile_dir = os.environ.get("ZKBF_PROFILE")
        t0 = time.time()
        if profile_dir:
            import jax

            with jax.profiler.trace(profile_dir):
                proof = self.core_prover.prove(pk.pk, record, challenger)
            log.info("jax.profiler trace written to %s", profile_dir)
        else:
            proof = self.core_prover.prove(pk.pk, record, challenger)
        elapsed_ms = (time.time() - t0) * 1000
        nb_bytes = len(proof.to_bytes())
        log.info(
            "summary: cycles=%d, e2e=%dms, khz=%.2f, proofSize=%d",
            record.global_clk,
            int(elapsed_ms),
            record.global_clk / max(elapsed_ms, 1e-9),
            nb_bytes,
        )
        for line in generate_execution_report(record.opcode_counts()):
            log.debug("%s", line)

        if os.environ.get("BF_DEBUG", "").lower() in ("1", "true"):
            self.machine.debug_constraints(program, record)

        return BfCoreProof(
            proof=proof,
            stdin=bytes(stdin),
            public_values=record.output_stream,
            cycles=record.global_clk,
        )

    def verify(self, proof: MachineProof, vk: BfVerifyingKey) -> None:
        from .stark.errors import MachineVerificationError

        sp = proof.shard_proof
        if not sp.contains_cpu():
            raise MissingCpuChip("missing CPU chip in shard")
        try:
            if sp.log_degree_cpu() > MAX_CPU_LOG_DEGREE:
                raise CpuLogDegreeTooLarge(
                    f"CPU log degree {sp.log_degree_cpu()} > {MAX_CPU_LOG_DEGREE}"
                )
        except (KeyError, IndexError, AttributeError, TypeError) as e:
            raise MachineVerificationError(
                f"structurally invalid shard proof: {type(e).__name__}: {e}"
            ) from e
        challenger = self.config.challenger()
        self.machine.verify(vk.vk, proof, challenger)
