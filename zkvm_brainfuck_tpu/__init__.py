"""zkvm_brainfuck_tpu: a TPU-native STARK proving stack for the Brainfuck zkVM.

A from-scratch JAX/XLA re-design of felicityin/zkvm-brainfuck (Rust/Plonky3):
KoalaBear field + EF4 challenges, Poseidon2 Merkle commitments, LogUp
cross-chip lookups, two-adic FRI - with every hot kernel (trace generation,
NTT/LDE, hashing, LogUp, quotient, FRI folds) expressed as batched device
code, a native C++ executor front-end, and multi-chip scaling via
jax.sharding (see parallel/).
"""

from .prover import BfCoreProof, BfProver, BfProvingKey, BfVerifyingKey
from .sdk import (
    BfProofWithPublicValues,
    BfVerificationError,
    CpuProver,
    Prover,
    ProverClient,
)
from .utils.logging import setup_logger

__version__ = "0.1.0"

__all__ = [
    "ProverClient",
    "Prover",
    "CpuProver",
    "BfProver",
    "BfProvingKey",
    "BfVerifyingKey",
    "BfCoreProof",
    "BfProofWithPublicValues",
    "BfVerificationError",
    "setup_logger",
]
