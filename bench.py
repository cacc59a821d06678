"""Benchmark: end-to-end core-proof wall-clock on real TPU hardware.

Proves a loop-heavy Brainfuck guest (~2^20 cycles) with the full production
FRI config (84 queries, 16 PoW bits), verifies the proof, and prints ONE JSON
line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

`vs_baseline` is the speedup against an assumed reference-prover rate of
20 kHz (cycles/sec) for the Rust CPU prover - the reference publishes no
numbers (BASELINE.md) and no Rust toolchain exists in this image, so the
anchor is the mid-range of single-shard SP1-class CPU provers on this trace
shape; revisit when a measured baseline lands.

Environment knobs:
    BENCH_CYCLES_LOG2 (default 20)  - target cycle count
    BENCH_STEADY=1                  - prove twice, report the warm run
    FRI_QUERIES (default 84)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from zkvm_brainfuck_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

ASSUMED_BASELINE_KHZ = 20.0


def bench_guest(log2_cycles: int) -> str:
    """Loop-heavy guest: '-[>-[-]<-]' is ~133k cycles (255 outer iterations
    of a 255-iteration inner clear loop); repeat to reach the target."""
    unit = "-[>-[-]<-]"
    unit_cycles = 133_000
    reps = max(1, round((1 << log2_cycles) / unit_cycles))
    return unit * reps


def main():
    from zkvm_brainfuck_tpu import ProverClient, setup_logger

    setup_logger()
    log2 = int(os.environ.get("BENCH_CYCLES_LOG2", "20"))
    guest = bench_guest(log2)

    client = ProverClient()
    pk, vk = client.setup(guest)

    # Steady-state by default: the first prove warms XLA compiles (the axon
    # TPU backend has no cross-process compilation cache), the second is
    # measured.  BENCH_COLD=1 measures the cold run instead.
    runs = 1 if os.environ.get("BENCH_COLD") == "1" else 2
    elapsed = None
    for _ in range(runs):
        t0 = time.time()
        proof = client.prove(pk).run()
        elapsed = time.time() - t0
    client.verify(proof, vk)

    cycles = proof.proof.cycles
    khz = cycles / elapsed / 1000.0
    baseline_seconds = cycles / (ASSUMED_BASELINE_KHZ * 1000.0)
    result = {
        "metric": f"e2e_core_prove_walltime_{cycles}_cycles_verified",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(baseline_seconds / elapsed, 3),
        "extra": {
            "cycles": cycles,
            "khz": round(khz, 2),
            "proof_bytes": len(proof.proof.proof.to_bytes()),
            "fri_queries": int(os.environ.get("FRI_QUERIES", "84")),
            "device": _device_desc(),
            "baseline_assumption": f"{ASSUMED_BASELINE_KHZ}kHz reference CPU prover",
        },
    }
    print(json.dumps(result))


def _device_desc() -> str:
    try:
        import jax

        return str(jax.devices()[0])
    except Exception:
        return "unknown"


if __name__ == "__main__":
    main()
