"""Measured CPU-backend anchor for BASELINE.md (VERDICT r3 item 7).

Runs THIS framework's prover on the CPU backend (8 virtual devices, XLA
CPU) at a given rung with the PRODUCTION FRI config, and prints the steady
kHz.  This is NOT the Rust reference prover (no Rust toolchain in this
image) - it is a clearly-labeled measured secondary anchor: "what a
general-purpose CPU achieves running this exact pipeline".

Usage: python tools/cpu_anchor.py [log2_cycles=14]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("FRI_QUERIES", "84")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

from zkvm_brainfuck_tpu.utils.jax_setup import ensure_cpu_isa_cap

ensure_cpu_isa_cap()

import jax

jax.config.update("jax_platforms", "cpu")

from zkvm_brainfuck_tpu.utils.jax_setup import enable_compilation_cache, enable_cpu_fast_field

enable_compilation_cache()
enable_cpu_fast_field()


def main():
    import json

    from bench import bench_guest
    from zkvm_brainfuck_tpu import ProverClient

    rung = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    guest = bench_guest(rung)
    client = ProverClient()
    pk, vk = client.setup(guest)
    t0 = time.time()
    proof = client.prove(pk).run()
    cold = time.time() - t0
    client.verify(proof, vk)
    t0 = time.time()
    proof = client.prove(pk).run()
    warm = time.time() - t0
    client.verify(proof, vk)
    cycles = proof.proof.cycles
    print(json.dumps({
        "metric": f"cpu_backend_anchor_{cycles}_cycles",
        "value": round(warm, 2),
        "unit": "s",
        "extra": {
            "cycles": cycles,
            "khz_steady": round(cycles / warm / 1000, 2),
            "cold_s": round(cold, 2),
            "fri_queries": int(os.environ["FRI_QUERIES"]),
            "backend": "xla-cpu (8 virtual devices)",
            "note": "THIS framework on CPU, not the Rust reference",
        },
    }), flush=True)


if __name__ == "__main__":
    main()
