"""Benchmark: end-to-end core-proof wall-clock on real TPU hardware.

Proves loop-heavy Brainfuck guests with the full production FRI config
(84 queries, 16 PoW bits), verifies every proof, and prints a JSON line

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

after EVERY completed rung of an ascending cycle ladder (2^14 -> 2^16 ->
2^18 -> 2^20), so a partial run still yields a valid (smaller-scale) result:
the LAST line printed is the best completed measurement.  If the budget
allows, the largest completed rung is re-proved warm (all programs already
compiled) and that steady-state number becomes the final line.

`vs_baseline` is the speedup against an assumed reference-prover rate of
20 kHz (cycles/sec) for the Rust CPU prover - the reference publishes no
numbers (BASELINE.md) and no Rust toolchain exists in this image, so the
anchor is the mid-range of single-shard SP1-class CPU provers on this trace
shape; revisit when a measured baseline lands.

Environment knobs:
    BENCH_CYCLES_LOG2   - run ONLY this rung (default: the ladder)
    BENCH_BUDGET        - wall-clock budget in seconds (default 1500)
    FRI_QUERIES         - default 84 (production)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from zkvm_brainfuck_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

ASSUMED_BASELINE_KHZ = 20.0
T0 = time.time()


def log(msg):
    print(f"[bench {time.time() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def bench_guest(log2_cycles: int) -> str:
    """Loop-heavy guest: '-[>-[-]<-]' is ~133k cycles (255 outer iterations
    of a 255-iteration inner clear loop); repeat to reach the target.
    Below one unit, use a plain '+'*n / '.'-terminated straight-line guest."""
    unit = "-[>-[-]<-]"
    unit_cycles = 133_003
    target = 1 << log2_cycles
    if target >= unit_cycles:
        return unit * max(1, round(target / unit_cycles))
    # straight-line filler: pairs of +- keep mv at 0; one output at the end
    return "+-" * ((target - 1) // 2) + "."


def emit(cycles, elapsed, verified, phase, extra=None):
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
            "phase": phase,
            "verified": verified,
            "fri_queries": int(os.environ.get("FRI_QUERIES", "84")),
            "baseline_assumption": f"{ASSUMED_BASELINE_KHZ}kHz reference CPU prover",
            **(extra or {}),
        },
    }
    print(json.dumps(result), flush=True)
    return result


def main():
    import jax

    from zkvm_brainfuck_tpu import ProverClient, setup_logger

    setup_logger()
    budget = float(os.environ.get("BENCH_BUDGET", "1500"))
    log(f"devices: {jax.devices()}  budget: {budget:.0f}s")

    if "BENCH_CYCLES_LOG2" in os.environ:
        ladder = [int(os.environ["BENCH_CYCLES_LOG2"])]
    else:
        ladder = [14, 16, 18, 20]

    client = ProverClient()
    last = None  # (log2, guest, pk, vk, elapsed)
    for rung in ladder:
        if last is not None:
            # proceed only if a fresh rung (~2.5x the previous incl. compile)
            # plus a warm re-prove still fits the budget.
            remaining = budget - (time.time() - T0)
            if remaining < 2.5 * last[4] + 60:
                log(f"skipping 2^{rung}: {remaining:.0f}s left")
                break
        guest = bench_guest(rung)
        log(f"rung 2^{rung}: setup")
        pk, vk = client.setup(guest)
        log(f"rung 2^{rung}: prove (cold)")
        t1 = time.time()
        proof = client.prove(pk).run()
        elapsed = time.time() - t1
        t2 = time.time()
        client.verify(proof, vk)
        tver = time.time() - t2
        cycles = proof.proof.cycles
        log(f"rung 2^{rung}: {cycles} cycles in {elapsed:.1f}s cold, verify {tver:.1f}s")
        emit(cycles, elapsed, True, "cold", {
            "proof_bytes": len(proof.proof.proof.to_bytes()),
            "verify_s": round(tver, 2),
            "device": _device_desc(),
        })
        last = (rung, guest, pk, vk, elapsed)

    # Warm re-prove of the largest completed rung: all programs compiled, so
    # this measures actual device throughput.
    if last is not None:
        rung, guest, pk, vk, cold_elapsed = last
        remaining = budget - (time.time() - T0)
        if remaining > 0.6 * cold_elapsed + 30:
            log(f"rung 2^{rung}: prove (warm)")
            t1 = time.time()
            proof = client.prove(pk).run()
            elapsed = time.time() - t1
            client.verify(proof, vk)
            cycles = proof.proof.cycles
            log(f"rung 2^{rung}: warm {elapsed:.1f}s")
            emit(cycles, elapsed, True, "steady", {
                "proof_bytes": len(proof.proof.proof.to_bytes()),
                "cold_s": round(cold_elapsed, 2),
                "device": _device_desc(),
            })
        else:
            log(f"no budget for warm re-prove ({remaining:.0f}s left)")


def _device_desc():
    import jax

    d = jax.devices()[0]
    return f"{d.platform}:{getattr(d, 'device_kind', '?')}x{len(jax.devices())}"


if __name__ == "__main__":
    main()
