"""Benchmark: end-to-end core-proof wall-clock on real TPU hardware.

Proves loop-heavy Brainfuck guests with the full production FRI config
(84 queries, 16 PoW bits), verifies every proof, and prints a JSON line

    {"metric": ..., "value": N, "unit": ..., "vs_assumed_baseline": N}

after EVERY completed rung of a DESCENDING cycle ladder (2^20 -> 2^18 ->
... -> 2^12), so the budget is spent on the most meaningful (largest) scale
first and a partial run still yields a valid result: the LAST line printed
is the best (largest-scale, steady-state) completed measurement.

Crash containment: every rung runs in a CHILD process under its own timeout, so
a hung device RPC, an OOM, or any other failure in one rung can never take
down the whole bench - the parent reports every completed rung and always
exits 0.  (Round-2 lesson: one RESOURCE_EXHAUSTED killed the process with
zero output lines.)

`vs_assumed_baseline` is the speedup against an ASSUMED reference-prover
rate of 20 kHz (cycles/sec) for the Rust CPU prover: the reference publishes
no numbers (BASELINE.md) and no Rust toolchain exists in this image, so the
anchor is the mid-range of single-shard SP1-class CPU provers on this trace
shape.  It is labeled as assumed, not measured.

Environment knobs:
    BENCH_CYCLES_LOG2   - run ONLY this rung (default: the ladder)
    BENCH_BUDGET        - wall-clock budget in seconds (default 1500)
    FRI_QUERIES         - default 84 (production)
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

ASSUMED_BASELINE_KHZ = 20.0
T0 = time.time()
# LARGEST first: per-rung fixed costs (compiled-executable loads over the
# tunnel, ~2-5 min/process) mean a tight budget should be spent on the rung
# with the best cycles/sec before the small ones; the final printed line is
# the best (max-cycles, steady-phase-preferred) completed measurement.
LADDER = [20, 18, 16, 14, 12]


def log(msg):
    print(f"[bench {time.time() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def bench_guest(log2_cycles: int) -> str:
    """Guest with EXACTLY 2^k - 1 cycles -> a 2^k-row CPU trace (the
    north-star metric is prove rate at a given trace height; overshooting
    into the next power of two doubles every chip's rows).

    Composition: m loop units '-[>-[-]<-]' (255 outer iterations of a
    255-iteration inner clear loop, 131_582 cycles measured) + a
    straight-line '+-' filler + one output."""
    unit = "-[>-[-]<-]"
    unit_cycles = 131_582
    target = (1 << log2_cycles) - 1
    m = max(0, (target - 1) // unit_cycles)
    rest = target - 1 - unit_cycles * m
    q, r = divmod(rest, 2)
    return unit * m + "+-" * q + "+" * r + "."


def emit(cycles, elapsed, phase, extra=None):
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
            "verified": True,
            "fri_queries": int(os.environ.get("FRI_QUERIES", "84")),
            "baseline_is_assumed": True,
            "baseline_assumption": f"{ASSUMED_BASELINE_KHZ}kHz reference CPU prover (unmeasured; see BASELINE.md)",
            **(extra or {}),
        },
    }
    print(json.dumps(result), flush=True)
    return result


# ---------------------------------------------------------------------------
# Child: prove one rung (cold + warm) in this process, print JSON per phase.
# ---------------------------------------------------------------------------


def run_rung(rung: int, do_warm: bool) -> None:
    from zkvm_brainfuck_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from zkvm_brainfuck_tpu import ProverClient, setup_logger

    setup_logger()
    d = jax.devices()[0]
    device = f"{d.platform}:{getattr(d, 'device_kind', '?')}x{len(jax.devices())}"
    log(f"rung 2^{rung}: devices {jax.devices()}")

    client = ProverClient()
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
    emit(cycles, elapsed, "cold", {
        "proof_bytes": len(proof.proof.proof.to_bytes()),
        "verify_s": round(tver, 2),
        "device": device,
    })
    if do_warm:
        # Two warm iterations: the first still absorbs stragglers (async
        # dispatches, host GC); the second is the true steady state.  Each is
        # emitted, so the driver's "last line" is the best measurement.
        for it in range(2):
            log(f"rung 2^{rung}: prove (warm {it + 1})")
            t1 = time.time()
            proof = client.prove(pk).run()
            elapsed = time.time() - t1
            client.verify(proof, vk)
            log(f"rung 2^{rung}: warm {elapsed:.1f}s")
            emit(proof.proof.cycles, elapsed, "steady", {
                "proof_bytes": len(proof.proof.proof.to_bytes()),
                "device": device,
            })


# ---------------------------------------------------------------------------
# Parent: ladder of child processes, each under its own timeout.
# ---------------------------------------------------------------------------


def spawn_rung(rung: int, timeout_s: float, do_warm: bool):
    """Run one rung in a child; forward its JSON lines; return them parsed."""
    env = dict(os.environ)
    cmd = [sys.executable, os.path.abspath(__file__), "--rung", str(rung)]
    if do_warm:
        cmd.append("--warm")
    log(f"spawning rung 2^{rung} (timeout {timeout_s:.0f}s)")
    results = []
    try:
        proc = subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=sys.stderr, env=env, text=True,
            start_new_session=True,
        )
        deadline = time.time() + timeout_s
        try:
            out, _ = proc.communicate(timeout=max(1.0, deadline - time.time()))
        except subprocess.TimeoutExpired:
            log(f"rung 2^{rung}: TIMEOUT after {timeout_s:.0f}s, killing")
            import signal

            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except Exception:
                proc.kill()
            out, _ = proc.communicate()
        for line in (out or "").splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                results.append(json.loads(line))
                print(line, flush=True)  # forward to the driver
            except json.JSONDecodeError:
                pass
        if proc.returncode not in (0, None) and not results:
            log(f"rung 2^{rung}: child rc={proc.returncode}, no result")
    except Exception as e:  # the bench must never die
        log(f"rung 2^{rung}: spawn failed: {e}")
    return results


def main():
    budget = float(os.environ.get("BENCH_BUDGET", "1500"))
    if "BENCH_CYCLES_LOG2" in os.environ:
        ladder = [int(os.environ["BENCH_CYCLES_LOG2"])]
    else:
        ladder = LADDER

    def rank(r):
        # max cycles first; steady phase beats cold at equal cycles
        return (r["extra"]["cycles"], r["extra"]["phase"] == "steady", -r["value"])

    best = None
    for i, rung in enumerate(ladder):
        remaining = budget - (time.time() - T0)
        if remaining < 60:
            log(f"budget exhausted ({remaining:.0f}s left)")
            break
        # The first (largest) rung gets a protected slice of the budget so a
        # hang there cannot eat everything; later rungs may use what remains.
        timeout_s = min(remaining - 20, budget * 0.55) if i == 0 else remaining - 20
        results = spawn_rung(rung, timeout_s, do_warm=True)
        for r in results:
            if best is None or rank(r) > rank(best):
                best = r

    if best is not None:
        # Re-print the best (== largest completed) measurement as the final line.
        print(json.dumps(best), flush=True)
    else:
        log("no rung completed")
        print(json.dumps({
            "metric": "e2e_core_prove_walltime_verified",
            "value": -1,
            "unit": "s",
            "vs_baseline": 0,
            "extra": {"error": "no rung completed within budget"},
        }), flush=True)
    sys.exit(0)


if __name__ == "__main__":
    if "--rung" in sys.argv:
        rung = int(sys.argv[sys.argv.index("--rung") + 1])
        try:
            run_rung(rung, do_warm="--warm" in sys.argv)
        except Exception:
            import traceback

            traceback.print_exc()
            sys.exit(1)
        sys.exit(0)
    main()
