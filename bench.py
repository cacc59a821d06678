"""Benchmark: end-to-end core-proof wall-clock on real TPU hardware.

Proves loop-heavy Brainfuck guests with the full production FRI config
(84 queries, 16 PoW bits), verifies every proof, and prints a JSON line

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
     "vs_assumed_baseline": N, "extra": {..., "phases": {...}}}

after EVERY completed measurement of a DESCENDING cycle ladder
(2^22 -> 2^20 -> 2^18 -> 2^16), so the budget is spent on the most
meaningful (largest) scale first and a partial run still yields a valid
result: the LAST line printed is the best (largest-scale, steady-state)
completed measurement.

Process structure (round-3 lesson: per-process fixed costs - device init +
compiled-executable loads over the tunnel - are minutes each, so one child
per rung starved the ladder):
- ONE persistent child walks the whole ladder, amortizing the fixed cost;
  its JSON lines stream to the parent and are FORWARDED IMMEDIATELY, so
  every completed measurement survives a later hang.
- The parent enforces a per-rung deadline (children announce rung starts);
  on a hang it kills the child and respawns it with the REMAINING rungs.
- Rungs whose minimum plausible cost exceeds the remaining budget are
  skipped outright instead of spawning doomed children.

`vs_assumed_baseline` is the speedup against an ASSUMED reference-prover
rate of 20 kHz (cycles/sec) for the Rust CPU prover: the reference publishes
no numbers (BASELINE.md) and no Rust toolchain exists in this image, so the
anchor is the mid-range of single-shard SP1-class CPU provers on this trace
shape.  `vs_baseline` is kept as a DUPLICATE of the same number for the
driver's parser; both are assumptions, clearly labeled in extra.  A measured
secondary anchor (this framework's own CPU backend) is recorded in
BASELINE.md.

Environment knobs:
    BENCH_CYCLES_LOG2   - run ONLY this rung (default: the ladder)
    BENCH_BUDGET        - wall-clock budget in seconds (default 1500)
    FRI_QUERIES         - default 84 (production)
"""

import json
import os
import signal
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

ASSUMED_BASELINE_KHZ = 20.0
T0 = time.time()
# LARGEST first: the final printed line is the best (max-cycles,
# steady-phase-preferred) completed measurement.  2^22 is the north-star
# scale (reference MAX_CPU_LOG_DEGREE, crates/core/machine/src/cpu/mod.rs:8).
LADDER = [22, 20, 18, 16]
# Minimum plausible seconds to get ANY result at rung k in a warm-cache child
# (device init + executable loads + one prove + verify); used to skip doomed
# rungs.  Generous for the tunnel's 2-5 min fixed cost when caches are cold.
MIN_RUNG_COST = {22: 240, 20: 150, 18: 120, 16: 100, 14: 90, 12: 90}


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
    speedup = round(baseline_seconds / elapsed, 3)
    result = {
        "metric": f"e2e_core_prove_walltime_{cycles}_cycles_verified",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": speedup,
        "vs_assumed_baseline": speedup,
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
# Child: walk a ladder of rungs IN ONE PROCESS, print JSON per measurement.
# ---------------------------------------------------------------------------


# Estimated peak device working set per rung (GB), measured round 5: the
# 2^22 prove peaks ~7 GB during the FRI phase (all rounds' LDEs + tree flats
# live until the query gathers).  The tunneled chip's FREE HBM fluctuates
# with other tenants, so big rungs probe for headroom first and defer
# instead of dying.
RUNG_PEAK_GB = {22: 5.0, 20: 2.0}  # 2^22 runs LOW-MEMORY (ZKBF_LOWMEM auto): ~4.5 GB peak


def hbm_headroom_ok(need_gb: float) -> bool:
    """Touch-probe `need_gb` of device HBM (constant-fill buffers don't
    count - only a program's actual working set hits the limit)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = int(need_gb * (1 << 30)) // 4
    touch = jax.jit(
        lambda k: jnp.sum(jax.random.bits(k, (n,), dtype=jnp.uint32) & jnp.uint32(1))
    )
    try:
        np.asarray(touch(jax.random.PRNGKey(int(time.time()) & 0xFFFF)))
        return True
    except Exception as e:
        if "RESOURCE_EXHAUSTED" not in str(e):
            raise
        return False


def run_ladder(rungs, deadline: float) -> None:
    from zkvm_brainfuck_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from zkvm_brainfuck_tpu import ProverClient, setup_logger
    from zkvm_brainfuck_tpu.utils import phases

    setup_logger()
    d = jax.devices()[0]
    device = f"{d.platform}:{getattr(d, 'device_kind', '?')}x{len(jax.devices())}"
    log(f"ladder {rungs}: devices {jax.devices()}")
    client = ProverClient()

    # A rung that hits RESOURCE_EXHAUSTED poisons this PROCESS (residual
    # buffers + cached big-rung tables keep failing every later rung -
    # observed round 4), so the child EXITS with rc=3 and a marker; the
    # parent respawns a fresh child with the remaining rungs and re-queues
    # the OOM'd rung once at the end (the tunneled chip's free HBM
    # fluctuates with other tenants, so a later attempt may fit).
    queue = list(rungs)
    deferred = set()
    while queue:
        rung = queue.pop(0)
        remaining = deadline - time.time()
        need = MIN_RUNG_COST.get(rung, 120)
        if remaining < need:
            log(f"rung 2^{rung}: skipped ({remaining:.0f}s left < {need}s minimum)")
            continue
        peak = RUNG_PEAK_GB.get(rung)
        if peak is not None and not hbm_headroom_ok(peak):
            if rung not in deferred and queue:
                # other tenants hold the chip's HBM right now: run the
                # smaller rungs first and come back
                deferred.add(rung)
                queue.append(rung)
                log(f"rung 2^{rung}: <{peak} GB free, deferred to end of ladder")
                continue
            # last in line: wait for headroom while budget remains
            waited = False
            while deadline - time.time() > need + 90:
                log(f"rung 2^{rung}: waiting 90s for {peak} GB of free HBM")
                time.sleep(90)
                if hbm_headroom_ok(peak):
                    waited = True
                    break
            if not waited:
                log(f"rung 2^{rung}: no headroom before budget; attempting anyway")
        try:
            run_one_rung(client, rung, deadline, device)
        except Exception as e:
            log(f"rung 2^{rung}: FAILED ({type(e).__name__}: {str(e)[:200]})")
            if "RESOURCE_EXHAUSTED" in str(e):
                print(json.dumps({"rung_oom": rung}), flush=True)
                sys.exit(3)


def run_one_rung(client, rung, deadline, device) -> None:
    from zkvm_brainfuck_tpu.utils import phases

    # announce so the parent can apply a per-rung deadline
    print(json.dumps({"rung_start": rung}), flush=True)
    guest = bench_guest(rung)
    log(f"rung 2^{rung}: setup")
    pk, vk = client.setup(guest)
    log(f"rung 2^{rung}: prove (cold)")
    ph = {}
    t1 = time.time()
    with phases.collect(ph):
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
        "phases": {k: round(v, 3) for k, v in ph.items()},
    })
    # Two warm iterations: the first still absorbs stragglers (async
    # dispatches, host GC); the second is the true steady state.  Each is
    # emitted, so the parent's "best" pick prefers the fastest steady.
    for it in range(2):
        if deadline - time.time() < 30:
            log(f"rung 2^{rung}: out of budget for warm iter {it + 1}")
            break
        log(f"rung 2^{rung}: prove (warm {it + 1})")
        ph = {}
        t1 = time.time()
        with phases.collect(ph):
            proof = client.prove(pk).run()
        elapsed = time.time() - t1
        t2 = time.time()
        client.verify(proof, vk)
        tver = time.time() - t2
        log(f"rung 2^{rung}: warm {elapsed:.1f}s, verify {tver:.1f}s")
        emit(proof.proof.cycles, elapsed, "steady", {
            "proof_bytes": len(proof.proof.proof.to_bytes()),
            "verify_s": round(tver, 2),
            "device": device,
            "phases": {k: round(v, 3) for k, v in ph.items()},
        })
    # Drop this rung's device buffers before the next (smaller) rung.
    del pk, vk, proof


# ---------------------------------------------------------------------------
# Parent: one persistent ladder child, streamed output, per-rung deadlines.
# ---------------------------------------------------------------------------


def spawn_ladder(rungs, budget_end: float, results, state):
    """Spawn one ladder child; stream + forward its stdout lines as they
    arrive; kill at rung deadlines.  Returns the rung list still pending."""
    cmd = [
        sys.executable, os.path.abspath(__file__),
        "--ladder", ",".join(str(r) for r in rungs),
        "--deadline", f"{budget_end:.1f}",
    ]
    log(f"spawning ladder child {rungs}")
    try:
        proc = subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=sys.stderr, text=True,
            start_new_session=True,
        )
    except Exception as e:
        log(f"spawn failed: {e}")
        return []

    pending = list(rungs)

    def reader():
        for line in proc.stdout:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "rung_start" in obj:
                state["rung"] = obj["rung_start"]
                state["rung_t0"] = time.time()
                continue
            if "rung_oom" in obj:
                state["oom"] = obj["rung_oom"]
                continue
            results.append(obj)
            print(line, flush=True)  # forward to the driver IMMEDIATELY

    t = threading.Thread(target=reader, daemon=True)
    t.start()

    while True:
        rc = proc.poll()
        if rc is not None:
            t.join(timeout=5)
            if rc == 0:
                return []
            log(f"ladder child exited rc={rc}")
            cur = state.get("rung")
            if cur is None:
                return pending  # died before any rung: retry (attempt-capped)
            done = {
                (r["extra"]["cycles"] + 1).bit_length() - 1
                for r in results
                if r.get("extra", {}).get("phase") == "steady"
            }
            rest = [r for r in pending if r < cur and r not in done]
            oom = state.pop("oom", None)
            if rc == 3 and oom is not None and oom not in state.setdefault("retried", set()):
                state["retried"].add(oom)
                rest = rest + [oom]  # one fresh-process retry at the end
                log(f"rung 2^{oom}: re-queued for a fresh-process retry")
            return rest
        now = time.time()
        cur = state.get("rung")
        if now > budget_end + 15:
            log("global budget exceeded: killing ladder child")
            _kill(proc)
            return []
        if cur is not None:
            # per-rung ceiling: largest rung may use up to 60% of the whole
            # budget; later rungs get whatever remains
            rung_budget = (budget_end - state["rung_t0"]) if cur != max(pending) \
                else min(budget_end - state["rung_t0"], 0.60 * (budget_end - T0))
            if now - state["rung_t0"] > rung_budget:
                log(f"rung 2^{cur}: deadline exceeded, killing child")
                _kill(proc)
                t.join(timeout=5)
                return [r for r in pending if r < cur]
        time.sleep(1.0)


def _kill(proc):
    try:
        os.killpg(proc.pid, signal.SIGKILL)
    except Exception:
        try:
            proc.kill()
        except Exception:
            pass
    try:
        proc.wait(timeout=10)
    except Exception:
        pass


def main():
    budget = float(os.environ.get("BENCH_BUDGET", "1500"))
    budget_end = T0 + budget
    if "BENCH_CYCLES_LOG2" in os.environ:
        ladder = [int(os.environ["BENCH_CYCLES_LOG2"])]
    else:
        ladder = list(LADDER)

    results, state = [], {}
    pending = ladder
    attempts = 0
    while pending and time.time() < budget_end - 60 and attempts < 4:
        attempts += 1
        pending = spawn_ladder(pending, budget_end, results, state)

    def rank(r):
        # max cycles first; steady phase beats cold at equal cycles
        return (r["extra"]["cycles"], r["extra"]["phase"] == "steady", -r["value"])

    best = None
    for r in results:
        if "extra" in r and (best is None or rank(r) > rank(best)):
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
            "vs_assumed_baseline": 0,
            "extra": {"error": "no rung completed within budget"},
        }), flush=True)
    sys.exit(0)


if __name__ == "__main__":
    if "--ladder" in sys.argv:
        rungs = [int(x) for x in sys.argv[sys.argv.index("--ladder") + 1].split(",")]
        deadline = float(sys.argv[sys.argv.index("--deadline") + 1]) \
            if "--deadline" in sys.argv else time.time() + 1e9
        try:
            run_ladder(rungs, deadline)
        except Exception:
            import traceback

            traceback.print_exc()
            sys.exit(1)
        sys.exit(0)
    if "--rung" in sys.argv:  # single-rung compatibility entry (prewarming)
        rung = int(sys.argv[sys.argv.index("--rung") + 1])
        try:
            run_ladder([rung], time.time() + 1e9)
        except Exception:
            import traceback

            traceback.print_exc()
            sys.exit(1)
        sys.exit(0)
    main()
