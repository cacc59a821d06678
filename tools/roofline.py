"""Speed-of-light measurement for the prover's kernel classes on the real TPU.

Measures, ON THE DEVICE THIS PROCESS SEES:
  1. elementwise KoalaBear throughput (mod-add, Montgomery mod-mul) - the
     VPU ceiling every field kernel is bounded by;
  2. HBM stream bandwidth (big-array copy);
  3. Poseidon2 permutation throughput (SoA batch) + its implied field-op
     rate vs (1);
  4. forward NTT throughput + implied butterfly rate vs (1);
  5. EF4 batched inverse throughput (the LogUp denominator kernel).

Prints one JSON line per measurement and a summary markdown table for
BASELINE.md.  Used with the per-phase times emitted by bench.py
("phases": {...}) to compute the fraction-of-roofline per prover phase.

Measurement discipline (memory: axon tunnel): distinct inputs per call,
force a host fetch of a small reduction per timing sample, warm once first.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def timeit(fn, *args, reps=5):
    """Median seconds over reps calls; each call must end in a host fetch."""
    ts = []
    for r in range(reps):
        t0 = time.time()
        fn(r, *args)
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    from zkvm_brainfuck_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from zkvm_brainfuck_tpu.ops import ext as xe
    from zkvm_brainfuck_tpu.ops import field as f
    from zkvm_brainfuck_tpu.ops import ntt as nt
    from zkvm_brainfuck_tpu.ops import poseidon2 as p2

    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{getattr(dev, 'device_kind', '?')}", file=sys.stderr)
    results = {}

    def emit(name, value, unit, extra=None):
        results[name] = (value, unit, extra or {})
        print(json.dumps({"metric": name, "value": value, "unit": unit,
                          **({"extra": extra} if extra else {})}), flush=True)

    # RTT floor on the tunnel is ~36 ms per fetch: make each timed call
    # hundreds of ms of real work so the floor is <10% of the measurement.
    N = 1 << 24
    K = 512

    # -- 1a. mod-add chain ------------------------------------------------
    @jax.jit
    def add_chain(x):
        y = x
        for _ in range(K):
            y = f.fadd(y, x)
        return jnp.sum(y[:8])

    x0 = jnp.arange(N, dtype=jnp.uint32) % jnp.uint32(f.P)
    _ = np.asarray(add_chain(x0))  # warm
    t = timeit(lambda r: np.asarray(add_chain(x0 + jnp.uint32(r + 1))))
    emit("kb_add_throughput", round(N * K / t / 1e9, 2), "Gops/s", {"n": N, "k": K})

    # -- 1b. Montgomery mod-mul chain -------------------------------------
    @jax.jit
    def mul_chain(x):
        y = x
        for _ in range(K):
            y = f.fmul(y, x)
        return jnp.sum(y[:8])

    _ = np.asarray(mul_chain(x0))
    t = timeit(lambda r: np.asarray(mul_chain(x0 + jnp.uint32(r + 1))))
    mul_gops = N * K / t / 1e9
    emit("kb_mul_throughput", round(mul_gops, 2), "Gops/s", {"n": N, "k": K})

    # -- 2. HBM stream (copy read+write) ----------------------------------
    M = 1 << 26  # 256 MB read + 256 MB write per copy

    @jax.jit
    def copy_chain(x):
        y = x + jnp.uint32(1)
        for _ in range(7):
            y = y + jnp.uint32(1)
        return jnp.sum(y[:8])

    xb = jnp.arange(M, dtype=jnp.uint32)
    _ = np.asarray(copy_chain(xb))
    t = timeit(lambda r: np.asarray(copy_chain(xb + jnp.uint32(r))))
    # 8 chained elementwise adds = 8 reads + 8 writes if unfused... XLA fuses
    # them into ONE read + ONE write; report the conservative fused figure.
    emit("hbm_stream_bw", round(2 * 4 * M / t / 1e9, 1), "GB/s",
         {"note": "fused elementwise chain: 1 read + 1 write of 256MB u32"})

    # -- 3. Poseidon2 permutation (SoA batch) ------------------------------
    B = 1 << 21

    @jax.jit
    def p2_chain(seed):
        cols = [seed + jnp.uint32(i) for i in range(16)]
        for _ in range(8):
            cols = p2.permute_cols(cols)
        return jnp.sum(cols[0][:8])

    s0 = jnp.arange(B, dtype=jnp.uint32)
    _ = np.asarray(p2_chain(s0))
    t = timeit(lambda r: np.asarray(p2_chain(s0 + jnp.uint32(r + 1))))
    perm_rate = 8 * B / t
    # field-op model per permutation: 8 ext rounds x (16 sbox(2 mul) + 64
    # add-ish linear) + 13 int rounds x (1 sbox + 16 mul + ~32 add)
    MODEL_MULS = 8 * 32 + 13 * 18  # 490
    MODEL_ADDS = 8 * 80 + 13 * 48  # 1264
    emit("poseidon2_perm_throughput", round(perm_rate / 1e6, 2), "Mperm/s", {
        "batch": B,
        "implied_mul_gops": round(perm_rate * MODEL_MULS / 1e9, 2),
        "implied_add_gops": round(perm_rate * MODEL_ADDS / 1e9, 2),
        "pct_of_mul_roofline": round(
            100 * (perm_rate * MODEL_MULS / 1e9) / max(mul_gops, 1e-9), 1),
    })

    # -- 4. forward NTT at PROVER-REPRESENTATIVE widths ---------------------
    # (the prover's NTTs run 38-64 columns wide; a 1-column NTT is pure
    # per-stage overhead and measures nothing useful)
    for log_n, w_cols in ((18, 64), (21, 40), (23, 64)):
        n = 1 << log_n
        tw = jax.jit(lambda log_n=log_n: nt.twiddle_blob_traced(log_n, False))()
        rev = jax.jit(lambda log_n=log_n: nt.bitrev_traced(log_n))()

        @jax.jit
        def ntt_once(x, tw=tw, rev=rev, log_n=log_n):
            y = nt.ntt_traced(x, tw, rev, log_n, False)
            return jnp.sum(y[:8, 0])

        try:
            xn = jnp.arange(n * w_cols, dtype=jnp.uint32).reshape(n, w_cols) % jnp.uint32(f.P)
            _ = np.asarray(ntt_once(xn))
            t = timeit(lambda r: np.asarray(ntt_once((xn + jnp.uint32(r + 1)) % jnp.uint32(f.P))))
        except Exception as e:
            print(f"ntt 2^{log_n}x{w_cols} skipped: {str(e)[:80]}", file=sys.stderr)
            continue
        bf = (n // 2) * log_n * w_cols  # butterflies: 1 mul + 2 add each
        emit(f"ntt_2e{log_n}x{w_cols}_time", round(t * 1e3, 2), "ms", {
            "butterflies": bf,
            "implied_mul_gops": round(bf / t / 1e9, 2),
            "pct_of_mul_roofline": round(100 * (bf / t / 1e9) / max(mul_gops, 1e-9), 1),
            "bytes_touched_gb": round(2 * 4 * n * w_cols * log_n / 1e9, 2),
            "implied_hbm_gbps": round(2 * 4 * n * w_cols * log_n / t / 1e9, 1),
        })

    # -- 5. EF4 batched inverse (LogUp denominators) -----------------------
    E = 1 << 20

    @jax.jit
    def einv_once(seed):
        planes = tuple((seed + jnp.uint32(i + 1)) % jnp.uint32(f.P) for i in range(4))
        inv = xe.einv(planes)
        return jnp.sum(inv[0][:8])

    se = jnp.arange(E, dtype=jnp.uint32)
    _ = np.asarray(einv_once(se))
    t = timeit(lambda r: np.asarray(einv_once(se + jnp.uint32(r + 1))))
    emit("ef4_inv_throughput", round(E / t / 1e6, 2), "Minv/s", {"batch": E})

    # -- summary table ------------------------------------------------------
    print("\n| kernel | measured | unit | notes |", file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for name, (v, u, ex) in results.items():
        print(f"| {name} | {v} | {u} | {ex} |", file=sys.stderr)


if __name__ == "__main__":
    main()
