"""Measure the tunneled TPU's transfer + dispatch characteristics.

The round-5 memory/orchestration design hinges on three numbers this probe
measures directly (BASELINE.md records the results):

1. D2H bandwidth  - decides whether spilling LDEs to host after the
   reduced-opening program (the 2^22 HBM lever) is affordable.
2. H2D bandwidth  - bound on re-upload strategies.
3. Per-dispatch overhead - wall-clock cost of ONE extra async device
   program on the tunnel (the orchestration-latency unit).

Measurement discipline (see memory: tpu-bench-discipline): distinct inputs
per call, force host fetches to sync, swamp the ~36 ms RTT where possible.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def fmt_mb(b):
    return f"{b / 1e6:7.1f} MB"


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # --- D2H bandwidth ---------------------------------------------------
    gen = jax.jit(lambda k, n: jax.random.bits(k, (n,), dtype=jnp.uint32),
                  static_argnums=1)
    for log_mb in [4, 6, 8]:
        n = (1 << log_mb) * (1 << 20) // 4
        x = gen(jax.random.PRNGKey(log_mb), n)
        _ = np.asarray(x[:8])  # ensure materialized
        t0 = time.time()
        h = np.asarray(x)
        dt = time.time() - t0
        print(f"D2H {fmt_mb(4 * n)}: {dt:6.3f}s = {4 * n / dt / 1e6:8.1f} MB/s"
              f"  (checksum {int(h[:64].sum())})", flush=True)
        del x, h

    # --- D2H with copy_to_host_async overlap ------------------------------
    n = (1 << 6) * (1 << 20) // 4
    xs = [gen(jax.random.PRNGKey(100 + i), n) for i in range(4)]
    for x in xs:
        _ = np.asarray(x[:8])
    t0 = time.time()
    for x in xs:
        x.copy_to_host_async()
    hs = [np.asarray(x) for x in xs]
    dt = time.time() - t0
    tot = 4 * n * len(xs)
    print(f"D2H async x4 {fmt_mb(tot)}: {dt:6.3f}s = {tot / dt / 1e6:8.1f} MB/s",
          flush=True)
    del xs, hs

    # --- H2D bandwidth ----------------------------------------------------
    for log_mb in [4, 6]:
        nbytes = (1 << log_mb) * (1 << 20)
        h = np.random.randint(0, 1 << 30, size=nbytes // 4, dtype=np.uint32)
        t0 = time.time()
        x = jax.device_put(h)
        s = np.asarray(jnp.sum(x[:64]))  # force completion
        dt = time.time() - t0
        print(f"H2D {fmt_mb(nbytes)}: {dt:6.3f}s = {nbytes / dt / 1e6:8.1f} MB/s",
              flush=True)
        del x, h

    # --- per-dispatch overhead -------------------------------------------
    # Chain of K tiny programs, each a separate dispatch, data-dependent so
    # they can't be reordered; ONE fetch at the end.  Compare K=1 vs K=32:
    # slope = per-dispatch wall cost.
    tiny = jax.jit(lambda x: x * jnp.uint32(2654435761) + jnp.uint32(1))
    x0 = gen(jax.random.PRNGKey(7), 1024)
    _ = np.asarray(tiny(x0)[:4])  # compile
    for k in [1, 8, 32]:
        ts = []
        for rep in range(3):
            x = gen(jax.random.PRNGKey(200 + 10 * k + rep), 1024)
            _ = np.asarray(x[:4])
            t0 = time.time()
            y = x
            for _i in range(k):
                y = tiny(y)
            _ = np.asarray(y[:4])
            ts.append(time.time() - t0)
        print(f"dispatch chain k={k:3d}: best {min(ts) * 1e3:7.1f} ms", flush=True)

    # --- HBM working-set probe -------------------------------------------
    # Touch-probe: allocate-and-reduce progressively larger buffers until
    # RESOURCE_EXHAUSTED (constant-fill buffers don't count - only touched
    # working set does; round-4 lesson).
    touch = jax.jit(lambda k, n: jnp.sum(
        jax.random.bits(k, (n,), dtype=jnp.uint32) & jnp.uint32(1)
    ), static_argnums=1)
    ok_gb = 0.0
    for gb4 in range(2, 40):  # step 0.25 GB
        nbytes = gb4 * (1 << 28)
        try:
            s = int(np.asarray(touch(jax.random.PRNGKey(300 + gb4), nbytes // 4)))
            ok_gb = nbytes / (1 << 30)
            print(f"HBM touch {ok_gb:5.2f} GB: ok ({s})", flush=True)
        except Exception as e:
            print(f"HBM touch {nbytes / (1 << 30):5.2f} GB: FAILED "
                  f"({type(e).__name__}: {str(e)[:80]})", flush=True)
            break
    print(f"max touched working set: {ok_gb:.2f} GB", flush=True)
    stats = getattr(dev, "memory_stats", lambda: None)()
    print(f"memory_stats: {stats}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
