"""Probe MXU integer/float matmul support + throughput on the tunneled TPU.

Decides the radix-128 matmul-NTT design: the 31-bit mod-p product must be
decomposed into limb matmuls that are EXACT on the MXU.  Candidates:
- int8 x int8 -> int32 (balanced base-256 digits, |sum| <= 2^21)
- f32 x f32 with HIGHEST precision (8-bit limbs, sums < 2^24, exact in f32)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(f, *args, n=3):
    f(*args).block_until_ready()
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        r = f(*args)
        np.asarray(jnp.ravel(r)[:4])  # force fetch (block_until_ready lies)
        best = min(best, time.time() - t0)
    return best


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    K = 128
    M = 1 << 17  # rest dim

    # correctness first: int8 @ int8 -> int32
    rng = np.random.default_rng(0)
    a8 = rng.integers(-128, 128, size=(K, K), dtype=np.int8)
    b8 = rng.integers(-128, 128, size=(K, 64), dtype=np.int8)
    want = a8.astype(np.int64) @ b8.astype(np.int64)
    try:
        got = np.asarray(
            jax.jit(lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.int32))(
                jnp.asarray(a8), jnp.asarray(b8)
            )
        )
        print(f"int8 dot exact: {bool((got == want).all())}", flush=True)
    except Exception as e:
        print(f"int8 dot FAILED: {type(e).__name__}: {str(e)[:100]}", flush=True)

    # f32 HIGHEST with 8-bit limb ranges
    af = rng.integers(0, 256, size=(K, K)).astype(np.float32)
    bf = rng.integers(0, 256, size=(K, 64)).astype(np.float32)
    wantf = af.astype(np.int64) @ bf.astype(np.int64)
    for prec in ["default", "highest"]:
        try:
            got = np.asarray(
                jax.jit(
                    lambda a, b: jax.lax.dot(
                        a, b, precision=jax.lax.Precision.HIGHEST
                        if prec == "highest" else jax.lax.Precision.DEFAULT,
                    )
                )(jnp.asarray(af), jnp.asarray(bf))
            ).astype(np.int64)
            print(f"f32 dot ({prec}) exact: {bool((got == wantf).all())}", flush=True)
        except Exception as e:
            print(f"f32 dot ({prec}) FAILED: {type(e).__name__}: {str(e)[:100]}",
                  flush=True)

    # throughput: (K,K) @ (K, M) for each supported dtype
    gen32 = jax.jit(lambda k: jax.random.bits(k, (K, M), dtype=jnp.uint32))

    def mk_i8(k):
        return (jax.random.bits(k, (K, M), dtype=jnp.uint32) & 255).astype(
            jnp.int8
        ) - jnp.int8(64)

    d_i8 = jnp.asarray(a8)
    x_i8 = jax.jit(mk_i8)(jax.random.PRNGKey(1))
    f_i8 = jax.jit(lambda d, x: jax.lax.dot(d, x, preferred_element_type=jnp.int32))
    try:
        t = timed(f_i8, d_i8, x_i8)
        ops = 2 * K * K * M
        print(f"int8 ({K}x{K})@({K}x{M}): {t * 1e3:7.2f} ms = {ops / t / 1e12:6.2f} Tops",
              flush=True)
    except Exception as e:
        print(f"int8 throughput FAILED: {str(e)[:100]}", flush=True)

    d_f = jnp.asarray(af)
    x_f = jax.jit(lambda k: (jax.random.bits(k, (K, M), dtype=jnp.uint32) & 255)
                  .astype(jnp.float32))(jax.random.PRNGKey(2))
    for prec, name in [(jax.lax.Precision.DEFAULT, "f32-def"),
                       (jax.lax.Precision.HIGHEST, "f32-hi")]:
        f_f = jax.jit(lambda d, x, p=prec: jax.lax.dot(d, x, precision=p))
        try:
            t = timed(f_f, d_f, x_f)
            ops = 2 * K * K * M
            print(f"{name} ({K}x{K})@({K}x{M}): {t * 1e3:7.2f} ms = {ops / t / 1e12:6.2f} Tops",
                  flush=True)
        except Exception as e:
            print(f"{name} throughput FAILED: {str(e)[:100]}", flush=True)

    # the real kernel shape: 16 int8 dots + recombination, vs one u32 VPU pass
    # (what a radix-128 NTT stage on (2^21, 8) block would cost)
    def stage_i8(d_limbs, x):  # d_limbs: (4, K, K) int8; x: (K, M) uint32
        xl = [((x >> (8 * i)) & 255).astype(jnp.int8) for i in range(4)]
        # balanced-digit correction skipped in the probe: timing only
        acc = jnp.zeros((K, M), jnp.uint64)
        for i in range(4):
            for j in range(4):
                p = jax.lax.dot(d_limbs[i], xl[j], preferred_element_type=jnp.int32)
                acc = acc + (p.astype(jnp.uint64) << (8 * (i + j)))
        return (acc % jnp.uint64(0x7F000001)).astype(jnp.uint32)

    d_limbs = jnp.asarray(
        rng.integers(-128, 128, size=(4, K, K), dtype=np.int8)
    )
    x32 = gen32(jax.random.PRNGKey(3))
    try:
        t = timed(jax.jit(stage_i8), d_limbs, x32)
        el = K * M
        print(f"full mod-p limb-stage ({K}x{M} u32): {t * 1e3:7.2f} ms = "
              f"{el / t / 1e9:6.2f} G mod-muls128/s", flush=True)
    except Exception as e:
        print(f"limb-stage FAILED: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
