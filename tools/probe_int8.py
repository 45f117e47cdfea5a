"""Probe: is int8 MXU compute a viable eval-path speedup on this TPU?

The v5e datasheet rates int8 at 394 TOPS vs 197 bf16 TFLOP/s. This probe
measures what JAX/XLA actually delivers today for the op shapes the
descriptor path uses:

  1. int8 x int8 -> int32 matmul (8192^3) vs the bf16 roofline anchor
     (docs/PERFORMANCE.md: 165 TFLOP/s).
  2. int8 conv_general_dilated (a ResNet layer3-shaped 3x3) — TPU support
     for quantized convs is the real question; if XLA upcasts or rejects,
     an int8 eval path is dead on arrival.
  3. The same conv expressed as im2col + int8 matmul, the fallback if (2)
     upcasts.

Timing follows the repo convention: chain outputs into a scalar and fetch
with float() (block_until_ready returns early on the axon tunnel).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, iters, flops):
    out = fn(*args)  # compile
    acc = jnp.sum(out.astype(jnp.float32))
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for _ in range(iters):
        acc = acc + jnp.sum(fn(*args).astype(jnp.float32))
    float(acc)
    dt = (time.perf_counter() - t0) / iters
    return dt, flops / dt / 1e12


def main():
    rng = np.random.RandomState(0)
    n = 8192
    a8 = jnp.asarray(rng.randint(-127, 127, (n, n), np.int8))
    b8 = jnp.asarray(rng.randint(-127, 127, (n, n), np.int8))
    abf = a8.astype(jnp.bfloat16)
    bbf = b8.astype(jnp.bfloat16)

    @jax.jit
    def mm_i8(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    @jax.jit
    def mm_bf(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    fl = 2.0 * n * n * n
    dt, tops = timed(mm_i8, (a8, b8), 8, fl)
    print(f"int8 {n}^3 matmul: {dt*1e3:.1f} ms = {tops:.1f} TOP/s")
    dt, tflops = timed(mm_bf, (abf, bbf), 8, fl)
    print(f"bf16 {n}^3 matmul: {dt*1e3:.1f} ms = {tflops:.1f} TFLOP/s")

    # layer3-shaped conv: 512 frames only to keep it quick
    bsz, h, w, c, k = 128, 16, 8, 1024, 1024
    x8 = jnp.asarray(rng.randint(-127, 127, (bsz, h, w, c), np.int8))
    w8 = jnp.asarray(rng.randint(-127, 127, (3, 3, c, k), np.int8))

    @jax.jit
    def conv_i8(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    @jax.jit
    def conv_bf(x, w):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    cfl = 2.0 * bsz * h * w * 9 * c * k
    try:
        dt, tops = timed(conv_i8, (x8, w8), 8, cfl)
        print(f"int8 3x3 conv (layer3 shape): {dt*1e3:.2f} ms = {tops:.1f} TOP/s")
    except Exception as e:  # noqa: BLE001 - probe records any rejection
        print(f"int8 conv REJECTED: {type(e).__name__}: {str(e)[:200]}")
    dt, tflops = timed(conv_bf, (x8, w8), 8, cfl)
    print(f"bf16 3x3 conv (layer3 shape): {dt*1e3:.2f} ms = {tflops:.1f} TFLOP/s")

    # im2col fallback: 3x3 conv as (bsz*h*w, 9c) @ (9c, k) int8 matmul
    @jax.jit
    def conv_im2col_i8(x, wts):
        patches = jnp.stack(
            [
                jnp.roll(x, (-dy, -dx), axis=(1, 2))
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
            ],
            axis=3,
        ).reshape(bsz * h * w, 9 * c)
        return jax.lax.dot_general(
            patches, wts.reshape(9 * c, k), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    dt, tops = timed(conv_im2col_i8, (x8, w8), 8, cfl)
    print(f"int8 im2col conv: {dt*1e3:.2f} ms = {tops:.1f} TOP/s")


if __name__ == "__main__":
    main()
