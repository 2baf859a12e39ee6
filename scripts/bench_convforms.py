"""Micro-bench: lowering strategies for the strip-packed decoder conv.

Shapes = flagship stage2 (64ch -> 32ch @ 64^3, 40 frames) reformulated as
(640, 64, 64, 384) -> (640, 64, 64, 128).  One TPU process at a time.

Timing method (axon tunnel): each variant runs ITERS times inside ONE
jitted lax.fori_loop with a data dependence between iterations (input
scaled by (1 + 1e-12 * carry) — exact identity in bf16/f32 but opaque to
the compiler, so the body cannot be hoisted), then a single host fetch.
Per-call RPC overhead through the tunnel is 50-150 ms, which swamps any
per-iteration measurement; this amortizes it to overhead/ITERS.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import jax
import jax.numpy as jnp

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def timeit(name, fn, *args, flops=None):
    x0, rest = args[0], args[1:]

    @jax.jit
    def loop(x, *rest):
        def body(i, s):
            out = fn(x * (1 + 1e-12 * s).astype(x.dtype), *rest)
            # full-output reduction so XLA cannot narrow the computation
            return jnp.sum(out.astype(jnp.float32)) * 1e-20
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    c = loop.lower(x0, *rest).compile()
    float(c(x0, *rest))  # warmup + fetch
    t0 = time.perf_counter()
    float(c(x0, *rest))
    dt = (time.perf_counter() - t0) / ITERS
    msg = f"{name:28s}: {dt*1e3:8.2f} ms"
    if flops:
        msg += f"  {flops/dt/1e12:6.1f} TF/s"
    print(msg, flush=True)
    return dt


def main():
    dt = jnp.bfloat16
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    M, V, W, K, N = 640, 64, 64, 384, 128
    x = jax.random.normal(k1, (M, V, W, K), dt)
    w33 = jax.random.normal(k2, (3, 3, K, N), dt) * 0.05
    real_flops = 2 * M * V * W * 9 * K * N  # toeplitz-counted

    # (c) pure matmul same total FLOPs (speed-of-light reference)
    a2 = x.reshape(M * V * W, K)
    w2 = jax.random.normal(k2, (K, 9 * N), dt) * 0.05
    timeit("matmul (M,384)@(384,1152)", lambda a, w: a @ w, a2, w2,
           flops=2 * M * V * W * K * 9 * N)

    # (b) 9 shifted einsums on a padded tensor
    def taps9(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = None
        for dv in range(3):
            for dw in range(3):
                a = jax.lax.dynamic_slice(
                    xp, (0, dv, dw, 0), (M, V, W, K))
                c = jnp.einsum("mvwk,kn->mvwn", a, w[dv, dw],
                               preferred_element_type=dt)
                out = c if out is None else out + c
        return out
    timeit("9x shifted einsum", taps9, x, w33, flops=real_flops)

    # (a) one conv2d 3x3 384->128
    def conv2d(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt)
    timeit("conv2d 3x3 384->128", conv2d, x, w33, flops=real_flops)

    # (d) baseline: plain conv3d 64->32 @64^3
    x3 = jax.random.normal(k1, (40, 64, 64, 64, 64), dt)
    w3 = jax.random.normal(k2, (3, 3, 3, 64, 32), dt) * 0.05
    def conv3d(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=dt)
    timeit("plain conv3d 64->32 @64^3", conv3d, x3, w3,
           flops=2 * 40 * 64**3 * 27 * 64 * 32)

    # (f) stage3 shape: 192 -> 128 (Cin=32, S=4)
    x192 = jax.random.normal(k1, (M, V, W, 192), dt)
    w192s = jax.random.normal(k2, (3, 3, 192, N), dt) * 0.05
    def taps9_s3(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = None
        for dv in range(3):
            for dw in range(3):
                a = jax.lax.dynamic_slice(
                    xp, (0, dv, dw, 0), (M, V, W, 192))
                c = jnp.einsum("mvwk,kn->mvwn", a, w[dv, dw],
                               preferred_element_type=dt)
                out = c if out is None else out + c
        return out
    timeit("9x einsum 192->128 (stage3)", taps9_s3, x192, w192s,
           flops=2 * M * V * W * 9 * 192 * N)


if __name__ == "__main__":
    main()
