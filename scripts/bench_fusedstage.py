"""A/B the fused decoder-stage Pallas kernel vs XLA's decomposition.

Usage: python scripts/bench_fusedstage.py [F] [G] [C] [iters]
Defaults match the decoder fine stage at the flagship training point:
F=120 folded frames, 64^3 grid, 32->32 channels.  One TPU process at a
time.  Result goes to BASELINE.md (VERDICT r4 #3).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 20

    from neural_marionette_tpu.ops.pallas.fusedstage_kernel import (
        fused_stage, reference_stage)

    g = np.random.default_rng(0)
    x = jnp.asarray(g.normal(0, 1, (F, G, G, G, C)), jnp.bfloat16)
    w = jnp.asarray(g.normal(0, 0.05, (3, 3, 3, C, C)), jnp.float32)
    b = jnp.asarray(g.normal(0, 0.1, (C,)), jnp.float32)
    sc = jnp.asarray(g.normal(1, 0.1, (C,)), jnp.float32)
    bi = jnp.asarray(g.normal(0, 0.1, (C,)), jnp.float32)

    fused = jax.jit(fused_stage).lower(x, w, b, sc, bi).compile()
    ref = jax.jit(reference_stage).lower(x, w, b, sc, bi).compile()

    y1 = np.asarray(fused(x, w, b, sc, bi), np.float32)
    y2 = np.asarray(ref(x, w, b, sc, bi), np.float32)
    err = np.max(np.abs(y1 - y2)) / max(np.max(np.abs(y2)), 1e-6)
    print(f"max rel err fused vs XLA: {err:.2e}")

    flops = 2 * F * G * G * G * 27 * C * C

    for name, fn in (("XLA  ", ref), ("pallas", fused)):
        fn(x, w, b, sc, bi).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            # per-iter block: the tunneled axon runtime reports garbage
            # timings if only the last dispatch is awaited (ROADMAP)
            fn(x, w, b, sc, bi).block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt * 1e3:8.2f} ms  ({flops / dt / 1e12:6.1f} "
              f"TF/s conv-FLOPs)")


if __name__ == "__main__":
    main()
