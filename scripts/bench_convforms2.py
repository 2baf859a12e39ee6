"""Per-stage A/B of strip conv forms: split (main+edge) vs toeplitz
(one conv3d, S x FLOPs, zero assembly) at the decoder's four stages.

Usage: python scripts/bench_convforms2.py [frames] [iters]
One TPU process at a time.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp

from neural_marionette_tpu.ops.stripconv import (strip_conv3_split,
                                                 strip_conv3_toeplitz)
from neural_marionette_tpu.utils.profiling import loop_time

ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 40
dt = jnp.bfloat16

# (name, grid, Cin, Cout, S)
STAGES = [
    ("s0 128->64 @32^3 S=2", 32, 128, 64, 2),
    ("s1  64->64 @32^3 S=2", 32, 64, 64, 2),
    ("s2  64->32 @64^3 S=4", 64, 64, 32, 4),
    ("s3  32->32 @64^3 S=4", 64, 32, 32, 4),
]


def main():
    k = jax.random.PRNGKey(0)
    for name, G, Cin, Cout, S in STAGES:
        xp = jax.random.normal(k, (FRAMES, G // S, G, G, S * Cin), dt)
        w = jax.random.normal(k, (3, 3, 3, Cin, Cout), dt) * 0.1
        b = jax.random.normal(k, (Cout,), dt)
        t_split = loop_time(lambda x: strip_conv3_split(x, w, b, S), xp,
                            iters=ITERS)
        t_toep = loop_time(lambda x: strip_conv3_toeplitz(x, w, b, S), xp,
                           iters=ITERS)
        gflop = 2 * FRAMES * G ** 3 * 27 * Cin * Cout / 1e9
        print(f"{name}: split {t_split*1e3:7.2f} ms "
              f"({gflop/t_split/1e3:5.1f} TF/s true)   "
              f"toeplitz {t_toep*1e3:7.2f} ms "
              f"({gflop/t_toep/1e3:5.1f} TF/s true)", flush=True)


if __name__ == "__main__":
    main()
