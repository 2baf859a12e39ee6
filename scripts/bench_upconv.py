"""A/B: fused parity upconv vs upsample2_trilinear + conv3d.

Usage: python scripts/bench_upconv.py [frames] [iters]
One TPU process at a time.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp

from neural_marionette_tpu.ops.upconv import upconv2_trilinear
from neural_marionette_tpu.ops.upsample import upsample2_trilinear
from neural_marionette_tpu.utils.profiling import loop_time

FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 40
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
dt = jnp.bfloat16

# (name, coarse grid, Cin, Cout) — the two upsample+conv stage heads
STAGES = [
    ("s0 16^3 128->64", 16, 128, 64),
    ("s2 32^3  64->32", 32, 64, 32),
]


def main():
    k = jax.random.PRNGKey(0)
    for name, G, Cin, Cout in STAGES:
        x = jax.random.normal(k, (FRAMES, G, G, G, Cin), dt)
        w = jax.random.normal(k, (3, 3, 3, Cin, Cout), dt) * 0.1
        b = jax.random.normal(k, (Cout,), dt)

        def two_op(xx):
            y = upsample2_trilinear(xx)
            y = jax.lax.conv_general_dilated(
                y, w, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=dt)
            return y + b

        t2 = loop_time(two_op, x, iters=ITERS)
        t1 = loop_time(lambda xx: upconv2_trilinear(xx, w, b), x,
                       iters=ITERS)
        gflop = 2 * FRAMES * (2 * G) ** 3 * 27 * Cin * Cout / 1e9
        print(f"{name}: upsample+conv {t2*1e3:7.2f} ms "
              f"({gflop/t2/1e3:5.1f} TF/s)   fused {t1*1e3:7.2f} ms "
              f"({gflop/t1/1e3:5.1f} TF/s)  {t2/t1:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
