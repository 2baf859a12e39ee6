"""Micro-bench: windowed-input assembly variants for the strip conv.

The interleaved window [prev(64) | cur(256) | next(64)] measured
66 GB/s (sub-128-lane writes); candidates reorder lanes so writes are
tile-aligned, compensating on the weight side.  One TPU process at a
time.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp

from neural_marionette_tpu.utils.profiling import loop_time

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
S, C = 4, 64


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (40, 16, 64, 64, S * C),
                          jnp.bfloat16)
    a = jnp.ones((40, S * C), jnp.bfloat16)
    GB = x.size * 2 / 1e9

    def run(name, fn):
        dt = loop_time(fn, x, iters=ITERS)
        print(f"{name:40s}: {dt*1e3:7.2f} ms  ({GB/dt:5.0f} GB/s in-read)",
              flush=True)

    def norm(x):
        return jnp.maximum(x * a[:, None, None, None, :], 0.01 * x)

    def interleaved(x):  # current: [prev_last | cur | next_first]
        y = norm(x)
        Us = y.shape[1]
        yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        prev = yp[:, 0:Us, :, :, (S - 1) * C:]
        nxt = yp[:, 2:Us + 2, :, :, 0:C]
        return jnp.concatenate([prev, y, nxt], axis=-1)
    run("window [prev|cur|next] (current)", interleaved)

    def aligned(x):  # [cur | prev_last | next_first]
        y = norm(x)
        Us = y.shape[1]
        yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        prev = yp[:, 0:Us, :, :, (S - 1) * C:]
        nxt = yp[:, 2:Us + 2, :, :, 0:C]
        return jnp.concatenate([y, prev, nxt], axis=-1)
    run("window [cur|prev|next] (aligned)", aligned)

    def no_window(x):  # normalize-only floor
        return norm(x)
    run("normalize+lrelu only", no_window)

    def window_only(x):  # without the elementwise prologue
        Us = x.shape[1]
        yp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        prev = yp[:, 0:Us, :, :, (S - 1) * C:]
        nxt = yp[:, 2:Us + 2, :, :, 0:C]
        return jnp.concatenate([x, prev, nxt], axis=-1)
    run("window only (aligned order)", window_only)

    # upsample interleave orders
    from neural_marionette_tpu.ops.stripconv import upsample2_packed
    xs = jax.random.normal(jax.random.PRNGKey(1), (40, 16, 32, 32, 2 * 64),
                           jnp.bfloat16)

    def up_current(v):
        return upsample2_packed(v, 2)
    dt = loop_time(up_current, xs, iters=ITERS)
    print(f"{'upsample2_packed S=2->4 (current)':40s}: {dt*1e3:7.2f} ms",
          flush=True)

    def up_grouped(v):  # [all-even | all-odd] lane order (aligned)
        from neural_marionette_tpu.ops.upsample import _interp_matrix
        N, Us, V, W, SC = v.shape
        Cc = SC // 2
        Sv = 2
        prev_last = jnp.concatenate(
            [v[:, :1, :, :, 0:Cc], v[:, :-1, :, :, (Sv - 1) * Cc:]], axis=1)
        next_first = jnp.concatenate(
            [v[:, 1:, :, :, 0:Cc], v[:, -1:, :, :, (Sv - 1) * Cc:]], axis=1)
        left = jnp.concatenate([prev_last, v[..., :Cc]], axis=-1)
        right = jnp.concatenate([v[..., Cc:], next_first], axis=-1)
        even = 0.25 * left + 0.75 * v
        odd = 0.75 * v + 0.25 * right
        out = jnp.concatenate([even, odd], axis=-1)  # aligned halves
        Wv = _interp_matrix(V, "bfloat16")
        Ww = _interp_matrix(W, "bfloat16")
        out = jnp.einsum("Vv,nuvwk->nuVwk", Wv, out)
        out = jnp.einsum("Ww,nuvwk->nuvWk", Ww, out)
        return out
    dt = loop_time(up_grouped, xs, iters=ITERS)
    print(f"{'upsample grouped [even|odd] order':40s}: {dt*1e3:7.2f} ms",
          flush=True)

    # conv2d consuming the aligned window order (weights permuted) —
    # check the conv itself doesn't care about lane order
    w = jax.random.normal(jax.random.PRNGKey(2),
                          (3, 3, (S + 2) * C, 128), jnp.bfloat16) * 0.05

    def conv_from_aligned(x):
        w6 = window_only(x)
        Nn, Us, V, W_, K = w6.shape
        return jax.lax.conv_general_dilated(
            w6.reshape(Nn * Us, V, W_, K), w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)
    run("window(aligned) + conv2d 384->128", conv_from_aligned)


if __name__ == "__main__":
    main()
