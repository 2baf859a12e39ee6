"""Micro-bench: GroupNorm statistics variants on the strip-packed layout.

Stage2-sized tensor (40, 16, 64, 64, 128) bf16 -> per-(n, lane) f32
(sum, sum-of-squares).  The v2 trace showed convert_reduce fusions at
~12 ms/stage (floor ~1 ms @ HBM bandwidth); this finds the fastest
lowering.  One TPU process at a time.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp

from neural_marionette_tpu.utils.profiling import loop_time

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def main():
    f32 = jnp.float32
    x = jax.random.normal(jax.random.PRNGKey(0), (40, 16, 64, 64, 128),
                          jnp.bfloat16)
    GB = x.size * 2 / 1e9

    def run(name, fn):
        dt = loop_time(fn, x, iters=ITERS)
        print(f"{name:34s}: {dt*1e3:7.2f} ms  "
              f"({GB/dt:5.0f} GB/s effective)", flush=True)

    def v2(x):
        s1 = jnp.sum(x, axis=(1, 2, 3), dtype=f32)
        s2 = jnp.einsum("nuvwk,nuvwk->nk", x, x,
                        preferred_element_type=f32)
        return s1, s2

    def leading_first(x):
        p1 = jnp.sum(x, axis=(1, 2), dtype=f32)        # (n, w, k)
        p2 = jnp.einsum("nuvwk,nuvwk->nwk", x, x,
                        preferred_element_type=f32)
        return jnp.sum(p1, axis=1), jnp.sum(p2, axis=1)

    def gram(x):
        x3 = x.reshape(x.shape[0], -1, x.shape[-1])
        s1 = jnp.sum(x3, axis=1, dtype=f32)
        g = jnp.einsum("nmk,nml->nkl", x3, x3, preferred_element_type=f32)
        return s1, jnp.einsum("nkk->nk", g)

    def ones_matvec(x):
        x3 = x.reshape(x.shape[0], -1, x.shape[-1])
        ones = jnp.ones((x3.shape[1],), jnp.bfloat16)
        s1 = jnp.einsum("m,nmk->nk", ones, x3, preferred_element_type=f32)
        s2 = jnp.einsum("nmk,nmk->nk", x3, x3, preferred_element_type=f32)
        return s1, s2

    def square_cast(x):
        xf = x.astype(f32)
        return (jnp.sum(xf, axis=(1, 2, 3)),
                jnp.sum(jnp.square(xf), axis=(1, 2, 3)))

    def minor_reshape(x):
        x6 = x.reshape(x.shape[:4] + (4, 32)).astype(f32)
        m = jnp.mean(x6, axis=(1, 2, 3, 4))
        m2 = jnp.mean(jnp.square(x6), axis=(1, 2, 3, 4))
        return m, m2

    run("v2: sum + self-einsum", v2)
    run("leading-axes-first", leading_first)
    run("gram diag", gram)
    run("ones-matvec + self-einsum", ones_matvec)
    run("f32-cast square", square_cast)
    run("minor (S,C) reshape", minor_reshape)

    # elementwise scale+shift+lrelu+window pass in isolation
    from neural_marionette_tpu.ops.stripconv import window_strips
    a = jnp.ones((40, 128), jnp.bfloat16)

    def norm_window(x):
        y = jnp.maximum(x * a[:, None, None, None, :], 0.01 * x)
        return window_strips(y, 4, 32)
    run("normalize+lrelu+window", norm_window)


if __name__ == "__main__":
    main()
