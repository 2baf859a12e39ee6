"""A/B: packed upconv chain (coarse-plane fixes, packed GN, one late
unshuffle) vs the fine upconv chain (fine-grid DUS fixes + flax GN).

The r3 B=16 trace showed the fine chain paying ~39 ms/iter of pure
copies: two whole-tensor layout round-trips from the boundary-fix
dynamic-update-slices (upconv.py:136) plus the pixel-shuffle transpose.
The packed chain applies fixes on single coarse planes and shuffles only
once, after GN+LeakyReLU (or not at all if the consumer is packed).

Each variant is measured through the CONSUMING fine conv (Conv_3's
32->32 k3) so layout effects on the consumer are captured.

Usage: python scripts/bench_packed_upconv.py [frames] [iters]
One TPU process at a time.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp

from neural_marionette_tpu.ops.upconv import (parity_unshuffle,
                                              upconv2_trilinear,
                                              upconv2_trilinear_packed)
from neural_marionette_tpu.ops.stripconv import strip_group_norm_fast
from neural_marionette_tpu.utils.profiling import loop_time

FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 160
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
dt = jnp.bfloat16

G, Cin, Cout = 32, 64, 32   # decoder stage 2: 32^3 64->32 (fine 64^3)
GROUPS = Cout // 16


def leaky(x):
    return jax.nn.leaky_relu(x, 0.01)


def flax_gn(y, scale, bias):
    import flax.linen as nn
    gn = nn.GroupNorm(num_groups=GROUPS, epsilon=1e-5)
    return gn.apply({"params": {"scale": scale, "bias": bias}}, y)


def main():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (FRAMES, G, G, G, Cin), dt)
    w = jax.random.normal(k, (3, 3, 3, Cin, Cout), dt) * 0.1
    b = jax.random.normal(k, (Cout,), dt)
    scale = jnp.ones((Cout,), jnp.float32)
    bias = jnp.zeros((Cout,), jnp.float32)
    w3 = jax.random.normal(k, (3, 3, 3, Cout, Cout), dt) * 0.1

    def conv3(y):
        return jax.lax.conv_general_dilated(
            y, w3, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=dt)

    def fine_chain(xx):
        y = upconv2_trilinear(xx, w, b)
        y = leaky(flax_gn(y, scale, bias)).astype(dt)
        return conv3(y)

    # fine chain with the original DUS boundary fixes (padfix off) —
    # the env var is read at trace time, so setting it inside the traced
    # function pins the variant per-jit
    def fine_chain_dus(xx):
        os.environ["NM_UPCONV_PADFIX"] = "0"
        try:
            return fine_chain(xx)
        finally:
            os.environ["NM_UPCONV_PADFIX"] = "1"

    def fine_head_dus(xx):
        os.environ["NM_UPCONV_PADFIX"] = "0"
        try:
            return fine_head(xx)
        finally:
            os.environ["NM_UPCONV_PADFIX"] = "1"

    def packed_chain(xx):
        y = upconv2_trilinear_packed(xx, w, b)
        y = leaky(strip_group_norm_fast(y, scale, bias, GROUPS, S=8))
        return conv3(parity_unshuffle(y.astype(dt)))

    # no-consumer variants (chain up to the fine activation)
    def fine_head(xx):
        y = upconv2_trilinear(xx, w, b)
        return leaky(flax_gn(y, scale, bias)).astype(dt)

    def packed_head(xx):
        y = upconv2_trilinear_packed(xx, w, b)
        y = leaky(strip_group_norm_fast(y, scale, bias, GROUPS, S=8))
        return parity_unshuffle(y.astype(dt))

    # correctness spot check on-device (scalar-out jit: fine tensors at
    # 160 frames are 2.7 GB each — eager f32 casts OOM)
    @jax.jit
    def maxdiff(xx):
        d = fine_head(xx).astype(jnp.float32) - \
            packed_head(xx).astype(jnp.float32)
        return jnp.max(jnp.abs(d))
    print(f"max |fine - packed| head: {float(maxdiff(x[:16])):.3e}")

    # mid: packed conv + coarse-plane fixes, but unshuffle BEFORE the GN
    # so the GN elementwise pass re-lays-out for the consuming conv as in
    # the fine chain (the late unshuffle feeds conv3 a hostile layout)
    def mid_head(xx):
        y = parity_unshuffle(upconv2_trilinear_packed(xx, w, b))
        return leaky(flax_gn(y, scale, bias)).astype(dt)

    def mid_chain(xx):
        return conv3(mid_head(xx))

    # mid2: packed conv + coarse fixes + GN stats computed on the PACKED
    # tensor (no f32 promotion around the transpose), one bf16 unshuffle,
    # then a fused per-channel normalize+leaky in the fine layout — so
    # conv3 sees the same producer pattern as the fine chain
    def mid2_head(xx):
        y = upconv2_trilinear_packed(xx, w, b)           # (N, s^3, 256)
        N = y.shape[0]
        stat = jnp.float32
        gs = Cout // GROUPS
        import numpy as np
        sel = np.zeros((8 * Cout, GROUPS), np.float32)
        sel[np.arange(8 * Cout), (np.arange(8 * Cout) % Cout) // gs] = 1.0
        sel = jnp.asarray(sel)
        s1 = jnp.sum(y, axis=(1, 2, 3), dtype=stat) @ sel        # (N, G)
        s2 = jnp.einsum("nuvwk,nuvwk->nk", y, y,
                        preferred_element_type=stat) @ sel
        count = G * G * G * 8 * gs
        mean = s1 / count
        var = jnp.maximum(s2 / count - mean ** 2, 0.0)
        rstd = jax.lax.rsqrt(var + 1e-5)
        # per-fine-channel a/b (N, Cout)
        selc = np.zeros((GROUPS, Cout), np.float32)
        selc[(np.arange(Cout) // gs), np.arange(Cout)] = 1.0
        selc = jnp.asarray(selc)
        a = (rstd @ selc) * scale[None]
        bb = bias[None] - (mean * rstd) @ selc * scale[None]
        z = parity_unshuffle(y)                          # bf16 transpose
        return leaky(z * a[:, None, None, None, :].astype(dt)
                     + bb[:, None, None, None, :].astype(dt))

    def mid2_chain(xx):
        return conv3(mid2_head(xx))

    @jax.jit
    def maxdiff2(xx):
        d = fine_head(xx).astype(jnp.float32) - \
            mid2_head(xx).astype(jnp.float32)
        return jnp.max(jnp.abs(d))
    print(f"max |fine - mid2| head: {float(maxdiff2(x[:16])):.3e}")

    rows = [("head fine (padfix)", fine_head),
            ("head fine (dus)", fine_head_dus),
            ("head packed", packed_head),
            ("head mid2", mid2_head),
            ("chain fine padfix (+conv3)", fine_chain),
            ("chain fine dus (+conv3)", fine_chain_dus),
            ("chain packed (+conv3)", packed_chain),
            ("chain mid2 (+conv3)", mid2_chain)]
    for name, fn in rows:
        t = loop_time(jax.jit(fn), x, iters=ITERS)
        print(f"{name:24s} {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
