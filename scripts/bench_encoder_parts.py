"""Micro-bench: encoder stage candidates (stem / pools / Res blocks).

Flagship shapes, NM_FRAMES frames (default 40) bf16.  One TPU process at a time.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp

from neural_marionette_tpu.utils.profiling import loop_time

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
FRAMES = int(os.environ.get("NM_FRAMES", "40"))
dt = jnp.bfloat16


def conv3d(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride,) * 3, "SAME" if stride == 1 else "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=dt)


def main():
    k = jax.random.PRNGKey(0)
    occ4 = jax.random.normal(k, (FRAMES, 64, 64, 64, 4), dt)
    w5_4 = jax.random.normal(k, (5, 5, 5, 4, 32), dt) * 0.1
    t = loop_time(lambda x: conv3d(x, w5_4), occ4, iters=ITERS)
    print(f"stem conv3d k5 4->32 @64^3      : {t*1e3:7.2f} ms", flush=True)

    # (removed: occ-only k5 measured SLOWER than 4-ch — 18.4 vs 10.0 ms,
    # Cin=1 lane starvation; and a 125-slice im2col OOMs on 128x lane
    # padding of 1-lane columns.  Strip-packed k5 stem is the candidate.)
    from neural_marionette_tpu.ops.stripconv import (pack_strips,
                                                     strip_convk_split)
    occp = pack_strips(occ4, 4)   # (40, 16, 64, 64, 16)
    t = loop_time(lambda x: strip_convk_split(x, w5_4, None, 4), occp,
                  iters=ITERS)
    print(f"stem strip k5 S=4 (packed)      : {t*1e3:7.2f} ms", flush=True)

    # pool conv k2 s2 32->32 @64^3
    x32 = jax.random.normal(k, (FRAMES, 64, 64, 64, 32), dt)
    wp = jax.random.normal(k, (2, 2, 2, 32, 32), dt) * 0.1
    t = loop_time(lambda x: conv3d(x, wp, stride=2), x32, iters=ITERS)
    print(f"pool conv k2s2 32->32 @64^3     : {t*1e3:7.2f} ms", flush=True)

    # strip pool: packed S=4 input
    from neural_marionette_tpu.ops.stripconv import strip_pool2
    xp32 = pack_strips(x32, 4)
    t = loop_time(lambda x: strip_pool2(x, wp, None, 4), xp32, iters=ITERS)
    print(f"strip pool2 S=4 (packed)        : {t*1e3:7.2f} ms", flush=True)

    # Res3D @32^3: conv3 32->64, conv3 64->64, 1x1 skip 32->64
    y32 = jax.random.normal(k, (FRAMES, 32, 32, 32, 32), dt)
    wa = jax.random.normal(k, (3, 3, 3, 32, 64), dt) * 0.1
    wb = jax.random.normal(k, (3, 3, 3, 64, 64), dt) * 0.1
    ws = jax.random.normal(k, (1, 1, 1, 32, 64), dt) * 0.1

    def res_plain(x):
        a = conv3d(x, wa)
        b = conv3d(a, wb)
        s = conv3d(x, ws)
        return b + s
    t = loop_time(res_plain, y32, iters=ITERS)
    print(f"Res3D plain @32^3 (3 convs)     : {t*1e3:7.2f} ms", flush=True)

    from neural_marionette_tpu.ops.stripconv import (strip_conv3_split,
                                                     strip_conv1x1)
    yp32 = pack_strips(y32, 4)

    def res_strip(x):
        a = strip_conv3_split(x, wa, None, 4)
        b = strip_conv3_split(a, wb, None, 4)
        s = strip_conv1x1(x, ws, None, 4)
        return b + s
    t = loop_time(res_strip, yp32, iters=ITERS)
    print(f"Res3D strip S=4 (packed)        : {t*1e3:7.2f} ms", flush=True)

    # stem WEIGHT gradient — the #1 op in the train-step trace
    # (17.5 TF/s, 18 ms/step for the plain d/dw of the k5 stem)
    def stem_dw_plain(x):
        g = jax.grad(lambda w: jnp.sum(conv3d(x, w).astype(jnp.float32))
                     * 1e-6)(w5_4)
        return g
    t = loop_time(stem_dw_plain, occ4, iters=ITERS)
    print(f"stem dw plain                   : {t*1e3:7.2f} ms", flush=True)

    def stem_dw_strip(x):
        g = jax.grad(lambda w: jnp.sum(
            strip_convk_split(x, w, None, 4).astype(jnp.float32))
            * 1e-6)(w5_4)
        return g
    t = loop_time(stem_dw_strip, occp, iters=ITERS)
    print(f"stem dw strip S=4               : {t*1e3:7.2f} ms", flush=True)

    # coord-split stem (models/blocks.Basic3DBlock.split_coords):
    # conv(vox Cin=1) + one-frame coord field.  fwd AND dw.
    occ1 = occ4[..., :1]
    coords = occ4[..., 1:]  # stand-in constant field (same shapes)

    def coordsplit_fwd(x):
        out = conv3d(x, w5_4[..., :1, :])
        field = conv3d(coords[:1], w5_4[..., 1:, :])
        return out + field

    t = loop_time(coordsplit_fwd, occ1, iters=ITERS)
    print(f"stem coord-split fwd            : {t*1e3:7.2f} ms", flush=True)

    def coordsplit_dw(x):
        def f(w):
            out = conv3d(x, w[..., :1, :])
            field = conv3d(coords[:1], w[..., 1:, :])
            return jnp.sum((out + field).astype(jnp.float32)) * 1e-6
        return jax.grad(f)(w5_4)

    t = loop_time(coordsplit_dw, occ1, iters=ITERS)
    print(f"stem coord-split dw             : {t*1e3:7.2f} ms", flush=True)

    # coord-split STRIP stem: strip conv on Cin=1 packed + coord field
    occ1p = pack_strips(occ1, 4)  # (40, 16, 64, 64, 4)

    def coordsplit_strip_fwd(x):
        out = strip_convk_split(x, w5_4[..., :1, :], None, 4)
        field = strip_convk_split(pack_strips(coords[:1], 4),
                                  w5_4[..., 1:, :], None, 4)
        return out + field

    t = loop_time(coordsplit_strip_fwd, occ1p, iters=ITERS)
    print(f"stem coord-split strip fwd S=4  : {t*1e3:7.2f} ms", flush=True)

    def coordsplit_strip_dw(x):
        def f(w):
            out = strip_convk_split(x, w[..., :1, :], None, 4)
            field = strip_convk_split(pack_strips(coords[:1], 4),
                                      w[..., 1:, :], None, 4)
            return jnp.sum((out + field).astype(jnp.float32)) * 1e-6
        return jax.grad(f)(w5_4)

    t = loop_time(coordsplit_strip_dw, occ1p, iters=ITERS)
    print(f"stem coord-split strip dw S=4   : {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
