"""Pallas TPU 3D conv kernel with MXU-shaped tap packing.

Why.  The decoder/encoder 3D convs run at 4-64 channels on 64^3 grids
(reference build_voxel_decoder, kypt_detector.py:417-460; feature net
:264-271).  XLA's conv at Cout<=64 fills only a fraction of the MXU's
128-lane output tiles; the hardware trace (scripts/analyze_trace.py over a
bench run) shows the two 64^3 decoder convs at ~15% of bf16 peak
(39.6 + 15.6 ms of a 155 ms forward) and the 5^3 encoder stem at 13 ms,
plus ~20 ms/step of pure layout copies XLA inserts around them.

How.  Re-shape the contraction so both MXU dimensions are full:

* the kd*kh (dz, dy) taps are packed into the CONTRACTION dim — the
  kernel materialises ``Xg (rows, kd*kh*Cin)`` in VMEM from kd*kh shifted
  views of the haloed input block (VPU copies), e.g. K = 9*64 = 576 for
  the 3^3/Cin=64 decoder conv;
* the kw dx taps are packed into the OUTPUT dim — one matmul produces
  partials ``(rows_xhalo, kw*Cout)`` (N = 96..192), and the output is a
  kw-way x-shifted add of the partial blocks (VPU);
* rows therefore only need an X-halo (W + kw - 1 columns, ~3-6% extra
  work); the (dz, dy) halos are free — they're just different slice
  offsets into the input block.

All kd*kh*kw taps map to exactly that many useful (K-block, N-block)
slots — no padded tap slots — so the MXU shape efficiency approaches the
K/N lane-tile occupancies instead of the ~Cout/128 ceiling of the naive
layout, with f32 accumulation.

The wrapper handles SAME padding, adaptive (tz, ty) tiling to a VMEM
budget, and a custom VJP (backward = XLA convs, numerically the mirror of
``nn.Conv``'s own gradients, so training is unaffected).  On non-TPU
backends the kernel runs interpreted (CPU tests) — production use there
should prefer ``nn.Conv``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET = 9 * 1024 * 1024  # leave headroom below the ~16 MiB core


def _conv_kernel(x_ref, w_ref, b_ref, out_ref, *, tz, ty, W, Wp,
                 Cin, Cout, kd, kh, kw, out_dtype):
    """One (frame, z-tile, y-tile) program.

    x_ref: (1, 1, 1, tz+kd-1, ty+kh-1, Wp, Cin) haloed input block.  Halo
           tiles overlap between programs, which BlockSpec index maps
           cannot express (they address in block units) and manual HBM
           DMA slicing cannot either (the minor dim must be 128-aligned);
           instead the wrapper materialises the halo blocks ONCE with an
           XLA stack-of-slices (~(tz+2)/tz * (ty+2)/ty extra input
           traffic) and Pallas pipelines them like any other input.
    w_ref: (kd*kh*Cin, kw*Cout) packed weights; K-block g=(dz,dy),
           N-block dx
    b_ref: (1, Cout) bias
    out_ref: (1, tz, ty, W, Cout)

    (dz, dy) tap groups are consumed two at a time: each matmul contracts
    K = 2*Cin (a full 128-lane tile at Cin=64) and produces all kw
    N-blocks, accumulating in f32.  Wp is W + kw - 1 rounded up to the
    sublane tile; the pad columns ride through the matmuls and are
    dropped by the dx reduction.
    """
    rows = tz * ty * Wp
    nG = kd * kh

    def sl(g):
        dz, dy = divmod(g, kh)
        blk = x_ref[0, 0, 0, dz:dz + tz, dy:dy + ty, :, :]
        return blk.reshape(rows, Cin)  # (tz, ty, Wp, Cin) -> rows-major

    partial = None
    for g0 in range(0, nG - 1, 2):
        x2 = jnp.concatenate([sl(g0), sl(g0 + 1)], axis=1)  # (rows, 2Cin)
        p = jnp.dot(x2, w_ref[g0 * Cin:(g0 + 2) * Cin, :],
                    preferred_element_type=jnp.float32)
        partial = p if partial is None else partial + p
    if nG % 2:
        p = jnp.dot(sl(nG - 1), w_ref[(nG - 1) * Cin:nG * Cin, :],
                    preferred_element_type=jnp.float32)
        partial = p if partial is None else partial + p

    y = b_ref[0, :].astype(jnp.float32)
    for dx in range(kw):
        # static lane-dim slice, then major-dim-only reshape (Mosaic can't
        # lower reshapes that split the minor/lane dimension)
        p_dx = partial[:, dx * Cout:(dx + 1) * Cout]
        p_dx = p_dx.reshape(tz, ty, Wp, Cout)
        y = y + p_dx[:, :, dx:dx + W, :]
    out_ref[0, :, :, :, :] = y.astype(out_dtype)


def _lanes(c):  # lane-padded width
    return -(-c // 128) * 128


def _pick_tiles(D, H, W, Cin, Cout, kd, kh, kw):
    """Largest (tz, ty) dividing (D, H) fitting the VMEM budget, counting
    lane padding and a 2x slack for Mosaic temporaries."""
    for tz in (8, 4, 2, 1):
        if D % tz:
            continue
        for ty in (H, H // 2, H // 4, H // 8, 8, 4, 2, 1):
            if ty < 1 or H % ty:
                continue
            rows = tz * ty * (-(-(W + kw - 1) // 8) * 8)
            need = (rows * _lanes(kw * Cout) * 4 * 2   # f32 partial + temp
                    + rows * _lanes(2 * Cin) * 2 * 2   # x2 temp + slices
                    + 2 * (tz + kd - 1) * (ty + kh - 1)
                    * (W + kw - 1) * _lanes(Cin) * 2   # input, 2 buffers
                    + 2 * tz * ty * W * _lanes(Cout) * 2   # out, 2 buffers
                    + tz * ty * (W + kw - 1) * _lanes(Cout) * 4 * 2)  # y
            if 2 * need <= 2 * VMEM_BUDGET and need <= VMEM_BUDGET:
                return tz, ty
    return 1, 1


def _conv3d_pallas_fwd(x, w, b):
    """x (F, D, H, W, Cin); w (kd, kh, kw, Cin, Cout) odd sizes; b (Cout,)."""
    F, D, H, W, Cin = x.shape
    kd, kh, kw, _, Cout = w.shape
    out_dtype = x.dtype
    pz, py, px = kd // 2, kh // 2, kw // 2

    Wp = -(-(W + kw - 1) // 8) * 8  # sublane-aligned width incl. halo
    xp = jnp.pad(x, ((0, 0), (pz, pz), (py, py),
                     (px, px + Wp - (W + kw - 1)), (0, 0)))
    xb = xp.astype(jnp.bfloat16)
    # packed weights: rows = (dz, dy) blocks of Cin; cols = dx blocks
    wp = jnp.transpose(w, (0, 1, 3, 2, 4))     # (dz, dy, Cin, dx, Cout)
    wp = wp.reshape(kd * kh * Cin, kw * Cout).astype(jnp.bfloat16)
    bb = b.reshape(1, Cout).astype(jnp.bfloat16)

    tz, ty = _pick_tiles(D, H, W, Cin, Cout, kd, kh, kw)
    # materialise overlapping halo blocks (see _conv_kernel docstring)
    xz = jnp.stack([xb[:, i * tz:i * tz + tz + kd - 1]
                    for i in range(D // tz)], axis=1)
    xzy = jnp.stack([xz[:, :, :, j * ty:j * ty + ty + kh - 1]
                     for j in range(H // ty)], axis=2)
    # (F, D/tz, H/ty, tz+kd-1, ty+kh-1, Wp, Cin)

    kernel = functools.partial(_conv_kernel, tz=tz, ty=ty, W=W, Wp=Wp,
                               Cin=Cin, Cout=Cout, kd=kd, kh=kh, kw=kw,
                               out_dtype=out_dtype)
    out = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        grid=(F, D // tz, H // ty),
        in_specs=[
            pl.BlockSpec((1, 1, 1, tz + kd - 1, ty + kh - 1, Wp, Cin),
                         lambda f, z, y: (f, z, y, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kd * kh * Cin, kw * Cout),
                         lambda f, z, y: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda f, z, y: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tz, ty, W, Cout),
                               lambda f, z, y: (f, z, y, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, D, H, W, Cout), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * F * D * H * W * kd * kh * kw * Cin * Cout,
            bytes_accessed=xzy.size * 2 + F * D * H * W * Cout * 2,
            transcendentals=0),
    )(xzy, wp, bb)
    return out


@jax.custom_vjp
def conv3d_pallas(x, w, b):
    """SAME-padded odd-size channels-last 3D conv (tap-packed Pallas
    kernel)."""
    return _conv3d_pallas_fwd(x, w, b)


def _fwd(x, w, b):
    return _conv3d_pallas_fwd(x, w, b), (x, w)


def _bwd(res, g):
    """Backward via XLA convs — the mirror of nn.Conv's own gradients
    (training throughput is dominated by these XLA convs either way)."""
    x, w = res
    kd, kh, kw = w.shape[:3]
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
    # dx: conv of g with spatially-flipped, io-swapped weights
    w_flip = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    dx = jax.lax.conv_general_dilated(
        g.astype(x.dtype), w_flip.astype(x.dtype), (1, 1, 1), "SAME",
        dimension_numbers=dn)
    # dw: correlate x with g (batch+space as the contraction)
    pads = [(kd // 2, kd // 2), (kh // 2, kh // 2), (kw // 2, kw // 2)]
    dw = jax.lax.conv_general_dilated(
        jnp.transpose(x, (4, 1, 2, 3, 0)).astype(jnp.float32),
        jnp.transpose(g, (1, 2, 3, 0, 4)).astype(jnp.float32),
        (1, 1, 1), pads,
        dimension_numbers=jax.lax.conv_dimension_numbers(
            (x.shape[4], x.shape[1], x.shape[2], x.shape[3], x.shape[0]),
            (g.shape[1], g.shape[2], g.shape[3], g.shape[0], g.shape[4]),
            ("NDHWC", "DHWIO", "NDHWC")))
    dw = jnp.transpose(dw, (1, 2, 3, 0, 4)).astype(w.dtype)
    db = jnp.sum(g, axis=(0, 1, 2, 3)).astype(w.dtype)
    return dx, dw, db


conv3d_pallas.defvjp(_fwd, _bwd)
