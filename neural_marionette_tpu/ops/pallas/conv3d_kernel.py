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

The grid runs one program per (frame, z-plane); the kd z-shifted views
needed for the z taps are the SAME padded array passed kd times with
shifted BlockSpec index maps (halo copies are never materialised — index
maps address in block units, so a z-block of 1 makes any shift legal).
The wrapper handles SAME padding and a custom VJP (backward = XLA convs,
numerically the mirror of ``nn.Conv``'s own gradients).  On non-TPU
backends the kernel runs interpreted (CPU tests).

Hardware status (see ROADMAP.md): 20.7 TF/s on the 64^3 64->32 decoder
conv — 1.5x the standalone XLA conv, but XLA's in-graph fusion still wins
(it picks layouts globally and fuses the GN stats), so the model routes
through this kernel only when NM_PALLAS_CONV=1.  The identified end state
is a decoder megakernel fusing conv+GN+LeakyReLU chains in VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _conv_kernel(*refs, H, W, Wp, Cin, Cout, kd, kh, kw, out_dtype):
    """One (frame, z-plane) program.

    refs = (x_dz0, ..., x_dz{kd-1}, w, b, out): the SAME padded input
    array is passed kd times with z-shifted BlockSpec index maps — that
    is how overlapping z-halos are expressed without materialising halo
    copies (index maps address in block units, so a z-block size of 1
    makes arbitrary shifts legal).  Each x block is one z-plane
    (1, 1, H+kh-1, Wp, Cin); y-halos are slices of the plane, x-halos
    live in the Wp padding.

    w: (kd*kh*Cin, kw*Cout) packed weights; K-block g=(dz,dy), N-block
    dx.  b: (1, Cout).  out: (1, 1, H, W, Cout).

    (dz, dy) tap groups are consumed two at a time: each matmul contracts
    K = 2*Cin (a full 128-lane tile at Cin=64) and produces all kw
    N-blocks, accumulating partials in f32; the dx reduction drops the
    Wp pad columns.
    """
    x_refs = refs[:kd]
    w_ref, b_ref, out_ref = refs[kd], refs[kd + 1], refs[kd + 2]
    rows = H * Wp
    nG = kd * kh

    def sl(g):
        dz, dy = divmod(g, kh)
        blk = x_refs[dz][0, 0, dy:dy + H, :, :]  # (H, Wp, Cin)
        return blk.reshape(rows, Cin)

    partial = None
    for g0 in range(0, nG - 1, 2):
        x2 = jnp.concatenate([sl(g0), sl(g0 + 1)], axis=1)
        p = jnp.dot(x2, w_ref[g0 * Cin:(g0 + 2) * Cin, :],
                    preferred_element_type=jnp.float32)
        partial = p if partial is None else partial + p
    if nG % 2:
        p = jnp.dot(sl(nG - 1), w_ref[(nG - 1) * Cin:nG * Cin, :],
                    preferred_element_type=jnp.float32)
        partial = p if partial is None else partial + p

    y = b_ref[0, :].astype(jnp.float32)
    for dx in range(kw):
        # static lane slice, then major-dim-only reshape (Mosaic cannot
        # lower reshapes that split the minor dim)
        p_dx = partial[:, dx * Cout:(dx + 1) * Cout]
        p_dx = p_dx.reshape(H, Wp, Cout)
        y = y + p_dx[:, dx:dx + W, :]
    out_ref[0, 0, :, :, :] = y.astype(out_dtype)


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

    kernel = functools.partial(_conv_kernel, H=H, W=W, Wp=Wp,
                               Cin=Cin, Cout=Cout, kd=kd, kh=kh, kw=kw,
                               out_dtype=out_dtype)

    def x_spec(dz):
        return pl.BlockSpec((1, 1, H + kh - 1, Wp, Cin),
                            lambda f, z, dz=dz: (f, z + dz, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        grid=(F, D),
        in_specs=[x_spec(dz) for dz in range(kd)] + [
            pl.BlockSpec((kd * kh * Cin, kw * Cout),
                         lambda f, z: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda f, z: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, H, W, Cout),
                               lambda f, z: (f, z, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, D, H, W, Cout), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * F * D * H * W * kd * kh * kw * Cin * Cout,
            bytes_accessed=kd * xb.size * 2 + F * D * H * W * Cout * 2,
            transcendentals=0),
    )(*([xb] * kd + [wp, bb]))
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
