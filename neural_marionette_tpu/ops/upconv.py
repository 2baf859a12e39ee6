"""Fused 2x-trilinear-upsample + k=3 conv as ONE coarse-grid conv.

The decoder's two expensive stages are `conv3d(k=3, SAME)` applied to a
2x trilinear upsample (half-pixel / torch align_corners=False — see
ops/upsample.py; reference build_voxel_decoder kypt_detector.py:417-460
uses nn.Upsample + Conv3d).  Both ops are linear, so the composition is
a single linear map — and because the upsample is 2x, the composed map
splits by OUTPUT PARITY: each of the 8 parity classes (pu, pv, pw) of
the fine grid is an ordinary k=3 conv of the COARSE input with a
parity-specific kernel.  Batched over parity classes this is one conv3d
with 8*Cout output features at the coarse grid — the same MACs as the
fine-grid conv but reading 1/8 the input bytes, MXU-friendly
contraction/output dims (27*Cin x 8*Cout), and the entire upsample pass
(3 bandwidth passes + an even/odd assembly) deleted.

Per 1D axis, with interp taps (0.25, 0.75) and conv taps (w0, w1, w2):

    z_even[i] = (0.75w0+0.25w1) x[i-1] + (0.25w0+0.75w1+0.75w2) x[i]
                + 0.25w2 x[i+1]
    z_odd[i]  = 0.25w0 x[i-1] + (0.75w0+0.75w1+0.25w2) x[i]
                + (0.25w1+0.75w2) x[i+1]

(the M_even / M_odd matrices below), composed over the three axes as a
Kronecker action on the (3, 3, 3) tap array.  Boundary semantics differ
from a zero-padded coarse conv in exactly four output planes per axis
(the upsample edge-CLAMPS while the fine conv zero-pads y[-1]/y[2n]):

    o = 0:      + 0.25 (w1 - w0) . x[0]
    o = 1:      + 0.25 w0        . x[0]
    o = 2n - 2: + 0.25 w2        . x[n-1]
    o = 2n - 1: + 0.25 (w1 - w2) . x[n-1]

where each correction kernel is composed over the remaining axes by the
same operator one dimension down.  To avoid double-counting the
second-order (edge) and third-order (corner) terms, axis i's fix
composes the remaining axes with the TRUE operator for axes after i and
the coarse conv WITHOUT fixes for axes before i (triangular
inclusion-exclusion):  sum_i A_0..A_{i-1} (x) E_i (x) T_{i+1}.. equals
exactly T - A (T = A + E per axis).  The fixes touch single
planes/rows, so their cost is negligible.  Everything is pure XLA and
differentiable; parity with ``conv3d(upsample2_trilinear(x))`` is exact
up to bf16 summation order.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# K_parity[a] = sum_b M[parity][a, b] * w[b]
_M_EVEN = np.array([[0.75, 0.25, 0.0],
                    [0.25, 0.75, 0.75],
                    [0.0, 0.0, 0.25]], np.float32)
_M_ODD = np.array([[0.25, 0.0, 0.0],
                   [0.75, 0.75, 0.25],
                   [0.0, 0.25, 0.75]], np.float32)


def _compose_axis(W: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Apply the parity matrices along tap axis ``axis``: the result has
    a new leading parity axis (2) and the tap axis moved to axis+1."""
    M = jnp.asarray(np.stack([_M_EVEN, _M_ODD]), W.dtype)  # (2, 3, 3)
    Wm = jnp.moveaxis(W, axis, 0)                          # (3, ...)
    out = jnp.tensordot(M, Wm, axes=[[2], [0]])            # (2, 3, ...)
    return jnp.moveaxis(out, 1, axis + 1)


def _parity_kernels(W: jnp.ndarray, nd: int) -> jnp.ndarray:
    """W ((3,)*nd, Cin, Cout) -> ((2,)*nd + (3,)*nd + (Cin, Cout)) with
    parity axes in spatial order (p_1, ..., p_nd)."""
    for i in range(nd):
        # i parity axes already prepended; tap axis i now sits at 2*i
        W = _compose_axis(W, 2 * i)
    # axes now (p_nd, ..., p_1, a_1..a_nd, Cin, Cout) - reverse parities
    perm = tuple(range(nd - 1, -1, -1)) + tuple(range(nd, W.ndim))
    return W.transpose(perm)


def _insert_parity(corr: jnp.ndarray, axis: int, q: int, nd: int,
                   Cout: int) -> jnp.ndarray:
    """Zero-expand a packed correction over the remaining nd-1 axes into
    the full parity-major channel layout of an nd-axis packed tensor,
    placing the content at parity bit ``q`` of axis ``axis``.

    corr (N, rest..., 2^(nd-1) * Cout) with parity bits ordered by the
    remaining axes -> (N, rest..., 2^nd * Cout)."""
    lead = corr.shape[:-1]
    before, after = 2 ** axis, 2 ** (nd - 1 - axis)
    r = corr.reshape(lead + (before, after, Cout))
    z = jnp.zeros_like(r)
    parts = (r, z) if q == 0 else (z, r)
    out = jnp.stack(parts, axis=len(lead) + 1)   # (.., before, 2, after, C)
    return out.reshape(lead + (2 ** nd * Cout,))


def _upconv_nd_packed(x: jnp.ndarray, W: jnp.ndarray, nd: int,
                      nfix: int) -> jnp.ndarray:
    """Like :func:`_upconv_nd` but returns the COARSE parity-packed
    result (N, s1..s_nd, 2^nd * Cout), parity-major channel blocks
    (p_1..p_nd, Cout) — i.e. the fine tensor before the pixel shuffle.

    The boundary fixes land on single COARSE planes here (fine plane o
    on an axis is coarse plane o>>1 at parity o&1), so no fine-grid
    dynamic-update-slice exists: on TPU the fine DUS chain forced two
    whole-tensor layout round-trips (measured 2x13 ms/iter at B=16,
    copy.3693/3754 in the r3 trace) that this form deletes."""
    Cin, Cout = W.shape[-2], W.shape[-1]
    if nd == 0:
        return jnp.tensordot(x, W, axes=[[-1], [0]])

    spatial = x.shape[1:1 + nd]
    Kp = _parity_kernels(W, nd)
    Kp = Kp.reshape((2 ** nd,) + (3,) * nd + (Cin, Cout))
    Kb = jnp.moveaxis(Kp, 0, -2)
    Kb = Kb.reshape((3,) * nd + (Cin, 2 ** nd * Cout))

    dn = {1: ("NWC", "WIO", "NWC"),
          2: ("NHWC", "HWIO", "NHWC"),
          3: ("NDHWC", "DHWIO", "NDHWC")}[nd]
    y = jax.lax.conv_general_dilated(
        x, Kb, (1,) * nd, "SAME", dimension_numbers=dn,
        preferred_element_type=x.dtype)        # (N, s.., 2^nd*Cout)

    w_dt = W.dtype
    quarter = jnp.asarray(0.25, w_dt)
    for axis in range(nd - nfix, nd):
        n = spatial[axis]
        assert n >= 2, "upconv needs every spatial dim >= 2"
        Wm = jnp.moveaxis(W, axis, 0)          # (3, (3,)*(nd-1), Ci, Co)
        w0, w1, w2 = Wm[0], Wm[1], Wm[2]
        x_lo = jax.lax.index_in_dim(x, 0, axis=1 + axis, keepdims=False)
        x_hi = jax.lax.index_in_dim(x, n - 1, axis=1 + axis,
                                    keepdims=False)
        for o, xb, F in (
                (0, x_lo, (w1 - w0) * quarter),
                (1, x_lo, w0 * quarter),
                (2 * n - 2, x_hi, w2 * quarter),
                (2 * n - 1, x_hi, (w1 - w2) * quarter)):
            corr = _upconv_nd_packed(xb, F, nd - 1, nd - 1 - axis)
            corr = _insert_parity(corr, axis, o & 1, nd, Cout)
            m = o >> 1
            plane = jax.lax.index_in_dim(y, m, axis=1 + axis,
                                         keepdims=False)
            y = jax.lax.dynamic_update_index_in_dim(
                y, plane + corr, m, axis=1 + axis)
    return y


def parity_unshuffle(y: jnp.ndarray, nd: int = 3) -> jnp.ndarray:
    """Packed (N, s1..s_nd, 2^nd * C), parity-major -> fine
    (N, 2*s1..2*s_nd, C) — the pixel shuffle, applied once at the end of
    a packed chain (or folded into a consumer's output layout)."""
    N = y.shape[0]
    spatial = y.shape[1:1 + nd]
    C = y.shape[-1] // 2 ** nd
    y = y.reshape((N,) + spatial + (2,) * nd + (C,))
    perm = [0]
    for i in range(nd):
        perm += [1 + i, 1 + nd + i]
    perm += [1 + 2 * nd]
    y = y.transpose(perm)
    return y.reshape((N,) + tuple(2 * s for s in spatial) + (C,))


def upconv2_trilinear_packed(x: jnp.ndarray, kernel: jnp.ndarray,
                             bias=None) -> jnp.ndarray:
    """Fused upsample2+conv3d returning the coarse parity-packed tensor
    (N, D, H, W, 8*Cout): ``parity_unshuffle(result) ==
    upconv2_trilinear(x, kernel, bias)`` exactly.  Lets GroupNorm /
    activations / further convs run on the packed layout (lane = p*Cout
    + c, the same modular structure ops/stripconv.py's
    strip_group_norm_fast handles with S=8)."""
    assert kernel.shape[:3] == (3, 3, 3), kernel.shape
    y = _upconv_nd_packed(x, kernel.astype(x.dtype), 3, 3)
    if bias is not None:
        y = y + jnp.tile(bias.astype(y.dtype), 8)
    return y


def _upconv_nd(x: jnp.ndarray, W: jnp.ndarray, nd: int,
               nfix: int) -> jnp.ndarray:
    """x (N, s1..s_nd, Cin), W ((3,)*nd, Cin, Cout) ->
    (N, 2*s1..2*s_nd, Cout).  Boundary fixes applied only to the LAST
    ``nfix`` spatial axes (triangular inclusion-exclusion; top-level
    callers pass nfix=nd)."""
    Cin, Cout = W.shape[-2], W.shape[-1]
    if nd == 0:
        return jnp.tensordot(x, W, axes=[[-1], [0]])

    spatial = x.shape[1:1 + nd]
    Kp = _parity_kernels(W, nd)
    Kp = Kp.reshape((2 ** nd,) + (3,) * nd + (Cin, Cout))
    # batch parities into features: ((3,)*nd, Cin, 2^nd * Cout),
    # parity-major feature order
    Kb = jnp.moveaxis(Kp, 0, -2)
    Kb = Kb.reshape((3,) * nd + (Cin, 2 ** nd * Cout))

    dn = {1: ("NWC", "WIO", "NWC"),
          2: ("NHWC", "HWIO", "NHWC"),
          3: ("NDHWC", "DHWIO", "NDHWC")}[nd]
    y = jax.lax.conv_general_dilated(
        x, Kb, (1,) * nd, "SAME", dimension_numbers=dn,
        preferred_element_type=x.dtype)        # (N, s.., 2^nd*Cout)

    # pixel-shuffle: (N, s1..s_nd, (p1..p_nd, C)) -> (N, 2*s..., C)
    N = x.shape[0]
    y = y.reshape((N,) + spatial + (2,) * nd + (Cout,))
    perm = [0]
    for i in range(nd):
        perm += [1 + i, 1 + nd + i]
    perm += [1 + 2 * nd]
    y = y.transpose(perm)
    y = y.reshape((N,) + tuple(2 * s for s in spatial) + (Cout,))

    import os
    # boundary-fix application, hardware A/B'd at the B=16 bench point:
    # 'pad' (zero-padded single-plane corrections + add) HOPED to fuse
    # into the consumer but MEASURED 46 ms/iter SLOWER than the DUS form
    # (296.6 -> 342.1 ms full forward — XLA materialises the padded
    # full-size tensors instead of fusing).  Keep DUS; the flag stays
    # for re-measurement on future XLA versions.
    padfix = os.environ.get("NM_UPCONV_PADFIX", "0") != "0"
    w_dt = W.dtype
    quarter = jnp.asarray(0.25, w_dt)
    for axis in range(nd - nfix, nd):
        n = spatial[axis]
        assert n >= 2, "upconv needs every spatial dim >= 2"
        Wm = jnp.moveaxis(W, axis, 0)          # (3, (3,)*(nd-1), Ci, Co)
        w0, w1, w2 = Wm[0], Wm[1], Wm[2]
        x_lo = jax.lax.index_in_dim(x, 0, axis=1 + axis, keepdims=False)
        x_hi = jax.lax.index_in_dim(x, n - 1, axis=1 + axis,
                                    keepdims=False)
        for o, xb, F in (
                (0, x_lo, (w1 - w0) * quarter),
                (1, x_lo, w0 * quarter),
                (2 * n - 2, x_hi, w2 * quarter),
                (2 * n - 1, x_hi, (w1 - w2) * quarter)):
            # remaining axes: those before `axis` coarse-only (nfix'=?),
            # those after `axis` with the true fixed operator — i.e. fix
            # only the last (nd - 1 - axis) axes of the sub-problem
            corr = _upconv_nd(xb, F, nd - 1, nd - 1 - axis)
            if padfix:
                corr = jnp.expand_dims(corr, 1 + axis)
                pw = [(0, 0)] * corr.ndim
                pw[1 + axis] = (o, 2 * n - 1 - o)
                y = y + jnp.pad(corr, pw)
            else:
                plane = jax.lax.index_in_dim(y, o, axis=1 + axis,
                                             keepdims=False)
                y = jax.lax.dynamic_update_index_in_dim(
                    y, plane + corr, o, axis=1 + axis)
    return y


def upconv2_trilinear(x: jnp.ndarray, kernel: jnp.ndarray,
                      bias=None) -> jnp.ndarray:
    """``conv3d(kernel, SAME)(upsample2_trilinear(x))`` in one fused op.

    x (N, D, H, W, Cin) channels-last; kernel (3, 3, 3, Cin, Cout) in
    flax Conv layout; returns (N, 2D, 2H, 2W, Cout).
    """
    assert kernel.shape[:3] == (3, 3, 3), kernel.shape
    y = _upconv_nd(x, kernel.astype(x.dtype), 3, 3)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
