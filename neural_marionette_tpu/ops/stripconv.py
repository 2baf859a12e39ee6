"""Strip-packed 3D convolutions: full-MXU-tile conv for small channels.

Why.  The decoder's 64^3 convs (reference build_voxel_decoder,
kypt_detector.py:417-460) have Cout=32/Cin=64: on TPU the MXU contracts
128x128 tiles and HBM/VMEM layouts pad the minor (channel) dim to 128
lanes, so XLA's native conv3d runs these stages at ~15% of bf16 peak with
~21 ms/step of layout copies around them (BASELINE.md round-2 trace).

What.  Fold S consecutive planes of one spatial axis (U) into the channel
dim ("strip packing"): x (N, U, V, W, C) -> xp (N, U/S, V, W, S*C).  A
k=3 conv along U then only needs the S+2 planes covering a strip's
window, which are a LANE-CONTIGUOUS slice of [prev-block last plane |
this block | next-block first plane].  The U-taps become part of the
contraction dim and the remaining (V, W) taps are a plain 2D conv:

    conv3d(k=3, Cin -> Cout)  ==  conv2d(k=3x3, (S+2)*Cin -> S*Cout)

over the windowed packed tensor, with a block-Toeplitz weight expansion
(zeros where d - j is outside the tap range).  For the flagship decoder
stages this turns (Cin=64 -> Cout=32) into (384 -> 128) — every matmul
dim a full multiple of the 128-lane MXU tile.  The Toeplitz zeros cost
exactly 2x FLOPs at S=4 ((S+2)/3), which is a bargain against the ~7x
utilization loss they buy back.  S is chosen per stage so S*Cout = 128.

Everything here is pure XLA (differentiable, works on CPU), so the same
formulation accelerates the backward pass in training.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def pack_strips(x: jnp.ndarray, S: int) -> jnp.ndarray:
    """(N, U, V, W, C) -> (N, U//S, V, W, S*C); lane order (s, c)."""
    N, U, V, W, C = x.shape
    assert U % S == 0, f"U={U} not divisible by strip size {S}"
    x = x.reshape(N, U // S, S, V, W, C)
    x = jnp.moveaxis(x, 2, 4)
    return x.reshape(N, U // S, V, W, S * C)


def unpack_strips(xp: jnp.ndarray, S: int) -> jnp.ndarray:
    """Inverse of :func:`pack_strips`."""
    N, Us, V, W, SC = xp.shape
    C = SC // S
    x = xp.reshape(N, Us, V, W, S, C)
    x = jnp.moveaxis(x, 4, 2)
    return x.reshape(N, Us * S, V, W, C)


def window_strips(xp: jnp.ndarray, S: int, Cin: int) -> jnp.ndarray:
    """Packed (N, Us, V, W, S*Cin) -> windowed (N, Us, V, W, (S+2)*Cin).

    Window slot d in 0..S+1 holds input plane S*us - 1 + d (zeros outside
    the volume == SAME padding along U).  Slots 1..S are the block itself;
    slot 0 / S+1 are single lane-slices of the neighbour blocks, so the
    whole window is three lane-contiguous concatenated slices.
    """
    N, Us, V, W, SC = xp.shape
    xpad = jnp.pad(xp, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    prev_last = xpad[:, 0:Us, :, :, (S - 1) * Cin:S * Cin]
    next_first = xpad[:, 2:Us + 2, :, :, 0:Cin]
    return jnp.concatenate([prev_last, xp, next_first], axis=-1)


def strip_weights(kernel: jnp.ndarray, S: int) -> jnp.ndarray:
    """(3, 3, 3, Cin, Cout) conv kernel -> (3, 3, (S+2)*Cin, S*Cout)
    block-Toeplitz expansion for the windowed conv2d.

    Output plane j of a strip reads window slot d with U-tap
    ku = d - j (valid 0..2); invalid (d, j) pairs are exact zeros.
    """
    assert kernel.shape[0] == 3, "strip conv supports k=3 along U"
    zeros = jnp.zeros_like(kernel[0])  # (3, 3, Cin, Cout)
    rows = []
    for d in range(S + 2):
        row = [kernel[d - j] if 0 <= d - j <= 2 else zeros
               for j in range(S)]
        rows.append(jnp.stack(row, axis=0))      # (S, 3, 3, Cin, Cout)
    T = jnp.stack(rows, axis=0)                  # (S+2, S, 3, 3, Cin, Cout)
    T = T.transpose(2, 3, 0, 4, 1, 5)            # (3, 3, S+2, Cin, S, Cout)
    Cin, Cout = kernel.shape[3], kernel.shape[4]
    return T.reshape(3, 3, (S + 2) * Cin, S * Cout)


def strip_conv3(xp: jnp.ndarray, kernel: jnp.ndarray, bias, S: int
                ) -> jnp.ndarray:
    """SAME k=3 conv3d on a strip-packed tensor.

    xp (N, Us, V, W, S*Cin); kernel (3, 3, 3, Cin, Cout) in flax Conv
    layout; returns (N, Us, V, W, S*Cout).
    """
    N, Us, V, W, SC = xp.shape
    Cin = SC // S
    Cout = kernel.shape[-1]
    w6 = window_strips(xp, S, Cin)
    T = strip_weights(kernel, S)
    y = jax.lax.conv_general_dilated(
        w6.reshape(N * Us, V, W, (S + 2) * Cin), T,
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=xp.dtype)
    y = y.reshape(N, Us, V, W, S * Cout)
    if bias is not None:
        y = y + jnp.tile(bias, S)
    return y


def strip_group_norm(xp: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                     num_groups: int, S: int,
                     eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm(C // 16 groups) on a strip-packed tensor: statistics per
    (sample, group) over all spatial positions INCLUDING the S packed
    planes — identical to flax nn.GroupNorm on the unpacked tensor."""
    N, Us, V, W, SC = xp.shape
    C = SC // S
    gs = C // num_groups
    x6 = xp.reshape(N, Us, V, W, S, num_groups, gs).astype(jnp.float32)
    # fast variance (E[x^2] - E[x]^2), matching flax's default
    mean = jnp.mean(x6, axis=(1, 2, 3, 4, 6), keepdims=True)
    mean2 = jnp.mean(jnp.square(x6), axis=(1, 2, 3, 4, 6), keepdims=True)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    y = (x6 - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(N, Us, V, W, S, C).astype(xp.dtype)
    y = y * scale.astype(xp.dtype) + bias.astype(xp.dtype)
    return y.reshape(N, Us, V, W, SC)


def upsample2_packed(xp: jnp.ndarray, S: int) -> jnp.ndarray:
    """Half-pixel 2x trilinear upsample of a strip-packed tensor WITHOUT
    unpacking: (N, Us, V, W, S*C) -> (N, Us, 2V, 2W, 2S*C).

    The U axis doubles inside the lanes (strip size S -> 2S, strip count
    unchanged): out plane 2r = 0.25*plane(r-1) + 0.75*plane(r) and
    out plane 2r+1 = 0.75*plane(r) + 0.25*plane(r+1) (edges clamped,
    matching ops.upsample's interpolation matrix), where the r-1 / r+1
    neighbours are lane-contiguous slices plus one plane borrowed from
    the adjacent strip.  V / W upsample as ordinary interp-matrix
    contractions (packing only touches U).  Zero transposes.
    """
    from .upsample import _interp_matrix
    N, Us, V, W, SC = xp.shape
    C = SC // S
    dname = jnp.dtype(xp.dtype).name

    # neighbour planes (global edge clamp: plane -1 -> 0, plane U -> U-1)
    prev_last = jnp.concatenate(
        [xp[:, :1, :, :, 0:C], xp[:, :-1, :, :, (S - 1) * C:]], axis=1)
    next_first = jnp.concatenate(
        [xp[:, 1:, :, :, 0:C], xp[:, -1:, :, :, (S - 1) * C:]], axis=1)
    left = jnp.concatenate([prev_last, xp[..., :(S - 1) * C]], axis=-1) \
        if S > 1 else prev_last
    right = jnp.concatenate([xp[..., C:], next_first], axis=-1) \
        if S > 1 else next_first
    even = 0.25 * left + 0.75 * xp    # lane block r -> out plane 2r
    odd = 0.75 * xp + 0.25 * right    # lane block r -> out plane 2r+1
    out = jnp.concatenate(
        [blk for r in range(S)
         for blk in (even[..., r * C:(r + 1) * C],
                     odd[..., r * C:(r + 1) * C])], axis=-1)

    Wv = _interp_matrix(V, dname)
    Ww = _interp_matrix(W, dname)
    out = jnp.einsum("Vv,nuvwk->nuVwk", Wv, out)
    out = jnp.einsum("Ww,nuvwk->nuvWk", Ww, out)
    return out.astype(xp.dtype)


def strip_group_norm_fast(xp: jnp.ndarray, scale: jnp.ndarray,
                          bias: jnp.ndarray, num_groups: int, S: int,
                          eps: float = 1e-5) -> jnp.ndarray:
    """Reshape-free GroupNorm on a strip-packed tensor.

    Splitting the 128-lane minor dim (reshape to (S, G, gs)) forces XLA
    relayout copies on TPU; instead group statistics are computed with a
    static (S*C, G) 0/1 selector matmul over per-lane f32 sums, and the
    normalization is one fused elementwise pass with per-(sample, lane)
    scale/shift.  Matches flax GroupNorm (f32 stats, fast variance).
    """
    import numpy as np
    N, Us, V, W, SC = xp.shape
    C = SC // S
    gs = C // num_groups
    # f32 stats for bf16/f32 inputs (flax GroupNorm semantics); promotes
    # to f64 under x64 so exact-equivalence tests can compare at 1e-10
    stat_dtype = jnp.promote_types(xp.dtype, jnp.float32)
    sel = np.zeros((SC, num_groups), np.float32)
    sel[np.arange(SC), (np.arange(SC) % C) // gs] = 1.0
    sel = jnp.asarray(sel, dtype=stat_dtype)

    # per-lane sums with f32 accumulation (bf16 products are exact in
    # f32); leading-axis-first reduction order measured fastest on TPU
    # (scripts/bench_gnstats.py)
    s1_lane = jnp.sum(xp, axis=(1, 2, 3), dtype=stat_dtype)       # (N, SC)
    s2_lane = jnp.einsum("nuvwk,nuvwk->nk", xp, xp,
                         preferred_element_type=stat_dtype)
    s1 = s1_lane @ sel                                            # (N, G)
    s2 = s2_lane @ sel
    count = Us * V * W * S * gs
    mean = s1 / count
    var = jnp.maximum(s2 / count - jnp.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + eps)                               # (N, G)

    gamma = jnp.tile(scale.astype(stat_dtype), S)                 # (SC,)
    beta = jnp.tile(bias.astype(stat_dtype), S)
    a = (rstd @ sel.T) * gamma[None]                              # (N, SC)
    b = beta[None] - (mean * rstd) @ sel.T * gamma[None]
    y = xp * a[:, None, None, None, :].astype(xp.dtype) \
        + b[:, None, None, None, :].astype(xp.dtype)
    return y


def strip_split_weights(kernel: jnp.ndarray, S: int):
    """(3, 3, 3, Cin, Cout) -> (T_main (3, 3, S*Cin, S*Cout),
    T_edge (3, 3, 2*Cin, S*Cout)) for the assembly-free split conv.

    T_main holds every within-strip tap: output plane j reads in-strip
    plane p with U-tap ku = p - j + 1 (valid 0..2).  T_edge holds the two
    cross-strip taps: rows 0..Cin-1 = the previous strip's LAST plane
    (feeds j=0 with ku=0), rows Cin.. = the next strip's FIRST plane
    (feeds j=S-1 with ku=2).
    """
    zeros = jnp.zeros_like(kernel[0])          # (3, 3, Cin, Cout)
    rows = []
    for p in range(S):
        row = [kernel[p - j + 1] if abs(p - j) <= 1 else zeros
               for j in range(S)]
        rows.append(jnp.stack(row, axis=0))    # (S, 3, 3, Cin, Cout)
    Tm = jnp.stack(rows, axis=0)               # (S, S, 3, 3, Cin, Cout)
    Tm = Tm.transpose(2, 3, 0, 4, 1, 5)
    Cin, Cout = kernel.shape[3], kernel.shape[4]
    Tm = Tm.reshape(3, 3, S * Cin, S * Cout)

    erows = []
    for which in range(2):                     # 0: prev-last, 1: next-first
        j_hit = 0 if which == 0 else S - 1
        ku = 0 if which == 0 else 2
        row = [kernel[ku] if j == j_hit else zeros for j in range(S)]
        erows.append(jnp.stack(row, axis=0))   # (S, 3, 3, Cin, Cout)
    Te = jnp.stack(erows, axis=0)              # (2, S, 3, 3, Cin, Cout)
    Te = Te.transpose(2, 3, 0, 4, 1, 5).reshape(3, 3, 2 * Cin, S * Cout)
    return Tm, Te


def strip_conv3_split(xp: jnp.ndarray, kernel: jnp.ndarray, bias, S: int
                      ) -> jnp.ndarray:
    """Assembly-free SAME k=3 conv3d on a strip-packed tensor.

    Identical math and FLOPs to :func:`strip_conv3`, but instead of
    materializing the (S+2)*Cin windowed tensor (measured ~13 ms/stage at
    104 GB/s — scripts/bench_window.py), the conv splits into a main
    conv2d over xp itself plus an edge conv2d over the small
    [prev-last-plane | next-first-plane] tensor (2*Cin lanes).
    """
    if os.environ.get("NM_STRIP_V2", "1") != "0":
        # v2 default: measured decoder fwd 63.9->50.8 ms, fwd+bwd
        # 136.7->104.7 ms at 40 frames bf16 (scripts/bench_stripconv.py)
        return strip_convk_split2(xp, kernel, bias, S)
    N, Us, V, W, SC = xp.shape
    Cin = SC // S
    Cout = kernel.shape[-1]
    Tm, Te = strip_split_weights(kernel, S)

    zrow = jnp.zeros_like(xp[:, :1, :, :, 0:Cin])
    prev_last = jnp.concatenate(
        [zrow, xp[:, :-1, :, :, (S - 1) * Cin:]], axis=1)
    next_first = jnp.concatenate(
        [xp[:, 1:, :, :, 0:Cin], zrow], axis=1)
    E = jnp.concatenate([prev_last, next_first], axis=-1)

    def c2d(v, w):
        return jax.lax.conv_general_dilated(
            v.reshape(N * Us, V, W, v.shape[-1]), w,
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=xp.dtype)

    y = c2d(xp, Tm) + c2d(E, Te)
    y = y.reshape(N, Us, V, W, S * Cout)
    if bias is not None:
        y = y + jnp.tile(bias, S)
    return y


def strip_convk_split(xp: jnp.ndarray, kernel: jnp.ndarray, bias, S: int
                      ) -> jnp.ndarray:
    """Assembly-free SAME odd-k conv3d on a strip-packed tensor —
    generalizes :func:`strip_conv3_split` to k in {3, 5, ...} with halo
    h = (k-1)//2 <= S (the halo must fit in one neighbour strip).
    Dispatches to the v2 (selection-conv) form unless NM_STRIP_V2=0.
    """
    if os.environ.get("NM_STRIP_V2", "1") != "0":
        # v2 default: measured decoder fwd 63.9->50.8 ms, fwd+bwd
        # 136.7->104.7 ms at 40 frames bf16 (scripts/bench_stripconv.py)
        return strip_convk_split2(xp, kernel, bias, S)
    return strip_convk_split_v1(xp, kernel, bias, S)


def strip_convk_split_v1(xp: jnp.ndarray, kernel: jnp.ndarray, bias, S: int
                         ) -> jnp.ndarray:
    """v1 split form: main conv2d over xp itself (S*Cin -> S*Cout block-
    Toeplitz within-strip taps; output plane j reads in-strip plane p with
    U-tap ku = p - j + h, valid 0..k-1) plus an edge conv2d over the small
    [prev-strip last h planes | next-strip first h planes] tensor
    (2h*Cin lanes).

    Kept callable directly (not just via the dispatcher) because its
    LINEAR TRANSPOSE w.r.t. the kernel is the lane-packed weight-gradient
    used by ops.hybridconv: the main conv2d's wgrad has S*Cout=128 output
    lanes and only S/k extra FLOPs — vs Cout output lanes (4x tile
    padding at Cout=32) for the plain conv3d wgrad.
    """
    k = kernel.shape[0]
    h = (k - 1) // 2
    assert k % 2 == 1 and h <= S, (k, S)
    N, Us, V, W, SC = xp.shape
    Cin = SC // S
    Cout = kernel.shape[-1]
    zeros = jnp.zeros_like(kernel[0])          # (k, k, Cin, Cout)

    rows = []
    for p in range(S):
        row = [kernel[p - j + h] if abs(p - j) <= h else zeros
               for j in range(S)]
        rows.append(jnp.stack(row, axis=0))
    Tm = jnp.stack(rows, axis=0).transpose(2, 3, 0, 4, 1, 5)
    Tm = Tm.reshape(k, k, S * Cin, S * Cout)

    erows = []
    for g in list(range(-h, 0)) + list(range(S, S + h)):
        row = [kernel[g - j + h] if abs(g - j) <= h else zeros
               for j in range(S)]
        erows.append(jnp.stack(row, axis=0))
    Te = jnp.stack(erows, axis=0).transpose(2, 3, 0, 4, 1, 5)
    Te = Te.reshape(k, k, 2 * h * Cin, S * Cout)

    zrow = jnp.zeros_like(xp[:, :1, :, :, 0:h * Cin])
    prev_last = jnp.concatenate(
        [zrow, xp[:, :-1, :, :, (S - h) * Cin:]], axis=1)
    next_first = jnp.concatenate(
        [xp[:, 1:, :, :, 0:h * Cin], zrow], axis=1)
    E = jnp.concatenate([prev_last, next_first], axis=-1)

    def c2d(v, w):
        return jax.lax.conv_general_dilated(
            v.reshape(N * Us, V, W, v.shape[-1]), w,
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=xp.dtype)

    y = c2d(xp, Tm) + c2d(E, Te)
    y = y.reshape(N, Us, V, W, S * Cout)
    if bias is not None:
        y = y + jnp.tile(bias, S)
    return y


def strip_conv1x1(xp: jnp.ndarray, kernel: jnp.ndarray, bias, S: int
                  ) -> jnp.ndarray:
    """1x1x1 conv on a strip-packed tensor as a block-diagonal lane
    matmul (kron(I_S, w)).  kernel (1, 1, 1, Cin, Cout)."""
    w = kernel[0, 0, 0]
    Cout = w.shape[-1]
    Wb = jnp.kron(jnp.eye(S, dtype=w.dtype), w)      # (S*Cin, S*Cout)
    y = xp @ Wb
    if bias is not None:
        y = y + jnp.tile(bias, S)
    return y


def strip_pool2(xp: jnp.ndarray, kernel: jnp.ndarray, bias, S: int
                ) -> jnp.ndarray:
    """k=2 stride-2 'pool' conv (Pool3DBlock's downsample) on a packed
    tensor: (N, Us, V, W, S*C) -> (N, Us/2, V/2, W/2, S*Cout).

    Zero-assembly form: output strip uo reads exactly input strips
    (2uo, 2uo+1), i.e. a k=2 stride-2 window along the STRIP axis — so
    the whole pool is ONE conv3d over (Us, V, W) with window (2, 2, 2)
    and stride (2, 2, 2) on the packed tensor itself.  Strip-axis tap
    a in {0, 1} holds input plane p (of strip 2uo+a) -> output plane j
    iff (a*S + p) - 2j is a valid original U-tap (0..1); elsewhere exact
    zeros.  Dense-matmul overhead: S x FLOPs of the true pool (8*S^2*
    C*Cout vs 8*S*C*Cout per position), bought back by full 128-lane
    contractions and zero data motion (a concat-assembled variant
    measured 2.1x SLOWER than plain conv3d; this form replaces it).
    kernel (2, 2, 2, C, Cout).
    """
    N, Us, V, W, SC = xp.shape
    C = SC // S
    Cout = kernel.shape[-1]
    assert Us % 2 == 0
    zeros = jnp.zeros_like(kernel[0])                # (2, 2, C, Cout)
    taps = []
    for a in range(2):
        rows = []
        for p in range(S):
            g = a * S + p
            row = [kernel[g - 2 * j] if 0 <= g - 2 * j <= 1 else zeros
                   for j in range(S)]
            rows.append(jnp.stack(row, axis=0))      # (S, 2, 2, C, Cout)
        taps.append(jnp.stack(rows, axis=0))         # (S, S, 2, 2, C, Co)
    T = jnp.stack(taps, axis=0)                      # (2, S, S, 2, 2, C, Co)
    T = T.transpose(0, 3, 4, 1, 5, 2, 6).reshape(2, 2, 2, SC, S * Cout)
    y = jax.lax.conv_general_dilated(
        xp, T, window_strides=(2, 2, 2), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=xp.dtype)
    if bias is not None:
        y = y + jnp.tile(bias, S)
    return y


def strip_conv3_toeplitz(xp: jnp.ndarray, kernel: jnp.ndarray, bias, S: int
                         ) -> jnp.ndarray:
    """SAME k=3 conv3d on a strip-packed tensor as ONE conv3d over
    (Us, V, W) — zero assembly, no edge tensor.

    The strip axis gets a k=3 SAME window: strip-axis tap a in
    {-1, 0, +1} holds input plane p (of strip us+a) -> output plane j
    iff a*S + p - j is in {-1, 0, 1}.  The a=+-1 slabs are zero except
    one plane (cross-strip halo), so the dense contraction costs
    S x the true conv FLOPs (27*S^2*Cin*Cout vs 27*S*Cin*Cout) — use
    for small S (the S=2 decoder stages) where the split form's edge
    assembly dominates its FLOPs advantage.
    kernel (3, 3, 3, Cin, Cout).
    """
    N, Us, V, W, SC = xp.shape
    Cin = SC // S
    Cout = kernel.shape[-1]
    zeros = jnp.zeros_like(kernel[0])                # (3, 3, Cin, Cout)
    taps = []
    for a in (-1, 0, 1):
        rows = []
        for p in range(S):
            row = [kernel[a * S + p - j + 1]
                   if abs(a * S + p - j) <= 1 else zeros
                   for j in range(S)]
            rows.append(jnp.stack(row, axis=0))      # (S, 3, 3, Cin, Cout)
        taps.append(jnp.stack(rows, axis=0))         # (S, S, 3, 3, Cin, Co)
    T = jnp.stack(taps, axis=0)                      # (3, S, S, 3, 3, ...)
    T = T.transpose(0, 3, 4, 1, 5, 2, 6).reshape(3, 3, 3, SC, S * Cout)
    y = jax.lax.conv_general_dilated(
        xp, T, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=xp.dtype)
    if bias is not None:
        y = y + jnp.tile(bias, S)
    return y


def _edge_sel_kernel(SC: int, Cin: int, S: int, h: int, dtype) -> jnp.ndarray:
    """(3, 1, 1, S*Cin, 2h*Cin) selection-conv kernel assembling the
    cross-strip halo tensor E of :func:`strip_convk_split` as ONE conv3d
    over the packed tensor (strip-axis window 3, SAME padding = the
    boundary zeros).  Tap a=0 reads strip us-1 (its last h planes), tap
    a=2 reads strip us+1 (its first h planes); tap a=1 is zero."""
    import numpy as np
    K = np.zeros((3, 1, 1, SC, 2 * h * Cin), np.float32)
    idx = np.arange(h * Cin)
    K[0, 0, 0, (S - h) * Cin + idx, idx] = 1.0
    K[2, 0, 0, idx, h * Cin + idx] = 1.0
    return jnp.asarray(K, dtype)


def strip_convk_split2(xp: jnp.ndarray, kernel: jnp.ndarray, bias, S: int
                       ) -> jnp.ndarray:
    """:func:`strip_convk_split` with two measured TPU fixes (identical
    math; hardware A/B in scripts/bench_stripconv.py):

    * the halo tensor E is built by a tiny (3, 1, 1) selection conv
      (``_edge_sel_kernel``, FLOPs ~ 1/6 of the main conv) instead of
      minor-dim lane slices + concat — the slices lower to loop fusions
      that re-read the ENTIRE packed tensor at ~1/2 HBM bandwidth
      (~23 ms/trainstep in the round-3 trace);
    * every conv runs as conv3d with a size-1 strip-axis window directly
      on the 5-D packed tensor, so the (N, Us) fold reshape — a physical
      ~600 GB/s copy in the trace, not a bitcast — disappears.
    """
    k = kernel.shape[0]
    h = (k - 1) // 2
    assert k % 2 == 1 and h <= S, (k, S)
    N, Us, V, W, SC = xp.shape
    Cin = SC // S
    Cout = kernel.shape[-1]
    zeros = jnp.zeros_like(kernel[0])          # (k, k, Cin, Cout)

    rows = []
    for p in range(S):
        row = [kernel[p - j + h] if abs(p - j) <= h else zeros
               for j in range(S)]
        rows.append(jnp.stack(row, axis=0))
    Tm = jnp.stack(rows, axis=0).transpose(2, 3, 0, 4, 1, 5)
    Tm = Tm.reshape(k, k, S * Cin, S * Cout)

    erows = []
    for g in list(range(-h, 0)) + list(range(S, S + h)):
        row = [kernel[g - j + h] if abs(g - j) <= h else zeros
               for j in range(S)]
        erows.append(jnp.stack(row, axis=0))
    Te = jnp.stack(erows, axis=0).transpose(2, 3, 0, 4, 1, 5)
    Te = Te.reshape(k, k, 2 * h * Cin, S * Cout)

    def c3d(v, w):
        return jax.lax.conv_general_dilated(
            v, w, window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=xp.dtype)

    E = c3d(xp, _edge_sel_kernel(SC, Cin, S, h, xp.dtype))
    y = c3d(xp, Tm[None]) + c3d(E, Te[None])
    if bias is not None:
        y = y + jnp.tile(bias, S)
    return y
