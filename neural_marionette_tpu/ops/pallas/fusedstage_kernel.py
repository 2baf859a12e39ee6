"""Fused decoder-stage Pallas kernel: conv3d(k=3) + GroupNorm + LeakyReLU.

The round-4 verdict asked for this prototype (VoxelDecoder fine stage,
reference build_voxel_decoder kypt_detector.py:417-460; our
models/detector.py VoxelDecoder.stage) to be MEASURED rather than argued
about.  Design:

* pass 1 — the tap-packed conv kernel of ops/pallas/conv3d_kernel.py
  (one program per (frame, z-plane), (dz,dy)->K / dx->N packing, f32
  accumulation) EXTENDED to also emit per-(frame, z, group) partial
  moment sums (sum, sum^2) of the conv output while the plane is still
  in VMEM — deleting the separate GN-stats read pass over the 64^3
  tensor that XLA's decomposition performs;
* a tiny XLA reduce folds the z-partials into per-(frame, group)
  mean/var (F x 2G values — negligible);
* pass 2 — normalize + scale/shift + LeakyReLU as plain XLA elementwise
  (one fused read + write).  A Pallas pass 2 was prototyped and removed:
  XLA's elementwise fusion is already one-read-one-write (bandwidth
  optimal), so a kernel buys nothing, and per-frame (1, ngroups) block
  reads violate Mosaic's (8, 128) min-tile rule (second-minor block dim
  must be 8-divisible or full) — the fix (padding the per-frame stats
  rows to (8, 128) blocks) is exactly what the stats OUTPUT of pass 1
  already does, see `_conv_stats_kernel`.

HBM traffic per stage: x + write y + read y + write out = 3 passes over
the activation tensor vs XLA's 4 (conv write, stats read, normalize
read, out write) — a ~2.4 ms/stage ceiling at 120 frames, IF the pass-1
conv matmul matches XLA's conv throughput (the previous standalone
measurement had the tap-packed kernel at 20.7 TF/s vs XLA's in-graph
conv fusions at 73-157 TF/s in the r5 trace — see BASELINE.md).

Measure with scripts/bench_fusedstage.py; the verdict lives in
BASELINE.md.  Forward-only: the training backward would additionally
need a custom VJP that forfeits XLA's fused backward — only worth
building if the forward wins first.

MEASURED OUTCOME (round 5, real chip): the kernel's operand layout
constraint is channels-minor ({4,3,2,1,0} row-major, C=32), so XLA must
relayout the input into a 128-lane-padded copy — a 4.0x HBM expansion
(the compiler report shows 2.24G unpadded -> 8.97G padded for the halo
pad plus 7.50G for the x copy), which OOMs outright at the flagship
F=120 point (16.47G > 15.75G HBM) and at any size taxes every x read
with 4x the bytes.  In-graph XLA avoids this entirely by keeping these
C<64 stages batch-minor (the r5 trace's conv fusions).  This is the
same lane-padding wall as ops/pallas/conv3d_kernel.py (20.7 TF/s
standalone vs XLA's 73-157 in-graph) with the GN fusion unable to buy
it back — quantified rejection recorded in BASELINE.md; kernel kept as
the measurement artifact, not routed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAKY_SLOPE = 0.01


def _conv_stats_kernel(*refs, H, W, Wp, Cin, Cout, kd, kh, kw, ngroups):
    """Pass 1: conv plane + per-group moment partials.

    refs = (x_dz0..x_dz{kd-1}, w, b, y_out, stats_out); stats_out is
    a (1, 1, 8, 128) f32 block (Mosaic min-tile — a (1, 1, 2*ngroups)
    block is unlowerable: the second-minor block dim must be 8-divisible
    or span the array) whose row 0 holds [sum_g0.., sq_g0.., 0...] of
    this plane's conv output; rows 1-7 are broadcast copies."""
    x_refs = refs[:kd]
    w_ref, b_ref = refs[kd], refs[kd + 1]
    y_ref, s_ref = refs[kd + 2], refs[kd + 3]
    rows = H * Wp
    nG = kd * kh
    Cg = Cout // ngroups

    def sl(g):
        dz, dy = divmod(g, kh)
        blk = x_refs[dz][0, 0, dy:dy + H, :, :]
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
        p_dx = partial[:, dx * Cout:(dx + 1) * Cout]
        p_dx = p_dx.reshape(H, Wp, Cout)
        y = y + p_dx[:, dx:dx + W, :]

    y_ref[0, 0, :, :, :] = y.astype(y_ref.dtype)
    # per-group moments of the f32 plane while it is VMEM-resident.
    # Mosaic cannot reshape-split the minor (channel) dim into
    # (ngroups, Cg), so reduce channels-per-column first and fold the
    # group structure with an indicator matmul.
    yf = y.reshape(H * W, Cout)                     # major-merge only
    cs = jnp.sum(yf, axis=0, keepdims=True)         # (1, Cout)
    cq = jnp.sum(yf * yf, axis=0, keepdims=True)    # (1, Cout)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (Cout, ngroups), 0)
    g_idx = jax.lax.broadcasted_iota(jnp.int32, (Cout, ngroups), 1)
    gmask = (c_idx // Cg == g_idx).astype(jnp.float32)
    sg = jnp.dot(cs, gmask, preferred_element_type=jnp.float32)
    qg = jnp.dot(cq, gmask, preferred_element_type=jnp.float32)
    row = jnp.concatenate(
        [sg, qg, jnp.zeros((1, 128 - 2 * ngroups), jnp.float32)], axis=1)
    s_ref[0, 0, :, :] = jnp.broadcast_to(row, (8, 128))


def fused_stage(x, w, b, scale, bias, ngroups: int | None = None,
                eps: float = 1e-5):
    """leaky_relu(group_norm(conv3d(x, w) + b)) — fused, forward only.

    x (F, D, H, W, Cin) channels-last; w (3, 3, 3, Cin, Cout); scale /
    bias (Cout,) GroupNorm affine params.  Matches
    models/blocks.py group_norm semantics (num_groups = Cout // 16,
    eps 1e-5) and LEAKY_SLOPE = 0.01.
    """
    F, D, H, W, Cin = x.shape
    kd, kh, kw, _, Cout = w.shape
    if ngroups is None:
        ngroups = max(Cout // 16, 1)
    out_dtype = x.dtype
    pz, py, px = kd // 2, kh // 2, kw // 2
    interpret = jax.default_backend() != "tpu"

    Wp = -(-(W + kw - 1) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (pz, pz), (py, py),
                     (px, px + Wp - (W + kw - 1)), (0, 0)))
    xb = xp.astype(jnp.bfloat16)
    wp = jnp.transpose(w, (0, 1, 3, 2, 4))
    wp = wp.reshape(kd * kh * Cin, kw * Cout).astype(jnp.bfloat16)
    bb = b.reshape(1, Cout).astype(jnp.bfloat16)

    kernel = functools.partial(_conv_stats_kernel, H=H, W=W, Wp=Wp,
                               Cin=Cin, Cout=Cout, kd=kd, kh=kh, kw=kw,
                               ngroups=ngroups)

    def x_spec(dz):
        return pl.BlockSpec((1, 1, H + kh - 1, Wp, Cin),
                            lambda f, z, dz=dz: (f, z + dz, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    y, stats = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(F, D),
        in_specs=[x_spec(dz) for dz in range(kd)] + [
            pl.BlockSpec((kd * kh * Cin, kw * Cout), lambda f, z: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda f, z: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, H, W, Cout), lambda f, z: (f, z, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda f, z: (f, z, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((F, D, H, W, Cout), out_dtype),
            jax.ShapeDtypeStruct((F, D, 8, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * F * D * H * W * kd * kh * kw * Cin * Cout,
            bytes_accessed=kd * xb.size * 2 + F * D * H * W * Cout * 2,
            transcendentals=0),
    )(*([xb] * kd + [wp, bb]))

    # z-partials -> per-(frame, group) mean / inv-std (tiny XLA reduce);
    # only row 0 of each (8, 128) stats block carries data
    tot = jnp.sum(stats[:, :, 0, :2 * ngroups], axis=1)  # (F, 2*ngroups)
    n = jnp.float32(D * H * W * (Cout // ngroups))
    mean = tot[:, :ngroups] / n
    var = tot[:, ngroups:] / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)

    # pass 2: one fused XLA elementwise read+write (see module docstring)
    Cg = Cout // ngroups
    mu_c = jnp.repeat(mean, Cg, axis=1)[:, None, None, None, :]
    inv_c = jnp.repeat(inv, Cg, axis=1)[:, None, None, None, :]
    z = (y.astype(jnp.float32) - mu_c) * inv_c \
        * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return jnp.where(z >= 0, z, z * LEAKY_SLOPE).astype(out_dtype)


def reference_stage(x, w, b, scale, bias, ngroups: int | None = None,
                    eps: float = 1e-5):
    """The XLA decomposition this kernel races (same math, same dtypes)."""
    F, D, H, W, Cin = x.shape
    Cout = w.shape[-1]
    if ngroups is None:
        ngroups = max(Cout // 16, 1)
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b.astype(x.dtype)
    yf = y.astype(jnp.float32).reshape(F, D, H, W, ngroups,
                                       Cout // ngroups)
    mean = yf.mean(axis=(1, 2, 3, 5), keepdims=True)
    var = ((yf - mean) ** 2).mean(axis=(1, 2, 3, 5), keepdims=True)
    z = (yf - mean) * jax.lax.rsqrt(var + eps)
    z = z.reshape(F, D, H, W, Cout) * scale.astype(jnp.float32) \
        + bias.astype(jnp.float32)
    return jnp.where(z >= 0, z, z * LEAKY_SLOPE).astype(x.dtype)
