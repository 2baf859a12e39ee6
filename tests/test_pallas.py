"""Pallas kernel tests (interpret mode on the CPU test backend; the same
code compiles via Mosaic on TPU — validated on hardware, see BASELINE.md)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from neural_marionette_tpu.ops import voxelize_jnp, voxelize_np
from neural_marionette_tpu.ops.pallas import voxelize_pallas


def test_matches_scatter_random():
    g = np.random.default_rng(0)
    pts = jnp.asarray(g.uniform(-1, 1, size=(2, 3, 500, 3)),
                      dtype=jnp.float32)
    a = np.asarray(voxelize_jnp(pts, 32))
    b = np.asarray(voxelize_pallas(pts, 32))
    np.testing.assert_array_equal(a, b)


def test_matches_host_voxelizer():
    g = np.random.default_rng(1)
    pts = g.uniform(-1, 1, size=(300, 3)).astype(np.float32)
    a = voxelize_np(pts, 16)
    b = np.asarray(voxelize_pallas(jnp.asarray(pts[None]), 16))[0]
    np.testing.assert_array_equal(a, b)


def test_oob_points_dropped():
    pts = np.array([[5.0, 5, 5], [0, 0, 0], [-2, 0.5, 0.5],
                    [0.5, 9.0, 0.5]], dtype=np.float32)
    out = np.asarray(voxelize_pallas(jnp.asarray(pts[None]), 16))
    assert out.sum() == 1.0


def test_duplicates_idempotent():
    pts = np.zeros((100, 3), dtype=np.float32)  # all in one voxel
    out = np.asarray(voxelize_pallas(jnp.asarray(pts[None]), 16))
    assert out.max() == 1.0 and out.sum() == 1.0


def test_nonmultiple_point_count_padding():
    g = np.random.default_rng(2)
    pts = jnp.asarray(g.uniform(-1, 1, size=(1, 777, 3)), dtype=jnp.float32)
    a = np.asarray(voxelize_jnp(pts, 32))
    b = np.asarray(voxelize_pallas(pts, 32))
    np.testing.assert_array_equal(a, b)


# ------------------------------------------------------- tap-packed conv3d
def _conv_ref(x, w, b):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME", dimension_numbers=dn) + b


@pytest.mark.parametrize("shape,k", [
    ((2, 8, 8, 8, 16), 3),   # single-tile
    ((1, 8, 8, 16, 32), 3),  # wider W
    ((1, 8, 8, 8, 4), 5),    # 5^3 stem shape
])
def test_conv3d_pallas_forward(shape, k):
    from neural_marionette_tpu.ops.pallas.conv3d_kernel import conv3d_pallas
    g = np.random.default_rng(0)
    cin, cout = shape[-1], 8
    x = jnp.asarray(g.normal(size=shape), jnp.float32)
    w = jnp.asarray(g.normal(size=(k, k, k, cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(g.normal(size=(cout,)) * 0.1, jnp.float32)
    ref = _conv_ref(x, w, b)
    out = conv3d_pallas(x, w, b)
    # kernel computes in bf16 with f32 accumulation
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=0.05 * float(jnp.abs(ref).max()))


def test_conv3d_pallas_z_boundaries():
    """Each grid program covers one z-plane with kd shifted views of the
    same array; verify boundary planes (where SAME-padding contributes)
    exactly, with strongly z-asymmetric content."""
    from neural_marionette_tpu.ops.pallas.conv3d_kernel import conv3d_pallas
    g = np.random.default_rng(1)
    x = jnp.asarray(g.normal(size=(1, 6, 8, 8, 16))
                    * np.arange(1, 7)[None, :, None, None, None],
                    jnp.float32)
    w = jnp.asarray(g.normal(size=(3, 3, 3, 16, 8)) * 0.1, jnp.float32)
    b = jnp.zeros((8,), jnp.float32)
    ref = _conv_ref(x, w, b)
    out = conv3d_pallas(x, w, b)
    for z in (0, 5):  # boundary planes
        np.testing.assert_allclose(
            np.asarray(out[:, z]), np.asarray(ref[:, z]), rtol=0,
            atol=0.05 * float(jnp.abs(ref).max()))


def test_conv3d_pallas_grads():
    from neural_marionette_tpu.ops.pallas.conv3d_kernel import conv3d_pallas
    g = np.random.default_rng(2)
    x = jnp.asarray(g.normal(size=(1, 8, 8, 8, 16)), jnp.float32)
    w = jnp.asarray(g.normal(size=(3, 3, 3, 16, 8)) * 0.1, jnp.float32)
    b = jnp.asarray(g.normal(size=(8,)) * 0.1, jnp.float32)
    f_p = lambda *a: jnp.sum(jnp.sin(conv3d_pallas(*a)))
    f_r = lambda *a: jnp.sum(jnp.sin(_conv_ref(*a)))
    gp = jax.grad(f_p, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(f_r, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=0,
            atol=0.02 * float(jnp.abs(r).max()) + 1e-5)


def test_conv_module_routes_through_pallas(monkeypatch):
    """The flax Conv drop-in produces the same output (to bf16 tolerance)
    and the same param tree whether it routes through the Pallas kernel
    or XLA (TPU-only routing is forced on here)."""
    from neural_marionette_tpu.models import blocks
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 8, 4)),
                    jnp.float32)
    m = blocks.Res3DBlock(8)
    params = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(params, x)
    monkeypatch.setattr(
        blocks, "_pallas_conv_applicable",
        lambda mod, v: (v.ndim == 5 and len(mod.kernel_size) == 3
                        and mod.kernel_size[0] == 3))
    out = m.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0,
        atol=0.05 * float(jnp.abs(ref).max()))


# ---------------------------------------------------------------- chamfer

def _jnp_chamfer_num(kp, occ_flat, G):
    """The losses.py jnp formulation, reduced to the kernel's contract."""
    import jax
    from neural_marionette_tpu.ops.coords import coord_maps
    V = coord_maps((G, G, G), jnp.float32).reshape(-1, 3)
    v2 = jnp.sum(V * V, axis=-1)
    dots = jnp.einsum("vc,mkc->mvk", V, kp,
                      precision=jax.lax.Precision.HIGHEST)
    c2 = jnp.sum(kp * kp, axis=-1)
    dmin = v2[None] + jnp.min(c2[:, None, :] - 2.0 * dots, axis=-1)
    return jnp.sum(jnp.maximum(dmin, 0.0) * occ_flat, axis=-1)


def test_chamfer_kernel_value_and_grads():
    import jax
    from neural_marionette_tpu.ops.pallas.chamfer_kernel import \
        chamfer_num_pallas
    G, M, K = 32, 3, 6
    rng = np.random.default_rng(0)
    kp = jnp.asarray(rng.uniform(-0.9, 0.9, (M, K, 3)).astype(np.float32))
    occ = jnp.asarray((rng.random((M, G ** 3)) < 0.05).astype(np.float32))

    ref = _jnp_chamfer_num(kp, occ, G)
    got = chamfer_num_pallas(kp, occ, G)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)

    w = jnp.arange(1.0, M + 1.0)
    gk_ref, go_ref = jax.grad(
        lambda a, b: jnp.sum(_jnp_chamfer_num(a, b, G) * w),
        argnums=(0, 1))(kp, occ)
    gk, go = jax.grad(
        lambda a, b: jnp.sum(chamfer_num_pallas(a, b, G) * w),
        argnums=(0, 1))(kp, occ)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref),
                               rtol=1e-5, atol=1e-4)
    # atol 4e-6: the kernel's VPU FMA chain reassociates the fp32
    # v.c sum vs the oracle einsum; near relu/min boundaries one ulp of
    # dmin moves g*relu(dmin) by ~1e-6
    np.testing.assert_allclose(np.asarray(go), np.asarray(go_ref),
                               rtol=1e-5, atol=4e-6)


def test_chamfer_kernel_matches_volume_fitting_loss():
    """End-to-end: the kernel path == volume_fitting_loss's chamfer (the
    routing is TPU-only; here both forms are exercised explicitly)."""
    from neural_marionette_tpu.ops.losses import volume_fitting_loss
    from neural_marionette_tpu.ops.pallas.chamfer_kernel import \
        chamfer_num_pallas
    G, B, T, K = 16, 2, 3, 5
    rng = np.random.default_rng(1)
    seq = jnp.asarray((rng.random((B, T, G, G, G, 1)) < 0.1)
                      .astype(np.float32))
    keypoints = jnp.asarray(
        rng.uniform(-0.9, 0.9, (B, T, K, 4)).astype(np.float32))

    ref = volume_fitting_loss(seq, keypoints, [0.1] * K, "chamfer")
    kp = keypoints[..., :3].reshape(B * T, K, 3)
    occ = seq[..., 0].reshape(B * T, G ** 3)
    num = chamfer_num_pallas(kp, occ, G).reshape(B, T)
    den = jnp.maximum(jnp.sum(occ, axis=-1).reshape(B, T), 1.0)
    np.testing.assert_allclose(np.asarray(num / den), np.asarray(ref),
                               rtol=1e-5, atol=1e-7)


def test_chamfer_kernel_padded_k_and_intensity_column():
    """K not a multiple of 8 pads with sentinels that never win the min;
    occupancy dtype bf16 is accepted."""
    from neural_marionette_tpu.ops.pallas.chamfer_kernel import \
        chamfer_num_pallas
    G, M, K = 16, 2, 9
    rng = np.random.default_rng(2)
    kp = jnp.asarray(rng.uniform(-0.9, 0.9, (M, K, 3)).astype(np.float32))
    occ = jnp.asarray((rng.random((M, G ** 3)) < 0.2))
    got = chamfer_num_pallas(kp, occ.astype(jnp.bfloat16), G)
    ref = _jnp_chamfer_num(kp, occ.astype(jnp.float32), G)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4)


def test_fusedstage_kernel_matches_xla_decomposition():
    """Fused conv3d+GN+LeakyReLU stage (the round-5 megakernel measurement
    artifact) stays numerically pinned to the XLA decomposition it races.
    Interpret mode; the Mosaic-safe formulation (8x128-padded stats
    blocks, indicator-matmul group reduction) compiled and matched on
    hardware at 4.76e-3 = bf16 cast (BASELINE.md r5)."""
    from neural_marionette_tpu.ops.pallas.fusedstage_kernel import (
        fused_stage, reference_stage)
    g = np.random.default_rng(0)
    F, G, C = 2, 8, 32
    x = jnp.asarray(g.normal(0, 1, (F, G, G, G, C)), jnp.bfloat16)
    w = jnp.asarray(g.normal(0, 0.05, (3, 3, 3, C, C)), jnp.float32)
    b = jnp.asarray(g.normal(0, 0.1, (C,)), jnp.float32)
    sc = jnp.asarray(g.normal(1, 0.1, (C,)), jnp.float32)
    bi = jnp.asarray(g.normal(0, 0.1, (C,)), jnp.float32)
    got = np.asarray(fused_stage(x, w, b, sc, bi), np.float32)
    want = np.asarray(reference_stage(x, w, b, sc, bi), np.float32)
    scale = max(np.max(np.abs(want)), 1e-6)
    assert np.max(np.abs(got - want)) / scale < 2e-2  # bf16 output cast
