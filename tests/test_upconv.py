"""Fused upsample+conv (ops/upconv.py) vs the two-op reference."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_marionette_tpu.ops.upconv import upconv2_trilinear, _upconv_nd
from neural_marionette_tpu.ops.upsample import upsample2_trilinear


def rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape, np.float32))


def ref_upconv(x, k, b):
    y = jax.lax.conv_general_dilated(
        upsample2_trilinear(x), k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + b


@pytest.mark.parametrize("shape,cin,cout", [
    ((2, 4, 4, 4, 5), 5, 7),
    ((1, 8, 4, 2, 3), 3, 4),   # anisotropic, incl. minimum dim 2
    ((1, 2, 2, 2, 2), 2, 2),   # all dims minimal: fixes overlap-free
])
def test_upconv2_matches_upsample_then_conv(shape, cin, cout):
    x = rand(shape, seed=1)
    k = rand((3, 3, 3, cin, cout), seed=2) * 0.3
    b = rand((cout,), seed=3)
    out = upconv2_trilinear(x, k, b)
    ref = ref_upconv(x, k, b)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_upconv_1d_2d_building_blocks():
    # 1D: (N, s, Cin)
    x = rand((3, 6, 4), seed=10)
    W = rand((3, 4, 5), seed=11) * 0.3
    out = _upconv_nd(x, W, 1, 1)
    # reference: upsample along axis then k=3 conv1d SAME
    from neural_marionette_tpu.ops.upsample import _interp_matrix
    U = _interp_matrix(6, "float32")
    y = jnp.einsum("Ss,nsc->nSc", U, x)
    ref = jax.lax.conv_general_dilated(
        y, W, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    # 2D
    x2 = rand((2, 4, 5, 3), seed=12)
    W2 = rand((3, 3, 3, 4), seed=13) * 0.3
    out2 = _upconv_nd(x2, W2, 2, 2)
    Uh = _interp_matrix(4, "float32")
    Uw = _interp_matrix(5, "float32")
    y2 = jnp.einsum("Hh,nhwc->nHwc", Uh, x2)
    y2 = jnp.einsum("Ww,nhwc->nhWc", Uw, y2)
    ref2 = jax.lax.conv_general_dilated(
        y2, W2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=1e-4)


def test_voxel_decoder_upconv_equivalence():
    """use_upconv routes stage 2 through the fused op: identical param
    tree, same forward and gradients as the two-op plain decoder."""
    from neural_marionette_tpu.models.detector import VoxelDecoder
    x = rand((2, 8, 8, 8, 32), seed=7)
    plain = VoxelDecoder(feat_dim=32, use_strip=False, use_upconv=False)
    fused = VoxelDecoder(feat_dim=32, use_strip=False, use_upconv=True)
    p1 = plain.init(jax.random.PRNGKey(0), x)
    p2 = fused.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p1) == \
        jax.tree_util.tree_structure(p2)
    for v1, v2 in zip(jax.tree_util.tree_leaves(p1),
                      jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))

    y1, y2 = plain.apply(p1, x), fused.apply(p1, x)
    assert y2.shape == y1.shape == (2, 32, 32, 32, 1)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=3e-5)

    g1 = jax.grad(lambda p: jnp.sum(plain.apply(p, x) ** 2))(p1)
    g2 = jax.grad(lambda p: jnp.sum(fused.apply(p, x) ** 2))(p1)
    for v1, v2 in zip(jax.tree_util.tree_leaves(g1),
                      jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   atol=2e-3, rtol=1e-3)

    # remat variant identical to the non-remat fused path
    y3 = VoxelDecoder(feat_dim=32, use_strip=False, use_upconv=True,
                      remat_stages=True).apply(p1, x)
    np.testing.assert_allclose(np.asarray(y3), np.asarray(y2), atol=1e-6)


def test_upconv_grad_flows():
    x = rand((1, 4, 4, 4, 3), seed=20)
    k = rand((3, 3, 3, 3, 2), seed=21) * 0.3

    def f(kk):
        return jnp.sum(jnp.square(upconv2_trilinear(x, kk)))

    def f_ref(kk):
        return jnp.sum(jnp.square(ref_upconv(x, kk, jnp.zeros(2))))

    g = jax.grad(f)(k)
    g_ref = jax.grad(f_ref)(k)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=1e-3, rtol=1e-4)


@pytest.mark.parametrize("shape,cin,cout", [
    ((2, 4, 4, 4, 5), 5, 7),
    ((1, 8, 4, 2, 3), 3, 4),
    ((1, 2, 2, 2, 2), 2, 2),
])
def test_packed_upconv_matches_fine(shape, cin, cout):
    """parity_unshuffle(packed) == the fine upconv == upsample-then-conv.

    The packed form computes the identical conv + boundary fixes, just
    before the pixel shuffle (fixes land on coarse planes), so the match
    is exact up to summation order."""
    from neural_marionette_tpu.ops.upconv import (parity_unshuffle,
                                                  upconv2_trilinear_packed)
    x = rand(shape, seed=21)
    k = rand((3, 3, 3, cin, cout), seed=22) * 0.3
    b = rand((cout,), seed=23)
    packed = upconv2_trilinear_packed(x, k, b)
    assert packed.shape == shape[:4] + (8 * cout,)
    out = parity_unshuffle(packed)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(upconv2_trilinear(x, k, b)),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref_upconv(x, k, b)),
                               atol=1e-4, rtol=1e-4)


def test_packed_groupnorm_on_parity_layout():
    """strip_group_norm_fast with S=8 on the parity-packed layout ==
    flax GroupNorm on the unshuffled fine tensor."""
    import flax.linen as nn
    from neural_marionette_tpu.ops.upconv import (parity_unshuffle,
                                                  upconv2_trilinear_packed)
    from neural_marionette_tpu.ops.stripconv import strip_group_norm_fast

    cin, cout, groups = 4, 32, 2
    x = rand((2, 4, 4, 4, cin), seed=31)
    k = rand((3, 3, 3, cin, cout), seed=32) * 0.3
    scale = rand((cout,), seed=33)
    bias = rand((cout,), seed=34)

    packed = upconv2_trilinear_packed(x, k)
    yp = strip_group_norm_fast(packed, scale, bias, groups, S=8)
    got = parity_unshuffle(yp)

    fine = parity_unshuffle(packed)
    gn = nn.GroupNorm(num_groups=groups, epsilon=1e-5)
    ref = gn.apply({"params": {"scale": scale, "bias": bias}}, fine)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
