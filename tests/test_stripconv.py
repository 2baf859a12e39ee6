"""Strip-packed conv pipeline (ops/stripconv.py): exact equivalence with
the plain conv/GN/upsample ops, and VoxelDecoder path interchangeability
(same parameter tree, same outputs, same gradients).

The strip form exists for the TPU MXU (S*Cout = full 128-lane tiles,
3.1x the plain conv3d on hardware — BASELINE.md); on CPU it is gated off
by default (strip_decoder=-1 auto), so these tests force it on.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_marionette_tpu.ops.stripconv import (
    pack_strips, unpack_strips, strip_conv3, strip_conv3_split,
    strip_group_norm, strip_group_norm_fast, upsample2_packed,
    strip_weights)
from neural_marionette_tpu.ops.upsample import upsample2_trilinear
from neural_marionette_tpu.models.detector import VoxelDecoder


def rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed)
                       .normal(size=shape).astype(np.float32))


def test_pack_roundtrip():
    x = rand((2, 8, 4, 4, 6))
    for S in (1, 2, 4):
        np.testing.assert_array_equal(
            np.asarray(unpack_strips(pack_strips(x, S), S)), np.asarray(x))


@pytest.mark.parametrize("S,Cin,Cout", [(2, 8, 8), (4, 8, 4), (1, 6, 5)])
def test_strip_conv3_matches_conv3d(S, Cin, Cout):
    x = rand((2, 8, 6, 6, Cin), seed=1)
    k = rand((3, 3, 3, Cin, Cout), seed=2) * 0.2
    b = rand((Cout,), seed=3)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
    out = unpack_strips(strip_conv3(pack_strips(x, S), k, b, S), S)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)
    # assembly-free split form: identical math, no windowed tensor
    out2 = unpack_strips(strip_conv3_split(pack_strips(x, S), k, b, S), S)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               atol=1e-5)


def test_strip_conv1x1_and_pool2():
    from neural_marionette_tpu.ops.stripconv import (strip_conv1x1,
                                                     strip_pool2)
    x = rand((2, 8, 8, 8, 6), seed=9)
    k1 = rand((1, 1, 1, 6, 10), seed=10) * 0.3
    b1 = rand((10,), seed=11)
    ref = jax.lax.conv_general_dilated(
        x, k1, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b1
    out = unpack_strips(strip_conv1x1(pack_strips(x, 2), k1, b1, 2), 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    k2 = rand((2, 2, 2, 6, 4), seed=12) * 0.3
    b2 = rand((4,), seed=13)
    ref2 = jax.lax.conv_general_dilated(
        x, k2, (2, 2, 2), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b2
    for S in (2, 4):
        out2 = unpack_strips(strip_pool2(pack_strips(x, S), k2, b2, S), S)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                                   atol=1e-5)


def test_strip_conv3_toeplitz_matches_conv3d():
    from neural_marionette_tpu.ops.stripconv import strip_conv3_toeplitz
    x = rand((2, 8, 8, 8, 5), seed=30)
    k = rand((3, 3, 3, 5, 7), seed=31) * 0.3
    b = rand((7,), seed=32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
    for S in (1, 2, 4):
        out = unpack_strips(strip_conv3_toeplitz(pack_strips(x, S), k, b, S),
                            S)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)


def test_strip_convk_split_k5_matches_conv3d():
    from neural_marionette_tpu.ops.stripconv import strip_convk_split
    x = rand((2, 8, 8, 8, 4), seed=20)
    k5 = rand((5, 5, 5, 4, 8), seed=21) * 0.2
    b5 = rand((8,), seed=22)
    ref = jax.lax.conv_general_dilated(
        x, k5, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b5
    for S in (2, 4):   # h=2 <= S
        out = unpack_strips(strip_convk_split(pack_strips(x, S), k5, b5, S),
                            S)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)
    # k=3 reduces to the tested split form
    k3 = rand((3, 3, 3, 4, 8), seed=23) * 0.2
    ref3 = jax.lax.conv_general_dilated(
        x, k3, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    out3 = unpack_strips(strip_convk_split(pack_strips(x, 4), k3, None, 4),
                         4)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(ref3),
                               atol=1e-4)


def test_strip_weights_zero_structure():
    k = rand((3, 3, 3, 2, 3), seed=4)
    T = strip_weights(k, 4)  # (3, 3, 24, 12)
    # output plane j only reads window slots j..j+2
    T6 = np.asarray(T).reshape(3, 3, 6, 2, 4, 3)
    for d in range(6):
        for j in range(4):
            blk = T6[:, :, d, :, j, :]
            if 0 <= d - j <= 2:
                np.testing.assert_array_equal(blk, np.asarray(k[d - j]))
            else:
                assert (blk == 0).all()


def test_upsample2_packed_matches_trilinear():
    x = rand((2, 8, 6, 6, 8), seed=5)
    for S in (1, 2, 4):
        up = upsample2_packed(pack_strips(x, S), S)
        ref = pack_strips(upsample2_trilinear(x), 2 * S)
        np.testing.assert_allclose(np.asarray(up), np.asarray(ref),
                                   atol=1e-6)


def test_strip_group_norm_matches_flax():
    import flax.linen as nn
    x = rand((2, 8, 5, 5, 16), seed=6)
    gn = nn.GroupNorm(num_groups=4, epsilon=1e-5)
    params = gn.init(jax.random.PRNGKey(0), x)
    sc = params["params"]["scale"] + 0.3
    bi = params["params"]["bias"] - 0.1
    ref = gn.apply({"params": {"scale": sc, "bias": bi}}, x)
    for S in (2, 4):
        xp = pack_strips(x, S)
        for fn in (strip_group_norm, strip_group_norm_fast):
            out = unpack_strips(fn(xp, sc, bi, 4, S), S)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-5, err_msg=fn.__name__)


def test_voxel_decoder_strip_equivalence():
    """Same params (identical tree), same forward, same gradients."""
    x = rand((2, 8, 8, 8, 32), seed=7)
    plain = VoxelDecoder(feat_dim=32, use_strip=False)
    strip = VoxelDecoder(feat_dim=32, use_strip=True)
    p1 = plain.init(jax.random.PRNGKey(0), x)
    p2 = strip.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p1) == \
        jax.tree_util.tree_structure(p2)
    for v1, v2 in zip(jax.tree_util.tree_leaves(p1),
                      jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))

    y1, y2 = plain.apply(p1, x), strip.apply(p1, x)
    assert y2.shape == y1.shape == (2, 32, 32, 32, 1)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=3e-5)

    g1 = jax.grad(lambda p: jnp.sum(plain.apply(p, x) ** 2))(p1)
    g2 = jax.grad(lambda p: jnp.sum(strip.apply(p, x) ** 2))(p1)
    for v1, v2 in zip(jax.tree_util.tree_leaves(g1),
                      jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   atol=2e-3, rtol=1e-3)

    # remat variant identical too
    y3 = VoxelDecoder(feat_dim=32, use_strip=True,
                      remat_stages=True).apply(p1, x)
    np.testing.assert_allclose(np.asarray(y3), np.asarray(y2), atol=1e-6)
