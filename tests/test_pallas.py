"""Pallas kernel tests (interpret mode on the CPU test backend; the same
code compiles via Mosaic on TPU — validated on hardware, see BASELINE.md)."""
import numpy as np
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
