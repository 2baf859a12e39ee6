"""Native host library (C++) vs NumPy reference paths."""
import numpy as np
import pytest

from neural_marionette_tpu.data import native
from neural_marionette_tpu.data.pipeline import episodic_normalization
from neural_marionette_tpu.ops.voxelize import voxelize_np


@pytest.mark.skipif(not native.available(),
                    reason="native toolchain unavailable")
def test_native_voxelize_matches_numpy():
    g = np.random.default_rng(0)
    pts = g.uniform(-1, 1, size=(5, 1000, 3)).astype(np.float32)
    got = native.voxelize_batch(pts, 32)
    want = np.stack([voxelize_np(pts[f], 32) for f in range(5)])
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not native.available(),
                    reason="native toolchain unavailable")
def test_native_normalize_matches_numpy():
    g = np.random.default_rng(1)
    seq = g.uniform(-5, 9, size=(4, 200, 3)).astype(np.float32)
    joints = g.uniform(-5, 9, size=(4, 6, 3)).astype(np.float32)
    got, gj = native.normalize_episodic(seq, 0.9, 0.1, -0.2, joints=joints)
    want, wj = episodic_normalization(seq.astype(np.float64), 0.9, 0.1,
                                      -0.2, joints=joints)
    np.testing.assert_allclose(got, want, atol=2e-6)
    np.testing.assert_allclose(gj, wj, atol=2e-6)


@pytest.mark.skipif(not native.available(),
                    reason="native toolchain unavailable")
def test_native_normalize_no_joints():
    g = np.random.default_rng(2)
    seq = g.uniform(0, 4, size=(3, 64, 3)).astype(np.float32)
    got = native.normalize_episodic(seq)
    want = episodic_normalization(seq.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=2e-6)
    assert got.min() >= -1.0 - 1e-5 and got.max() <= 1.0 + 1e-5


def test_fallback_works_even_without_native(monkeypatch):
    monkeypatch.setattr(native, "_load", lambda: None)
    g = np.random.default_rng(3)
    pts = g.uniform(-1, 1, size=(2, 100, 3)).astype(np.float32)
    out = native.voxelize_batch(pts, 16)
    assert out.shape == (2, 16, 16, 16, 1)
