"""Hybrid-gradient conv (ops/hybridconv): plain forward, strip-packed
weight-gradient — exactness vs plain-conv autodiff in f64."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from neural_marionette_tpu.ops.hybridconv import (conv3d_hybrid,
                                                  hybrid_strip_size,
                                                  _plain_conv)


def _plain_ref(x, kernel, bias):
    return _plain_conv(x, kernel) + bias


@pytest.mark.parametrize("k,Cin,Cout,S,D", [
    (3, 16, 32, 4, 8),   # decoder-shaped: S*Cout = 128
    (3, 8, 64, 2, 8),    # res-block-shaped
    (5, 4, 32, 4, 8),    # k5 stem-shaped (halo 2 <= S)
])
def test_hybrid_grads_exact(k, Cin, Cout, S, D):
    with jax.enable_x64(True):
        g = np.random.default_rng(0)
        x = jnp.asarray(g.standard_normal((3, D, 6, 6, Cin)), jnp.float64)
        w = jnp.asarray(0.1 * g.standard_normal((k, k, k, Cin, Cout)),
                        jnp.float64)
        b = jnp.asarray(0.1 * g.standard_normal((Cout,)), jnp.float64)
        ct = jnp.asarray(g.standard_normal(x.shape[:4] + (Cout,)),
                         jnp.float64)

        y_h = conv3d_hybrid(x, w, b, S)
        y_p = _plain_ref(x, w, b)
        np.testing.assert_allclose(np.asarray(y_h), np.asarray(y_p),
                                   rtol=1e-12, atol=1e-12)

        def loss_h(x, w, b):
            return jnp.sum(conv3d_hybrid(x, w, b, S) * ct)

        def loss_p(x, w, b):
            return jnp.sum(_plain_ref(x, w, b) * ct)

        gh = jax.grad(loss_h, argnums=(0, 1, 2))(x, w, b)
        gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, w, b)
        for a, e, name in zip(gh, gp, ["dx", "dw", "db"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                       rtol=1e-9, atol=1e-9, err_msg=name)


def test_hybrid_strip_size():
    assert hybrid_strip_size(32, 64, 3) == 4
    assert hybrid_strip_size(64, 32, 3) == 2
    assert hybrid_strip_size(32, 64, 5) == 4   # halo 2 <= 4
    assert hybrid_strip_size(128, 64, 3) == 0  # lanes already full
    assert hybrid_strip_size(96, 64, 3) == 0   # unalignable
    assert hybrid_strip_size(64, 7, 3) == 0    # D not divisible
    assert hybrid_strip_size(64, 2, 5) == 2    # halo 2 == S=2 still fits


def test_conv_module_routes_hybrid():
    """blocks.Conv routes through the hybrid path (forced on CPU) with an
    unchanged parameter tree and identical forward + gradients."""
    from neural_marionette_tpu.models.blocks import Conv
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((2, 8, 8, 8, 16)), jnp.float32)
    mod = Conv(32, (3, 3, 3), padding="SAME")

    os.environ["NM_HYBRID_WGRAD_FORCE"] = "1"
    try:
        params = mod.init(jax.random.PRNGKey(0), x)
        y_h = mod.apply(params, x)
        dw_h = jax.grad(
            lambda p: jnp.sum(mod.apply(p, x) ** 2))(params)
    finally:
        del os.environ["NM_HYBRID_WGRAD_FORCE"]
    # plain route (no force, CPU backend): same params, same outputs
    y_p = mod.apply(params, x)
    dw_p = jax.grad(lambda p: jnp.sum(mod.apply(p, x) ** 2))(params)
    np.testing.assert_allclose(np.asarray(y_h), np.asarray(y_p),
                               rtol=1e-6, atol=1e-6)
    # f32 summation-order differences only (f64 exactness proven above)
    for a, e in zip(jax.tree.leaves(dw_h), jax.tree.leaves(dw_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-3, atol=1e-4)


def test_detector_grads_with_hybrid_route():
    """End-to-end: the full detector's parameter gradients are unchanged
    when blocks.Conv routes the stem/res/decoder convs through the hybrid
    path (forced on CPU)."""
    from neural_marionette_tpu.config import MarionetteConfig
    from neural_marionette_tpu.models import KyptDetector
    cfg = MarionetteConfig(
        grid_size=32, nkeypoints=6, input_dim=3, Ttot=2, Tcond=1,
        nlatent_kypt=16, nhidden_kypt=32, const_intensity=3,
        affinity_ver=3, nneighbor=2, feat_dim=32, dataset="synthetic")
    det = KyptDetector(cfg)
    g = np.random.default_rng(0)
    x = jnp.asarray(
        (g.random((1, 2, 32, 32, 32, 1)) < 0.05).astype(np.float32))
    params = det.init(jax.random.PRNGKey(0), x)

    def loss(p):
        out = det.apply(p, x)
        return out["recon_loss"] + out["sparsity_loss"]

    os.environ["NM_HYBRID_WGRAD_FORCE"] = "1"
    try:
        l_h, g_h = jax.value_and_grad(loss)(params)
    finally:
        del os.environ["NM_HYBRID_WGRAD_FORCE"]
    l_p, g_p = jax.value_and_grad(loss)(params)
    assert float(l_h) == pytest.approx(float(l_p), rel=1e-6)
    flat_h = jax.tree_util.tree_leaves_with_path(g_h)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(g_p))
    assert len(flat_h) == len(flat_p)
    for path, leaf in flat_h:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_p[path]),
            rtol=2e-3, atol=1e-5, err_msg=jax.tree_util.keystr(path))
