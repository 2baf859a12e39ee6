"""Shape / jit / behavior tests for model components on a tiny 16^3 grid."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_marionette_tpu.config import MarionetteConfig
from neural_marionette_tpu.models import (
    Hourglass, KyptDetector, HSVRNNBVH, NeuralMarionette, SkeletonArrays)


def tiny_cfg(**kw):
    base = dict(grid_size=32, nkeypoints=6, input_dim=3, Ttot=4, Tcond=2,
                nlatent_kypt=16, nhidden_kypt=32, const_intensity=3,
                affinity_ver=3, nneighbor=2, gaussian_sigma=1.5,
                feat_dim=32)
    base.update(kw)
    return MarionetteConfig(**base)


@pytest.fixture(scope="module")
def voxseq():
    g = np.random.default_rng(0)
    pts = g.uniform(-0.9, 0.9, size=(2, 4, 64, 3)).astype(np.float32)
    from neural_marionette_tpu.ops import voxelize_jnp
    return voxelize_jnp(jnp.asarray(pts), 32)  # (2, 4, 32, 32, 32, 1)


def test_hourglass_shape():
    hg = Hourglass(output_channels=16, N=16)
    x = jnp.zeros((2, 16, 16, 16, 16))
    params = hg.init(jax.random.PRNGKey(0), x)
    y = hg.apply(params, x)
    assert y.shape == x.shape


def test_hourglass_odd_size():
    # grid 48 -> N=12 exercises output_padding paths
    hg = Hourglass(output_channels=16, N=12)
    x = jnp.zeros((1, 12, 12, 12, 16))
    params = hg.init(jax.random.PRNGKey(0), x)
    assert hg.apply(params, x).shape == x.shape


def test_detector_forward_shapes(voxseq):
    cfg = tiny_cfg()
    det = KyptDetector(cfg)
    params = det.init(jax.random.PRNGKey(0), voxseq)
    out = det.apply(params, voxseq)
    B, T, G = 2, 4, 32
    K, g = cfg.nkeypoints, G // 4
    assert out["recon"].shape == (B, T, G, G, G, 1)
    assert out["keypoints"].shape == (B, T, K, 4)
    assert out["heatmaps"].shape == (B, T, g, g, g, K)
    assert out["affinity"].shape == (cfg.nneighbor, K, K, 1)
    assert out["first_feature"].shape == (B, g, g, g, cfg.feat_dim)
    # recon is a valid probability
    r = np.asarray(out["recon"])
    assert r.min() >= 0.0 and r.max() <= 1.0
    # keypoint coords in [-1, 1], intensity in [0, 1]
    kp = np.asarray(out["keypoints"])
    assert np.all(np.abs(kp[..., :3]) <= 1.0)
    assert np.all((kp[..., 3] >= 0) & (kp[..., 3] <= 1.0 + 1e-5))
    for name in ["recon_loss", "sparsity_loss", "separation_loss",
                 "vol_fit_reg", "local_const_loss", "time_const_loss",
                 "sparsity_const_loss", "graph_traj_loss"]:
        assert out[name].shape == (), name
        assert np.isfinite(float(out[name])), name


def test_detector_affinity_inactive(voxseq):
    cfg = tiny_cfg()
    det = KyptDetector(cfg)
    params = det.init(jax.random.PRNGKey(0), voxseq)
    out = det.apply(params, voxseq, affinity_active=False)
    assert out["affinity"] is None
    assert float(out["local_const_loss"]) == 0.0
    assert float(out["graph_traj_loss"]) == 0.0


def test_affinity_ver3_structure(voxseq):
    cfg = tiny_cfg()
    det = KyptDetector(cfg)
    params = det.init(jax.random.PRNGKey(0), voxseq)
    aff = det.apply(params, method=lambda m: m.get_affinity())
    K = cfg.nkeypoints
    a = np.asarray(aff)[..., 0]
    assert a.shape == (2, K, K)
    # zero diagonal, rows sum to 1 (softmax over K-1 redistributed)
    np.testing.assert_allclose(np.diagonal(a, axis1=1, axis2=2), 0,
                               atol=1e-7)
    np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-5)


@pytest.mark.parametrize("ver", [0, 1, 2])
def test_affinity_other_versions(ver):
    cfg = tiny_cfg(affinity_ver=ver)
    det = KyptDetector(cfg)
    x = jnp.zeros((1, 2, 32, 32, 32, 1))
    params = det.init(jax.random.PRNGKey(0), x)
    aff = np.asarray(det.apply(params, method=lambda m: m.get_affinity()))
    assert aff.shape == (2, cfg.nkeypoints, cfg.nkeypoints, 1)
    assert np.isfinite(aff).all()


def test_affinity_ver4_gumbel():
    cfg = tiny_cfg(affinity_ver=4, graph_random_init=1)
    det = KyptDetector(cfg)
    x = jnp.zeros((1, 2, 32, 32, 32, 1))
    params = det.init({"params": jax.random.PRNGKey(0),
                       "gumbel": jax.random.PRNGKey(1)}, x)
    K = cfg.nkeypoints
    a = np.asarray(det.apply(params, method=lambda m: m.get_affinity(),
                             rngs={"gumbel": jax.random.PRNGKey(2)}))[..., 0]
    b = np.asarray(det.apply(params, method=lambda m: m.get_affinity(),
                             rngs={"gumbel": jax.random.PRNGKey(3)}))[..., 0]
    np.testing.assert_allclose(np.diagonal(a, axis1=1, axis2=2), 0,
                               atol=1e-7)
    np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-5)
    assert not np.allclose(a, b)  # stochastic across rng keys


def test_const_intensity_modes(voxseq):
    for ci in [0, 1, 2, 4]:
        cfg = tiny_cfg(const_intensity=ci)
        det = KyptDetector(cfg)
        params = det.init(jax.random.PRNGKey(0), voxseq)
        out = det.apply(params, voxseq)
        assert out["keypoints"].shape == (2, 4, cfg.nkeypoints, 4), ci


def test_dynamics_encode_shapes():
    cfg = tiny_cfg()
    K = cfg.nkeypoints
    dyn = HSVRNNBVH(cfg)
    kp = jnp.asarray(np.random.default_rng(1).uniform(
        -1, 1, size=(2, 4, K, 4)), dtype=jnp.float32)
    sk = SkeletonArrays.chain(K)
    params = dyn.init({"params": jax.random.PRNGKey(0),
                       "sample": jax.random.PRNGKey(1)},
                      kp, sk, method=HSVRNNBVH.encode)
    out = dyn.apply(params, kp, sk, method=HSVRNNBVH.encode,
                    rngs={"sample": jax.random.PRNGKey(2)})
    assert out["kypt_recon"].shape == (2, 4, K, 4)
    assert out["R"].shape == (2, 4, K, 3, 3)
    assert out["z_kypts"].shape == (2, 4, cfg.nlatent_kypt)
    assert out["h_kypts"].shape == (2, 5, cfg.nhidden_kypt)
    assert np.isfinite(float(out["kl_kypt"]))
    assert np.isfinite(float(out["kypt_recon_loss"]))
    # rotations orthonormal
    R = np.asarray(out["R"]).reshape(-1, 3, 3)
    np.testing.assert_allclose(R @ np.swapaxes(R, 1, 2),
                               np.broadcast_to(np.eye(3), R.shape), atol=1e-4)


def test_dynamics_generate_shapes():
    cfg = tiny_cfg()
    K = cfg.nkeypoints
    dyn = HSVRNNBVH(cfg)
    kp = jnp.asarray(np.random.default_rng(1).uniform(
        -1, 1, size=(2, 2, K, 4)), dtype=jnp.float32)
    sk = SkeletonArrays.chain(K)
    params = dyn.init({"params": jax.random.PRNGKey(0),
                       "sample": jax.random.PRNGKey(1)},
                      kp, sk, method=HSVRNNBVH.encode)
    out = dyn.apply(params, kp, sk, Ttot=5, Tcond=2,
                    method=HSVRNNBVH.generate,
                    rngs={"sample": jax.random.PRNGKey(2)})
    assert out["keypoints_cond"].shape == (2, 2, K, 4)
    assert out["keypoints_gen"].shape == (2, 3, K, 4)


def test_best_of_n_improves_fit():
    """More samples should (weakly) reduce the distance of the best sample."""
    cfg = tiny_cfg()
    K = cfg.nkeypoints
    dyn = HSVRNNBVH(cfg)
    kp = jnp.asarray(np.random.default_rng(3).uniform(
        -0.5, 0.5, size=(4, 4, K, 4)), dtype=jnp.float32)
    sk = SkeletonArrays.chain(K)
    params = dyn.init({"params": jax.random.PRNGKey(0),
                       "sample": jax.random.PRNGKey(1)},
                      kp, sk, method=HSVRNNBVH.encode)
    losses = []
    for s in [1, 64]:
        out = dyn.apply(params, kp, sk, sample_num=s,
                        method=HSVRNNBVH.encode,
                        rngs={"sample": jax.random.PRNGKey(5)})
        losses.append(float(out["kypt_recon_loss"]))
    assert losses[1] <= losses[0]


def test_marionette_forward_and_generate(voxseq):
    cfg = tiny_cfg()
    model = NeuralMarionette(cfg)
    sk = SkeletonArrays.chain(cfg.nkeypoints)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = model.init(rngs, voxseq, detector_active=True,
                        learner_active=True, skeleton=sk)
    out = model.apply(params, voxseq, detector_active=True,
                      learner_active=True, skeleton=sk,
                      rngs={"sample": jax.random.PRNGKey(2)})
    assert "recon" in out and "kypt_recon" in out

    gen = model.apply(params, voxseq, sk, method=NeuralMarionette.generate,
                      rngs={"sample": jax.random.PRNGKey(3)})
    assert gen["gen"].shape == voxseq.shape
    assert gen["keypoints"].shape == (2, 4, cfg.nkeypoints, 4)


def test_marionette_jit_and_grad(voxseq):
    """Loss differentiates through the full detector+dynamics stack."""
    cfg = tiny_cfg()
    model = NeuralMarionette(cfg)
    sk = SkeletonArrays.chain(cfg.nkeypoints)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "sample": jax.random.PRNGKey(1)},
                        voxseq, detector_active=True, learner_active=True,
                        skeleton=sk)

    @jax.jit
    def loss_fn(p, x):
        out = model.apply(p, x, detector_active=True, learner_active=True,
                          skeleton=sk, rngs={"sample": jax.random.PRNGKey(2)})
        return (100.0 * out["recon_loss"] + 5.0 * out["sparsity_loss"]
                + out["kypt_recon_loss"] + 0.003 * out["kl_kypt"])

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params, voxseq)
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least the detector conv kernels get nonzero gradient
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    nonzero = [np.abs(np.asarray(v)).max() for p, v in flat
               if "kypt_detector" in jax.tree_util.keystr(p)]
    assert max(nonzero) > 0


def test_learned_sigma(voxseq):
    """fixed_sigma=0: per-keypoint learned sigmas (sigmoid * 2*base)."""
    cfg = tiny_cfg(fixed_sigma=0)
    det = KyptDetector(cfg)
    params = det.init(jax.random.PRNGKey(0), voxseq)
    assert "sigmas" in params["params"]["vox_to_kypt"]
    out = det.apply(params, voxseq)
    assert out["keypoints"].shape == (2, 4, cfg.nkeypoints, 4)
    sig = det.apply(params, method=lambda m: m.vox_to_kypt.sigmas())
    s = np.asarray(sig)
    assert s.shape == (cfg.nkeypoints,)
    assert np.all(s > 0) and np.all(s < 2 * cfg.gaussian_sigma)


def test_interpolate_scan_matches_eager_oracle():
    """The scanned/jittable interpolate must reproduce the step-by-step
    eager transcription of the reference loop exactly (same rng stream,
    same anchor-collapse and retroactive-selection semantics)."""
    cfg = tiny_cfg()
    K = cfg.nkeypoints
    T = 8  # anchors at 0, 3, 6, 7 with anchor_rate=3
    dyn = HSVRNNBVH(cfg)
    kp = jnp.asarray(np.random.default_rng(7).uniform(
        -0.5, 0.5, size=(1, T, K, 4)), dtype=jnp.float32)
    sk = SkeletonArrays.chain(K)
    params = dyn.init({"params": jax.random.PRNGKey(0),
                       "sample": jax.random.PRNGKey(1)},
                      kp, sk, method=HSVRNNBVH.encode)

    kwargs = dict(anchor_rate=3, sample_num=16)
    rngs = {"sample": jax.random.PRNGKey(11)}
    eager = dyn.apply(params, kp, sk, method=HSVRNNBVH._interpolate_eager,
                      rngs=rngs, **kwargs)
    scanned = jax.jit(lambda p, k: dyn.apply(
        p, k, sk, method=HSVRNNBVH.interpolate, rngs=rngs, **kwargs))(
        params, kp)
    assert scanned.shape == (1, T, K, 4)
    # atol: the pointer-doubling FK's matmul chain fuses differently under
    # jit than eager op-by-op (observed 1.3e-6 max abs); semantic errors
    # (wrong sample selection / anchor collapse) would be O(0.1)
    np.testing.assert_allclose(np.asarray(scanned), np.asarray(eager),
                               rtol=0, atol=1e-5)


def test_coord_split_stem_equivalence():
    """The coord-split stem (Basic3DBlock.split_coords) is the SAME
    function as conv-on-concat: identical param tree, outputs equal,
    gradients equal.  The decomposition only changes WHERE the constant
    coordinate channels enter (one broadcast frame vs per batch row)."""
    from neural_marionette_tpu.models.blocks import Basic3DBlock
    from neural_marionette_tpu.ops import add_coord_channels

    g = np.random.default_rng(3)
    x = jnp.asarray(g.normal(size=(4, 8, 8, 8, 2)).astype(np.float32))
    xc = add_coord_channels(x)  # (4, 8, 8, 8, 5)

    plain = Basic3DBlock(16, 5)
    split = Basic3DBlock(16, 5, split_coords=True)
    p1 = plain.init(jax.random.PRNGKey(0), xc)
    p2 = split.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p1) == \
        jax.tree_util.tree_structure(p2)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    y1 = plain.apply(p1, xc)
    y2 = split.apply(p1, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)

    g1 = jax.grad(lambda p: jnp.sum(plain.apply(p, xc) ** 2))(p1)
    g2 = jax.grad(lambda p: jnp.sum(split.apply(p, x) ** 2))(p1)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        # f32 reassociation only: conv-over-5ch vs split 2ch+3ch partial
        # sums (grads here are O(1e3), so rtol is the meaningful bound)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-2, rtol=1e-4)


def test_featurenet_strip_front_equivalence():
    """The strip-packed encoder front (stem + pool lane-packed,
    coord-split one-frame field) computes the SAME function as the plain
    path: identical param tree, matching outputs and parameter grads.

    The grad comparison runs in float64: in f32 the strip path's
    different conv partial-sum order leaves ~3e-4 reassociation noise
    after the deep encoder (measured), which would force tolerances too
    loose to catch real bugs.  f64 collapses true equivalence to ~1e-10.
    """
    from neural_marionette_tpu.models.detector import FeatureNet

    g = np.random.default_rng(5)
    x = jnp.asarray((g.uniform(size=(2, 32, 32, 32, 1)) < 0.2)
                    .astype(np.float32))
    plain = FeatureNet(32, 32, split_coords=True, use_strip=False)
    strip = FeatureNet(32, 32, split_coords=True, use_strip=True)
    p1 = plain.init(jax.random.PRNGKey(0), x)
    p2 = strip.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p1) == \
        jax.tree_util.tree_structure(p2)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    y1 = plain.apply(p1, x)
    y2 = strip.apply(p1, x)
    assert y1.shape == y2.shape
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               atol=2e-5, rtol=1e-5)

    with jax.enable_x64(True):
        plain64 = FeatureNet(32, 32, split_coords=True, use_strip=False,
                             dtype=jnp.float64)
        strip64 = FeatureNet(32, 32, split_coords=True, use_strip=True,
                             dtype=jnp.float64)
        p64 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), p1)
        x64 = jnp.asarray(np.asarray(x), jnp.float64)
        y1 = plain64.apply(p64, x64)
        y2 = strip64.apply(p64, x64)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   atol=1e-12, rtol=1e-12)
        g1 = jax.grad(lambda p: jnp.mean(plain64.apply(p, x64) ** 2))(p64)
        g2 = jax.grad(lambda p: jnp.mean(strip64.apply(p, x64) ** 2))(p64)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-10, rtol=1e-10)


def test_frame_chunked_forward_matches_unchunked(voxseq):
    """frame_chunk splits the folded (B*T) conv axis into head+tail calls;
    frames are independent through the stacks so outputs must match the
    single-call path (VERDICT r3 #2: the 128-lane padding-cliff fix)."""
    cfg0 = tiny_cfg(frame_chunk=0)
    cfg3 = tiny_cfg(frame_chunk=3)   # B*T = 8 -> head 6 + tail 2
    det0, det3 = KyptDetector(cfg0), KyptDetector(cfg3)
    params = det0.init(jax.random.PRNGKey(0), voxseq)
    out0 = det0.apply(params, voxseq)
    out3 = det3.apply(params, voxseq)  # same params: chunking is not
    # allowed to change the parameter tree
    for k in ["recon", "keypoints", "heatmaps", "first_feature"]:
        np.testing.assert_allclose(np.asarray(out0[k]), np.asarray(out3[k]),
                                   rtol=2e-5, atol=2e-5, err_msg=k)

    # gradient path through both chunks
    def loss(p):
        return det3.apply(p, voxseq)["recon_loss"]
    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
