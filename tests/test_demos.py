"""End-to-end demo app tests on a tiny model with synthetic data."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_marionette_tpu.config import MarionetteConfig
from neural_marionette_tpu.apps.common import (DemoContext, load_pretrained,
                                               synthetic_clip)
from neural_marionette_tpu.models import NeuralMarionette, SkeletonArrays
from neural_marionette_tpu.retarget import extract_skin_weights, \
    retarget_motion
from neural_marionette_tpu.skeleton import Skeleton


def tiny_ctx(tmp_path=None):
    cfg = MarionetteConfig(
        grid_size=32, nkeypoints=6, input_dim=3, Ttot=6, Tcond=2,
        nlatent_kypt=16, nhidden_kypt=32, const_intensity=3, affinity_ver=3,
        nneighbor=2, feat_dim=32, sample_rate=1, dataset="synthetic")
    model = NeuralMarionette(cfg)
    x = jnp.zeros((1, 2, 32, 32, 32, 1))
    sk = SkeletonArrays.chain(cfg.nkeypoints)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "sample": jax.random.PRNGKey(1)},
                        x, detector_active=True, learner_active=True,
                        skeleton=sk)
    return DemoContext(cfg=cfg, model=model, params=params, skeleton=None)


@pytest.fixture(scope="module")
def ctx():
    return tiny_ctx()


@pytest.fixture(scope="module")
def clip(ctx):
    vox, pts = synthetic_clip(ctx.cfg, seq_len=12, seed=0)
    return vox, pts


def test_generation_demo(ctx, clip, tmp_path):
    from neural_marionette_tpu.apps.generation import (run_generation,
                                                       save_outputs)
    vox, _ = clip
    result = run_generation(ctx, vox, Tcond=2, Tgen=3, sample_num=2, seed=0)
    G = ctx.cfg.grid_size
    assert result["gen_voxels"].shape == (2, 5, G, G, G, 1)
    assert result["keypoints"].shape == (2, 5, ctx.cfg.nkeypoints, 4)
    assert set(np.unique(result["gen_voxels"])) <= {0.0, 1.0}
    save_outputs(result, str(tmp_path / "gen"), vox_cond=vox[:2], Tcond=2)
    assert os.path.exists(tmp_path / "gen" / "gen_voxels.npy")
    # surfel-plate render set (reference output inventory)
    for s in range(2):
        assert os.path.exists(tmp_path / "gen" / f"gen_result_{s}.gif")
        assert os.path.exists(
            tmp_path / "gen" / f"gen_result_imgs_{s}" / "00.png")


def test_interpolation_demo(ctx, clip, tmp_path):
    from neural_marionette_tpu.apps.interpolation import (run_interpolation,
                                                          save_outputs)
    vox, _ = clip
    result = run_interpolation(ctx, vox, anchor_rate=3, sample_num=8,
                               seed=0)
    T = vox.shape[0]
    assert result["interp_voxels"].shape[0] == T
    assert result["keypoints"].shape == (T, ctx.cfg.nkeypoints, 4)
    # intensities frozen to frame 0
    np.testing.assert_allclose(
        result["keypoints"][:, :, -1],
        np.broadcast_to(result["keypoints"][0:1, :, -1],
                        result["keypoints"][:, :, -1].shape))
    save_outputs(result, str(tmp_path / "interp"), vox_clip=vox)
    assert os.path.exists(tmp_path / "interp" / "interp_voxels.npy")
    # reference interpolation artifact naming (not generation-named)
    assert os.path.exists(tmp_path / "interp" / "interp_result_0.gif")


def test_demos_use_reference_camera():
    """All demo renders share the reference's PinholeCameraParameters
    (vendored data/demo/source/source.json; reference
    vis_generation.py:171-177, vis_retarget.py:399-557)."""
    from neural_marionette_tpu.viz import raster as R
    cam = R.default_camera()
    assert (cam.W, cam.H) == (1025, 958)
    assert cam.f == pytest.approx(829.65233682549228)
    assert (cam.cx, cam.cy) == (512.0, 478.5)
    np.testing.assert_allclose(
        cam.eye, [-0.5546303168997937, -0.0035468143869429314,
                  3.3230607082645185], atol=1e-12)
    # everything in the unit cube projects in front of the camera
    pts = np.random.default_rng(0).uniform(-1, 1, (256, 3))
    _, _, z = cam.project(pts)
    assert (z > 0).all()


def test_retarget_demo(ctx, clip, tmp_path):
    from neural_marionette_tpu.apps.retarget import run_retarget, \
        save_outputs
    vox, pts = clip
    target_points = pts[0]  # (N, 3)
    out = run_retarget(ctx, vox, target_points, mode="ours", seed=0)
    res = out["result"]
    T, N = vox.shape[0], target_points.shape[0]
    assert res.new_points.shape == (T, N, 3)
    assert res.new_keypoints.shape == (T, ctx.cfg.nkeypoints, 4)
    assert res.skin_weights.shape == (N, ctx.cfg.nkeypoints)
    assert np.isfinite(res.new_points).all()
    save_outputs(out, str(tmp_path / "ret"), source_vox=vox,
                 target_points=target_points)
    # reference render inventory: source w/ skeleton, target stills,
    # smooth / skeleton / overlay deformed sequences + GIFs
    for f in ["source.gif", "smooth.gif", "skeleton.gif", "overlay.gif",
              "target.png", "target_skin.png"]:
        assert os.path.exists(tmp_path / "ret" / f), f
    for d in ["source_imgs", "smooth_imgs", "skeleton_imgs",
              "overlay_imgs"]:
        assert os.path.exists(tmp_path / "ret" / d / "00.png"), d

    base = run_retarget(ctx, vox, target_points, mode="baseline", seed=0)
    assert np.isfinite(base["result"].new_points).all()


def test_skin_weights_properties():
    g = np.random.default_rng(0)
    K = 5
    parents = np.array([0, 0, 1, 2, 0], dtype=np.int32)
    sk = Skeleton(A=np.zeros((K, K), np.float32),
                  priority_values=np.zeros(K, np.float32),
                  priority_indices=np.array([0, 1, 4, 2, 3], np.int32),
                  parents=parents)
    kp = np.concatenate([g.uniform(-0.5, 0.5, size=(K, 3)),
                         np.ones((K, 1))], axis=-1)
    pts = g.uniform(-0.5, 0.5, size=(50, 3))
    w = extract_skin_weights(sk, pts, kp)
    assert w.shape == (50, K)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-9)
    assert (w >= 0).all()
    # root never selected as the nearest bone; weight only via parent blend
    # of its children is allowed, so just check weights are concentrated
    assert (np.count_nonzero(w, axis=1) <= 2).all()


def test_retarget_identity():
    """Retargeting a shape onto itself with identity rotations reproduces
    bone-relative structure (sanity, not exactness)."""
    g = np.random.default_rng(1)
    K = 4
    parents = np.array([0, 0, 1, 2], dtype=np.int32)
    sk = Skeleton(A=np.zeros((K, K), np.float32),
                  priority_values=np.arange(K, dtype=np.float32),
                  priority_indices=np.arange(K, dtype=np.int32),
                  parents=parents)
    kp = np.concatenate([g.uniform(-0.5, 0.5, size=(K, 3)),
                         np.ones((K, 1))], axis=-1)
    pts = g.uniform(-0.5, 0.5, size=(30, 3))
    T = 3
    src_kp = np.broadcast_to(kp, (T, K, 4)).copy()
    eye = np.broadcast_to(np.eye(3), (T, K, 3, 3)).copy()
    offset = kp[:, :3] - kp[parents, :3]
    res = retarget_motion(sk, src_kp, eye, kp, np.broadcast_to(
        np.eye(3), (K, 3, 3)).copy(), pts, offset, mode="ours")
    # identity rotations + self offsets => points reproduced exactly
    np.testing.assert_allclose(res.new_points[0], pts, atol=1e-6)
