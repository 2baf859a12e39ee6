"""Motion retargeting demo (reference vis_retarget.py:154-322).

Detect a source dance clip's keypoints + per-frame global rotations, detect
a target shape's bind-pose keypoints, skin the target points to the learned
skeleton, and replay the source motion on the target via LBS.
"""
from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..data.pipeline import episodic_normalization
from ..models.dynamics import SkeletonArrays
from ..ops import voxelize_np
from ..retarget import retarget_motion
from .common import DemoContext, detect_and_extract_skeleton


def load_obj_vertices(path: str) -> np.ndarray:
    """Minimal OBJ vertex reader (the reference uses Open3D; only the
    vertex positions feed the retarget math)."""
    verts = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]),
                              float(parts[3])])
    return np.asarray(verts, dtype=np.float64)


def load_target_points(path: str, scale: float = 0.8, x_trans: float = 0.0,
                       z_trans: float = 0.0, is_bind: bool = False):
    """Target shape -> normalized points (reference
    load_voxel_from_real_data_for_mesh, vis_retarget.py:92-100)."""
    if path.endswith(".obj"):
        x = load_obj_vertices(path)
    else:
        x = np.load(path)[..., :3]
    if is_bind:
        x = np.stack([x[:, 0], -x[:, 2], x[:, 1]], axis=-1)
    x = episodic_normalization(x[None], scale, x_trans, z_trans)[0]
    return x


def run_retarget(ctx: DemoContext, source_vox: np.ndarray,
                 target_points: np.ndarray, hardness: float = 8.0,
                 mode: str = "ours", seed: int = 0):
    """source_vox: (T, G, G, G, 1); target_points: (N, 3) in [-1, 1]^3."""
    model, params = ctx.model, ctx.params
    cfg = ctx.cfg

    # ---- source: keypoints + per-frame global rotations
    det, skeleton = detect_and_extract_skeleton(ctx, source_vox)
    source_kp = np.array(det["keypoints"])  # (1, T, K, 4), writable copy
    # freeze intensities to frame 0 for consistent rigs (vis_retarget.py:242)
    source_kp[:, 1:, :, -1] = source_kp[:, :1, :, -1]
    sk = SkeletonArrays.from_skeleton(skeleton)
    dyn = model.apply(
        params, jnp.asarray(source_kp), sk,
        method=lambda m, *a, **k: m.dyna_module.encode(*a, **k),
        rngs={"sample": jax.random.PRNGKey(seed)})
    source_R = np.asarray(dyn["R"][0])  # (T, K, 3, 3)

    # ---- target: bind-pose keypoints + inverse rotations
    target_vox = voxelize_np(target_points.astype(np.float32),
                             cfg.grid_size)
    tdet = model.apply(
        params, jnp.asarray(target_vox[None, None]),
        affinity_active=True,
        method=lambda m, v, affinity_active:
        m.kypt_detector(v, affinity_active=affinity_active))
    target_kp = np.asarray(tdet["keypoints"])  # (1, 1, K, 4)
    # transplant source frame-0 intensities (vis_retarget.py:260)
    target_kp = np.concatenate(
        [target_kp[..., :3], source_kp[:1, :1, :, 3:]], axis=-1)
    tdyn = model.apply(
        params, jnp.asarray(target_kp), sk,
        method=lambda m, *a, **k: m.dyna_module.encode(*a, **k),
        rngs={"sample": jax.random.PRNGKey(seed + 1)})
    target_R = np.asarray(tdyn["R"][0, 0])  # (K, 3, 3) bind pose

    # bone offsets from the target pose (vis_retarget.py:275)
    offset = np.asarray(model.apply(
        params, jnp.asarray(target_kp), sk.parents,
        method=lambda m, *a: m.dyna_module.get_offset(*a)))[0]  # (K, 3)

    result = retarget_motion(
        skeleton, source_kp[0], source_R, target_kp[0, 0], target_R,
        target_points, offset, hardness=hardness, mode=mode)
    return dict(result=result, skeleton=skeleton,
                source_keypoints=source_kp[0], target_keypoints=target_kp)


def save_outputs(out: dict, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    res = out["result"]
    np.save(os.path.join(out_dir, "retargeted_points.npy"), res.new_points)
    np.save(os.path.join(out_dir, "retargeted_keypoints.npy"),
            res.new_keypoints)
    np.save(os.path.join(out_dir, "skin_weights.npy"), res.skin_weights)
    np.save(os.path.join(out_dir, "parents.npy"), out["skeleton"].parents)

    # matplotlib point-cloud animation (Open3D rendering of the reference
    # replaced by a dependency-free renderer)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    try:
        import imageio
    except ImportError:
        return
    frames = []
    T = res.new_points.shape[0]
    for t in range(0, T, max(T // 40, 1)):
        fig = plt.figure(figsize=(4, 4), dpi=64)
        ax = fig.add_subplot(111, projection="3d")
        p = res.new_points[t]
        sub = p[:: max(len(p) // 4000, 1)]
        ax.scatter(sub[:, 0], sub[:, 2], sub[:, 1], s=1, c="teal",
                   alpha=0.5, linewidths=0)
        kp = res.new_keypoints[t]
        ax.scatter(kp[:, 0], kp[:, 2], kp[:, 1], s=25, c="red")
        ax.set_xlim(-1, 1); ax.set_ylim(-1, 1); ax.set_zlim(-1, 1)
        ax.set_axis_off()
        fig.canvas.draw()
        frames.append(np.asarray(fig.canvas.buffer_rgba())[..., :3].copy())
        plt.close(fig)
    imageio.mimsave(os.path.join(out_dir, "retarget.gif"), frames,
                    duration=0.12)
