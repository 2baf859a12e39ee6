"""Motion generation demo (reference vis_generation.py).

Condition on the first ``Tcond`` frames of a clip, collapse to the best
posterior latent per step, then roll ``sample_num`` independent prior
trajectories forward and decode each back to voxels.
"""
from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..models.dynamics import HSVRNNBVH, SkeletonArrays
from ..models.marionette import NeuralMarionette
from .common import DemoContext, detect_and_extract_skeleton


def run_generation(ctx: DemoContext, vox_clip: np.ndarray,
                   Tcond: int = 5, Tgen: int = 25, sample_num: int = 3,
                   seed: int = 2, threshold: float = 0.5):
    """vox_clip: (Tcond, G, G, G, 1) conditioning frames.

    Returns dict with generated voxels (sample_num, Tcond+Tgen, G, G, G, 1),
    keypoints, and the skeleton."""
    model, params = ctx.model, ctx.params
    det, skeleton = detect_and_extract_skeleton(ctx, vox_clip[:Tcond])
    keypoints = det["keypoints"]  # (1, Tcond, K, 4)
    sk = SkeletonArrays.from_skeleton(skeleton)

    cond_kp, gen_kp = model.apply(
        params, keypoints, sk, Ttot=Tcond + Tgen, Tcond=Tcond,
        sample_num=sample_num,
        method=lambda m, *a, **k: m.dyna_module.generate_many(*a, **k),
        rngs={"sample": jax.random.PRNGKey(seed)})

    first_feature = det["first_feature"]
    first_frame = jnp.asarray(vox_clip[None, 0])
    vox_out, kp_out = [], []
    for s in range(sample_num):
        full_kp = jnp.concatenate([cond_kp, gen_kp[s:s + 1]], axis=1)
        dec = model.apply(
            params, full_kp, first_feature, first_frame,
            method=lambda m, *a: m.kypt_detector.decode_from_dyna(*a))
        vox = np.asarray(dec["gen"][0])
        vox_out.append((vox >= threshold).astype(np.float32))
        kp_out.append(np.asarray(full_kp[0]))
    return dict(gen_voxels=np.stack(vox_out), keypoints=np.stack(kp_out),
                skeleton=skeleton, cond_keypoints=np.asarray(cond_kp[0]))


def save_outputs(result: dict, out_dir: str, vox_cond=None,
                 Tcond: int = 5) -> None:
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "gen_voxels.npy"), result["gen_voxels"])
    np.save(os.path.join(out_dir, "keypoints.npy"), result["keypoints"])
    np.save(os.path.join(out_dir, "parents.npy"),
            result["skeleton"].parents)
    render_generation(result["gen_voxels"], out_dir, Tcond=Tcond)
    from ..viz.visualize import vis_keypoints, vis_recon
    gv = result["gen_voxels"][..., :]
    kp = result["keypoints"]
    vis_keypoints(gv, kp, logger_path=out_dir, nepoch=0,
                  affinity=result["skeleton"].A, log_num=gv.shape[0],
                  group="generation", mode="A")
    if vox_cond is not None:
        ref = np.broadcast_to(
            np.concatenate([vox_cond,
                            np.zeros_like(gv[0][vox_cond.shape[0]:])])[None],
            gv.shape)
        vis_recon(ref, gv, logger_path=out_dir, nepoch=0,
                  log_num=gv.shape[0], group="generation",
                  Tcond=vox_cond.shape[0])


def render_generation(gen_voxels: np.ndarray, out_dir: str,
                      Tcond: int = 5, prefix: str = "gen_result") -> None:
    """Surfel-"plate" renders with estimated normals, the reference's
    generation output inventory (vis_generation.py:155-192):
    ``gen_result_imgs_<s>/%02d.png`` per frame + ``gen_result_<s>.gif``
    per sample; conditioning frames blue, generated frames green, shaded
    by z-height exactly like the reference's color ramp."""
    from ..viz import raster as R

    G = gen_voxels.shape[2]
    cam = R.default_camera()  # the reference's pinhole camera JSON
    for s in range(gen_voxels.shape[0]):
        img_dir = os.path.join(out_dir, f"{prefix}_imgs_{s}")
        os.makedirs(img_dir, exist_ok=True)
        frames = []
        # clip-wide z ramp (the reference derives it from the clip)
        occ_all = np.stack(np.nonzero(gen_voxels[s, :, ..., 0]),
                           axis=-1)
        if len(occ_all) == 0:
            continue
        zs = occ_all[:, 3] / ((G - 1) / 2) - 1
        min_z, z_len = float(zs.min()), float(max(zs.max() - zs.min(),
                                                  1e-6))
        for t in range(gen_voxels.shape[1]):
            coords = np.stack(
                np.nonzero(gen_voxels[s, t, ..., 0]), axis=-1) \
                / ((G - 1) / 2) - 1
            if len(coords) == 0:
                frames.append(np.ones((cam.H, cam.W, 3), np.float32))
                continue
            normals = R.estimate_normals(coords)
            base = np.array([0.6, 0.6, 1.0]) if t < Tcond \
                else np.array([0.6, 1.0, 0.6])
            ramp = (coords[:, -1] - min_z) / z_len * 0.8 + 0.2
            colors = base[None] * ramp[:, None]
            img = R.render_surfels(cam, coords, normals, colors,
                                   radius=0.03)
            R.save_png(img, os.path.join(img_dir, f"{t:02d}.png"))
            frames.append(img)
        R.save_gif(frames, os.path.join(out_dir, f"{prefix}_{s}.gif"))
