"""Motion interpolation demo (reference vis_interpolation.py).

Detect keypoints over a clip, keep every ``anchor_rate``-th frame as an
anchor, and fill the in-between frames with prior rollouts selected to land
near the next anchor.
"""
from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..models.dynamics import SkeletonArrays
from .common import DemoContext, detect_and_extract_skeleton


def run_interpolation(ctx: DemoContext, vox_clip: np.ndarray,
                      anchor_rate: int = 10, sample_num: int = 10000,
                      seed: int = 2, threshold: float = 0.5):
    """vox_clip: (T, G, G, G, 1).  ``sample_num`` defaults to the
    reference's 10000 prior trajectories per segment
    (vis_interpolation.py:54); the scan-vectorised interpolate kernel makes
    that cheap on chip."""
    model, params = ctx.model, ctx.params
    det, skeleton = detect_and_extract_skeleton(ctx, vox_clip)
    keypoints = det["keypoints"]
    sk = SkeletonArrays.from_skeleton(skeleton)

    selected = model.apply(
        params, keypoints, sk, anchor_rate=anchor_rate,
        sample_num=sample_num,
        method=lambda m, *a, **k: m.dyna_module.interpolate(*a, **k),
        rngs={"sample": jax.random.PRNGKey(seed)})

    dec = model.apply(
        params, selected, det["first_feature"],
        jnp.asarray(vox_clip[None, 0]),
        method=lambda m, *a: m.kypt_detector.decode_from_dyna(*a))
    vox = np.asarray(dec["gen"][0])
    return dict(interp_voxels=(vox >= threshold).astype(np.float32),
                keypoints=np.asarray(selected[0]),
                detected_keypoints=np.asarray(keypoints[0]),
                skeleton=skeleton)


def save_outputs(result: dict, out_dir: str, vox_clip=None) -> None:
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "interp_voxels.npy"),
            result["interp_voxels"])
    np.save(os.path.join(out_dir, "keypoints.npy"), result["keypoints"])
    # surfel-plate render set, same presentation as the reference's
    # interpolation demo (vis_interpolation.py:138-198), under the
    # reference's interpolation artifact names (interp_result_*.gif)
    from .generation import render_generation
    render_generation(result["interp_voxels"][None], out_dir, Tcond=0,
                      prefix="interp_result")
    from ..viz.visualize import vis_keypoints, vis_recon
    iv = result["interp_voxels"][None]
    vis_keypoints(iv, result["keypoints"][None], logger_path=out_dir,
                  nepoch=0, affinity=result["skeleton"].A, log_num=1,
                  group="interpolation", mode="A")
    if vox_clip is not None:
        vis_recon(vox_clip[None], iv, logger_path=out_dir, nepoch=0,
                  log_num=1, group="interpolation")
