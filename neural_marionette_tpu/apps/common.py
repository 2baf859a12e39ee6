"""Shared demo-app plumbing: pretrained loading, clip loading, skeleton.

Mirrors the reference demo preamble (vis_generation.py:44-90): load
``opt.pickle``/``opt.json`` + checkpoint, build the model, enable affinity
(``network.anneal(1)`` upstream), detect keypoints on a clip, and extract
the skeleton once.  Accepts BOTH our Orbax checkpoints and the reference's
torch ``.pth`` via utils/torch_convert.  Falls back to a synthetic clip
when the demo blob (missing from the mount upstream too) is absent.
"""
from __future__ import annotations

import os
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import MarionetteConfig, load_reference_pickle
from ..data.pipeline import crop_sequence, episodic_normalization
from ..models import NeuralMarionette, SkeletonArrays
from ..ops import voxelize_np
from ..skeleton import Skeleton
from ..skeleton_device import extract_skeleton_host_api


class DemoContext(NamedTuple):
    cfg: MarionetteConfig
    model: NeuralMarionette
    params: dict
    skeleton: Optional[Skeleton]


def load_pretrained(exp_dir: str, **overrides) -> DemoContext:
    """Build (cfg, model, params) from an experiment directory.

    Layouts understood:
      * ours:       <exp_dir>/opt.json + <exp_dir>/epochs/<N>/state (Orbax)
      * reference:  <exp_dir>/opt.pickle + <exp_dir>/<name>.pth
    """
    opt_json = os.path.join(exp_dir, "opt.json")
    opt_pickle = os.path.join(exp_dir, "opt.pickle")
    if os.path.exists(opt_json):
        cfg = MarionetteConfig.from_json(opt_json)
    elif os.path.exists(opt_pickle):
        cfg = load_reference_pickle(opt_pickle)
    else:
        raise FileNotFoundError(f"no opt.json/opt.pickle under {exp_dir}")
    if overrides:
        cfg = cfg.replace(**overrides)

    model = NeuralMarionette(cfg)
    example = jnp.zeros((1, 2, cfg.grid_size, cfg.grid_size, cfg.grid_size,
                         1), jnp.float32)
    sk_placeholder = SkeletonArrays.chain(cfg.nkeypoints)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "sample": jax.random.PRNGKey(1)},
                        example, detector_active=True, learner_active=True,
                        skeleton=sk_placeholder)

    skeleton = None
    epochs_dir = os.path.join(exp_dir, "epochs")
    pth_files = [f for f in os.listdir(exp_dir) if f.endswith(".pth")] \
        if os.path.isdir(exp_dir) else []
    if os.path.isdir(epochs_dir):
        from ..train.checkpoint import CheckpointManager
        from ..train.state import create_train_state
        mgr = CheckpointManager(exp_dir)
        state = create_train_state(cfg, params, jax.random.PRNGKey(0))
        state, skeleton, _ = mgr.restore(state)
        params = state.params
    elif pth_files:
        from ..utils.torch_convert import load_reference_checkpoint
        converted = load_reference_checkpoint(
            os.path.join(exp_dir, pth_files[0]))
        params = converted
    else:
        print(f"WARNING: no checkpoint found under {exp_dir}; "
              "running with random weights")
    return DemoContext(cfg=cfg, model=model, params=params,
                       skeleton=skeleton)


def load_clip(file: str, cfg: MarionetteConfig, start: int = 0,
              scale: float = 1.0, x_trans: float = 0.0,
              z_trans: float = 0.0):
    """.npy point sequence -> (voxels (T, G, G, G, 1), points (T, N, 3)).

    Reference demo load_voxel (vis_generation.py:14-25)."""
    x = np.load(file)[..., :3]
    x = crop_sequence(x, start=start, T=cfg.Ttot,
                      sample_rate=cfg.sample_rate)
    x = episodic_normalization(x, scale, x_trans, z_trans)
    vox = np.stack([voxelize_np(x[t], cfg.grid_size)
                    for t in range(x.shape[0])])
    return vox.astype(np.float32), x.astype(np.float32)


def synthetic_clip(cfg: MarionetteConfig, seq_len: Optional[int] = None,
                   seed: int = 0):
    """Fallback clip when demo data is absent (the demo .npy is a missing
    large blob upstream as well)."""
    from ..data.datasets import Synthetic
    ds = Synthetic(True, cfg.replace(random_crop=0),
                   n_sequences=1, seq_len=seq_len or cfg.Ttot * 2,
                   n_bones=max(cfg.nkeypoints // 3, 3), n_points=4096)
    ds.log_epoch(seed)
    item = ds[0]
    pts = item[0] if isinstance(item, tuple) else item
    pts = pts[:cfg.Ttot]
    vox = np.stack([voxelize_np(pts[t], cfg.grid_size)
                    for t in range(pts.shape[0])])
    return vox.astype(np.float32), pts


def detect_and_extract_skeleton(ctx: DemoContext, vox_clip: np.ndarray):
    """Detector forward on a clip + skeleton extraction from the learned
    affinity (the demo's `network.anneal(1)` + encode side-effect)."""
    model, params = ctx.model, ctx.params
    det = model.apply(params, jnp.asarray(vox_clip[None]),
                      affinity_active=True,
                      method=lambda m, v, affinity_active:
                      m.kypt_detector(v, affinity_active=affinity_active))
    skeleton = ctx.skeleton
    if skeleton is None:
        # on-device extraction (skeleton_device.py); host NumPy version
        # remains the differential-test oracle
        skeleton = extract_skeleton_host_api(det["affinity"])
    return det, skeleton
