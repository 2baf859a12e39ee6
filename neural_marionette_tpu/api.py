"""High-level library facade.

One object wrapping the full capability surface so library users don't
touch flax plumbing:

    from neural_marionette_tpu.api import Marionette
    m = Marionette.load("pretrained/aist")          # ours or reference .pth
    det = m.detect(points)                          # keypoints + skeleton
    gen = m.generate(vox_clip, Tcond=5, Tgen=25)    # motion generation
    itp = m.interpolate(vox_clip, anchor_rate=10)   # in-betweening
    ret = m.retarget(source_vox, target_points)     # motion retargeting
"""
from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .apps.common import DemoContext, load_pretrained, \
    detect_and_extract_skeleton
from .config import MarionetteConfig
from .models import NeuralMarionette, SkeletonArrays
from .ops import voxelize_np
from .skeleton import Skeleton


class Marionette:
    """Stateful convenience wrapper over the functional stack."""

    def __init__(self, ctx: DemoContext):
        self.ctx = ctx
        self.cfg = ctx.cfg
        self.skeleton: Optional[Skeleton] = ctx.skeleton

    # ------------------------------------------------------------- loading
    @classmethod
    def load(cls, exp_dir: str, **overrides) -> "Marionette":
        return cls(load_pretrained(exp_dir, **overrides))

    @classmethod
    def from_config(cls, cfg: MarionetteConfig, seed: int = 0) -> "Marionette":
        """Random-weight instance (development / training from scratch)."""
        model = NeuralMarionette(cfg)
        g = cfg.grid_size
        example = jnp.zeros((1, 2, g, g, g, 1), jnp.float32)
        params = model.init(
            {"params": jax.random.PRNGKey(seed),
             "sample": jax.random.PRNGKey(seed + 1)},
            example, detector_active=True, learner_active=True,
            skeleton=SkeletonArrays.chain(cfg.nkeypoints))
        return cls(DemoContext(cfg=cfg, model=model, params=params,
                               skeleton=None))

    # ----------------------------------------------------------- inference
    def voxelize(self, points: np.ndarray) -> np.ndarray:
        """(T, N, 3) normalized points -> (T, G, G, G, 1)."""
        return np.stack([voxelize_np(points[t], self.cfg.grid_size)
                         for t in range(points.shape[0])])

    def detect(self, vox_clip: np.ndarray) -> dict:
        """(T, G, G, G, 1) -> keypoints (T, K, 4), heatmaps, affinity,
        skeleton (extracted once and cached)."""
        det, skeleton = detect_and_extract_skeleton(self.ctx, vox_clip)
        if self.skeleton is None:
            self.skeleton = skeleton
        return dict(
            keypoints=np.asarray(det["keypoints"][0]),
            heatmaps=np.asarray(det["heatmaps"][0]),
            recon=np.asarray(det["recon"][0]),
            affinity=np.asarray(det["affinity"]),
            skeleton=skeleton,
        )

    def encode(self, vox_clip: np.ndarray, seed: int = 0) -> dict:
        """Detector + VRNN encode: keypoints, per-frame global rotations."""
        det, skeleton = detect_and_extract_skeleton(self.ctx, vox_clip)
        if self.skeleton is None:
            self.skeleton = skeleton
        sk = SkeletonArrays.from_skeleton(skeleton)
        dyn = self.ctx.model.apply(
            self.ctx.params, det["keypoints"], sk,
            method=lambda m, *a, **k: m.dyna_module.encode(*a, **k),
            rngs={"sample": jax.random.PRNGKey(seed)})
        return dict(keypoints=np.asarray(det["keypoints"][0]),
                    kypt_recon=np.asarray(dyn["kypt_recon"][0]),
                    R=np.asarray(dyn["R"][0]), skeleton=skeleton)

    # --------------------------------------------------------- capabilities
    def generate(self, vox_clip: np.ndarray, Tcond: int = 5, Tgen: int = 25,
                 sample_num: int = 3, seed: int = 2) -> dict:
        from .apps.generation import run_generation
        return run_generation(self.ctx, vox_clip, Tcond=Tcond, Tgen=Tgen,
                              sample_num=sample_num, seed=seed)

    def interpolate(self, vox_clip: np.ndarray, anchor_rate: int = 10,
                    sample_num: int = 10000, seed: int = 2) -> dict:
        from .apps.interpolation import run_interpolation
        return run_interpolation(self.ctx, vox_clip,
                                 anchor_rate=anchor_rate,
                                 sample_num=sample_num, seed=seed)

    def retarget(self, source_vox: np.ndarray, target_points: np.ndarray,
                 hardness: float = 8.0, mode: str = "ours",
                 seed: int = 0) -> dict:
        from .apps.retarget import run_retarget
        return run_retarget(self.ctx, source_vox, target_points,
                            hardness=hardness, mode=mode, seed=seed)
