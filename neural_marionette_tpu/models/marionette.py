"""NeuralMarionette: detector + dynamics composition root.

Re-design of reference `model/neural_marionette.py`.  The reference's
mutable gating (``control_active`` flipping requires_grad,
``affinity_start``) becomes *static* call arguments driven by the training
scheduler — each (detector_active, learner_active, affinity_active)
combination is its own compiled program (at most three per run).

The stop-gradient boundary between detector and dynamics
(neural_marionette.py:53) is explicit here.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import MarionetteConfig
from .detector import KyptDetector
from .dynamics import HSVRNNBVH, SkeletonArrays


class NeuralMarionette(nn.Module):
    cfg: MarionetteConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.kypt_detector = KyptDetector(self.cfg, dtype=self.dtype)
        self.dyna_module = HSVRNNBVH(self.cfg, dtype=self.dtype)

    def __call__(self, vox_seq,
                 detector_active: bool = True,
                 learner_active: bool = False,
                 affinity_active: bool = True,
                 skeleton: Optional[SkeletonArrays] = None) -> dict[str, Any]:
        """vox_seq: (B, T, G, G, G, 1) channels-last.

        Reference neural_marionette.py:34-56; the frozen-detector path
        (torch.no_grad) is expressed as stop_gradient over the detector
        outputs (parameter freezing itself is the optimizer mask's job).
        """
        log: dict[str, Any] = {}
        if detector_active or learner_active:
            det = self.kypt_detector(vox_seq, affinity_active=affinity_active)
            if not detector_active:
                det = jax.tree.map(
                    lambda x: jax.lax.stop_gradient(x)
                    if isinstance(x, jnp.ndarray) else x, det)
            log.update(det)

        if learner_active:
            assert skeleton is not None, \
                "learner path needs a SkeletonArrays (extract_skeleton on " \
                "the trained affinity, cached once per run)"
            keypoints = jax.lax.stop_gradient(log["keypoints"])
            log.update(self.dyna_module.encode(keypoints, skeleton))
        return log

    def generate(self, vox_seq, skeleton: SkeletonArrays,
                 affinity_active: bool = True,
                 sample_num: int = 10) -> dict[str, Any]:
        """Conditioned generation (reference neural_marionette.py:58-103):
        detect on the first Tcond frames, roll the VRNN out to T, decode
        generated keypoints back to voxels, concatenate recon || gen."""
        cfg = self.cfg
        T = vox_seq.shape[1]
        Tcond = cfg.Tcond
        assert Tcond < T

        det = self.kypt_detector(vox_seq[:, :Tcond],
                                 affinity_active=affinity_active)
        keypoints = det["keypoints"]
        dyn = self.dyna_module.generate(keypoints, skeleton, Ttot=T,
                                        Tcond=Tcond, sample_num=sample_num)
        gen_log = self.kypt_detector.decode_from_dyna(
            dyn["keypoints_gen"], det["first_feature"], vox_seq[:, 0])

        total_recon = jnp.concatenate(
            [det["recon"][:, :Tcond], gen_log["gen"]], axis=1)
        total_keypoints = jnp.concatenate(
            [keypoints[:, :Tcond], dyn["keypoints_gen"]], axis=1)
        return dict(gen=total_recon, keypoints=total_keypoints,
                    affinity=det["affinity"])

    def encode_only(self, vox_seq, skeleton: SkeletonArrays,
                    affinity_active: bool = True,
                    sample_num: int = 10) -> dict[str, Any]:
        """Detector + dynamics encode for inference (demo/retarget path:
        keypoints, per-frame global rotations R, affinity)."""
        det = self.kypt_detector(vox_seq, affinity_active=affinity_active)
        dyn = self.dyna_module.encode(
            jax.lax.stop_gradient(det["keypoints"]), skeleton,
            sample_num=sample_num)
        det.update(dyn)
        return det
