"""Visualisation (host-side matplotlib/GIF rendering)."""
from .visualize import vis_keypoints, vis_recon

__all__ = ["vis_keypoints", "vis_recon"]
