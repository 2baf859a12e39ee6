"""Pure-functional compute ops (L2 layer of the framework)."""
from .coords import add_coord_channels, coord_maps
from .keypoints import extract_keypoints_from_heatmap, render_gaussian_maps
from .rotations import rotation_6d_to_matrix
from .fk import (fk_global_rotations, fk_positions,
                 fk_global_rotations_parallel, fk_positions_parallel)
from .voxelize import voxelize_np, voxelize_jnp
from .losses import (
    bce_recon_loss,
    keypoint_sparsity_loss,
    temporal_separation_loss,
    volume_fitting_loss,
    graph_consistency_losses,
    graph_trajectory_loss,
    gaussian_kl,
)

__all__ = [
    "add_coord_channels", "coord_maps",
    "extract_keypoints_from_heatmap", "render_gaussian_maps",
    "rotation_6d_to_matrix", "fk_global_rotations", "fk_positions",
    "fk_global_rotations_parallel", "fk_positions_parallel",
    "voxelize_np", "voxelize_jnp",
    "bce_recon_loss", "keypoint_sparsity_loss", "temporal_separation_loss",
    "volume_fitting_loss", "graph_consistency_losses",
    "graph_trajectory_loss", "gaussian_kl",
]
