"""Matplotlib/GIF visualisation of voxel recon + keypoints/graphs.

Host-side re-implementation of reference `vis/visualize.py` (vis_keypoints
:15-108, vis_recon :112-172): 3D scatter of occupied voxels with keypoints
(alpha = intensity) and affinity/adjacency edges, rendered per frame to RGB
arrays, assembled into GIF tensors ``(B, T, H, W, 3) uint8`` for
TensorBoard ``add_video`` and imageio GIF files.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _fig_to_array(fig) -> np.ndarray:
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    return buf.copy()


def _draw_arrow3d(ax, p0, p1, color="g", alpha=1.0, lw=1.7):
    """Directed 3D arrow, the reference's Arrow3D
    (utils/vis_utils.py:7-16): a FancyArrowPatch whose endpoints are
    projected through the axes' 3D transform at draw time."""
    from matplotlib.patches import FancyArrowPatch
    from mpl_toolkits.mplot3d import proj3d

    class _Arrow3D(FancyArrowPatch):
        def __init__(self, verts, **kw):
            super().__init__((0, 0), (0, 0), **kw)
            self._verts3d = verts

        def do_3d_projection(self, renderer=None):
            xs3d, ys3d, zs3d = self._verts3d
            xs, ys, zs = proj3d.proj_transform(xs3d, ys3d, zs3d,
                                               self.axes.M)
            self.set_positions((xs[0], ys[0]), (xs[1], ys[1]))
            return min(zs)

    ax.add_artist(_Arrow3D(([p0[0], p1[0]], [p0[1], p1[1]],
                            [p0[2], p1[2]]),
                           mutation_scale=10, lw=lw, arrowstyle="-|>",
                           color=color, alpha=float(np.clip(alpha, 0, 1))))


def _scatter_vox(ax, vox, color="gray", alpha=0.2):
    """vox: (G, G, G) binary occupancy, channels squeezed."""
    xs, ys, zs = np.nonzero(vox)
    G = vox.shape[0]
    coords = np.stack([xs, ys, zs], -1) / max(G - 1, 1) * 2 - 1
    ax.scatter(coords[:, 0], coords[:, 2], coords[:, 1], s=2, c=color,
               alpha=alpha, marker="o", linewidths=0)
    ax.set_xlim(-1, 1)
    ax.set_ylim(-1, 1)
    ax.set_zlim(-1, 1)
    ax.set_axis_off()


def vis_keypoints(vox, keypoints, logger_path: Optional[str] = None,
                  nepoch: int = 0, affinity=None, log_num: int = 4,
                  group: str = "track", Tcond: Optional[int] = None,
                  mode: str = "affinity", figsize: int = 3,
                  affinity_threshold: float = 0.2) -> np.ndarray:
    """(B, T, G, G, G, 1) + (B, T, K, 4) -> (log_num, T, H, W, 3) uint8.

    Keypoint alpha = intensity; edges drawn for affinity above threshold
    (mode='affinity') or for binary adjacency (mode='A').
    """
    vox = np.asarray(vox)[..., 0]
    kp = np.asarray(keypoints)
    B, T = vox.shape[:2]
    n = min(log_num, B)
    K = kp.shape[2]
    cmap = plt.get_cmap("tab20")
    colors = [cmap(k % 20) for k in range(K)]

    # edge sets per mode (reference vis/visualize.py:74-89):
    # 'affinity' -> per-keypoint top-nneighbor DIRECTED arrows, alpha from
    # the keypoint's intensity; 'A' -> undirected lines, alpha = A[i, j].
    infl = None
    A = None
    if affinity is not None:
        aff = np.asarray(affinity)
        if mode == "affinity":
            infl = aff[..., 0].max(axis=0) if aff.ndim == 4 else aff
        else:  # adjacency matrix 'A'
            A = aff if aff.ndim == 2 else aff[..., 0]
    nneighbor = 2
    arrow_targets = None
    if infl is not None:
        # top-nneighbor per row, descending (reference argsort()[::-1])
        arrow_targets = np.argsort(-infl, axis=-1, kind="stable")[
            :, :nneighbor]

    videos = []
    for b in range(n):
        frames = []
        for t in range(T):
            fig = plt.figure(figsize=(figsize, figsize), dpi=64)
            ax = fig.add_subplot(111, projection="3d")
            color = "gray" if Tcond is None or t < Tcond else "lightblue"
            _scatter_vox(ax, vox[b, t], color=color)
            alphas = np.clip(kp[b, t, :, 3], 0, 1)
            max_alpha = alphas.max() + 1e-5
            for k in range(K):
                x, y, z, inten = kp[b, t, k]
                ax.scatter([x], [z], [y], s=40, c=[colors[k]],
                           alpha=float(np.clip(inten, 0.05, 1.0)))
            if arrow_targets is not None:
                # directed per-neighbor arrows, per-keypoint alpha
                # (reference vis/visualize.py:74-85)
                for k in range(K):
                    for j in arrow_targets[k]:
                        pi, pj = kp[b, t, k], kp[b, t, j]
                        _draw_arrow3d(ax, (pi[0], pi[2], pi[1]),
                                      (pj[0], pj[2], pj[1]),
                                      alpha=alphas[k] / max_alpha)
            elif A is not None:
                for i in range(K):
                    for j in range(i + 1, K):
                        if A[i, j] <= 0:
                            continue
                        pi, pj = kp[b, t, i], kp[b, t, j]
                        ax.plot([pi[0], pj[0]], [pi[2], pj[2]],
                                [pi[1], pj[1]], c="green",
                                alpha=float(np.clip(A[i, j], 0, 1)),
                                linewidth=2.5)
            frames.append(_fig_to_array(fig))
            plt.close(fig)
        videos.append(np.stack(frames))
    video = np.stack(videos)  # (n, T, H, W, 3)

    if logger_path is not None:
        _save_gifs(video, logger_path, nepoch, group, "keypoints")
    return video


def vis_recon(vox, recon, logger_path: Optional[str] = None, nepoch: int = 0,
              log_num: int = 4, group: str = "track",
              Tcond: Optional[int] = None, figsize: int = 3,
              threshold: float = 0.5) -> np.ndarray:
    """Side-by-side GT / reconstruction scatter -> (n, T, H, 2W, 3) uint8."""
    vox = np.asarray(vox)[..., 0]
    rec = np.asarray(recon)[..., 0] >= threshold
    B, T = vox.shape[:2]
    n = min(log_num, B)

    videos = []
    for b in range(n):
        frames = []
        for t in range(T):
            fig = plt.figure(figsize=(2 * figsize, figsize), dpi=64)
            ax1 = fig.add_subplot(121, projection="3d")
            ax2 = fig.add_subplot(122, projection="3d")
            _scatter_vox(ax1, vox[b, t], color="gray")
            color = "green" if Tcond is None or t < Tcond else "lightblue"
            _scatter_vox(ax2, rec[b, t], color=color)
            frames.append(_fig_to_array(fig))
            plt.close(fig)
        videos.append(np.stack(frames))
    video = np.stack(videos)

    if logger_path is not None:
        _save_gifs(video, logger_path, nepoch, group, "recon")
    return video


def _save_gifs(video: np.ndarray, logger_path: str, nepoch: int, group: str,
               name: str) -> None:
    try:
        import imageio
    except ImportError:
        return
    gif_dir = os.path.join(logger_path, "gifs", str(nepoch))
    os.makedirs(gif_dir, exist_ok=True)
    for i in range(video.shape[0]):
        imageio.mimsave(
            os.path.join(gif_dir, f"{group}_{name}_{i}.gif"),
            list(video[i]), duration=0.15)
