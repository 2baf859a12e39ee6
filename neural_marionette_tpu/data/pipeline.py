"""Host-side sequence pipeline: window cropping, episodic normalization.

Re-implements reference `utils/dataset_utils.py:6-19` plus the window-start
selection logic that the reference duplicates inside all seven dataset
classes (dataset/dataset.py:51-73 et al.) — here it is one shared function.

Voxelization itself is TPU-native: the loader ships normalized POINT
windows (fixed N) to the device and the jitted step scatters them into the
occupancy grid (ops.voxelize_jnp / the Pallas kernel), instead of the
reference's per-frame NumPy voxelize on the host.  A host path
(ops.voxelize_np) remains for parity tests and compat.
"""
from __future__ import annotations

import random
from typing import Optional

import numpy as np


def crop_sequence(seq: np.ndarray, start: int, T: int,
                  sample_rate: int = 1) -> np.ndarray:
    """Strided temporal window (reference utils/dataset_utils.py:6-7)."""
    return seq[start:start + T * sample_rate:sample_rate]


def episodic_normalization(seq: np.ndarray, scale: float = 1.0,
                           x_trans: float = 0.0, z_trans: float = 0.0,
                           joints: Optional[np.ndarray] = None):
    """Normalize a whole clip into [-1, 1]^3 by the clip-wide bbox
    (per-episode, NOT per-frame), optionally co-normalizing joints
    (reference utils/dataset_utils.py:9-19)."""
    bmax = np.amax(seq, axis=(0, 1))
    bmin = np.amin(seq, axis=(0, 1))
    blen = (bmax - bmin).max()
    out = ((seq - bmin[None, None]) * scale / (blen + 1e-5)) * 2 - 1 \
        + np.array([x_trans, 0.0, z_trans])
    if joints is not None:
        joints = ((joints - bmin[None, None]) * scale / (blen + 1e-5)) * 2 - 1
        return out, joints
    return out


def select_window_start(seq_len: int, T: int, sample_rate: int,
                        random_crop: bool, epoch_id: int,
                        rng: random.Random) -> int:
    """Window-start policy shared by every dataset.

    random_crop: uniform start such that the strided window fits
    (reference dataset.py:51-56); otherwise an epoch-deterministic sweep
    with offset wraparound (reference dataset.py:57-63).
    """
    span = sample_rate * (T - 1)
    if random_crop:
        if seq_len - 1 - span < 0:
            return 0
        return rng.randint(0, seq_len - 1 - span)
    offset = (epoch_id % T) * sample_rate
    n_windows = max(seq_len // (T * sample_rate), 1)
    start = (epoch_id % n_windows) * (T * sample_rate) + offset
    if start + span >= seq_len:
        start = max(start - 2 * offset, 0)
    return start


def pad_short_sequence(x: np.ndarray, T: int, sample_rate: int) -> np.ndarray:
    """Repeat the last frame so a strided window fits
    (reference dataset.py:65-68)."""
    if x.shape[0] < T * sample_rate:
        copy_num = T - x.shape[0]
        if copy_num > 0:
            x = np.concatenate([x] + [x[-1:]] * copy_num, axis=0)
    return x


def fix_point_count(points: np.ndarray, n_points: int,
                    rng: np.random.Generator) -> np.ndarray:
    """Subsample or repeat points to a fixed N per frame (static shapes are
    required for jit; the reference's .npy files are fixed-N already)."""
    T, N, C = points.shape
    if N == n_points:
        return points
    if N > n_points:
        idx = rng.choice(N, n_points, replace=False)
    else:
        idx = rng.choice(N, n_points, replace=True)
    return points[:, idx]


def window_from_sequence(x: np.ndarray, T: int, sample_rate: int,
                         random_crop: bool, epoch_id: int,
                         rng: random.Random,
                         joints: Optional[np.ndarray] = None,
                         scale: float = 1.0,
                         short_pad_first: bool = False,
                         align_rots: Optional[np.ndarray] = None):
    """Full window extraction: start selection, padding, crop, normalize.

    ``short_pad_first`` reproduces the subtle ordering difference between
    dataset classes: DFAUST/AIST choose the start BEFORE padding short
    sequences (dataset.py:51-68) while animals/humanoids/panda pad first
    (dataset.py:221-238); with padding the start resets to 0 either way, so
    one flag covers both.

    ``align_rots``: per-source-frame (T_seq, 3, 3) root-alignment rotation
    matrices (AIST ``align_root``).  The window-START frame's matrix is
    applied to every frame of the NORMALIZED window — the reference's
    intent at dataset.py:161-164 (its numpy code there crashes as written:
    ``.expand`` on an ndarray and a mis-axed ``transpose``; this is the
    repaired semantics).  Joints are NOT rotated — the reference doesn't
    rotate them either.

    The window is bbox-anchored to [-1,1]^3 (not origin-centered), so
    rotating about the origin can push points outside the grid where the
    voxelizer would silently drop them; we re-run episodic_normalization
    after the rotation (joints co-normalized by the same bbox transform)
    so no geometry is lost.
    """
    if x.shape[0] < T * sample_rate:
        start = 0
        x = pad_short_sequence(x, T, sample_rate)
        if joints is not None:
            joints = pad_short_sequence(joints, T, sample_rate)
    else:
        start = select_window_start(x.shape[0], T, sample_rate, random_crop,
                                    epoch_id, rng)
    x = crop_sequence(x, start, T, sample_rate)
    if joints is not None:
        joints = crop_sequence(joints, start, T, sample_rate)
        x, joints = episodic_normalization(x, scale=scale, joints=joints)
    else:
        x = episodic_normalization(x, scale=scale)
    if align_rots is not None:
        r = align_rots[min(start, len(align_rots) - 1)]  # (3, 3)
        x = np.einsum("ij,tnj->tni", r, x)
        # renormalize so the rotated window stays inside [-1,1]^3
        if joints is not None:
            x, joints = episodic_normalization(x, scale=scale, joints=joints)
        else:
            x = episodic_normalization(x, scale=scale)
    if joints is not None:
        return x, joints
    return x
