"""AIST++ offline preprocessor (L0 layer).

Equivalent of reference `dataset/aistpp/prepare_aistpp.py`: SMPL forward
pass over each motion -> sample 20k surface points/frame + 24 GT joints
(J_regressor) + per-frame yaw root-alignment matrices; 90/10 train/test
split; GT affinity from SMPL parents.  Output layout consumed by
``data.datasets.AIST``:

    <save_dir>/surface/{train,test}/<seq>.npy      (T, 20000, 3)
    <save_dir>/joints/{train,test}/<seq>.npy       (T, 24, 3)
    <save_dir>/root_aligns/{train,test}/<seq>.npy  (T, 3, 3)
    <save_dir>/gt_affinity.npy                     (24, 24)

Requires the optional raw-data toolchain (smplx, trimesh, aist_plusplus) —
not shipped in the TPU image; this module import-gates them with a clear
error.  Run on any CPU host with the AIST++ download.
"""
from __future__ import annotations

import argparse
import os
import random

import numpy as np

from scipy.spatial.transform import Rotation as R

_MISSING = None
try:
    import torch
    import trimesh
    from smplx import SMPL
    from aist_plusplus.loader import AISTDataset
except ImportError as e:  # pragma: no cover - raw-data toolchain optional
    _MISSING = e


def sample_surface_points(mesh, n: int = 20000) -> np.ndarray:
    """Uniform surface samples with face normals -> (n, 6) float32."""
    pts, face_idx = trimesh.sample.sample_surface(mesh, n)
    return np.hstack([pts, mesh.face_normals[face_idx]]).astype(np.float32)


def yaw_alignment(root_rotvec: np.ndarray) -> np.ndarray:
    """Inverse yaw rotation matrix from the SMPL global orientation."""
    euler = R.from_rotvec(root_rotvec).as_euler("xyz", degrees=True)
    return R.from_euler("y", euler[1], degrees=True).as_matrix().T


def main():
    if _MISSING is not None:
        raise ImportError(
            "prepare_aistpp needs smplx/trimesh/aist_plusplus "
            f"(pip install smplx trimesh aist_plusplus): {_MISSING}")

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--anno_dir", default="aist_plusplus_final")
    parser.add_argument("--smpl_model", required=True,
                        help="path to the SMPL male model .pkl")
    parser.add_argument("--save_dir", default="aist_plusplus_smpl_joints")
    parser.add_argument("--n_points", type=int, default=20000)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    random.seed(args.seed)
    seqs_all = sorted(os.listdir(os.path.join(args.anno_dir, "motions")))
    with open(os.path.join(args.anno_dir, "ignore_list.txt"), "rb") as f:
        ignores = [a.decode("utf-8") for a in f.read().splitlines() if a]
    seqs = [s[:-4] for s in seqs_all
            if not any(s[:26] == ig[:26] for ig in ignores)]
    random.shuffle(seqs)

    dataset = AISTDataset(args.anno_dir)
    for split in ("train", "test"):
        for sub in ("surface", "joints", "root_aligns"):
            os.makedirs(os.path.join(args.save_dir, sub, split),
                        exist_ok=True)

    smpl = SMPL(model_path=args.smpl_model, gender="MALE", batch_size=1)

    # GT affinity from the SMPL kinematic tree (symmetrized parents)
    affinity = np.zeros((24, 24), dtype=np.float32)
    for k in range(24):
        parent = int(smpl.parents[k])
        if parent >= 0:
            affinity[k, parent] = affinity[parent, k] = 1.0
    np.save(os.path.join(args.save_dir, "gt_affinity.npy"), affinity)

    total = len(seqs)
    for idx, seq in enumerate(seqs):
        poses, scaling, trans = AISTDataset.load_motion(
            dataset.motion_dir, seq)
        vertices = smpl.forward(
            global_orient=torch.from_numpy(poses[:, 0:1]).float(),
            body_pose=torch.from_numpy(poses[:, 1:]).float(),
            transl=torch.from_numpy(trans).float(),
            scaling=torch.from_numpy(scaling.reshape(1, 1)).float(),
        ).vertices.detach()

        sampled = np.stack([
            sample_surface_points(trimesh.Trimesh(vertices[t], smpl.faces),
                                  args.n_points)[..., :3]
            for t in range(vertices.shape[0])])
        root_aligns = np.stack([yaw_alignment(poses[t, :3])
                                for t in range(vertices.shape[0])])

        J_reg = smpl.J_regressor[None].expand(vertices.shape[0], -1, -1)
        joints = torch.einsum("bij,bjk->bik", J_reg,
                              vertices).detach().numpy()

        split = "train" if idx / total <= 0.9 else "test"
        np.save(os.path.join(args.save_dir, "surface", split,
                             seq + ".npy"), sampled)
        np.save(os.path.join(args.save_dir, "root_aligns", split,
                             seq + ".npy"), root_aligns)
        np.save(os.path.join(args.save_dir, "joints", split,
                             seq + ".npy"), joints)
        with open(f"{split}_list.txt", "a") as f:
            f.write(seq + "\n")
        print(f"{idx}/{total} {split} {seq} saved")


if __name__ == "__main__":
    main()
