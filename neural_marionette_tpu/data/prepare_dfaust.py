"""D-FAUST offline preprocessor (L0 layer).

Equivalent of reference `dataset/dfaust/write_sequence_to_obj.py`: read the
registrations hdf5 per (subject, sequence), sample 20k surface points per
frame, write ``<path>/surface/<sid>/<seq>.npy`` (T, 20000, 3+3) consumed by
``data.datasets.DFAUST``.

Requires h5py + trimesh (raw-data toolchain, not in the TPU image) — run on
any CPU host with the D-FAUST download.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

_MISSING = None
try:
    import h5py
    import trimesh
except ImportError as e:  # pragma: no cover - raw-data toolchain optional
    _MISSING = e

SUBJECT_IDS = ["50002", "50004", "50007", "50009", "50020",
               "50021", "50022", "50025", "50026", "50027"]


def sample_surface_points(mesh, n: int = 20000) -> np.ndarray:
    pts, face_idx = trimesh.sample.sample_surface(mesh, n)
    return np.hstack([pts, mesh.face_normals[face_idx]]).astype(np.float32)


def parse_subjects_file(path: str) -> dict[str, tuple[str, list[str]]]:
    """subjects_and_sequences.txt -> {sid: (gender, [sequences])}."""
    out: dict[str, tuple[str, list[str]]] = {}
    current = None
    with open(path) as f:
        for line in f.read().splitlines():
            parts = line.split()
            if len(parts) == 2:
                sid, gender = parts
                current = sid
                out[sid] = (gender.strip("()"), [])
            elif len(parts) == 1 and current is not None and parts[0]:
                out[current][1].append(parts[0])
    return out


def main():
    if _MISSING is not None:
        raise ImportError(
            f"prepare_dfaust needs h5py + trimesh: {_MISSING}")

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--path", default="data/D-FAUST",
                        help="directory with registrations_{m,f}.hdf5")
    parser.add_argument("--subjects_file", default="subjects_and_sequences.txt")
    parser.add_argument("--n_points", type=int, default=20000)
    args = parser.parse_args()

    np.random.seed(0)
    subjects = parse_subjects_file(args.subjects_file)
    for sid in SUBJECT_IDS:
        if sid not in subjects:
            continue
        gender, seqs = subjects[sid]
        reg_path = os.path.join(
            args.path, "registrations_m.hdf5" if gender == "male"
            else "registrations_f.hdf5")
        for seq in seqs:
            sidseq = f"{sid}_{seq}"
            with h5py.File(reg_path, "r") as f:
                if sidseq not in f:
                    print(f"sequence {seq} of {sid} not in {reg_path}")
                    continue
                verts = np.array(f[sidseq]).transpose([2, 0, 1])
                faces = np.array(f["faces"])

            save_dir = os.path.join(args.path, "surface", sid)
            os.makedirs(save_dir, exist_ok=True)
            sampled = np.stack([
                sample_surface_points(trimesh.Trimesh(v, faces),
                                      args.n_points)
                for v in verts])
            np.save(os.path.join(save_dir, seq + ".npy"), sampled)
            print(os.path.join(save_dir, seq), "saved")


if __name__ == "__main__":
    main()
