"""Execute the L0 preprocessors end to end on fabricated raw fixtures.

VERDICT r3 #3: the two offline preparation scripts were code-complete but
execution-zero (no raw D-FAUST/AIST++ download in this container).  These
tests fabricate minimal raw inputs — a 2-frame registrations hdf5, a set
of AIST++ motion pkls, a tiny SMPL-layout model file — run both script
``main()``s for real, and feed the written layouts into the L1 dataset
classes, closing the raw-bytes -> training-window path.

Reference contracts: dataset/dfaust/write_sequence_to_obj.py:25-116,
dataset/aistpp/prepare_aistpp.py:19-104.
"""
import os
import pickle

import numpy as np
import pytest

from neural_marionette_tpu.config import MarionetteConfig
from neural_marionette_tpu.data.meshsample import (face_normals,
                                                   sample_surface,
                                                   sample_surface_with_normals)
from neural_marionette_tpu.data.smpl_np import SMPLNumpy, rodrigues


# ---------------------------------------------------------------- fixtures
def _cube_mesh(scale=1.0):
    """Unit cube: 8 verts, 12 triangles."""
    verts = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                      for z in (0, 1)], dtype=np.float64) * scale
    faces = np.array([
        [0, 1, 3], [0, 3, 2],      # x = 0
        [4, 6, 7], [4, 7, 5],      # x = 1
        [0, 4, 5], [0, 5, 1],      # y = 0
        [2, 3, 7], [2, 7, 6],      # y = 1
        [0, 2, 6], [0, 6, 4],      # z = 0
        [1, 5, 7], [1, 7, 3],      # z = 1
    ], dtype=np.int64)
    return verts, faces


def _write_tiny_smpl(path):
    """SMPL-layout model dict: 24-joint chain skinned over the cube."""
    verts, faces = _cube_mesh()
    J = 24
    rng = np.random.default_rng(0)
    J_regressor = rng.random((J, len(verts)))
    J_regressor /= J_regressor.sum(1, keepdims=True)
    weights = rng.random((len(verts), J))
    weights /= weights.sum(1, keepdims=True)
    parents = np.concatenate([[-1], np.arange(J - 1)])  # simple chain
    with open(path, "wb") as f:
        pickle.dump({"v_template": verts, "J_regressor": J_regressor,
                     "weights": weights, "kintree_table":
                         np.stack([np.where(parents < 0, 0, parents),
                                   np.arange(J)]),
                     "f": faces}, f)


# ------------------------------------------------------------- meshsample
def test_sample_surface_on_cube():
    verts, faces = _cube_mesh()
    rng = np.random.default_rng(1)
    pts, fidx = sample_surface(verts, faces, 2000, rng)
    assert pts.shape == (2000, 3) and fidx.shape == (2000,)
    # every sample lies ON a cube face: one coordinate is exactly 0 or 1
    on_face = np.isclose(pts, 0.0, atol=1e-12) | np.isclose(pts, 1.0,
                                                            atol=1e-12)
    assert on_face.any(axis=1).all()
    assert (pts >= -1e-12).all() and (pts <= 1 + 1e-12).all()
    # area-uniform: each of the 6 faces draws ~1/6 of the samples
    face_of = fidx // 2
    counts = np.bincount(face_of, minlength=6)
    assert (counts > 2000 / 6 * 0.7).all()
    # normals are unit and axis-aligned for the cube
    n = face_normals(verts, faces)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, rtol=1e-12)
    pn = sample_surface_with_normals(verts, faces, 16, rng)
    assert pn.shape == (16, 6) and pn.dtype == np.float32


# ----------------------------------------------------------------- smpl_np
def test_smpl_numpy_rest_and_rigid_rotation(tmp_path):
    model = str(tmp_path / "smpl.pkl")
    _write_tiny_smpl(model)
    smpl = SMPLNumpy(model)
    assert smpl.parents[0] == -1 and (smpl.parents[1:] >= 0).all()

    T, J = 3, 24
    zero_go = np.zeros((T, 1, 3))
    zero_bp = np.zeros((T, J - 1, 3))
    trans = np.arange(T * 3, dtype=np.float64).reshape(T, 3)

    # zero pose: vertices == scaling * template + transl
    v = smpl.forward(zero_go, zero_bp, trans, scaling=2.0)
    expect = 2.0 * smpl.v_template[None] + trans[:, None]
    np.testing.assert_allclose(v, expect, atol=1e-5)

    # joints regress from vertices
    jnts = smpl.joints_from_vertices(v)
    np.testing.assert_allclose(
        jnts, np.einsum("jv,tvk->tjk", smpl.J_regressor, v), atol=1e-5)

    # pure global orientation = rigid rotation about the root joint
    rotvec = np.array([0.3, -0.2, 0.5])
    go = np.broadcast_to(rotvec, (T, 1, 3)).copy()
    v_rot = smpl.forward(go, zero_bp, np.zeros((T, 3)), scaling=1.0)
    Rm = rodrigues(rotvec[None])[0]
    j0 = smpl.J_regressor @ smpl.v_template
    j0 = j0[0]
    expect = (smpl.v_template - j0) @ Rm.T + j0
    np.testing.assert_allclose(v_rot, np.broadcast_to(expect, v_rot.shape),
                               atol=1e-5)


# ------------------------------------------------------- D-FAUST script
def test_prepare_dfaust_main_end_to_end(tmp_path):
    h5py = pytest.importorskip("h5py")
    from neural_marionette_tpu.data import prepare_dfaust

    verts, faces = _cube_mesh()
    Tseq = 2
    seq_verts = np.stack([verts, verts + [0.1, 0.0, 0.0]])  # (T, V, 3)
    droot = tmp_path / "D-FAUST"
    droot.mkdir()
    with h5py.File(droot / "registrations_m.hdf5", "w") as f:
        # reference hdf5 layout: (V, 3, T)
        f["50002_chicken_wings"] = seq_verts.transpose(1, 2, 0)
        f["faces"] = faces
    subjects = tmp_path / "subjects_and_sequences.txt"
    subjects.write_text("50002 (male)\n  chicken_wings\n  missing_seq\n")

    prepare_dfaust.main(["--path", str(droot),
                         "--subjects_file", str(subjects),
                         "--n_points", "64"])

    out = np.load(droot / "surface" / "50002" / "chicken_wings.npy")
    assert out.shape == (Tseq, 64, 6) and out.dtype == np.float32
    # frame 1 is frame 0 shifted +0.1 in x: sampled clouds live in the
    # shifted bbox
    assert out[1, :, 0].min() >= 0.1 - 1e-6

    # manual split placement (same as upstream), then the L1 loader
    split_dir = droot / "surface" / "train" / "50002"
    split_dir.mkdir(parents=True)
    os.rename(droot / "surface" / "50002" / "chicken_wings.npy",
              split_dir / "chicken_wings.npy")
    from neural_marionette_tpu.data.datasets import DFAUST
    cfg = MarionetteConfig(grid_size=32, Ttot=2, sample_rate=1,
                           n_points=32, data_root=str(tmp_path),
                           dataset="dfaust")
    ds = DFAUST(train=True, options=cfg)
    assert len(ds) == 1
    w = ds[0]
    assert w.shape == (2, 32, 3) and w.dtype == np.float32
    assert np.abs(w).max() <= 1.0 + 1e-5  # episodic normalization


# --------------------------------------------------------- AIST++ script
def test_prepare_aistpp_main_end_to_end(tmp_path):
    from neural_marionette_tpu.data import prepare_aistpp

    model = str(tmp_path / "smpl.pkl")
    _write_tiny_smpl(model)

    anno = tmp_path / "aist_plusplus_final"
    motions = anno / "motions"
    motions.mkdir(parents=True)
    rng = np.random.default_rng(3)
    Tseq, n_seqs = 3, 12
    names = [f"gBR_sBM_cAll_d{i:02d}_mBR0_ch{i:02d}" for i in range(n_seqs)]
    for name in names:
        with open(motions / (name + ".pkl"), "wb") as f:
            pickle.dump({"smpl_poses": rng.normal(0, 0.1, (Tseq, 72)),
                         "smpl_scaling": np.array([1.5]),
                         "smpl_trans": rng.normal(0, 0.5, (Tseq, 3))}, f)
    # ignore list knocks one sequence out by its 26-char prefix
    (anno / "ignore_list.txt").write_text(names[0] + "\n")

    save = tmp_path / "aist_plusplus_smpl_joints"
    prepare_aistpp.main(["--anno_dir", str(anno), "--smpl_model", model,
                         "--save_dir", str(save), "--n_points", "64"])

    aff = np.load(save / "gt_affinity.npy")
    assert aff.shape == (24, 24)
    np.testing.assert_array_equal(aff, aff.T)       # symmetrized parents
    assert aff.sum() == 2 * 23                      # chain: 23 edges

    train = sorted(os.listdir(save / "surface" / "train"))
    test = sorted(os.listdir(save / "surface" / "test"))
    assert len(train) + len(test) == n_seqs - 1     # one ignored
    assert len(test) >= 1                           # 90/10 split happened
    for split, files in (("train", train), ("test", test)):
        for fn in files:
            pts = np.load(save / "surface" / split / fn)
            jts = np.load(save / "joints" / split / fn)
            ra = np.load(save / "root_aligns" / split / fn)
            assert pts.shape == (Tseq, 64, 3)
            assert jts.shape == (Tseq, 24, 3)
            assert ra.shape == (Tseq, 3, 3)
            # yaw alignments are rotations
            np.testing.assert_allclose(
                np.einsum("tij,tkj->tik", ra, ra),
                np.broadcast_to(np.eye(3), ra.shape), atol=1e-6)
    assert (save / "train_list.txt").exists()

    # written layout feeds the L1 AIST loader incl. eval joints + aligns
    from neural_marionette_tpu.data.datasets import AIST
    cfg = MarionetteConfig(grid_size=32, Ttot=2, sample_rate=1,
                           n_points=32, data_root=str(tmp_path),
                           dataset="aist", is_eval=1)
    ds = AIST(train=True, options=cfg, align_root=True)
    assert len(ds) == len(train)
    pts, joints = ds[0]
    assert pts.shape == (2, 32, 3) and joints.shape == (2, 24, 3)
    assert np.abs(pts).max() <= 1.0 + 1e-5


# ------------------------------------------- AIST++ at real data scale
def _write_real_scale_smpl(path):
    """SMPL-layout model at the REAL mesh scale: a procedurally-generated
    cylinder body with exactly SMPL's 6890 vertices and 13674 triangles
    (real SMPL: 13776 — within 1%), 24 joints on a chain through the axis.
    The fixture path then differs from real AIST++ only by the download
    (reference uses basicmodel_m ... v1.1.0.pkl at these shapes)."""
    R_, S = 130, 53                      # rings x segments = 6890 verts
    theta = np.linspace(0, 2 * np.pi, S, endpoint=False)
    z = np.linspace(0, 1.8, R_)
    verts = np.empty((R_ * S, 3))
    for r in range(R_):
        verts[r * S:(r + 1) * S, 0] = 0.15 * np.cos(theta)
        verts[r * S:(r + 1) * S, 2] = 0.15 * np.sin(theta)
        verts[r * S:(r + 1) * S, 1] = z[r]
    faces = []
    for r in range(R_ - 1):
        for s in range(S):
            a, b = r * S + s, r * S + (s + 1) % S
            c, d = a + S, b + S
            faces.append([a, b, d])
            faces.append([a, d, c])
    faces = np.asarray(faces, np.int64)
    assert len(verts) == 6890 and len(faces) == 13674

    J = 24
    joint_y = np.linspace(0.05, 1.75, J)
    rng = np.random.default_rng(0)
    # regressor: each joint regresses from its nearest vertex ring
    J_regressor = np.zeros((J, len(verts)))
    for j in range(J):
        d = np.abs(verts[:, 1] - joint_y[j])
        near = np.argsort(d)[:S]
        J_regressor[j, near] = 1.0 / S
    # skinning: soft assignment to the two nearest joints
    d = np.abs(verts[:, 1][:, None] - joint_y[None])
    w = np.exp(-d / 0.08)
    weights = w / w.sum(1, keepdims=True)
    parents = np.concatenate([[-1], np.arange(J - 1)])
    with open(path, "wb") as f:
        pickle.dump({"v_template": verts, "J_regressor": J_regressor,
                     "weights": weights, "kintree_table":
                         np.stack([np.where(parents < 0, 0, parents),
                                   np.arange(J)]),
                     "f": faces}, f)


@pytest.mark.slow
def test_prepare_aistpp_real_scale_and_training(tmp_path):
    """VERDICT r4 #8: run the L0 preprocessor at REAL AIST++ shapes — 6890-
    vertex SMPL forward, 20,000-point frames, reference-style sequence
    names and train/test split lists — then train one `--dataset aist
    --is_eval 1` epoch from the fixture tree through the real CLI, and
    check the GT affinity written by the preprocessor is consumed by the
    final eval (affinity_result.json)."""
    import subprocess
    import sys
    from neural_marionette_tpu.data import prepare_aistpp

    model = str(tmp_path / "smpl_real_scale.pkl")
    _write_real_scale_smpl(model)

    anno = tmp_path / "aist_plusplus_final"
    motions = anno / "motions"
    motions.mkdir(parents=True)
    rng = np.random.default_rng(7)
    Tseq, n_seqs = 24, 12
    genres = ["BR", "PO", "LO", "MH", "LH", "HO", "WA", "KR", "JS", "JB",
              "MB", "LB"]
    names = [f"g{g}_sBM_cAll_d{i:02d}_m{g}{i % 5}_ch{i:02d}"
             for i, g in enumerate(genres)]
    for name in names:
        # smooth dance-like pose tracks, real 72-dof layout
        t = np.arange(Tseq)[:, None]
        freq = rng.uniform(0.05, 0.3, 72)
        amp = rng.uniform(0.05, 0.4, 72)
        poses = amp * np.sin(freq * t + rng.uniform(0, 6.3, 72))
        with open(motions / (name + ".pkl"), "wb") as f:
            pickle.dump({"smpl_poses": poses,
                         "smpl_scaling": np.array([90.0]),  # real ~cm scale
                         "smpl_trans": rng.normal(0, 30.0, (Tseq, 3))}, f)
    (anno / "ignore_list.txt").write_text(names[0] + "\n")

    save = tmp_path / "aist_plusplus_smpl_joints"
    prepare_aistpp.main(["--anno_dir", str(anno), "--smpl_model", model,
                         "--save_dir", str(save), "--n_points", "20000"])

    # real shapes on disk
    train = sorted(os.listdir(save / "surface" / "train"))
    test = sorted(os.listdir(save / "surface" / "test"))
    assert len(train) + len(test) == n_seqs - 1
    pts = np.load(save / "surface" / "train" / train[0])
    jts = np.load(save / "joints" / "train" / train[0])
    assert pts.shape == (Tseq, 20000, 3)
    assert jts.shape == (Tseq, 24, 3)
    aff = np.load(save / "gt_affinity.npy")
    assert aff.shape == (24, 24) and aff.sum() == 2 * 23
    # reference-style split lists
    tlist = (save / "train_list.txt").read_text().split()
    assert sorted(t + ".npy" for t in tlist) == train

    # one real CLI training epoch from the fixture tree (tiny model so the
    # CPU step compiles fast; the DATA is full-scale)
    out_root = str(tmp_path / "out")
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = [sys.executable, os.path.join(REPO, "train.py"),
            "--dataset", "aist", "--apply_adjust_config", "0",
            "--platform", "cpu", "--data_root", str(tmp_path),
            "--output_root", out_root, "--exp_name", "real_scale",
            "--grid_size", "32", "--feat_dim", "32", "--nkeypoints", "6",
            "--Ttot", "4", "--Tcond", "2", "--sample_rate", "2",
            # nbatch=1: the 90/10 split leaves ONE test sequence and the
            # loader drops ragged tails — B=2 would yield zero eval batches
            "--nbatch", "1", "--n_points", "512", "--num_workers", "2",
            "--nlatent_kypt", "16", "--nhidden_kypt", "32",
            "--is_eval", "1", "--nepoch", "1", "--save_every", "1",
            "--log_gif_every", "100", "--mesh_data", "1",
            "--mesh_model", "1", "--detector_start", "0",
            "--learner_start", "0", "--affinity_anneal", "0"]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(args, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=1800)
    assert proc.returncode == 0, \
        f"train.py failed\nstdout:\n{proc.stdout[-4000:]}\n" \
        f"stderr:\n{proc.stderr[-4000:]}"
    found = {}
    for dirpath, _, files in os.walk(out_root):
        for f in files:
            found[f] = os.path.join(dirpath, f)
    assert "metrics.jsonl" in found
    import json
    with open(found["metrics.jsonl"]) as f:
        rec = json.loads(f.readline())
    assert np.isfinite(rec["train"]["total_loss"])
    assert "semantic" in rec["valid"]
    # the preprocessor-written GT affinity was consumed by the final eval
    assert "affinity_result.json" in found
    with open(found["affinity_result.json"]) as f:
        rec = json.load(f)
    assert rec["gt_edges"] == 23 and 0.0 <= rec["recovery"] <= 1.0
