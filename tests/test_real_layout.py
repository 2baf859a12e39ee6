"""Fixture-based real-data-layout tests.

No raw AIST++/D-FAUST data exists in this container, so these tests write a
MINIATURE on-disk tree following the reference's AIST layout
(reference dataset/dataset.py:94-186: surface/joints/root_aligns npy files
per split) and exercise (a) the AIST loader directly — including the
per-window ``align_root`` rotation semantics — and (b) one full
``train.py --dataset aist`` epoch through the real CLI driver.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from neural_marionette_tpu.config import MarionetteConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_FRAMES = 12   # per stored sequence
N_PTS = 300
K_GT = 4        # GT joint count (reference AIST has 24; any K' works)


def _rot_y(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float32)


def _write_aist_tree(root, n_train=3, n_test=2, seed=0,
                     n_frames=N_FRAMES):
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "aist_plusplus_smpl_joints")
    for split, n in [("train", n_train), ("test", n_test)]:
        for sub in ("surface", "joints", "root_aligns"):
            os.makedirs(os.path.join(base, sub, split), exist_ok=True)
        for i in range(n):
            name = f"g{split[0]}{i}_seq.npy"
            pts = rng.uniform(-0.5, 0.5,
                              size=(n_frames, N_PTS, 3)).astype(np.float32)
            # drift over time so windows differ
            pts += np.linspace(0, 0.3, n_frames)[:, None, None]
            joints = rng.uniform(-0.5, 0.5,
                                 size=(n_frames, K_GT, 3)).astype(np.float32)
            aligns = np.stack([_rot_y(0.1 * t + i) for t in range(n_frames)])
            np.save(os.path.join(base, "surface", split, name), pts)
            np.save(os.path.join(base, "joints", split, name), joints)
            np.save(os.path.join(base, "root_aligns", split, name), aligns)
    return base


@pytest.fixture(scope="module")
def aist_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("aist_data")
    _write_aist_tree(str(root))
    return str(root)


def _tiny_cfg(root, **kw):
    base = dict(dataset="aist", data_root=root, grid_size=32, nkeypoints=6,
                feat_dim=32, Ttot=4, Tcond=2, sample_rate=2, is_eval=1,
                nlatent_kypt=16, nhidden_kypt=32, nbatch=2, n_points=256,
                num_workers=0, random_crop=0)
    base.update(kw)
    return MarionetteConfig(**base)


def test_aist_loader_shapes_and_joints(aist_root):
    from neural_marionette_tpu.data import load_dataset
    cfg = _tiny_cfg(aist_root)
    for training, expect_n in [(True, 3), (False, 2)]:
        ds = load_dataset(training, cfg)
        assert len(ds) == expect_n
        pts, joints = ds[0]
        assert pts.shape == (cfg.Ttot, cfg.n_points, 3)
        assert pts.dtype == np.float32
        assert np.abs(pts).max() <= 1.0 + 1e-5
        assert joints.shape == (cfg.Ttot, K_GT, 3)


def test_aist_align_root_per_window_rotation(aist_root):
    """align_root applies the WINDOW-START frame's rotation to the whole
    normalized window (reference dataset.py:161-164 intent)."""
    from neural_marionette_tpu.data import load_dataset
    cfg = _tiny_cfg(aist_root, is_eval=0, n_points=N_PTS)
    ds_plain = load_dataset(True, cfg)
    ds_rot = load_dataset(True, cfg, align_root=True)
    # epoch-deterministic crops: same epoch => same window start
    for epoch in (0, 1):
        ds_plain.log_epoch(epoch)
        ds_rot.log_epoch(epoch)
        plain = ds_plain[1]
        rot = ds_rot[1]
        # recover the start the shared policy picked
        from neural_marionette_tpu.data.pipeline import select_window_start
        import random
        start = select_window_start(N_FRAMES, cfg.Ttot, cfg.sample_rate,
                                    False, epoch, random.Random(cfg.seed))
        rel = ds_rot.seq_path[1]
        r = np.load(os.path.join(ds_rot.align_root_dir, rel))[start]
        # rotation about the origin, then re-normalization so the rotated
        # window stays inside [-1,1]^3 (pipeline.window_from_sequence)
        from neural_marionette_tpu.data.pipeline import (
            episodic_normalization)
        expected = episodic_normalization(
            np.einsum("ij,tnj->tni", r, plain))
        np.testing.assert_allclose(rot, expected, atol=1e-6)
        assert np.abs(rot).max() <= 1.0 + 1e-5  # nothing leaves the grid
        if epoch == 1:
            assert start != 0  # the per-window (not frame-0) matrix was used


@pytest.mark.slow
def test_train_cli_one_epoch_aist(aist_root, tmp_path):
    """One real `train.py --dataset aist` epoch through the CLI against the
    miniature tree: loaders, driver, eval metrics, checkpoints, CSV dumps."""
    out_root = str(tmp_path / "out")
    args = [sys.executable, os.path.join(REPO, "train.py"),
            "--dataset", "aist", "--apply_adjust_config", "0",
            "--platform", "cpu", "--data_root", aist_root,
            "--output_root", out_root, "--exp_name", "fixture",
            "--grid_size", "32", "--feat_dim", "32", "--nkeypoints", "6",
            "--Ttot", "4", "--Tcond", "2", "--sample_rate", "2",
            "--nbatch", "2", "--n_points", "256", "--num_workers", "0",
            "--nlatent_kypt", "16", "--nhidden_kypt", "32",
            "--is_eval", "1", "--eval_voxel_chamfer", "1",
            "--nepoch", "1", "--save_every", "1", "--log_gif_every", "100",
            "--mesh_data", "1", "--mesh_model", "1",
            "--detector_start", "0", "--learner_start", "0",
            "--affinity_anneal", "0"]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(args, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=1500)
    assert proc.returncode == 0, \
        f"train.py failed\nstdout:\n{proc.stdout[-4000:]}\n" \
        f"stderr:\n{proc.stderr[-4000:]}"

    metrics_files = []
    csvs = []
    for dirpath, _, files in os.walk(out_root):
        for f in files:
            if f == "metrics.jsonl":
                metrics_files.append(os.path.join(dirpath, f))
            if f.endswith("_result.csv"):
                csvs.append(f)
    assert metrics_files, f"no metrics.jsonl under {out_root}"
    with open(metrics_files[0]) as f:
        rec = json.loads(f.readline())
    assert np.isfinite(rec["train"]["total_loss"])
    assert "semantic" in rec["valid"] and "voxel_chamfer" in rec["valid"]
    assert "semantic_result.csv" in csvs and "chamfer_result.csv" in csvs
