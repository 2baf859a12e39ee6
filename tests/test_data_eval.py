"""Tests for the data pipeline, synthetic dataset, loader, and eval metrics."""
import random

import numpy as np
import pytest

from neural_marionette_tpu.config import MarionetteConfig
from neural_marionette_tpu.data import (
    DataLoader, Synthetic, crop_sequence, episodic_normalization,
    fix_point_count, load_dataset, pad_short_sequence, prefetch_to_device,
    select_window_start, window_from_sequence)
from neural_marionette_tpu.eval import (evaluate, semantic_final,
                                        semantic_scores, voxel_chamfer)


def test_crop_sequence():
    seq = np.arange(20)[:, None, None]
    out = crop_sequence(seq, start=2, T=4, sample_rate=3)
    np.testing.assert_array_equal(out[:, 0, 0], [2, 5, 8, 11])


def test_episodic_normalization_bbox():
    g = np.random.default_rng(0)
    seq = g.uniform(5, 9, size=(6, 100, 3))
    out = episodic_normalization(seq)
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6
    # episodic: the same transform for all frames (relative motion kept)
    d_orig = seq[1] - seq[0]
    d_norm = out[1] - out[0]
    ratio = d_norm / d_orig
    assert np.allclose(ratio, ratio.flat[0], rtol=1e-5)


def test_episodic_normalization_joints():
    g = np.random.default_rng(1)
    seq = g.uniform(-3, 3, size=(4, 50, 3))
    joints = seq[:, :5].copy()
    out, j = episodic_normalization(seq, joints=joints)
    np.testing.assert_allclose(out[:, :5], j, atol=1e-9)


def test_pad_short_sequence():
    x = np.arange(3)[:, None]
    out = pad_short_sequence(x, T=5, sample_rate=1)
    np.testing.assert_array_equal(out[:, 0], [0, 1, 2, 2, 2])


def test_select_window_start_random_fits():
    rng = random.Random(0)
    for _ in range(50):
        s = select_window_start(30, T=5, sample_rate=3, random_crop=True,
                                epoch_id=0, rng=rng)
        assert 0 <= s and s + 3 * 4 < 30


def test_select_window_start_deterministic():
    rng = random.Random(0)
    starts = [select_window_start(100, T=5, sample_rate=2, random_crop=False,
                                  epoch_id=e, rng=rng) for e in range(10)]
    assert starts == [select_window_start(100, 5, 2, False, e,
                                          random.Random(1))
                      for e in range(10)]  # rng unused in this mode
    for e, s in enumerate(starts):
        assert 0 <= s and s + 2 * 4 < 100


def test_fix_point_count():
    g = np.random.default_rng(0)
    pts = g.normal(size=(3, 100, 3))
    down = fix_point_count(pts, 50, g)
    up = fix_point_count(pts, 200, g)
    assert down.shape == (3, 50, 3) and up.shape == (3, 200, 3)


def test_synthetic_dataset_and_loader():
    cfg = MarionetteConfig(dataset="synthetic", Ttot=4, sample_rate=2,
                           nkeypoints=6, is_eval=1, nbatch=4)
    ds = load_dataset(True, cfg, n_points=256, n_sequences=8, seq_len=20)
    ds.log_epoch(0)
    assert len(ds) == 8
    pts, joints = ds[0]
    assert pts.shape == (4, 256, 3)
    assert joints.shape[0] == 4 and joints.shape[2] == 3
    assert np.abs(pts).max() <= 1.0 + 1e-5
    # deterministic content per index
    pts2, _ = ds[0]
    assert pts.shape == pts2.shape

    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    b_pts, b_joints = batches[0]
    assert b_pts.shape == (4, 4, 256, 3)

    # prefetch to default devices
    for batch in prefetch_to_device(iter(batches), buffer_size=2):
        pass


def test_window_from_sequence_with_joints():
    g = np.random.default_rng(0)
    x = g.uniform(-2, 2, size=(30, 64, 3))
    joints = g.uniform(-2, 2, size=(30, 5, 3))
    pts, j = window_from_sequence(x, T=4, sample_rate=2, random_crop=True,
                                  epoch_id=0, rng=random.Random(0),
                                  joints=joints)
    assert pts.shape == (4, 64, 3) and j.shape == (4, 5, 3)


def test_semantic_scores_perfect_match():
    g = np.random.default_rng(2)
    gt = g.uniform(-1, 1, size=(2, 3, 4, 3))
    # predictions exactly at GT with full intensity, plus 2 decoys
    pred = np.concatenate([
        np.concatenate([gt, np.ones((2, 3, 4, 1))], axis=-1),
        np.tile(np.array([5.0, 5, 5, 1.0]), (2, 3, 2, 1))], axis=2)
    scores, log = semantic_scores(None, pred, gt)
    assert log == pytest.approx(1.0)
    assert semantic_final(scores) == pytest.approx(1.0)


def test_semantic_scores_low_intensity_invalidated():
    gt = np.zeros((1, 1, 1, 3))
    pred = np.zeros((1, 1, 2, 4))
    pred[0, 0, 0] = [0, 0, 0, 0.1]   # exact match but intensity < 0.2
    pred[0, 0, 1] = [0.5, 0, 0, 0.9]
    scores, _ = semantic_scores(None, pred, gt)
    assert scores[0, 1] == 1 and scores[0, 0] == 0


def test_voxel_chamfer_identical_is_zero():
    g = np.random.default_rng(3)
    vox = (g.uniform(size=(1, 2, 8, 8, 8, 1)) > 0.9).astype(np.float32)
    assert voxel_chamfer(vox, vox) == pytest.approx(0.0)
    # shifted recon has positive chamfer
    recon = np.roll(vox, 2, axis=2)
    assert voxel_chamfer(vox, recon) > 0


def test_evaluate_dispatch():
    g = np.random.default_rng(4)
    gt = g.uniform(-1, 1, size=(1, 2, 3, 3))
    pred = np.concatenate([gt, np.ones((1, 2, 3, 1))], axis=-1)
    out = evaluate("semantic", None, {"keypoints": pred,
                                      "gt_keypoints": gt})
    assert out["scores_log"] == pytest.approx(1.0)
    with pytest.raises(ValueError):
        evaluate("nope", None, {})


# ------------------------------------------------- L0 preprocessors (pure)
def test_prepare_aistpp_yaw_alignment():
    """yaw_alignment must cancel exactly the yaw component of a SMPL
    global orientation (reference prepare_aistpp root_aligns semantics)."""
    from scipy.spatial.transform import Rotation as R
    from neural_marionette_tpu.data.prepare_aistpp import yaw_alignment
    rng = np.random.default_rng(0)
    # pure yaw: the alignment cancels it exactly
    for _ in range(5):
        yaw = float(rng.uniform(-89, 89))  # xyz-euler of pure yaw is
        # unambiguous only within (-90, 90) - same quirk as the reference
        rot = R.from_euler("y", yaw, degrees=True)
        align = yaw_alignment(rot.as_rotvec())
        np.testing.assert_allclose(align @ rot.as_matrix(), np.eye(3),
                                   atol=1e-9)
    # mixed rotation: the alignment is a pure y-axis rotation cancelling
    # the extracted xyz-euler yaw component
    for _ in range(5):
        euler = rng.uniform(-60, 60, size=3)
        rot = R.from_euler("xyz", euler, degrees=True)
        align = yaw_alignment(rot.as_rotvec())
        expected = R.from_euler("y", euler[1], degrees=True).as_matrix().T
        np.testing.assert_allclose(align, expected, atol=1e-9)
        np.testing.assert_allclose(align @ align.T, np.eye(3), atol=1e-9)


def test_prepare_dfaust_parse_subjects(tmp_path):
    from neural_marionette_tpu.data.prepare_dfaust import parse_subjects_file
    f = tmp_path / "subjects_and_sequences.txt"
    f.write_text("50002 (male)\n  chicken_wings\n  hips\n"
                 "50004 (female)\n  jumping_jacks\n\n")
    out = parse_subjects_file(str(f))
    assert out == {"50002": ("male", ["chicken_wings", "hips"]),
                   "50004": ("female", ["jumping_jacks"])}


def test_affinity_recovery_chain():
    from neural_marionette_tpu.eval import affinity_recovery
    # GT: 4-joint chain 0-1-2-3 (3 edges)
    gt = np.zeros((4, 4))
    for i in range(3):
        gt[i, i + 1] = gt[i + 1, i] = 1
    # semantic histogram maps GT joint i -> predicted keypoint perm[i]
    perm = [2, 0, 3, 1]
    hist = np.zeros((4, 6))
    for i, p in enumerate(perm):
        hist[i, p] = 10
    # predicted skeleton recovers edges (2,0) and (0,3) but not (3,1):
    # parents: 0->2, 3->0, 1->5 (wrong), 5 root
    parents = np.array([2, 5, -1, 0, -1, -1])
    out = affinity_recovery(gt, parents, hist)
    assert out["gt_edges"] == 3
    assert out["recovered"] == 2
    assert out["collapsed"] == 0
    assert out["recovery"] == pytest.approx(2 / 3)
    # collapsed assignment: two GT joints on one keypoint
    hist[1] = 0
    hist[1, 2] = 5  # joint 1 now also maps to keypoint 2 (same as joint 0)
    out = affinity_recovery(gt, parents, hist)
    assert out["collapsed"] >= 1


def test_synthetic_gt_affinity_and_memo():
    from neural_marionette_tpu.data.datasets import Synthetic
    cfg = MarionetteConfig(dataset="synthetic", nkeypoints=6)
    ds = Synthetic(train=True, options=cfg, n_sequences=4, seq_len=12)
    aff = ds.gt_affinity()
    assert aff.shape == (6, 6)
    assert aff.sum() == 2 * 5 and np.array_equal(aff, aff.T)
    # memoization: second access returns the identical cached arrays
    p1 = ds._generate_memo(0)[0]
    p2 = ds._generate_memo(0)[0]
    assert p1 is p2
