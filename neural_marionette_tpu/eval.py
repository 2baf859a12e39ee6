"""Quantitative evaluation metrics.

Re-implementation of reference `utils/eval_utils.py`:

* :func:`semantic_scores` — match each GT joint to the nearest predicted
  keypoint (low-intensity keypoints invalidated), accumulate a K'xK
  assignment histogram; score = mean over GT joints of the max assignment
  fraction (eval_utils.py:59-89, finalised :12-20).
* :func:`voxel_chamfer` — binarize recon at 0.5 and compute the symmetric
  chamfer distance between occupied-voxel coordinate sets, reported x1e4
  (eval_utils.py:29-55, :21-26).

Both run on host NumPy: they are validation-only, operate on
variable-size point sets, and are called once per epoch.
"""
from __future__ import annotations

import numpy as np


def semantic_scores(scores: np.ndarray | None, keypoints: np.ndarray,
                    gt_keypoints: np.ndarray,
                    intensity_threshold: float = 0.2):
    """Accumulate the assignment histogram for one batch.

    keypoints: (B, T, K, 4) predicted (xyz + intensity).
    gt_keypoints: (B, T, K', 3).
    Returns (scores (K', K), batch_score float).
    """
    kypt = np.array(keypoints, copy=True)
    B, T, K, _ = kypt.shape
    invalid = kypt[..., -1] < intensity_threshold
    kypt[invalid] = np.array([1e4, 1e4, 1e4, 1.0])
    pred = kypt[..., :-1][:, :, None]          # (B, T, 1, K, 3)
    gt = np.asarray(gt_keypoints)[:, :, :, None]  # (B, T, K', 1, 3)
    K_gt = gt.shape[2]

    if scores is None:
        scores = np.zeros((K_gt, K))

    dist = ((gt - pred) ** 2).sum(-1)              # (B, T, K', K)
    closest = dist.argmin(axis=-1).reshape(-1, K_gt)  # (B*T, K')
    batch_fracs = []
    for k_gt in range(K_gt):
        hist = np.bincount(closest[:, k_gt], minlength=K).astype(np.float64)
        scores[k_gt] += hist
        batch_fracs.append(hist.max() / hist.sum())
    return scores, float(np.mean(batch_fracs))


def semantic_final(scores: np.ndarray) -> float:
    """Final score from the accumulated histogram (eval_utils.py:12-20)."""
    total = scores[0].sum()
    norm = scores / total
    return float(norm.max(axis=-1).mean())


def voxel_chamfer(gt_voxel: np.ndarray, recon: np.ndarray,
                  threshold: float = 0.5) -> float:
    """Mean symmetric chamfer (x1e4) between occupied-voxel coordinates.

    gt_voxel / recon: (B, T, G, G, G, 1) channels-last, recon in [0, 1].
    """
    gt = np.asarray(gt_voxel)[..., 0]
    rc = (np.asarray(recon)[..., 0] >= threshold)
    B, T, G = gt.shape[:3]
    total = 0.0
    count = 0
    for b in range(B):
        for t in range(T):
            gt_coords = np.stack(np.nonzero(gt[b, t]), axis=-1) \
                / ((G - 1) / 2) - 1
            rc_coords = np.stack(np.nonzero(rc[b, t]), axis=-1) \
                / ((G - 1) / 2) - 1
            if len(gt_coords) == 0 or len(rc_coords) == 0:
                continue
            d = ((gt_coords[:, None] - rc_coords[None]) ** 2).sum(-1)
            total += d.min(axis=1).mean() + d.min(axis=0).mean()
            count += 1
    return float(total / max(count, 1)) * 1e4


def affinity_recovery(gt_affinity: np.ndarray, parents: np.ndarray,
                      semantic_hist: np.ndarray) -> dict:
    """Fraction of GT skeleton edges recovered by the extracted skeleton.

    The reference writes ``gt_affinity.npy`` during AIST++ preparation
    (reference dataset/aistpp/prepare_aistpp.py:66-73) but never consumes
    it; this metric closes that loop.  GT joints are mapped to predicted
    keypoints via the semantic assignment histogram (argmax per GT joint —
    the same mapping semantic_final scores), and a GT edge (i, j) counts as
    recovered when the extracted skeleton (parent edges) connects the two
    mapped keypoints.

    gt_affinity: (K', K') symmetric 0/1.  parents: (K,) extracted-skeleton
    parent indices.  semantic_hist: (K', K) accumulated assignment counts.
    """
    gt = np.asarray(gt_affinity)
    parents = np.asarray(parents)
    assign = np.asarray(semantic_hist).argmax(-1)          # (K',)
    pred_edges = {(int(min(k, p)), int(max(k, p)))
                  for k, p in enumerate(parents) if p >= 0 and p != k}
    gt_i, gt_j = np.nonzero(np.triu(gt, 1))
    recovered = 0
    collapsed = 0
    for i, j in zip(gt_i, gt_j):
        a, b = int(assign[i]), int(assign[j])
        if a == b:
            collapsed += 1  # both GT endpoints map to one keypoint
            continue
        if (min(a, b), max(a, b)) in pred_edges:
            recovered += 1
    n_gt = len(gt_i)
    return {"recovered": recovered, "collapsed": collapsed,
            "gt_edges": n_gt,
            "recovery": recovered / max(n_gt, 1)}


def evaluate(name: str, scores, params: dict):
    """Dispatch matching the reference surface (eval_utils.py:4-10)."""
    if name == "semantic":
        new_scores, log = semantic_scores(scores, params["keypoints"],
                                          params["gt_keypoints"])
        return {"scores": new_scores, "scores_log": log}
    if name == "voxel_chamfer":
        log = voxel_chamfer(params["voxel"], params["recon"])
        scores = (scores or []) + [log]
        return {"scores": scores, "scores_log": log}
    raise ValueError(f"invalid evaluation metric {name!r}")
