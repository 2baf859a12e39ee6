"""Detector / graph loss functions.

TPU-native re-implementations of reference `utils/kypt_detector_utils.py:
92-265` and the BCE reconstruction loss of `model/kypt_detector.py:91-92`.
All are pure jnp functions over channels-last layouts:

* ``seq``:        (B, T, G, G, G, 1)
* ``heatmaps``:   (B, T, g, g, g, K)
* ``keypoints``:  (B, T, K, D+1)
* ``affinity``:   (nneighbor, K, K, 1)

The volume-fitting chamfer loss is restructured for HBM economy: instead of
materialising a (B, K, 3, G, G, G) distance tensor per frame (reference
kypt_detector_utils.py:141-153), the min-over-keypoints runs as a K-step
``lax.scan`` over fused (B, T, G, G, G) element-wise passes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .coords import coord_maps

_LOG_CLAMP = -100.0  # torch.nn.BCELoss clamps log() at -100


def bce_recon_loss(recon: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-(B, T) mean binary cross entropy over channel+spatial dims.

    Matches torch ``nn.BCELoss`` (log clamped at -100) applied in reference
    kypt_detector.py:91-92.
    """
    log_p = jnp.maximum(jnp.log(recon), _LOG_CLAMP)
    log_1p = jnp.maximum(jnp.log1p(-recon), _LOG_CLAMP)
    nll = -(target * log_p + (1.0 - target) * log_1p)
    return jnp.mean(nll, axis=tuple(range(2, nll.ndim)))  # (B, T)


def keypoint_sparsity_loss(heatmaps: jnp.ndarray) -> jnp.ndarray:
    """L1 of spatial-mean heatmap activations, mean over K -> (B, T).

    Reference utils/kypt_detector_utils.py:92-103.
    """
    spatial_axes = tuple(range(2, heatmaps.ndim - 1))
    heatmap_mean = jnp.mean(heatmaps, axis=spatial_axes)  # (B, T, K)
    return jnp.mean(jnp.abs(heatmap_mean), axis=2)  # (B, T)


def temporal_separation_loss(keypoints: jnp.ndarray,
                             sep_sigma: float) -> jnp.ndarray:
    """Gaussian penalty on similar displacement trajectories -> (B,).

    Reference utils/kypt_detector_utils.py:105-133.
    """
    coords = keypoints[..., :-1]  # (B, T, K, D)
    B, T, K, D = coords.shape
    displacement = coords - jnp.mean(coords, axis=1, keepdims=True)
    diff = jnp.sum(
        (displacement[:, :, :, None] - displacement[:, :, None]) ** 2,
        axis=-1)  # (B, T, K, K)
    diff = jnp.mean(diff, axis=1)  # (B, K, K)
    loss = jnp.exp(-diff / (2.0 * sep_sigma ** 2.0))
    loss = jnp.sum(loss, axis=(1, 2)) - K
    return loss / (K * (K - 1))


def volume_fitting_loss(seq: jnp.ndarray, keypoints: jnp.ndarray,
                        sigmas, vol_fit_type: str) -> jnp.ndarray:
    """Occupancy-weighted fit of keypoints to the voxel volume -> (B, T).

    Reference utils/kypt_detector_utils.py:135-169.  ``chamfer`` is the
    shipped default (train.py:96): per-voxel min squared distance to the
    nearest keypoint, averaged over occupied voxels.
    """
    B, T = seq.shape[:2]
    spatial = seq.shape[2:-1]
    if vol_fit_type == "none":
        return jnp.zeros((B, T), dtype=seq.dtype)

    occ = seq[..., 0]  # (B, T, G, G, G)
    grid = coord_maps(spatial, seq.dtype)  # (G, G, G, 3)
    K = keypoints.shape[2]

    if vol_fit_type == "chamfer":
        # |v - c|^2 = |v|^2 - 2 v.c + |c|^2: the v.c term is one
        # (G^3, 3) x (3, K) matmul per frame (MXU), so min-over-keypoints
        # touches the full grid ONCE instead of K times (the naive K-pass
        # running-min is pure HBM traffic).  HIGHEST precision keeps the
        # expansion exact in fp32; tiny cancellation negatives are clamped.
        kp = keypoints[..., :3]  # (B, T, K, 3)

        # TPU: fused Pallas kernel (dist+min+mask reduce in VMEM) — the
        # XLA lowering materialises the (G^3, B, K) dot tensor in HBM
        # between matmul and min (~18 ms/iter at the B=16 bench point);
        # the kernel streams occupancy once.  Exact same expansion and
        # JAX vjp tie conventions (tests/test_pallas.py); jnp path below
        # remains the CPU/test oracle.  Opt out: NM_PALLAS_CHAMFER=0.
        import os
        from .pallas.chamfer_kernel import (chamfer_num_pallas,
                                            chamfer_supported)
        cubic = len(set(spatial)) == 1
        if (cubic and chamfer_supported(spatial[0])
                and jax.default_backend() == "tpu"
                and os.environ.get("NM_PALLAS_CHAMFER", "1") != "0"):
            G = spatial[0]
            M = B * T
            num = chamfer_num_pallas(
                kp.reshape(M, -1, 3), occ.reshape(M, G ** 3), G)
            num = num.reshape(B, T).astype(seq.dtype)
            den = jnp.sum(occ.reshape(B, T, -1), axis=-1)
            return num / jnp.maximum(den, 1.0)
        V = grid.reshape(-1, 3)                      # (G^3, 3)
        v2 = jnp.sum(V * V, axis=-1)                 # (G^3,)
        occ_flat = occ.reshape(B, T, -1)             # (B, T, G^3)

        # checkpoint: without it the lax.map stores the (T, G^3, B, K)
        # dots tensor (1.0 GB f32 at the flagship point) as backward
        # residuals; recomputing the 1.5-GFLOP matmul is ~free
        @jax.checkpoint
        def timestep(args):
            kp_t, occ_t = args                       # (B, K, 3), (B, G^3)
            dots = jnp.dot(V, kp_t.reshape(B * K, 3).T,
                           precision=jax.lax.Precision.HIGHEST)
            dots = dots.reshape(-1, B, K)            # (G^3, B, K)
            c2 = jnp.sum(kp_t * kp_t, axis=-1)       # (B, K)
            dmin = v2[:, None] + jnp.min(c2[None] - 2.0 * dots, axis=-1)
            dmin = jnp.maximum(dmin, 0.0)            # (G^3, B)
            return jnp.sum(dmin * occ_t.T, axis=0)   # (B,)

        num = jax.lax.map(
            timestep, (jnp.moveaxis(kp, 1, 0), jnp.moveaxis(occ_flat, 1, 0)))
        num = jnp.moveaxis(num, 0, 1)                # (B, T)
        den = jnp.sum(occ_flat, axis=-1)
        return num / jnp.maximum(den, 1.0)

    if vol_fit_type == "gaussian":
        # Intended semantics: 3-D intensity-scaled blobs, max over K,
        # penalize uncovered occupancy.  The reference's gaussian branch is
        # broken upstream (non-default path): it slices keypoints to 3
        # columns (kypt_detector_utils.py:157) then feeds them to the
        # (D+1)-column extractor, yielding 2-D blobs scaled by the
        # z-coordinate and a (B, B, ...) broadcast at :164.  We implement
        # what the code plainly means to do (documented deviation).
        from .keypoints import render_gaussian_maps
        G = spatial[0]
        sig = jnp.asarray(sigmas, dtype=seq.dtype) * 4.0
        gmap = render_gaussian_maps(keypoints, sig, G)  # (B,T,G,G,G,K)
        mask = jnp.max(gmap, axis=-1)  # (B, T, G, G, G)
        num = jnp.sum((1.0 - mask) * occ, axis=(2, 3, 4))
        den = jnp.sum(occ, axis=(2, 3, 4))
        return num / den

    raise ValueError(f"unknown vol_fit_type {vol_fit_type!r}")


def graph_consistency_losses(keypoints: jnp.ndarray, affinity: jnp.ndarray,
                             local_const: bool = True, time_const: bool = True,
                             sparsity_const: bool = True, ver: int = 0):
    """(local, time, sparsity, intensity) graph losses.

    Reference utils/kypt_detector_utils.py:172-225.  ``intensity`` is
    hard-zero upstream and kept so here.
    """
    B, T, K, _ = keypoints.shape
    dtype = keypoints.dtype
    zero = jnp.zeros((1, 1), dtype=dtype)

    influence = jnp.max(affinity, axis=0)  # (K, K, 1)
    if ver == 2:
        influence = influence + jnp.swapaxes(influence, 0, 1)
    positions = keypoints[..., :3]
    infl = influence[None, None]  # (1, 1, K, K, 1)
    intensities = keypoints[..., -1][..., None, None]  # (B, T, K, 1, 1)
    dist = jnp.sum(
        (positions[:, :, :, None] - positions[:, :, None]) ** 2,
        axis=-1, keepdims=True)  # (B, T, K, K, 1)

    if local_const:
        lc = dist * infl * intensities if ver in (0, 2) else dist * infl
        local_loss = jnp.mean(lc, axis=(2, 3, 4))  # (B, T)
    else:
        local_loss = zero

    if time_const:
        dev = jnp.abs(dist - jnp.mean(dist, axis=1, keepdims=True))
        tc = dev * infl * intensities if ver in (0, 2) else dev * infl
        time_loss = jnp.mean(tc, axis=(2, 3, 4))  # (B, T)
    else:
        time_loss = zero

    if sparsity_const:
        aff = affinity[..., 0]  # (n, K, K)
        a_self = aff[:, None]   # (n, 1, K, K)
        a_other = aff[None]     # (1, n, K, K)
        sp = jnp.sum((a_self * a_other) ** 2, axis=1, keepdims=True)
        sp = sp - a_self ** 4   # remove self-self
        sp = jnp.sum(sp, axis=(0, 1))          # (K, K)
        sparsity_loss = jnp.mean(sp)[None, None]
    else:
        sparsity_loss = zero

    intensity_loss = zero  # dead upstream (kypt_detector_utils.py:222)
    return local_loss, time_loss, sparsity_loss, intensity_loss


def _cosine_similarity(x, y, eps=1e-6):
    """torch.nn.CosineSimilarity semantics, exactly:
    ``w12 / (max(||x||, eps) * max(||y||, eps))`` — EACH norm clamped
    separately (aten cosine_similarity; verified numerically vs torch).
    ``max(sqrt(w), eps) == sqrt(max(w, eps^2))`` for w >= 0, and clamping
    before the sqrt keeps the gradient finite at exactly-zero vectors
    (static keypoints produce zero velocities; an unclamped norm has a NaN
    gradient at 0).
    """
    w12 = jnp.sum(x * y, axis=-1)
    nx = jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=-1), eps * eps))
    ny = jnp.sqrt(jnp.maximum(jnp.sum(y * y, axis=-1), eps * eps))
    return w12 / (nx * ny)


def graph_trajectory_loss(keypoints: jnp.ndarray, affinity: jnp.ndarray,
                          ver: int = 0) -> jnp.ndarray:
    """Velocity/acceleration cosine-dissimilarity weighted by influence.

    Reference utils/kypt_detector_utils.py:228-265 -> (1, 1).
    """
    influence = jnp.max(affinity[..., 0], axis=0)  # (K, K)
    if ver == 2:
        influence = influence + influence.T
    infl = influence[None, None]  # (1, 1, K, K)

    vel = keypoints[:, 1:, :, :3] - keypoints[:, :-1, :, :3]  # (B, T-1, K, 3)
    acc = vel[:, 1:] - vel[:, :-1]  # (B, T-2, K, 3)

    vel_cos = (1.0 - _cosine_similarity(vel[:, :, :, None],
                                        vel[:, :, None])) / 2.0
    acc_cos = (1.0 - _cosine_similarity(acc[:, :, :, None],
                                        acc[:, :, None])) / 2.0

    if ver in (0, 2):
        inten = keypoints[..., -1][..., None]  # (B, T, K, 1)
        inten_v = (inten[:, 1:] + inten[:, :-1]) / 2.0
        inten_a = (inten_v[:, 1:] + inten_v[:, :-1]) / 2.0
        vel_term = jnp.mean(vel_cos * infl * inten_v, axis=(0, 1))
        acc_term = jnp.mean(acc_cos * infl * inten_a, axis=(0, 1))
    else:
        vel_term = jnp.mean(vel_cos * infl, axis=(0, 1))
        acc_term = jnp.mean(acc_cos * infl, axis=(0, 1))

    return jnp.mean(vel_term + acc_term)[None, None]


def gaussian_kl(mean_q, std_q, mean_p, std_p):
    """KL(N(mean_q, std_q) || N(mean_p, std_p)), element-wise diagonal.

    Matches torch.distributions.kl_divergence for Normal
    (reference hsvrnn_bvh.py:131).
    """
    var_ratio = (std_q / std_p) ** 2
    t1 = ((mean_q - mean_p) / std_p) ** 2
    return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))
