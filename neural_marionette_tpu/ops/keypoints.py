"""Keypoint ops: spatial soft-argmax and separable Gaussian rendering.

TPU-native re-designs of reference `utils/kypt_detector_utils.py:28-90`:

* :func:`extract_keypoints_from_heatmap` — the reference marginalises each
  axis in a Python loop; here each marginal is a single reduction and the
  whole op vectorises over a folded ``B*T`` batch axis.
* :func:`render_gaussian_maps` — the reference renders one keypoint at a
  time in a ``for k ... for t`` Python loop (kypt_detector.py:348-353);
  here all ``(B, T, K)`` blobs are rendered at once from three separable
  1-D Gaussians (outer-product broadcast), which XLA fuses into one pass.

Layouts are channels-last: heatmaps are ``(B, G1..GD, K)``.
"""
from __future__ import annotations

import jax.numpy as jnp


def extract_keypoints_from_heatmap(heatmap: jnp.ndarray) -> jnp.ndarray:
    """Spatial soft-argmax.  ``(B, G1..GD, K)`` -> ``(B, K, D+1)``.

    Matches reference semantics exactly (utils/kypt_detector_utils.py:28-55):
    intensity is the spatial mean normalised by the per-batch max over K
    (+1e-6); per-axis weights are sums of ``heatmap + 1e-6`` over the other
    axes, normalised, then taken as expectation weights over
    ``linspace(-1, 1, Gd)``.
    """
    spatial = heatmap.shape[1:-1]
    D = len(spatial)
    spatial_axes = tuple(range(1, 1 + D))

    intensity = jnp.mean(heatmap, axis=spatial_axes)  # (B, K)
    intensity = intensity / (jnp.max(intensity, axis=-1, keepdims=True) + 1e-6)

    coords = []
    for d, Gd in enumerate(spatial):
        other_axes = tuple(a for a in spatial_axes if a != d + 1)
        # sum of (heatmap + 1e-6) over other axes == sum + 1e-6 * prod(other)
        n_other = 1
        for a in other_axes:
            n_other *= heatmap.shape[a]
        weights = jnp.sum(heatmap, axis=other_axes) + 1e-6 * n_other  # (B, Gd, K)
        weights = weights / jnp.sum(weights, axis=1, keepdims=True)
        grid = jnp.linspace(-1.0, 1.0, Gd, dtype=heatmap.dtype)
        coord_d = jnp.einsum("bgk,g->bk", weights, grid)
        coords.append(coord_d)
    coords = jnp.stack(coords, axis=-1)  # (B, K, D)
    return jnp.concatenate([coords, intensity[..., None]], axis=-1)


def render_gaussian_maps(keypoints: jnp.ndarray, sigma, G: int) -> jnp.ndarray:
    """Render axis-aligned Gaussian blobs on a ``G^D`` grid, channels-last.

    ``keypoints``: ``(..., K, D+1)`` (coords in [-1, 1] + intensity).
    ``sigma``: scalar or ``(K,)`` per-keypoint widths.
    Returns ``(..., G1..GD, K)`` with ``exp(-(x-c)^2 / (2 (sigma/G)^2))``
    separable products scaled by intensity, matching reference
    ``extract_gaussian_map_from_keypoints`` (utils/kypt_detector_utils.py:57).
    """
    coords = keypoints[..., :-1]          # (..., K, D)
    intensities = keypoints[..., -1]      # (..., K)
    D = coords.shape[-1]
    sigma = jnp.asarray(sigma, dtype=keypoints.dtype)
    width = 2.0 * (sigma / G) ** 2.0      # scalar or (K,)
    if width.ndim == 0:
        width = jnp.broadcast_to(width, (coords.shape[-2],))  # (K,)

    grid = jnp.linspace(-1.0, 1.0, G, dtype=keypoints.dtype)  # (G,)
    # per-axis 1-D Gaussians: (..., K, D, G); width aligns with the K axis
    axis_maps = jnp.exp(
        -((grid - coords[..., None]) ** 2) / width[:, None, None])

    # outer product across axes; result (..., K, G, G, ..., G)
    out = axis_maps[..., 0, :]
    for d in range(1, D):
        out = out[..., None] * axis_maps[..., d, :].reshape(
            axis_maps.shape[:-2] + (1,) * d + (G,))
    out = out * intensities[..., None].reshape(
        intensities.shape + (1,) * D)

    # move K behind the spatial dims -> channels-last
    k_axis = out.ndim - 1 - D
    return jnp.moveaxis(out, k_axis, -1)
