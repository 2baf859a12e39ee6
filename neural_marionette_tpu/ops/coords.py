"""Coordinate-grid ops (CoordConv channels, voxel coordinate grids).

TPU-native equivalents of reference `utils/kypt_detector_utils.py:4-26`
(``add_coord_channels``).  Layout is channels-LAST (``(B, X1..XD, C)``)
throughout this framework: XLA's TPU conv lowering prefers the minor-most
channel dimension, and it keeps the lane dimension dense.
"""
from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp


@functools.lru_cache(maxsize=32)
def _coord_maps_np(spatial: tuple[int, ...]) -> np.ndarray:
    """Cached as NumPy, never jnp: an lru_cache of device values would
    capture tracers when first hit inside jit/remat tracing."""
    grids = [np.linspace(-1.0, 1.0, n, dtype=np.float32) for n in spatial]
    mesh = np.meshgrid(*grids, indexing="ij")  # D arrays of shape spatial
    return np.stack(mesh, axis=-1)  # (*spatial, D)


def coord_maps(spatial: tuple[int, ...], dtype=jnp.float32) -> jnp.ndarray:
    """(*spatial, D) meshgrid of per-axis linspace(-1, 1) coordinates."""
    maps = _coord_maps_np(tuple(int(s) for s in spatial))
    return jnp.asarray(maps, dtype=dtype)


def add_coord_channels(x: jnp.ndarray) -> jnp.ndarray:
    """Append D coordinate channels to ``(B, X1..XD, C)`` -> ``(B, X1..XD, C+D)``.

    Mirrors reference ``add_coord_channels`` (utils/kypt_detector_utils.py:4)
    but channels-last.
    """
    spatial = x.shape[1:-1]
    maps = coord_maps(spatial, x.dtype)
    maps = jnp.broadcast_to(maps, (x.shape[0],) + maps.shape)
    return jnp.concatenate([x, maps], axis=-1)
