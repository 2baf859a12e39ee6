"""Point-cloud -> binary occupancy-grid voxelization.

Re-design of reference `utils/dataset_utils.py:21-31`.  Two paths:

* :func:`voxelize_np` — host (NumPy) path used by the CPU data pipeline,
  semantics-identical to the reference (truncating int cast, ``+1e-5`` step
  fudge, fixed ``[-1, 1]^3`` bbox) plus an index clip as an out-of-range
  guard (the reference would raise / wrap on stray points).
* :func:`voxelize_jnp` — on-device scatter (``.at[].max`` with ``mode=drop``
  for OOB safety) so voxelization can fuse into the jitted input pipeline;
  batched over leading dims via ``vmap``.  This is the op the Pallas scatter
  kernel (``neural_marionette_tpu/ops/pallas/voxelize_kernel.py``) replaces
  on TPU when point counts are large.

Output is channels-LAST: ``(G, G, G, 1)``.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _grid_params(grid_size: int):
    bmin = -1.0
    step = 2.0 / grid_size + 1e-5  # reference: (bbox_len / shape) + 1e-5
    return bmin, step


def voxelize_np(points: np.ndarray, grid_size: int) -> np.ndarray:
    """``(N, 3)`` float points in [-1, 1] -> ``(G, G, G, 1)`` float32 grid."""
    bmin, step = _grid_params(grid_size)
    idx = ((points[..., :3] - bmin) / step).astype(np.int32)
    idx = np.clip(idx, 0, grid_size - 1)  # OOB guard (deviation: ref wraps)
    grid = np.zeros((grid_size,) * 3 + (1,), dtype=np.float32)
    grid[idx[:, 0], idx[:, 1], idx[:, 2], 0] = 1.0
    return grid


def voxelize_jnp(points: jnp.ndarray, grid_size: int,
                 strict: bool = False) -> jnp.ndarray:
    """Device scatter voxelizer.  ``(..., N, 3)`` -> ``(..., G, G, G, 1)``.

    Out-of-range points are dropped (scatter ``mode='drop'``), never
    wrapped.  ``strict=True`` wraps the op in a ``checkify`` bounds check
    that reports stray points instead of silently dropping them (the
    sanitizer asked for in SURVEY.md §5 — the reference would wrap
    negative indices or crash).
    """
    if strict:
        from jax.experimental import checkify

        def _checked(p):
            bmin, step = _grid_params(grid_size)
            idx = jnp.floor((p[..., :3] - bmin) / step).astype(jnp.int32)
            checkify.check(
                jnp.all((idx >= 0) & (idx < grid_size)),
                f"voxelize: point index out of [0, {grid_size}) grid bounds")
            return voxelize_jnp(p, grid_size, strict=False)

        err, out = checkify.checkify(_checked)(points)
        err.throw()
        return out

    def _single(p):
        bmin, step = _grid_params(grid_size)
        idx = jnp.floor((p[:, :3] - bmin) / step).astype(jnp.int32)
        grid = jnp.zeros((grid_size,) * 3, dtype=jnp.float32)
        grid = grid.at[idx[:, 0], idx[:, 1], idx[:, 2]].max(
            1.0, mode="drop", unique_indices=False)
        return grid[..., None]

    batch_shape = points.shape[:-2]
    flat = points.reshape((-1,) + points.shape[-2:])
    out = jax.vmap(_single)(flat)
    return out.reshape(batch_shape + out.shape[1:])
