"""2x trilinear upsampling as separable MXU contractions.

``jax.image.resize(method='linear')`` lowers to gather-heavy code on TPU
(~8x off memory-bandwidth speed-of-light for the decoder's 32^3 -> 64^3
stages).  Half-pixel 2x interpolation is a fixed sparse linear map per
axis — out[2i] = 0.25 in[i-1] + 0.75 in[i], out[2i+1] = 0.75 in[i] +
0.25 in[i+1], edges clamped — so we apply it as three einsum contractions
with a precomputed (2G, G) matrix, which XLA puts on the MXU.

Numerically identical to jax.image.resize up to summation order (the
interpolation matrix rows have exactly two non-zeros; the extra matmul
terms are exact zeros).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _interp_matrix_np(g_in: int) -> np.ndarray:
    """(2*g_in, g_in) half-pixel 2x linear interpolation matrix.

    Cached as NumPy (never jnp): an lru_cache of device arrays would
    capture tracers when first hit inside jit/remat tracing.
    """
    W = np.zeros((2 * g_in, g_in), dtype=np.float32)
    for i in range(g_in):
        lo = max(i - 1, 0)
        hi = min(i + 1, g_in - 1)
        W[2 * i, lo] += 0.25
        W[2 * i, i] += 0.75
        W[2 * i + 1, i] += 0.75
        W[2 * i + 1, hi] += 0.25
    return W


def _interp_matrix(g_in: int, dtype_name: str) -> jnp.ndarray:
    return jnp.asarray(_interp_matrix_np(g_in), dtype=jnp.dtype(dtype_name))


def upsample2_trilinear(x: jnp.ndarray) -> jnp.ndarray:
    """(B, X, Y, Z, C) -> (B, 2X, 2Y, 2Z, C), half-pixel trilinear
    (align_corners=False), via per-axis interpolation matmuls."""
    dt = x.dtype
    Wx = _interp_matrix(x.shape[1], jnp.dtype(dt).name)
    Wy = _interp_matrix(x.shape[2], jnp.dtype(dt).name)
    Wz = _interp_matrix(x.shape[3], jnp.dtype(dt).name)
    x = jnp.einsum("Xx,bxyzc->bXyzc", Wx, x)
    x = jnp.einsum("Yy,bxyzc->bxYzc", Wy, x)
    x = jnp.einsum("Zz,bxyzc->bxyZc", Wz, x)
    return x
