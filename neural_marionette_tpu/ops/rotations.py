"""Rotation ops: Zhou-et-al 6D -> 3x3 rotation (Gram-Schmidt).

Re-design of reference `utils/geo_utils.py:30-78` as a fully-batched jnp op
(the reference flattens to 2-D and uses three hand-written cross-product
helpers; here one vectorised function handles any leading batch shape).
"""
from __future__ import annotations

import jax.numpy as jnp


def rotation_6d_to_matrix(param: jnp.ndarray) -> jnp.ndarray:
    """``(..., 6)`` -> ``(..., 3, 3)``.

    x = normalize(a); z = normalize(x × b); y = z × x; R = [x | y | z]
    (columns), with the reference's 1e-10 norm guard
    (utils/geo_utils.py:30-39).
    """
    a = param[..., 0:3]
    b = param[..., 3:6]

    def _normalize(v):
        # 1e-20 inside the sqrt keeps the gradient finite at v == 0
        # (value-identical to the reference's sqrt(.) + 1e-10 guard)
        mag = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-20) + 1e-10
        return v / mag

    x = _normalize(a)
    z = _normalize(jnp.cross(x, b))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)  # columns
