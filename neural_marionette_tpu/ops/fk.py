"""Forward kinematics over a learned skeleton tree.

Re-design of reference `utils/geo_utils.py:3-27` (dict walk accumulating
global rotations) and `model/hsvrnn_bvh.py:272-277` (in-place position
updates): both become ``lax.scan`` over the priority order with functional
``.at[].set`` updates, so the whole FK chain jit-compiles and vmaps over
the best-of-N sample axis.

``priority_indices`` orders joints root-first by distance from the root, so
a parent's global transform is always written before its children read it
(same invariant the reference relies on).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def fk_global_rotations(R_local: jnp.ndarray,
                        priority_indices: jnp.ndarray,
                        parents: jnp.ndarray,
                        inverse: bool = False) -> jnp.ndarray:
    """Compose local -> global rotations along the tree.

    ``R_local``: (B, K, 3, 3); ``priority_indices``/``parents``: (K,) int32.
    ``inverse=False``: Rglob[c] = Rglob[parent] @ R[c]  (reference geo_utils:22)
    ``inverse=True``:  Rglob[c] = R[c] @ Rglob[parent]  (reference geo_utils:24)
    """
    B, K = R_local.shape[:2]

    def step(Rglob, i):
        idx = priority_indices[i]
        parent = parents[idx]
        Rl = R_local[:, idx]                       # (B, 3, 3)
        Rp = Rglob[:, parent]
        Rg = Rl @ Rp if inverse else Rp @ Rl
        Rg = jnp.where(i == 0, Rl, Rg)             # root: global == local
        return Rglob.at[:, idx].set(Rg), None

    Rglob0 = jnp.zeros_like(R_local)
    Rglob, _ = jax.lax.scan(step, Rglob0, jnp.arange(K))
    return Rglob


def fk_positions(R_global: jnp.ndarray,
                 offset: jnp.ndarray,
                 root_pos: jnp.ndarray,
                 priority_indices: jnp.ndarray,
                 parents: jnp.ndarray) -> jnp.ndarray:
    """Walk the tree accumulating joint positions.

    ``pos[c] = R_global[c] @ offset[c] + pos[parent]`` with
    ``pos[root] = root_pos`` (reference hsvrnn_bvh.py:272-277).

    ``R_global``: (B, K, 3, 3); ``offset``: (B, K, 3); ``root_pos``: (B, 3).
    """
    B, K = offset.shape[:2]

    def step(pos, i):
        idx = priority_indices[i]
        parent = parents[idx]
        p = jnp.einsum("bij,bj->bi", R_global[:, idx], offset[:, idx])
        p = p + pos[:, parent]
        p = jnp.where(i == 0, root_pos, p)
        return pos.at[:, idx].set(p), None

    pos0 = jnp.zeros((B, K, 3), dtype=offset.dtype)
    pos, _ = jax.lax.scan(step, pos0, jnp.arange(K))
    return pos
