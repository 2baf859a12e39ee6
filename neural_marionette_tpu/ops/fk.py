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


# --------------------------------------------------------------------------
# Log-depth FK (product path).
#
# The scans above execute K sequential 3x3-matmul steps per call; inside the
# VRNN's time scan that is pure latency (K=24 dependent dispatches per frame).
# Pointer doubling cuts the chain to ceil(log2(K-1)) batched rounds: maintain
# ptr[k] = the ancestor 2^t edges above k (clamped at the root, whose parent
# is itself) and P[k] = the composed transform of the path segment
# (ptr[k], k].  Seeding the ROOT's entry with the identity (rotations) / zero
# (positions) makes the fixed point absorbing, so no masking is needed and
# extra rounds are harmless.  ``parents``/``priority_indices`` may be traced
# (they come from the on-device skeleton extractor), so everything below is
# gather-based; only K is static.


def _doubling_rounds(K: int) -> int:
    """Smallest t with 2^t >= K-1 (max root distance in a K-node tree)."""
    t = 0
    while (1 << t) < max(K - 1, 1):
        t += 1
    return t


def fk_global_rotations_parallel(R_local: jnp.ndarray,
                                 priority_indices: jnp.ndarray,
                                 parents: jnp.ndarray,
                                 inverse: bool = False) -> jnp.ndarray:
    """Pointer-doubling equivalent of :func:`fk_global_rotations`.

    Invariant: after round t, ``P[k]`` is the ordered product of ``R_local``
    over the path (ptr[k], k], with the root's own entry fixed to I.  Once
    every ptr reaches the root, ``Rglob[k] = R_local[root] @ P[k]``
    (non-inverse) — uniform in k because ``P[root] = I``.
    """
    B, K = R_local.shape[:2]
    root = priority_indices[0]
    is_root = (jnp.arange(K) == root)[None, :, None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R_local.dtype), R_local.shape)
    P = jnp.where(is_root, eye, R_local)
    ptr = parents
    for _ in range(_doubling_rounds(K)):
        Pp = jnp.take(P, ptr, axis=1)
        P = (P @ Pp) if inverse else (Pp @ P)
        ptr = ptr[ptr]
    R_root = jnp.take(R_local, root, axis=1)[:, None]   # (B, 1, 3, 3)
    return (P @ R_root) if inverse else (R_root @ P)


def fk_positions_parallel(R_global: jnp.ndarray,
                          offset: jnp.ndarray,
                          root_pos: jnp.ndarray,
                          priority_indices: jnp.ndarray,
                          parents: jnp.ndarray) -> jnp.ndarray:
    """Pointer-doubling equivalent of :func:`fk_positions`.

    ``pos[k] = root_pos + sum_{a in path(root, k], a != root} Rg[a] @ off[a]``
    — the root's summand is zeroed so the doubling fixed point is absorbing.
    """
    B, K = offset.shape[:2]
    root = priority_indices[0]
    v = jnp.einsum("bkij,bkj->bki", R_global, offset)
    v = jnp.where((jnp.arange(K) == root)[None, :, None],
                  jnp.zeros((), dtype=v.dtype), v)
    ptr = parents
    for _ in range(_doubling_rounds(K)):
        v = v + jnp.take(v, ptr, axis=1)
        ptr = ptr[ptr]
    return root_pos[:, None, :] + v
