"""Hybrid-gradient 3D convolution: plain XLA forward, strip-packed
weight-gradient.

Why.  At >= ~96 folded frames XLA's batch-minor conv layouts give the
forward (and the input-gradient) full 128-lane MXU tiles with only the
frames->next-128-multiple padding (BASELINE.md round-3/4 ladder), so the
strip-packed forward's block-Toeplitz FLOPs overhead is a net loss there.
The WEIGHT-gradient is different: its matmul's minor output dim is Cout,
which the MXU pads to 128 lanes — a structural 4x tile waste at Cout=32
(e.g. the k5 stem's dw measured 68.4 ms plain vs 23.5 ms strip-packed at
160 frames, BASELINE.md) that no frame count fixes, because the frame
axis is the *contraction* dim of that matmul.

What.  ``conv3d_hybrid`` is the plain SAME stride-1 conv3d with a
``jax.custom_vjp``:

* forward: ``lax.conv_general_dilated`` — identical HLO to ``nn.Conv``,
  so inference (never differentiated) is completely unchanged;
* input-gradient: the transpose of the plain forward (XLA's own dgrad);
* weight-gradient: the LINEAR TRANSPOSE of the strip-packed split conv
  (``stripconv.strip_convk_split_v1``) w.r.t. its kernel.  The split
  form's main conv2d contracts (S*Cin -> S*Cout) over the packed tensor,
  so its wgrad has S*Cout = 128 output lanes and costs only ~S/k extra
  FLOPs (1.33x at S=4, k=3) — against the plain wgrad's 128/Cout tile
  padding (4x at Cout=32).

Exactness.  The strip split conv equals the plain conv as a linear map of
the kernel for every input (exact-equivalence tests in
tests/test_stripconv.py), so its adjoint equals the plain conv's wgrad up
to float reassociation (f64 test in tests/test_hybridconv.py).

Reference workload: the decoder / stem / res-block convs of
`/root/reference/model/kypt_detector.py:264-272,417-460` — this module is
a TPU-only training-speed rewrite with no reference counterpart.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .stripconv import pack_strips, strip_convk_split_v1


def _plain_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3d_hybrid(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                  S: int) -> jnp.ndarray:
    """SAME stride-1 conv3d, plain forward, strip-packed weight-gradient.

    x (N, D, H, W, Cin); kernel (k, k, k, Cin, Cout) flax layout; bias
    (Cout,).  ``S``: strip size for the backward packing — requires
    D % S == 0 and (k-1)//2 <= S.
    """
    return _plain_conv(x, kernel) + bias


def _hybrid_fwd(x, kernel, bias, S):
    return conv3d_hybrid(x, kernel, bias, S), (x, kernel)


def _hybrid_bwd(S, res, g):
    x, kernel = res
    # input-gradient: transpose of the plain forward (XLA's dgrad —
    # batch-minor full tiles at the frame counts this path is routed for)
    dx, = jax.linear_transpose(lambda x_: _plain_conv(x_, kernel), x)(g)
    # weight-gradient: adjoint of the strip split form — the main
    # conv2d wgrad runs with S*Cout output lanes instead of Cout
    xp = pack_strips(x, S)
    gp = pack_strips(g, S)
    dw, = jax.linear_transpose(
        lambda w: strip_convk_split_v1(xp, w, None, S), kernel)(gp)
    db = g.sum(axis=(0, 1, 2, 3))
    return dx, dw, db


conv3d_hybrid.defvjp(_hybrid_fwd, _hybrid_bwd)


def hybrid_strip_size(Cout: int, D: int, k: int) -> int:
    """Largest useful backward strip size for a stage, or 0 if the hybrid
    path has no benefit / doesn't apply: S*Cout = 128 full lanes, the
    k-halo fits in a neighbour strip, and D divides into strips."""
    if Cout >= 128 or 128 % Cout:
        return 0  # wgrad lanes already full / unalignable
    S = 128 // Cout
    h = (k - 1) // 2
    while S >= 2 and (D % S or h > S):
        S //= 2
    if S < 2 or D % S or h > S:
        return 0
    return S
