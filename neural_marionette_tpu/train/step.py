"""Jitted, mesh-sharded train / eval / generate steps.

One compiled program per scheduler phase (the (detector, learner, affinity)
active-combination is static).  The batch rides the mesh as
``P('data', 'model')`` over (B, T): pure data parallelism over batch plus
frame-level sequence parallelism for the detector's conv encoder.  Gradient
all-reduce is XLA's psum from the replicated-params sharding — nothing is
hand-written.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding

from ..config import MarionetteConfig
from ..models.marionette import NeuralMarionette
from ..models.dynamics import SkeletonArrays
from ..ops.voxelize import voxelize_jnp
from ..parallel.mesh import batch_spec
from .losses import LOSS_LIST
from .state import TrainState, make_optimizer, make_update_mask


def _constrain_batch(batch, mesh: Optional[Mesh]):
    if mesh is None:
        return batch
    return jax.lax.with_sharding_constraint(
        batch, NamedSharding(mesh, batch_spec()))


def _as_voxels(batch, cfg: MarionetteConfig, dtype=None):
    """Accept either voxel batches (B, T, G, G, G, 1) or raw point batches
    (B, T, N, 3) — points are scattered into the occupancy grid ON DEVICE
    (the reference voxelizes per frame on the host, dataset.py:79-86).
    On TPU the Pallas one-hot-matmul kernel does the scatter.

    ``dtype``: occupancy is binary, so the voxel tensor is EXACT in
    bfloat16 — casting to the compute dtype here halves the largest
    in-jit intermediate (8.4 GB at B=8 G=64 f32; it stays live through
    the whole step for the BCE loss and the first-frame decoder bias).
    """
    if batch.ndim == 4 and batch.shape[-1] == 3:
        if jax.default_backend() == "tpu":
            from ..ops.pallas import voxelize_pallas
            batch = voxelize_pallas(batch, cfg.grid_size)
        else:
            batch = voxelize_jnp(batch, cfg.grid_size)
    if dtype is not None and batch.dtype != dtype:
        batch = batch.astype(dtype)
    return batch


def total_loss(out: dict[str, Any], weights: dict[str, float], dtype):
    """Weighted sum over the loss registry; absent losses contribute 0
    (mirrors reference train.py:389-398)."""
    total = jnp.zeros((), dtype)
    metrics = {}
    for name in LOSS_LIST:
        val = out.get(name)
        if val is None:
            val = jnp.zeros((), dtype)
        total = total + weights.get(name, 0.0) * val
        metrics[name] = val
    metrics["total_loss"] = total
    return total, metrics


def make_train_step(model: NeuralMarionette, cfg: MarionetteConfig,
                    weights: dict[str, float],
                    detector_active: bool, learner_active: bool,
                    affinity_active: bool,
                    mesh: Optional[Mesh] = None,
                    donate: bool = True):
    """Build the jitted train step for one scheduler phase."""
    tx = make_optimizer(cfg)
    w = dict(weights)

    accum = max(int(getattr(cfg, "grad_accum", 1)), 1)

    def step_fn(state: TrainState, batch,
                skeleton: Optional[SkeletonArrays]):
        rng, sample_rng, gumbel_rng = jax.random.split(state.rng, 3)

        def loss_fn(params, micro, rngs):
            micro = _as_voxels(micro, cfg, model.dtype)
            out = model.apply(params, micro,
                              detector_active=detector_active,
                              learner_active=learner_active,
                              affinity_active=affinity_active,
                              skeleton=skeleton,
                              rngs=rngs)
            return total_loss(out, w, micro.dtype)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        batch = _constrain_batch(batch, mesh)
        if accum == 1:
            (loss, metrics), grads = grad_fn(
                state.params, batch,
                {"sample": sample_rng, "gumbel": gumbel_rng})
        else:
            # gradient accumulation: sequential microbatches so only one
            # microbatch's activations are live at a time — this is how
            # B > 4 fits one chip at grid 64 (activation peaks, not
            # params, bound the batch size).  Unrolled rather than
            # lax.scan: XLA double-buffers scan-body temporaries (~+5G
            # measured at grid 64), while the unrolled chain reuses them.
            B = batch.shape[0]
            assert B % accum == 0, f"batch {B} % grad_accum {accum} != 0"
            micros = batch.reshape((accum, B // accum) + batch.shape[1:])
            keys = jax.random.split(sample_rng, accum)
            grads = metrics = None
            micro = micros[0]
            for i in range(accum):
                k1, k2 = jax.random.split(keys[i])
                (_, m), g = grad_fn(state.params, micro,
                                    {"sample": k1, "gumbel": k2})
                grads = g if grads is None else jax.tree.map(jnp.add,
                                                             grads, g)
                metrics = m if metrics is None else jax.tree.map(
                    jnp.add, metrics, m)
                if i + 1 < accum:
                    # data-dependence barrier: without it XLA freely
                    # interleaves the microbatch graphs and their
                    # activation peaks overlap (defeating accumulation)
                    grads, micro = jax.lax.optimization_barrier(
                        (grads, micros[i + 1]))
            inv = 1.0 / accum
            grads = jax.tree.map(lambda g: g * inv, grads)
            metrics = jax.tree.map(lambda v: v * inv, metrics)
        mask = make_update_mask(state.params, detector_active,
                                learner_active, affinity_active)
        grads = jax.tree.map(lambda g, m: g * m, grads, mask)
        # pre-clip global gradient norm: a standard training-health
        # scalar, and the object the multi-chip dryrun differential
        # compares across mesh shapes (post-Adam params amplify
        # reduction-order noise on near-zero grads to +/-lr sign flips)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u, m: u * m, updates, mask)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, opt_state=opt_state,
                                  rng=rng, step=state.step + 1)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model: NeuralMarionette, cfg: MarionetteConfig,
                   weights: dict[str, float],
                   detector_active: bool, learner_active: bool,
                   affinity_active: bool,
                   mesh: Optional[Mesh] = None):
    """Forward-only step returning metrics + tensors needed for logging."""
    w = dict(weights)

    def eval_fn(params, batch, skeleton, sample_rng):
        batch = _as_voxels(_constrain_batch(batch, mesh), cfg, model.dtype)
        out = model.apply(params, batch,
                          detector_active=True,
                          learner_active=learner_active,
                          affinity_active=affinity_active,
                          skeleton=skeleton,
                          rngs={"sample": sample_rng,
                                "gumbel": jax.random.fold_in(sample_rng, 1)})
        _, metrics = total_loss(out, w, batch.dtype)
        tensors = {k: out[k] for k in
                   ("recon", "keypoints", "affinity", "kypt_recon")
                   if out.get(k) is not None}
        return metrics, tensors

    return jax.jit(eval_fn)


def make_generate_step(model: NeuralMarionette, cfg: MarionetteConfig,
                       affinity_active: bool = True,
                       mesh: Optional[Mesh] = None,
                       sample_num: int = 10):
    def gen_fn(params, batch, skeleton, sample_rng):
        batch = _as_voxels(_constrain_batch(batch, mesh), cfg, model.dtype)
        return model.apply(params, batch, skeleton,
                           affinity_active=affinity_active,
                           sample_num=sample_num,
                           method=NeuralMarionette.generate,
                           rngs={"sample": sample_rng})

    return jax.jit(gen_fn)
