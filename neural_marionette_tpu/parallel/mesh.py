"""Device mesh + sharding utilities.

The reference has no distributed layer at all (SURVEY.md §2.7: one process,
one GPU).  This module is the green-field TPU design: a 2-D
``Mesh(('data', 'model'))`` where

* ``data``  shards the batch (pure data parallelism — the model is ~7M
  params, so gradients all-reduce over ICI via XLA's psum);
* ``model`` shards the *frame* axis of a sequence window for the detector's
  conv encoder (frames are independent per-frame work, so this is the
  sequence-parallel story for this model family: encode frames across
  chips, gather the tiny keypoint tensors for the sequential VRNN).

All communication is XLA collectives inserted from sharding annotations —
there is no hand-written NCCL/MPI analogue to port.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh.  ``data=-1`` uses all remaining
    devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, \
        f"mesh {data}x{model} != {n} available devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_spec() -> P:
    """Batch sharded over data, frames over model."""
    return P(DATA_AXIS, MODEL_AXIS)


def data_only_spec() -> P:
    return P(DATA_AXIS)


def replicated_spec() -> P:
    return P()


def check_batch_shape(mesh: Mesh, batch) -> None:
    """Guard: the (B, T) leading axes must divide the (data, model) mesh
    dims or XLA raises an opaque sharding error deep in compile.  Demo
    windows can be any T (e.g. 21), so fail loudly with the fix."""
    data = mesh.shape[DATA_AXIS]
    model = mesh.shape[MODEL_AXIS]
    B, T = batch.shape[0], batch.shape[1]
    if B % data != 0:
        raise ValueError(
            f"batch B={B} not divisible by mesh data={data}; pad the "
            f"batch or choose a mesh with data dividing B")
    if T % model != 0:
        raise ValueError(
            f"window T={T} not divisible by mesh model={model} (frame "
            f"sequence-parallel axis); use model=1, pick T divisible by "
            f"model, or shard this batch with data_only_spec()")


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh: (B, T, ...) -> B over data,
    T over model."""
    check_batch_shape(mesh, batch)
    sharding = NamedSharding(mesh, batch_spec())
    return jax.device_put(batch, sharding)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, replicated_spec())
    return jax.device_put(tree, sharding)
