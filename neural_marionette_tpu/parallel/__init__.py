"""Distributed layer: device mesh, shardings (green-field TPU design)."""
from .mesh import (make_mesh, shard_batch, replicate, batch_spec,
                   data_only_spec, replicated_spec, DATA_AXIS, MODEL_AXIS)

__all__ = [
    "make_mesh", "shard_batch", "replicate", "batch_spec", "data_only_spec",
    "replicated_spec", "DATA_AXIS", "MODEL_AXIS",
]
