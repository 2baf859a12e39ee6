"""Multi-host / multi-slice runtime initialisation (SURVEY.md §5, §2.7).

The reference is single-process/single-GPU; this is the green-field layer:
``jax.distributed`` is the communication backend (no NCCL/MPI analogue to
write — XLA collectives over ICI within a slice, DCN across slices).

Failure handling: ``install_preemption_handler`` converts SIGTERM (the TPU
preemption signal) into a flag the training loop polls to checkpoint and
exit cleanly — the elastic-recovery analogue of the reference's
resume-from-latest-epoch UX (train.py:252-259).
"""
from __future__ import annotations

import signal
import threading
from typing import Optional

import jax

_preempted = threading.Event()


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialise the multi-host runtime.  No-op for single-process runs
    (auto-detection via TPU metadata handles standard deployments)."""
    if num_processes is not None and num_processes > 1 \
            or coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)


def warmup_collectives(mesh) -> None:
    """Pre-establish the communicator cliques for every mesh axis with
    tiny collectives BEFORE any big program runs.

    Backend comm contexts (gloo on CPU) are created lazily at the first
    execution of a collective over a device subset, with a ~30 s
    rendezvous timeout — while the first real train-step can take
    minutes to compile with rank-to-rank skew.  Warming with sub-second
    programs bounds the skew at context-creation time; the big programs
    then reuse the cached cliques.
    """
    if jax.process_count() == 1:
        return
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    import numpy as np
    ax = tuple(mesh.axis_names)
    shape = tuple(mesh.shape[a] for a in ax)
    local_rows = shape[0] // jax.process_count()
    if local_rows * jax.process_count() != shape[0]:
        print(f"[warmup_collectives] skipped: mesh axis 0 ({shape[0]}) not "
              f"divisible by process_count ({jax.process_count()}); first "
              "collective will pay the rendezvous skew", flush=True)
        return  # unusual process/mesh split; lazy init will handle it
    local = np.zeros((local_rows,) + shape[1:], np.float32)
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(*ax)), local)
    for axes in [ax[:1], ax[1:], ax]:
        if not axes:
            continue
        out_spec = P(*[a if a not in axes else None for a in ax])
        f = shard_map(lambda v, _axes=tuple(axes): jax.lax.psum(v, _axes),
                      mesh=mesh, in_specs=P(*ax), out_specs=out_spec)
        jax.block_until_ready(jax.jit(f)(x))


def process_info() -> tuple[int, int]:
    return jax.process_index(), jax.process_count()


def is_coordinator() -> bool:
    return jax.process_index() == 0


def install_preemption_handler() -> threading.Event:
    """SIGTERM -> preemption flag; poll :func:`preempted` in the epoch loop
    to save a final checkpoint before the VM disappears."""
    def _handler(signum, frame):
        _preempted.set()

    signal.signal(signal.SIGTERM, _handler)
    return _preempted


def preempted() -> bool:
    return _preempted.is_set()
