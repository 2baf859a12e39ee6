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
