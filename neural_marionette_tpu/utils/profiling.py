"""Tracing / profiling utilities (SURVEY.md §5).

The reference has no profiling at all (only a commented-out grad-norm
monitor, train.py:400-408).  This module provides the TPU-native kit:

* :class:`StepTimer` — ``block_until_ready``-based step timing with
  seqs/sec/chip throughput (the BASELINE.json north-star counter);
* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-compatible trace;
* :func:`start_server` — on-demand profiler server for live capture.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class StepTimer:
    """Wall-clock step timer with device synchronisation."""

    def __init__(self, items_per_step: float = 1.0):
        self.items_per_step = items_per_step
        self.times: list[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @contextlib.contextmanager
    def step(self, result_fn=None):
        self.start()
        out = {}
        yield out
        self.stop(out.get("result"))

    def mean_time(self, skip: int = 1) -> float:
        ts = self.times[skip:] if len(self.times) > skip else self.times
        return sum(ts) / max(len(ts), 1)

    def throughput(self, skip: int = 1) -> float:
        """items (e.g. voxel seqs) per second per process."""
        mt = self.mean_time(skip)
        return self.items_per_step / mt if mt > 0 else 0.0


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TensorBoard profile around a code block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    """Live-capture profiler server (connect via TensorBoard profile tab)."""
    return jax.profiler.start_server(port)


def device_memory_stats() -> dict:
    """Per-device HBM usage where the backend exposes it."""
    stats = {}
    for d in jax.devices():
        try:
            ms = d.memory_stats()
            stats[str(d)] = {
                "bytes_in_use": ms.get("bytes_in_use"),
                "peak_bytes_in_use": ms.get("peak_bytes_in_use"),
                "bytes_limit": ms.get("bytes_limit"),
            }
        except Exception:
            stats[str(d)] = None
    return stats


def loop_time(fn, *args, iters: int = 20) -> float:
    """Reliable per-iteration wall time through the axon tunnel.

    Per-call RPC overhead through the tunneled TPU is 50-150 ms, which
    swamps per-call timing, and ``block_until_ready`` alone reports
    garbage (ROADMAP.md).  This runs ``fn`` ``iters`` times inside ONE
    jitted ``lax.fori_loop`` with a data dependence between iterations
    (input scaled by ``1 + 1e-12 * carry`` — exact identity in bf16/f32
    but opaque to the compiler, so the body cannot be hoisted) plus a
    full-output reduction (so XLA cannot narrow the computation), then
    fetches once: overhead amortizes to 1/iters.
    """
    import jax.numpy as jnp
    x0, rest = args[0], args[1:]

    @jax.jit
    def loop(x, *rest):
        def body(i, s):
            out = fn(x * (1 + 1e-12 * s).astype(x.dtype), *rest)
            leaves = jax.tree.leaves(out)
            return sum(jnp.sum(o.astype(jnp.float32)) for o in leaves) \
                * jnp.float32(1e-20)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    c = loop.lower(x0, *rest).compile()
    float(c(x0, *rest))  # warmup + fetch
    t0 = time.perf_counter()
    float(c(x0, *rest))
    return (time.perf_counter() - t0) / iters
