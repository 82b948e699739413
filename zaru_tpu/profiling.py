"""Profiling hooks.

The reference's observability is EMA timers + FPS logs (timer.rs); those
exist in :mod:`zaru_tpu.timer`. This module adds the TPU-native layer: XLA
profiler traces viewable in TensorBoard/Perfetto, scoped annotations that
show up on the device timeline, and a simple block timer that forces device
completion.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax

__all__ = ["trace", "annotate", "device_timer"]


@contextmanager
def trace(log_dir: str):
    """Captures an XLA profiler trace for the enclosed block
    (view with TensorBoard or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that appears on the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


@contextmanager
def device_timer(label: str = "block", sink=print):
    """Times a block including device completion.

    JAX dispatch is async and there is no global "wait for everything"
    primitive for *pure* computations, so the context yields a ``sync``
    callable — pass it the block's output arrays (it returns them
    unchanged) and they are blocked on before the clock is read::

        with device_timer("step") as sync:
            out = sync(step(params, x))
    """
    pending = []

    def sync(x):
        pending.append(x)
        return x

    start = time.perf_counter()
    try:
        yield sync
    finally:
        import numpy as np

        for p in pending:
            # A real device->host readback per leaf: block_until_ready
            # does NOT block through tunneled devices (CLAUDE.md), so it
            # would time async enqueue, not execution.
            for leaf in jax.tree_util.tree_leaves(p):
                np.asarray(leaf)
        jax.effects_barrier()  # flush effectful work (debug prints, etc.)
        sink(f"{label}: {(time.perf_counter() - start) * 1e3:.2f}ms")
