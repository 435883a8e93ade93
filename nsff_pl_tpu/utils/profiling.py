"""Profiling / tracing utilities.

The reference's observability is Lightning's `profiler="simple"` plus
manual `torch.cuda.synchronize()` timing (`train.py:300`, test.ipynb cell
3 — SURVEY.md §5). TPU-native equivalents:

- `trace(logdir)`: context manager around `jax.profiler` producing a
  Perfetto/XPlane trace viewable in TensorBoard's profile plugin
- `Timer`: wall-clock timing that forces device completion by fetching a
  value (NOTE: on the tunneled axon backend `block_until_ready` does not
  reliably await remote execution — a scalar fetch does; see bench.py)
- `rays_per_sec`: the throughput metric this framework reports
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: `with trace('logs/profile'): step(...)`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force(x) -> float:
    """Force completion of a computation graph by fetching one scalar."""
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(leaf)) if leaf.ndim else float(leaf)


class Timer:
    """Measure steady-state step time with a forced fetch at the end."""

    def __init__(self):
        self.t0: Optional[float] = None
        self.elapsed: float = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False


def rays_per_sec(batch_size: int, n_steps: int, elapsed: float) -> float:
    return batch_size * n_steps / max(elapsed, 1e-12)
