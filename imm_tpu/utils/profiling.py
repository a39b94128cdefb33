"""Profiling / timing harness (SURVEY.md §5 "Tracing/profiling").

- ``trace(dir)``: context manager around ``jax.profiler`` for TensorBoard /
  Perfetto traces of the jitted step.
- ``timed_call``: reliable wall timing on this machine. IMPORTANT: through
  the axon relay, ``block_until_ready`` can return before the device work
  finishes (observed: a 4096^3 matmul chain "completing" in 0.1 ms). The only
  trustworthy barrier is a host read of a scalar that data-depends on the
  computation, which is what this helper does.
- ``throughput``: images/sec from a step callable, the driver's metric.
"""

from __future__ import annotations

import contextlib
import statistics
import time
from collections.abc import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync_scalar(tree) -> float:
    """Force completion by reading one dependent scalar to the host."""
    leaves = jax.tree.leaves(tree)
    return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:1]))


def timed_call(f: Callable, *args, warmup: int = 2, iters: int = 5) -> float:
    """Median seconds per call of ``f`` with a real completion barrier."""
    for _ in range(warmup):
        _sync_scalar(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.time()
        _sync_scalar(f(*args))
        ts.append(time.time() - t0)
    return statistics.median(ts)


def throughput(
    step: Callable, state, rng: jax.Array, batch: int, scan_steps: int,
    iters: int = 5,
) -> tuple[float, object]:
    """Steady-state images/sec of a (state, rng) -> (state, metrics) step."""
    for _ in range(2):
        rng, k = jax.random.split(rng)
        state, m = step(state, k)
        float(m["loss/total"])
    ts = []
    for _ in range(iters):
        rng, k = jax.random.split(rng)
        t0 = time.time()
        state, m = step(state, k)
        float(m["loss/total"])
        ts.append(time.time() - t0)
    return batch * scan_steps / statistics.median(ts), state
