"""Profiling & timing (TPU-native analog of the reference's Φ-Board benchmark page
and TF-profiler integration, /root/reference/phi/vis/_dash/board.py:25-91)."""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Tuple

import jax

__all__ = ['profile', 'profile_function', 'benchmark', 'Timer']


@contextlib.contextmanager
def profile(log_dir: str = '/tmp/phiflow_tpu_profile', host_tracer_level=2, python_tracer_level=1):
    """Trace device execution with jax.profiler; view in TensorBoard/Perfetto.

    >>> with utils.profile('/tmp/trace'):
    ...     step(v, s, p)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def profile_function(fn: Callable, *args, log_dir='/tmp/phiflow_tpu_profile', warmup=1, runs=3, **kwargs):
    """Profile a jitted function after warmup; returns (result, log_dir)."""
    result = None
    for _ in range(warmup):
        result = fn(*args, **kwargs)
    jax.block_until_ready(jax.tree_util.tree_leaves(result))
    with profile(log_dir):
        for _ in range(runs):
            result = fn(*args, **kwargs)
        jax.block_until_ready(jax.tree_util.tree_leaves(result))
    return result, log_dir


def benchmark(step_fn: Callable, state, n: int = 10, warmup: int = 2) -> Tuple[float, object]:
    """Wall-clock per step over n iterations (reference methodology:
    phi/vis/_vis_base.py:249 — warmup then timed steps, device-synchronized).

    `step_fn(*state) -> state'`. Returns (seconds_per_step, final_state)."""
    state = tuple(state) if isinstance(state, (tuple, list)) else (state,)
    for _ in range(warmup):
        result = step_fn(*state)
        state = result if isinstance(result, tuple) else (result,)
    jax.block_until_ready(jax.tree_util.tree_leaves(state))
    t0 = time.perf_counter()
    for _ in range(n):
        result = step_fn(*state)
        state = result if isinstance(result, tuple) else (result,)
    jax.block_until_ready(jax.tree_util.tree_leaves(state))
    per_step = (time.perf_counter() - t0) / n
    return per_step, state


class Timer:
    """Context timer: ``with Timer() as t: ...; print(t.elapsed)``."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.elapsed = time.perf_counter() - self.start
