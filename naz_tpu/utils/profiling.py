"""Tracing and per-phase timing.

The reference has no profiling beyond tqdm/print (SURVEY.md §5.1); here:

* :func:`trace` wraps ``jax.profiler`` for on-device traces viewable in
  TensorBoard/Perfetto;
* :func:`phase_timer` measures wall-clock per phase with device sync, so
  warmup vs sampling cost is attributable;
* :class:`GradEvalMeter` accumulates the north-star counter
  (grad-evals/s, BASELINE.md) from sampler info structs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np
import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def phase_timer(name: str, results: Optional[dict] = None, verbose: bool = True):
    """Wall-clock a phase, synchronizing outstanding device work at exit."""
    t0 = time.time()
    yield
    (jax.device_put(0.0) + 0).block_until_ready()  # fence
    dt = time.time() - t0
    if results is not None:
        results[name] = results.get(name, 0.0) + dt
    if verbose:
        print(f"[naz_tpu] {name}: {dt:.2f}s")


class GradEvalMeter:
    """Accumulate gradient-evaluation counts and elapsed time."""

    def __init__(self):
        self.evals = 0
        self.seconds = 0.0

    def add(self, num_grad_evals, seconds: float):
        self.evals += int(np.sum(np.asarray(num_grad_evals)))
        self.seconds += seconds

    @property
    def evals_per_s(self) -> float:
        return self.evals / self.seconds if self.seconds else float("nan")

    def __repr__(self):
        return f"GradEvalMeter({self.evals} evals, {self.evals_per_s:.1f}/s)"
