"""Tracing & timing utilities — the auxiliary observability subsystem.

TPU-native counterpart of the reference's torch.autograd.profiler mode and
cuda.synchronize timing brackets (train.py:355-383 `profile()`,
test_dtu_dypcd.py:437-445): `jax.profiler` traces viewable in
TensorBoard/Perfetto plus a fenced wall-clock timer that is robust on the
axon relay (where `block_until_ready` returns before execution — a
device->host readback is the only reliable fence; see bench.py).
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


def fence(x):
    """Reliable execution fence: host readback of one element."""
    arr = x
    while isinstance(arr, (tuple, list, dict)):
        arr = jax.tree.leaves(arr)[0]
    flat = arr.reshape(-1)
    return float(jax.device_get(flat[0]))


class Timer:
    """Fenced timing of a jitted callable: dispatch `iters` times, fence
    once — relay RTT amortises across iterations."""

    def __init__(self, fn, warmup=2, iters=10):
        self.fn = fn
        self.warmup = warmup
        self.iters = iters

    def measure(self, *args, **kwargs):
        for _ in range(self.warmup):
            fence(self.fn(*args, **kwargs))
        t0 = time.perf_counter()
        out = None
        for _ in range(self.iters):
            out = self.fn(*args, **kwargs)
        fence(out)
        return (time.perf_counter() - t0) / self.iters


@contextlib.contextmanager
def profile_trace(logdir="/tmp/jax-trace"):
    """Capture an XLA device trace (chrome-trace equivalent of the
    reference's profile mode)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
