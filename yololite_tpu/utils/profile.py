"""Timing utilities: Profile context manager + jax profiler hooks.

Counterpart of reference utils/ops.py:18-63; device sync is the caller's job
(wrap jax calls with block_until_ready before exiting the context).
"""

from __future__ import annotations

import time
from contextlib import ContextDecorator


class Profile(ContextDecorator):
    """Accumulating wall-clock timer: `with Profile() as p: ...` then p.dt / p.t."""

    def __init__(self, t: float = 0.0):
        self.t = t  # cumulative seconds
        self.dt = 0.0  # last interval

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.dt = time.perf_counter() - self.start
        self.t += self.dt
        return False

    def __str__(self):
        return f"Elapsed time is {self.t} s"


def trace_to(log_dir: str):
    """Context manager for a jax profiler trace (view with TensorBoard/XProf)."""
    import jax

    return jax.profiler.trace(log_dir)
