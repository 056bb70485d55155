"""Wall-clock benchmark harness (replaces the reference's
``wall_clock_timer.h``, SURVEY.md C16): compile-excluded timing with
``jax.block_until_ready`` fencing.
"""

from __future__ import annotations

import time

import jax


def time_fn(fn, *args, iters: int = 3, warmup: int = 1):
    """Best-of-``iters`` wall time of ``fn(*args)`` in seconds.

    Runs ``warmup`` untimed calls first (absorbs jit compilation), fences
    every call with ``block_until_ready`` on all output leaves.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best
