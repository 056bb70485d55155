"""Wall-clock benchmark harness (replaces the reference's
``wall_clock_timer.h``, SURVEY.md C16): compile-excluded timing with
``jax.block_until_ready`` fencing.
"""

from __future__ import annotations

import os
import re
import time

import numpy as np
import jax


def ensure_host_device_flag(count: int) -> None:
    """Guarantee XLA_FLAGS requests >= count virtual CPU devices.

    Replaces an existing --xla_force_host_platform_device_count value if
    it is smaller (a plain substring check would silently keep a stale
    smaller value from the environment). Must run before the CPU client
    is first created; harmless for real-hardware platforms.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    m = re.search(r"--xla_force_host_platform_device_count=(\d+)", flags)
    if m:
        if int(m.group(1)) >= count:
            return
        flags = flags.replace(
            m.group(0), f"--xla_force_host_platform_device_count={count}")
    else:
        flags = (flags
                 + f" --xla_force_host_platform_device_count={count}").strip()
    os.environ["XLA_FLAGS"] = flags


def enable_persistent_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (default:
    ``~/.cache/fastecc_jax``). Useful on CPU backends (the test suite
    enables it in conftest). WARNING: on the axon-tunneled TPU backend
    this HANGS the first compile (the plugin cannot serialize its
    executables) — do not enable when jax.default_backend() may be the
    axon TPU. Safe to call more than once; returns the directory used."""
    path = path or os.path.expanduser("~/.cache/fastecc_jax")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path


def fence(out):
    """Force completion of a computation's outputs.

    ``jax.block_until_ready`` alone is NOT sufficient on the axon TPU
    backend for executables containing Pallas custom calls (dispatch is
    fully async and readiness reports early); a host transfer of one
    element per leaf is a true data dependency. The result reference is
    then dropped by the caller so queued work can't accumulate HBM.
    """
    out = jax.block_until_ready(out)
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ndim") and getattr(leaf, "size", 1):
            # (zero-size leaves have no element to transfer — and force
            # nothing anyway)
            idx = (0,) * leaf.ndim
            np.asarray(jax.device_get(leaf[idx] if leaf.ndim else leaf))
    return out


def time_samples(fn, *args, iters: int = 3, warmup: int = 1) -> list[float]:
    """Every wall-time sample of ``fn(*args)`` in seconds (length ``iters``).

    Runs ``warmup`` untimed calls first (absorbs jit compilation), fences
    every call (see :func:`fence`), and drops each result before the next
    iteration so async dispatch can't stack output buffers in HBM.

    Returning ALL samples (not a min) is deliberate: same-commit chip runs
    on this environment's tunneled v5e spread far beyond the once-claimed
    ±7% (round-3 GF16 marginals swung 45-68 GB/s), so headline numbers are
    medians-with-spread, not best-of (round-3 verdict weak-point 2).
    """
    for _ in range(warmup):
        r = fence(fn(*args))
        del r
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fence(fn(*args))
        samples.append(time.perf_counter() - t0)
        del r
    return samples


def median(samples) -> float:
    """Median without numpy-float leakage (plain float for JSON)."""
    s = sorted(samples)
    m = len(s) // 2
    return float(s[m]) if len(s) % 2 else float((s[m - 1] + s[m]) / 2)


def time_fn(fn, *args, iters: int = 3, warmup: int = 1):
    """Best-of-``iters`` wall time of ``fn(*args)`` in seconds.

    Kept for microbenchmarks where min is the right statistic (peak-rate
    measurement: any slower sample is contention, and the peaks feed
    roofline UPPER bounds, which the fastest observation estimates best).
    Throughput headlines should use :func:`time_samples` + :func:`median`.
    """
    return min(time_samples(fn, *args, iters=iters, warmup=warmup))
