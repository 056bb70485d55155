"""Profiling and roofline helpers (SURVEY.md §5: tracing/observability).

The reference's only instrumentation is wall-clock prints; here we expose
the JAX profiler (Perfetto/TensorBoard traces with named stages) plus a
static roofline model for the codec so measured numbers have a
speed-of-light to compare against.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fastecc_trace"):
    """Capture a device trace viewable in TensorBoard/Perfetto:

        with profiling.trace("/tmp/tr"):
            fence(encode_fn(data))
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def scope(name: str):
    """Named scope for trace readability: with profiling.scope('ntt_f')."""
    return jax.named_scope(name)


def encode_roofline(n_blocks: int, lanes: int, hbm_gbps: float = 819.0,
                    vpu_add_units_per_s: float = 1.08e12):
    """Speed-of-light estimate for RS encode (n = 2k blocks, fused MFA path).

    Memory model: 2 fused passes per transform x 2 transforms = 4 HBM
    read+write passes over [k, lanes] u32.
    Compute model (docs/DESIGN.md §4): a radix butterfly costs ~19-27 VPU
    "add units" per element pair per stage (gf.add ~2.5, gf.sub ~2.5,
    Solinas-REDC Montgomery mulmod ~17, plus shape-dependent relayout)
    against a sustained ~1.08e12 add-units/s on one v5e core. The 19-unit
    figure below is calibrated to the measured 2^20-block encode; treat
    the estimate as accurate to ~±25% across shapes, not a hard bound.

    Returns a dict of bound estimates in seconds and the implied GB/s of
    codeword output.
    """
    import math
    k = n_blocks // 2
    elems = k * lanes
    word_bytes = 4
    # four fused passes read+write the [k, lanes] array
    hbm_bytes = 4 * 2 * elems * word_bytes
    t_mem = hbm_bytes / (hbm_gbps * 1e9)
    stages = 2 * math.log2(k)                  # iNTT + coset NTT
    units = elems * stages * 0.5 * 19          # add-units per butterfly
    t_compute = units / vpu_add_units_per_s
    t = max(t_mem, t_compute)
    out_bytes = n_blocks * lanes * word_bytes
    return {
        "t_memory_bound_s": t_mem,
        "t_compute_bound_s": t_compute,
        "bound": "memory" if t_mem > t_compute else "compute",
        "speed_of_light_gbps": out_bytes / t / 1e9,
    }
