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


# Measured on one TPU v5e chip via kernels/microbench.py (`cli gf-bench
# --variant all`) — INDEPENDENT of any codec measurement, so the roofline
# comparison below is not circular. Re-measure with measure_peaks() when
# the hardware changes; docs/DESIGN.md records the measured table.
MEASURED_PEAKS_V5E = {
    "hbm_stream_gbps": 577.2,      # Pallas copy, read+write counted
    "solinas_gops": 68.1,          # Solinas-REDC mulmod, traced operands
    "generic_gops": 70.3,          # generic limb REDC (— a WASH vs
                                   # Solinas on v5e: u32 mul is full-rate,
                                   # so the multiplier-free REDC's fewer
                                   # hardware multiplies buy nothing)
    "addmod_gops": 399.7,          # carry-trick modular add
    "gf16_gops": 137.3,            # Fermat-prime mulmod
    "raw_mul_gops": 3133.8,        # single u32 hardware multiply
    "raw_add_gops": 5244.3,        # single u32 add
}


def encode_roofline(n_blocks: int, lanes: int, peaks: dict | None = None):
    """Speed-of-light estimate for RS encode (n = 2k blocks, fused MFA
    path) from MEASURED peaks (kernels/microbench.py), not constants
    calibrated to the codec itself.

    Memory model: 2 fused passes per transform x 2 transforms = 4 HBM
    read+write passes over [k, lanes] u32, at the measured stream rate.
    Compute model: each radix-2 butterfly output pair costs one mulmod +
    one addmod + one submod per element pair per stage; with the measured
    dependent-chain rates m = solinas_gops and a = addmod_gops, the
    butterfly costs (1/m + 2/a) seconds per element pair. Relayout/
    interleave overhead between stages is NOT included — the gap between
    this bound and the measurement is the honest inefficiency number.

    Returns a dict of bound estimates in seconds and the implied GB/s of
    codeword output.
    """
    import math
    peaks = peaks or MEASURED_PEAKS_V5E
    k = n_blocks // 2
    elems = k * lanes
    word_bytes = 4
    # four fused passes read+write the [k, lanes] array
    hbm_bytes = 4 * 2 * elems * word_bytes
    t_mem = hbm_bytes / (peaks["hbm_stream_gbps"] * 1e9)
    stages = 2 * math.log2(k)                  # iNTT + coset NTT
    pairs = elems * stages * 0.5
    per_pair = 1 / (peaks["solinas_gops"] * 1e9) \
        + 2 / (peaks["addmod_gops"] * 1e9)
    t_compute = pairs * per_pair
    t = max(t_mem, t_compute)
    out_bytes = n_blocks * lanes * word_bytes
    return {
        "t_memory_bound_s": t_mem,
        "t_compute_bound_s": t_compute,
        "bound": "memory" if t_mem > t_compute else "compute",
        "speed_of_light_gbps": out_bytes / t / 1e9,
    }
