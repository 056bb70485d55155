"""On-chip microbenchmarks: independently measured roofline peaks.

The reference's ``ntt`` binary benchmarks GF mulmod variants head-to-head
(scalar vs SSE2 vs AVX2 — SURVEY.md §3.3) to establish the per-element
ceiling. This is the TPU analog, and also the fix for a round-1 weakness:
the roofline in utils/profiling.py was *calibrated to the measured
encode* (circular). These kernels measure the raw peaks directly:

  * ``hbm_stream_gbps`` — HBM read+write bandwidth via a Pallas copy.
  * ``vpu_chain_gops`` — elementwise u32 op throughput from a DEPENDENT
    in-VMEM op chain, two chain depths differenced so kernel launch and
    HBM traffic cancel exactly. Variants: raw multiply, raw add, and the
    mulmod flavors (Solinas REDC, generic REDC, GF16 Fermat) so the
    Solinas specialization's win is measured, not asserted.

All shapes are static and VMEM-resident per grid step; the arrays stay
in the field's closed range so mulmod chains remain valid.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import gf
from ..fields import FIELDS, GF16, GF32

_TL = 128          # lane tile (native u32 tile is (8, 128))
_TS = 512          # sublane rows per grid step: [512, 128] = 256 KB tile


def _copy_kernel(x_ref, out_ref):
    out_ref[:] = x_ref[:]


def hbm_stream_gbps(mib: int = 1024, iters: int = 3) -> float:
    """HBM copy bandwidth in GB/s counting read+write bytes."""
    from ..utils.timer import time_fn

    rows = mib * 1024 * 1024 // (4 * _TL)
    x = jnp.arange(rows * _TL, dtype=jnp.uint32).reshape(rows, _TL)

    fn = jax.jit(lambda v: pl.pallas_call(
        _copy_kernel,
        grid=(rows // _TS,),
        in_specs=[pl.BlockSpec((_TS, _TL), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_TS, _TL), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, _TL), jnp.uint32),
    )(v))
    secs = time_fn(fn, x, iters=iters)
    return 2 * rows * _TL * 4 / secs / 1e9


# one dependent elementwise step per variant; each keeps its operand in
# the closed range required by the next application
_C_MUL = np.uint32(0x9E3779B9)     # odd constant, raw u32 multiply
_VARIANTS = {
    "raw-mul": lambda y: y * _C_MUL,
    "raw-add": lambda y: y + _C_MUL,
    "addmod": lambda y: gf.add(GF32, y, np.uint32(12345)),
    "solinas": lambda y: gf.mont_mul(GF32, y, np.uint32(0x12345677)),
    "generic": lambda y: gf.mont_mul(GF32, y, np.uint32(0x12345677),
                                     generic=True),
    "gf16": lambda y: gf._mul_gf16(y, np.uint32(0x9999)),
}


def _chain_kernel(x_ref, out_ref, *, variant: str, depth: int):
    y = x_ref[:]
    step = _VARIANTS[variant]
    for _ in range(depth):
        y = step(y)
    out_ref[:] = y


def _chain_fn(rows: int, variant: str, depth: int):
    return jax.jit(lambda v: pl.pallas_call(
        functools.partial(_chain_kernel, variant=variant, depth=depth),
        grid=(rows // _TS,),
        in_specs=[pl.BlockSpec((_TS, _TL), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_TS, _TL), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, _TL), jnp.uint32),
    )(v))


def vpu_chain_gops(variant: str, mib: int = 64, depth: int = 128,
                   iters: int = 3) -> float:
    """Billions of ``variant`` ops/s: (depth vs 2*depth) differenced, so
    launch overhead and the HBM read/write cancel and only the marginal
    ``depth`` chain applications are timed."""
    from ..utils.timer import time_fn

    assert variant in _VARIANTS, f"unknown variant {variant!r}"
    rows = mib * 1024 * 1024 // (4 * _TL)
    # keep values < p for the mod variants (also fine for raw ops)
    x = (jnp.arange(rows * _TL, dtype=jnp.uint32) & jnp.uint32(0xFFFF)
         ).reshape(rows, _TL)
    t1 = time_fn(_chain_fn(rows, variant, depth), x, iters=iters)
    t2 = time_fn(_chain_fn(rows, variant, 2 * depth), x, iters=iters)
    marginal = max(t2 - t1, 1e-12)
    return rows * _TL * depth / marginal / 1e9


def measure_peaks(iters: int = 3, quick: bool = False) -> dict:
    """One-stop roofline measurement (feeds utils.profiling and the
    DESIGN.md peak-vs-achieved table)."""
    mib = 16 if quick else 64
    out = {"hbm_stream_gbps": round(
        hbm_stream_gbps(mib=128 if quick else 1024, iters=iters), 1)}
    for v in _VARIANTS:
        out[f"{v}_gops"] = round(
            vpu_chain_gops(v, mib=mib, iters=iters), 1)
    return out
