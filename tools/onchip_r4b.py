#!/usr/bin/env python
"""Round-4b on-chip run: overlap knobs + the fused wire pair.

Measures, on the real chip (run: python tools/onchip_r4b.py):

1. Mosaic-compiled correctness of the GF16 wire pair (pack fused into
   pass A1, serialization + escape bitmap into pass B2) vs the generic
   path — the bitmap's in-kernel group-sum over a reshaped minor axis is
   the lowering risk the CPU interpret tests cannot cover.
2. GF16 field-domain pair marginal with the round-4 vectorized epilogue,
   A/B'ing grid dimension_semantics parallel (new default) vs arbitrary
   (round-3 behavior) — verdict directive 1 (HBM/compute overlap).
3. GF16 WIRE-domain pair marginal (verdict directive 3 target: within
   ~15% of field-domain; the fused pipeline should in fact beat it).
4. GF32 headline encode pair marginal — regression guard for the
   epilogue/semantics changes.

Marginal = median(chain2) - median(single), per bench.py convention.
"""
import gc
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from fastecc_tpu.fields import GF16, GF32  # noqa: E402
from fastecc_tpu.kernels import ntt_mfa  # noqa: E402
from fastecc_tpu import packing, rs  # noqa: E402
from fastecc_tpu.utils.timer import median, time_samples  # noqa: E402


def marginal(make_f1, make_f2, x, samples=5):
    s1 = time_samples(make_f1, x, iters=samples)
    s2 = time_samples(make_f2, x, iters=samples)
    return median(s1), median(s2), median(s2) - median(s1), s1, s2


def emit(**kw):
    print(json.dumps(kw), flush=True)


def wire_correctness():
    k, bb = 1 << 8, 4096
    raw = np.random.default_rng(0).integers(0, 256, (k, bb), dtype=np.uint8)
    pairs = jnp.asarray(np.ascontiguousarray(raw).view(np.uint32))
    w = GF16.root_of_order(2 * k)
    f = jax.jit(lambda v: ntt_mfa.ntt_coset_pair_wire16_pallas(v, GF16, w))
    stored, bm = f(pairs)
    fields_in = packing.pack_data(jnp.asarray(raw), GF16)
    par = rs.encode_parity(fields_in, GF16, 2 * k)
    wire = np.asarray(packing.serialize_parity(par, GF16))
    got = rs.wire_gf16_from_parts(stored, bm)
    nesc = int((np.asarray(par) == 0x10000).sum())
    ok = bool(np.array_equal(got, wire))
    emit(check="wire16_compiled_bit_exact", ok=ok, escapes=nesc)
    if not ok:
        raise SystemExit("wire16 kernel wrong on chip")


def gf16_field(samples=5):
    k, lanes = 1 << 13, 1 << 15
    data = jax.block_until_ready(
        jax.random.bits(jax.random.key(2), (k, lanes), dtype=jnp.uint32)
        & jnp.uint32(0xFFFF))
    w = GF16.root_of_order(2 * k)
    for sem in ("parallel", "arbitrary"):
        ntt_mfa._GRID_SEMANTICS = (
            ("parallel", "parallel") if sem == "parallel" else None)
        f1 = jax.jit(lambda x: ntt_mfa.ntt_coset_pair_pallas(x, GF16, w))
        f2 = jax.jit(lambda x: ntt_mfa.ntt_coset_pair_pallas(
            ntt_mfa.ntt_coset_pair_pallas(x, GF16, w), GF16, w))
        t1, t2, m, s1, s2 = marginal(f1, f2, data, samples)
        emit(metric="gf16_field_pair", semantics=sem,
             single_s=round(t1, 4), marginal_s=round(m, 4),
             marginal_wire_gbps=round(2 * k * lanes * 2 / m / 1e9, 1),
             s1=[round(v, 4) for v in s1], s2=[round(v, 4) for v in s2])
        jax.clear_caches()
        gc.collect()
    ntt_mfa._GRID_SEMANTICS = ("parallel", "parallel")
    del data
    gc.collect()


def gf16_wire(samples=5):
    k, bb = 1 << 13, 1 << 16
    wu = bb // 4
    pairs = jax.block_until_ready(
        jax.random.bits(jax.random.key(3), (k, wu), dtype=jnp.uint32))
    for sem in ("parallel", "arbitrary"):
        ntt_mfa._GRID_SEMANTICS = (
            ("parallel", "parallel") if sem == "parallel" else None)
        f1 = jax.jit(lambda x: rs.encode_blocks_gf16_parts(x, 2 * k)[0])
        f2 = jax.jit(lambda x: rs.encode_blocks_gf16_parts(
            rs.encode_blocks_gf16_parts(x, 2 * k)[0], 2 * k)[0])
        t1, t2, m, s1, s2 = marginal(f1, f2, pairs, samples)
        emit(metric="gf16_wire_pair", semantics=sem,
             single_s=round(t1, 4), marginal_s=round(m, 4),
             marginal_wire_gbps=round(2 * k * bb / m / 1e9, 1),
             s1=[round(v, 4) for v in s1], s2=[round(v, 4) for v in s2])
        jax.clear_caches()
        gc.collect()
    ntt_mfa._GRID_SEMANTICS = ("parallel", "parallel")
    del pairs
    gc.collect()


def gf32_headline(samples=3):
    k, lanes = 1 << 19, 1024
    data = jax.block_until_ready(
        jax.random.bits(jax.random.key(0), (k, lanes), dtype=jnp.uint32)
        & jnp.uint32(0x0FFFFFFF))
    w = GF32.root_of_order(2 * k)
    for sem in ("parallel", "arbitrary"):
        ntt_mfa._GRID_SEMANTICS = (
            ("parallel", "parallel") if sem == "parallel" else None)
        f1 = jax.jit(lambda x: ntt_mfa.ntt_coset_pair_pallas(x, GF32, w))
        f2 = jax.jit(lambda x: ntt_mfa.ntt_coset_pair_pallas(
            ntt_mfa.ntt_coset_pair_pallas(x, GF32, w), GF32, w))
        t1, t2, m, s1, s2 = marginal(f1, f2, data, samples)
        emit(metric="gf32_headline_pair", semantics=sem,
             single_s=round(t1, 4), marginal_s=round(m, 4),
             marginal_cw_gbps=round(2 * k * lanes * 4 / m / 1e9, 1),
             s1=[round(v, 4) for v in s1], s2=[round(v, 4) for v in s2])
        jax.clear_caches()
        gc.collect()
    ntt_mfa._GRID_SEMANTICS = ("parallel", "parallel")
    del data
    gc.collect()


def main():
    emit(device=str(jax.devices()[0]))
    wire_correctness()
    jax.clear_caches()
    gc.collect()
    gf16_field()
    gf16_wire()
    gf32_headline()


if __name__ == "__main__":
    main()
