#!/usr/bin/env python
"""Round-5 on-chip run #1: the in-kernel bitmap wire pair.

Measures, on the real chip (run: python tools/onchip_r5.py):

1. Mosaic-compiled correctness of the reworked GF16 wire pair — pass B2
   now emits the escape bitmap itself via a REVISITED full-width output
   block with per-step pl.ds lane-slice stores (the round-4 version
   materialized a full-width escape intermediate + an XLA reduce, 4
   unpriced HBM bytes/wire-word). The dynamic lane store and the
   revisited block are the lowering risks interpret mode cannot cover.
2. GF16 WIRE-domain pair marginal with the new kernel (round-5 verdict
   directive 2 target: wire marginal >= field marginal — the fused pair
   moves less HBM, so it must win).
3. GF16 field-domain pair marginal on the same run (the comparison
   basis, and the directive-3 baseline before pipelining work).

Marginal = median(chain2) - median(single), per bench.py convention.
"""
import gc
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from fastecc_tpu.fields import GF16  # noqa: E402
from fastecc_tpu.kernels import ntt_mfa  # noqa: E402
from fastecc_tpu import packing, rs  # noqa: E402
from fastecc_tpu.utils.timer import median, time_samples  # noqa: E402


def marginal(f1, f2, x, samples=5):
    s1 = time_samples(f1, x, iters=samples)
    s2 = time_samples(f2, x, iters=samples)
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
    emit(check="wire16_inkernel_bitmap_bit_exact", ok=ok, escapes=nesc)
    if not ok:
        raise SystemExit("wire16 kernel wrong on chip")


def dense_escape_b2():
    sys.path.insert(0, "tests")
    from test_pallas import _dense_escape_b2_case
    lo2, hi2, st_want, bm_want = _dense_escape_b2_case(16, 16, 256)
    std, bmd = jax.jit(
        lambda a, b: ntt_mfa.wire16_pass_b2(a, b, GF16))(
            jnp.asarray(lo2), jnp.asarray(hi2))
    ok = (np.array_equal(np.asarray(std), st_want)
          and np.array_equal(np.asarray(bmd), bm_want))
    emit(check="wire16_b2_dense_escapes", ok=bool(ok),
         saturated_groups=int((bm_want == 0xFFFF).sum()))
    if not ok:
        raise SystemExit("dense-escape bitmap wrong on chip")


def lanes_correctness():
    """Compiled lanes kernels (field both fields + wire) vs staged, on
    chip, small shape — the whole-column stage chain with tr=1 is the
    Mosaic lowering risk interpret mode cannot cover."""
    from fastecc_tpu.fields import GF32
    from fastecc_tpu.ntt import ntt
    rng = np.random.default_rng(5)
    n, lanes = 1 << 10, 256
    for field in (GF32, GF16):
        x = jnp.asarray(rng.integers(0, field.p, (n, lanes),
                                     dtype=np.uint64).astype(np.uint32))
        g = field.root_of_order(2 * n)
        f = jax.jit(lambda v, fl=field, gg=g: (
            ntt_mfa.ntt_pair_lanes_pallas(v, fl, gg),
            ntt_mfa.ntt_coset_pair_pallas(v, fl, gg, tile=(8, 128))))
        a, b = f(x)
        ok = bool(np.array_equal(np.asarray(a), np.asarray(b)))
        emit(check=f"lanes_pair_{field.name}_vs_seam_on_chip", ok=ok)
        if not ok:
            raise SystemExit("lanes pair wrong on chip")
    k, bb = 1 << 8, 4096
    raw = np.random.default_rng(0).integers(0, 256, (k, bb), dtype=np.uint8)
    pairs = jnp.asarray(np.ascontiguousarray(raw).view(np.uint32))
    w = GF16.root_of_order(2 * k)
    f = jax.jit(lambda v: ntt_mfa.ntt_pair_lanes_wire16_pallas(v, GF16, w))
    stored, bm = f(pairs)
    fields_in = packing.pack_data(jnp.asarray(raw), GF16)
    par = rs.encode_parity(fields_in, GF16, 2 * k)
    wire = np.asarray(packing.serialize_parity(par, GF16))
    got = rs.wire_gf16_from_parts(stored, bm)
    ok = bool(np.array_equal(got, wire))
    emit(check="lanes_wire16_bit_exact_on_chip", ok=ok,
         escapes=int((np.asarray(par) == 0x10000).sum()))
    if not ok:
        raise SystemExit("lanes wire pair wrong on chip")
    jax.clear_caches()
    gc.collect()


def gf16_wire(samples=5):
    k, bb = 1 << 13, 1 << 16
    wu = bb // 4
    pairs = jax.block_until_ready(
        jax.random.bits(jax.random.key(3), (k, wu), dtype=jnp.uint32))
    w = GF16.root_of_order(2 * k)
    # (the one-pass "lanes" variant is compile-blocked at this shape —
    # tools/onchip_r5_lanes.log — so only the production 3-pass path
    # is measured)
    call = lambda v: rs.encode_blocks_gf16_parts(v, 2 * k)[0]  # noqa: E731
    f1 = jax.jit(call)
    f2 = jax.jit(lambda v: call(call(v)))
    t1, t2, m, s1, s2 = marginal(f1, f2, pairs, samples)
    emit(metric="gf16_wire_pair_seam3pass",
         single_s=round(t1, 4), marginal_s=round(m, 4),
         marginal_wire_gbps=round(2 * k * bb / m / 1e9, 1),
         s1=[round(v, 4) for v in s1], s2=[round(v, 4) for v in s2])
    del pairs
    jax.clear_caches()
    gc.collect()


def gf16_field(samples=5):
    k, lanes = 1 << 13, 1 << 15
    data = jax.block_until_ready(
        jax.random.bits(jax.random.key(2), (k, lanes), dtype=jnp.uint32)
        & jnp.uint32(0xFFFF))
    w = GF16.root_of_order(2 * k)
    call = lambda v: ntt_mfa.ntt_coset_pair_pallas(v, GF16, w)  # noqa: E731
    f1 = jax.jit(call)
    f2 = jax.jit(lambda v: call(call(v)))
    t1, t2, m, s1, s2 = marginal(f1, f2, data, samples)
    emit(metric="gf16_field_pair_seam3pass",
         single_s=round(t1, 4), marginal_s=round(m, 4),
         marginal_wire_gbps=round(2 * k * lanes * 2 / m / 1e9, 1),
         s1=[round(v, 4) for v in s1], s2=[round(v, 4) for v in s2])
    del data
    jax.clear_caches()
    gc.collect()


def main():
    emit(device=str(jax.devices()[0]))
    wire_correctness()
    dense_escape_b2()
    jax.clear_caches()
    gc.collect()
    lanes_correctness()
    gf16_wire()
    gf16_field()


if __name__ == "__main__":
    main()
