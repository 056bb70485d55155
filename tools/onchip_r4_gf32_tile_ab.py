#!/usr/bin/env python
"""Round-4 on-chip A/B: does the widened (8, 256) tile help or hurt the
GF32 headline encode pair (k=2^19 x 1024 lanes, c1=512, r1=1024)?

The GF16 sweep (tools/onchip_r4.log) measured one lane-tile doubling as
a 25% single-call win at small order; this decides whether the
_tile_for budget should admit the GF32 headline shape too. Also
re-confirms GF16 at the chosen (8, 256) THROUGH rs.encode_parity (the
sweep drove the kernel directly), and bit-exact-checks the widened tile
against the staged transforms ON HARDWARE (compiled Mosaic, not
interpret mode).

Run on the real chip: python tools/onchip_r4_gf32_tile_ab.py
"""
import gc
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from fastecc_tpu.fields import GF16, GF32  # noqa: E402
from fastecc_tpu.kernels import ntt_mfa  # noqa: E402
from fastecc_tpu.ntt import ntt_auto  # noqa: E402
from fastecc_tpu.utils.timer import median, time_samples  # noqa: E402


def bitexact_check():
    """Widened tile vs staged transforms, compiled on hardware."""
    for field, k, lanes in ((GF32, 1 << 12, 512), (GF16, 1 << 12, 512)):
        bits = jax.random.bits(jax.random.key(7), (k, lanes),
                               dtype=jnp.uint32)
        x = bits % jnp.uint32(field.p)
        g = field.root_of_order(2 * k)
        want = np.asarray(ntt_auto(ntt_auto(x, field, inverse=True),
                                   field, pre_seed=g))
        got = np.asarray(ntt_mfa.ntt_coset_pair_pallas(x, field, g,
                                                       tile=(8, 256)))
        ok = bool((want == got).all())
        print(json.dumps({"bitexact": field.name, "tile": [8, 256],
                          "ok": ok}), flush=True)
        assert ok, f"{field.name} widened tile mismatch on hardware"


def measure(field, k, lanes, mask, tile, samples=7):
    from fastecc_tpu import rs
    bits = jax.random.bits(jax.random.key(0), (k, lanes), dtype=jnp.uint32)
    data = jax.block_until_ready(bits & jnp.uint32(mask))
    w = field.root_of_order(2 * k)
    enc = (lambda x: ntt_mfa.ntt_coset_pair_pallas(x, field, w, tile=tile)
           ) if tile else (lambda x: rs.encode_parity(x, field, 2 * k))
    f1 = jax.jit(enc)
    f2 = jax.jit(lambda x: enc(enc(x)))
    s1 = time_samples(f1, data, iters=samples)
    s2 = time_samples(f2, data, iters=samples)
    del data
    gc.collect()
    jax.clear_caches()
    return s1, s2


def report(label, field, k, lanes, mask, tile, byte_per_lane):
    s1, s2 = measure(field, k, lanes, mask, tile)
    marg = median(s2) - median(s1)
    wire = 2 * k * lanes * byte_per_lane
    print(json.dumps({
        "label": label, "tile": list(tile) if tile else "auto",
        "single_s": round(median(s1), 4),
        "marginal_s": round(marg, 4),
        "marginal_wire_gbps": round(wire / marg / 1e9, 1) if marg > 0.002
        else None,
        "s1": [round(v, 4) for v in s1],
        "s2": [round(v, 4) for v in s2]}), flush=True)


def main():
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    bitexact_check()
    # GF32 headline shape: auto (=128 today), then forced 256
    report("gf32_k2e19", GF32, 1 << 19, 1024, 0x0FFFFFFF, (8, 128), 4)
    report("gf32_k2e19", GF32, 1 << 19, 1024, 0x0FFFFFFF, (8, 256), 4)
    # GF16 bench shape through the kernel at both tiles
    report("gf16_k2e13", GF16, 1 << 13, 1 << 15, 0xFFFF, (8, 128), 2)
    report("gf16_k2e13", GF16, 1 << 13, 1 << 15, 0xFFFF, (8, 256), 2)
    # GF16 through the production rs.encode_parity (auto tile = 256 now)
    report("gf16_k2e13_rs_auto", GF16, 1 << 13, 1 << 15, 0xFFFF, None, 2)


if __name__ == "__main__":
    main()
