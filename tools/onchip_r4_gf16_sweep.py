#!/usr/bin/env python
"""Round-4 on-chip tile sweep for the GF16 encode pair (verdict item 1).

GF16 encode measured at 57-73% of its bound in round 3 because the
small-order pipeline's per-grid-step compute (~1 us) is level with the
per-step fixed costs, so HBM never overlaps compute. This sweeps the
(TR, TL) tile of the seam-fused pair at the bench GF16 shape
(k=2^13 blocks x 2^15 lanes) to find where per-step work amortizes those
costs. Marginal = median(chain2) - median(single), per bench.py.

Run on the real chip: python tools/onchip_r4_gf16_sweep.py
"""
import gc
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from fastecc_tpu.fields import GF16, GF32  # noqa: E402
from fastecc_tpu.kernels import ntt_mfa  # noqa: E402
from fastecc_tpu.utils.timer import median, time_samples  # noqa: E402

K, LANES = 1 << 13, 1 << 15
W16 = GF16.root_of_order(2 * K)


def measure(tile, c_dim=None, samples=5):
    data = jax.block_until_ready(
        jax.random.bits(jax.random.key(2), (K, LANES), dtype=jnp.uint32)
        & jnp.uint32(0xFFFF))
    f1 = jax.jit(lambda x: ntt_mfa.ntt_coset_pair_pallas(
        x, GF16, W16, tile=tile, c_dim=c_dim))
    f2 = jax.jit(lambda x: ntt_mfa.ntt_coset_pair_pallas(
        ntt_mfa.ntt_coset_pair_pallas(x, GF16, W16, tile=tile, c_dim=c_dim),
        GF16, W16, tile=tile, c_dim=c_dim))
    s1 = time_samples(f1, data, iters=samples)
    s2 = time_samples(f2, data, iters=samples)
    del data
    gc.collect()
    jax.clear_caches()
    return median(s1), median(s2), median(s2) - median(s1), s1, s2


def main():
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    configs = [
        ((8, 128), None),    # round-3 production baseline
        ((8, 256), None),
        ((8, 512), None),
        ((8, 1024), None),
        ((16, 256), None),
        ((16, 512), None),
        ((8, 512), 64),      # deeper r1 at the wider tile
        ((8, 512), 256),     # shallower r1
    ]
    wire_bytes = 2 * K * LANES * 2
    for tile, c_dim in configs:
        try:
            t1, t2, marg, s1, s2 = measure(tile, c_dim)
            print(json.dumps({
                "tile": list(tile), "c_dim": c_dim,
                "single_s": round(t1, 4), "chain2_s": round(t2, 4),
                "marginal_s": round(marg, 4),
                "marginal_wire_gbps": round(wire_bytes / marg / 1e9, 1),
                "s1": [round(v, 4) for v in s1],
                "s2": [round(v, 4) for v in s2]}), flush=True)
        except Exception as e:  # noqa: BLE001 - sweep must survive a config
            print(json.dumps({"tile": list(tile), "c_dim": c_dim,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            gc.collect()
            jax.clear_caches()


if __name__ == "__main__":
    main()
