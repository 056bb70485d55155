#!/usr/bin/env python
"""Round-5 lanes-kernel VMEM ceiling probe + perf vs the 3-pass seam.

The one-pass lanes pair OOMed VMEM at k=2^13, TL=256 (352 MB wanted of
128 MB — the fused 26-stage chain's live set scales with the resident
block). This probes which (k, TL) actually compile and how they perform
against the 3-pass seam pair at the same shape, to set
_LANES_BLOCK_BYTES honestly. Run: python tools/onchip_r5_lanes.py
"""
import gc
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from fastecc_tpu.fields import GF16  # noqa: E402
from fastecc_tpu.kernels import ntt_mfa  # noqa: E402
from fastecc_tpu.utils.timer import median, time_samples  # noqa: E402


def emit(**kw):
    print(json.dumps(kw), flush=True)


def marginal(f1, f2, x, samples=5):
    s1 = time_samples(f1, x, iters=samples)
    s2 = time_samples(f2, x, iters=samples)
    return median(s1), median(s2), median(s2) - median(s1), s1, s2


def main():
    emit(device=str(jax.devices()[0]))
    total_lanes = 1 << 15            # fixed 2 GB-class GF16 working set?
    for lg_k, tl in ((13, 128), (12, 256), (12, 128), (11, 256)):
        k = 1 << lg_k
        lanes = 1 << 15              # u32 lanes; array = k * lanes * 4
        w = GF16.root_of_order(2 * k)
        data = jax.block_until_ready(
            jax.random.bits(jax.random.key(2), (k, lanes),
                            dtype=jnp.uint32) & jnp.uint32(0xFFFF))
        try:
            f1 = jax.jit(lambda x, kk=k, ww=w, t=tl:
                         ntt_mfa.ntt_pair_lanes_pallas(x, GF16, ww,
                                                       tile_l=t))
            f2 = jax.jit(lambda x, kk=k, ww=w, t=tl:
                         ntt_mfa.ntt_pair_lanes_pallas(
                             ntt_mfa.ntt_pair_lanes_pallas(x, GF16, ww,
                                                           tile_l=t),
                             GF16, ww, tile_l=t))
            t1, t2, m, s1, s2 = marginal(f1, f2, data)
            emit(metric="lanes_pair", lg_k=lg_k, tl=tl,
                 block_mb=round(k * tl * 4 / 2**20, 1),
                 single_s=round(t1, 4), marginal_s=round(m, 4),
                 marginal_wire_gbps=round(2 * k * lanes * 2 / m / 1e9, 1),
                 s1=[round(v, 4) for v in s1])
        except Exception as e:  # noqa: BLE001 - probing the ceiling
            emit(metric="lanes_pair", lg_k=lg_k, tl=tl,
                 block_mb=round(k * tl * 4 / 2**20, 1),
                 error=f"{type(e).__name__}: {e}"[:200])
        del data
        jax.clear_caches()
        gc.collect()
    # 3-pass seam reference at k=2^12 (same total work per byte)
    k, lanes = 1 << 12, 1 << 15
    w = GF16.root_of_order(2 * k)
    data = jax.block_until_ready(
        jax.random.bits(jax.random.key(2), (k, lanes), dtype=jnp.uint32)
        & jnp.uint32(0xFFFF))
    tile = ntt_mfa._tile_for(ntt_mfa._pair_default_c(k),
                             k // ntt_mfa._pair_default_c(k), lanes)
    f1 = jax.jit(lambda x: ntt_mfa.ntt_coset_pair_pallas(x, GF16, w,
                                                         tile=tile))
    f2 = jax.jit(lambda x: ntt_mfa.ntt_coset_pair_pallas(
        ntt_mfa.ntt_coset_pair_pallas(x, GF16, w, tile=tile), GF16, w,
        tile=tile))
    t1, t2, m, s1, s2 = marginal(f1, f2, data)
    emit(metric="seam3_reference", lg_k=12,
         single_s=round(t1, 4), marginal_s=round(m, 4),
         marginal_wire_gbps=round(2 * k * lanes * 2 / m / 1e9, 1))


if __name__ == "__main__":
    main()
