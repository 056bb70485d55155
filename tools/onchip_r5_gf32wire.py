#!/usr/bin/env python
"""Round-5 GF32 wire-encode breakdown: pack vs pair vs serialize.

encode_blocks(GF32) measured 18.6 GB/s against a 41.7 GB/s op-count
bound; cumulative partial pipelines at the bench shape (k=2^17, 4 KB
blocks) locate the gap. Run: python tools/onchip_r5_gf32wire.py
"""
import gc
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from fastecc_tpu import packing, rs  # noqa: E402
from fastecc_tpu.fields import GF32  # noqa: E402
from fastecc_tpu.utils.timer import median, time_samples  # noqa: E402


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    emit(device=str(jax.devices()[0]))
    k, bb = 1 << 17, 4096
    n = 2 * k
    raw = jax.block_until_ready(
        jax.random.bits(jax.random.key(4), (k, bb), dtype=jnp.uint8))

    stages = {
        "pack": lambda x: packing.pack_data(x, GF32),
        "pack_pad": lambda x: rs._pad_lanes(packing.pack_data(x, GF32))[0],
        "pack_pair": lambda x: rs.encode_parity(
            rs._pad_lanes(packing.pack_data(x, GF32))[0], GF32, n),
        "full": lambda x: rs.encode_blocks(x, GF32, n),
    }
    meds = {}
    for name, fn in stages.items():
        f = jax.jit(fn)
        s = time_samples(f, raw, iters=5)
        meds[name] = median(s)
        emit(metric=f"gf32wire_{name}", single_s=round(meds[name], 4),
             s=[round(v, 4) for v in s])
        jax.clear_caches()
        gc.collect()
    emit(deltas=dict(pack=round(meds["pack"], 4),
                     pad=round(meds["pack_pad"] - meds["pack"], 4),
                     pair=round(meds["pack_pair"] - meds["pack_pad"], 4),
                     serialize=round(meds["full"] - meds["pack_pair"], 4)))


if __name__ == "__main__":
    main()
