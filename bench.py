#!/usr/bin/env python
"""Headline benchmark: RS encode GB/s per chip (BASELINE.json:2).

Measures the reference's product path (`rs` binary, SURVEY.md §3.1) at the
baseline config: 2^20 source+parity blocks of 4KB over GF(0xFFF00001)
(k = 2^19 data blocks -> n = 2^20 codeword blocks, 1024 u32 lanes each).

Throughput definition (pinned): total codeword bytes (n * 4096) divided by
the wall time of one jitted encode step (iNTT_k + coset twiddle + NTT_k,
the fast path), best of `--iters` post-compilation runs. `vs_baseline`
compares against the reference's ~1.2 GB/s CPU headline (BASELINE.md).

Prints ONE JSON line. Falls back to smaller k on OOM (reported in the
JSON so a fallback is never mistaken for the full config).
"""

import argparse
import gc
import json
import sys

import jax
import jax.numpy as jnp

from fastecc_tpu import rs
from fastecc_tpu.fields import GF32
from fastecc_tpu.utils import time_fn

REFERENCE_GBPS = 1.2  # reference CPU headline (BASELINE.md, i7-4770 AVX2+OpenMP)


def make_data(k: int, lanes: int):
    """Random field elements generated on-device (28-bit values < p)."""
    bits = jax.random.bits(jax.random.key(0), (k, lanes), dtype=jnp.uint32)
    return bits & jnp.uint32(0x0FFFFFFF)


def run(lg_k: int, lanes: int, iters: int, lane_chunks: int):
    k, n = 1 << lg_k, 1 << (lg_k + 1)
    data = jax.block_until_ready(make_data(k, lanes))
    fn = jax.jit(lambda x: rs.encode_parity(x, GF32, n,
                                            lane_chunks=lane_chunks))
    secs = time_fn(fn, data, iters=iters)
    total_bytes = n * lanes * 4
    return secs, total_bytes, k, n


def run_decode_metric(iters: int):
    """Secondary: erasure-decode GB/s at n=2^20, e=2^19 erased, 512 lanes.

    Steady-state device throughput (the host-built locator tables are
    constructed once per erasure pattern and reused; their one-time cost
    is reported separately as decode_locator_host_seconds)."""
    import time

    import numpy as np

    from fastecc_tpu import decode as dec
    from fastecc_tpu import rs

    n, e, lanes = 1 << 20, 1 << 19, 512
    data = make_data(n // 2, lanes)
    cw = jax.block_until_ready(rs.encode_jit(data, GF32, n))
    del data
    rng = np.random.default_rng(1)
    erased = np.sort(rng.choice(n, size=e, replace=False))
    t0 = time.perf_counter()
    args = (cw,) + dec.prepare_decode_tables(erased, n, GF32)
    loc_secs = time.perf_counter() - t0
    secs = time_fn(lambda *a: dec.decode_prepared_jit(*a, GF32), *args,
                   iters=iters)
    del cw, args
    return secs, n * lanes * 4 / secs / 1e9, loc_secs


def run_gf16_metric(iters: int):
    """Secondary: GF(0x10001) encode GB/s (BASELINE.json:9 field), n=2^14
    blocks x 32768 lanes (2GB working set so the tunnel latency washes
    out)."""
    from fastecc_tpu import rs
    from fastecc_tpu.fields import GF16

    k, lanes = 1 << 13, 1 << 15
    bits = jax.random.bits(jax.random.key(2), (k, lanes), dtype=jnp.uint32)
    data = jax.block_until_ready(bits & jnp.uint32(0xFFFF))
    fn = jax.jit(lambda x: rs.encode_parity(x, GF16, 2 * k))
    secs = time_fn(fn, data, iters=iters)
    del data
    return secs, 2 * k * lanes * 4 / secs / 1e9


def run_ntt_metric(iters: int):
    """Secondary headline: 2^20-point GF(p) NTT wall time (BASELINE.json:2).

    512 lanes (2GB working set) so input+intermediate+output fit alongside
    nothing else; the per-element rate is lane-count independent."""
    from fastecc_tpu.ntt import ntt_auto
    x = jax.block_until_ready(make_data(1 << 20, 512))
    fn = jax.jit(lambda v: ntt_auto(v, GF32))
    secs = time_fn(fn, x, iters=iters)
    del x
    return secs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lg-k", type=int, default=19,
                    help="log2 of data block count (n = 2*k blocks total)")
    ap.add_argument("--lanes", type=int, default=1024,
                    help="u32 word lanes per block (1024 = 4KB blocks)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--lane-chunks", type=int, default=1,
                    help="sequential lane chunks (memory fallback for the "
                         "staged jnp path; the fused Pallas path fits "
                         "unchunked and chunking slows it down)")
    args = ap.parse_args()

    lg_k = args.lg_k
    fallback = False
    while True:
        chunks = args.lane_chunks
        try:
            secs, total_bytes, k, n = run(lg_k, args.lanes, args.iters,
                                          chunks)
            break
        except Exception as e:  # noqa: BLE001 - OOM fallback, reported
            if lg_k <= 12:
                raise
            print(f"# lg_k={lg_k} failed ({type(e).__name__}); retrying "
                  f"smaller", file=sys.stderr)
            lg_k -= 1
            fallback = True
            # Drop the traceback's frame references so the failed attempt's
            # device buffers are actually freed before the retry.
            e.__traceback__ = None
            del e
            gc.collect()
            jax.clear_caches()

    try:
        ntt_secs = round(run_ntt_metric(args.iters), 4)
    except Exception:  # noqa: BLE001 - secondary metric is best-effort
        ntt_secs = None
    jax.clear_caches()
    gc.collect()
    try:
        dec_secs, dec_gbps, loc_secs = run_decode_metric(max(2, args.iters))
        dec_secs, dec_gbps = round(dec_secs, 4), round(dec_gbps, 2)
        loc_secs = round(loc_secs, 2)
    except Exception:  # noqa: BLE001 - secondary metric is best-effort
        dec_secs = dec_gbps = loc_secs = None
    jax.clear_caches()
    gc.collect()
    try:
        g16_secs, g16_gbps = run_gf16_metric(args.iters)
        g16_secs, g16_gbps = round(g16_secs, 4), round(g16_gbps, 2)
    except Exception:  # noqa: BLE001 - secondary metric is best-effort
        g16_secs = g16_gbps = None

    gbps = total_bytes / secs / 1e9
    print(json.dumps({
        "metric": "rs_encode_throughput",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / REFERENCE_GBPS, 2),
        "config": {"k": k, "n": n, "lanes": args.lanes,
                   "block_bytes": args.lanes * 4, "field": "GF32",
                   "seconds": round(secs, 4), "fallback": fallback,
                   "lane_chunks": chunks,
                   "ntt_2e20_x512lane_seconds": ntt_secs,
                   "decode_2e20_e2e19_seconds": dec_secs,
                   "decode_gb_per_sec": dec_gbps,
                   "decode_locator_host_seconds": loc_secs,
                   "gf16_encode_2e14_seconds": g16_secs,
                   "gf16_encode_gb_per_sec": g16_gbps,
                   "device": str(jax.devices()[0]).strip()},
    }))


if __name__ == "__main__":
    main()
