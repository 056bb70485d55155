#!/usr/bin/env python
"""Out-of-core path measurement (SURVEY.md §6 discipline): streamed
encode + recover of a multi-GB file with the host-RAM high-water
recorded, so "link-bound by design" is a measured row in BASELINE.md
instead of an assertion (round-2 verdict, missing #5).

    python tools/bench_storage.py --gib 4 --workdir /root/repo/.bench_io

Prints one JSON line per phase. Notes for reading the numbers on THIS
machine: the axon tunnel moves host<->device traffic at ~20 MB/s, so
the streamed paths are tunnel-link-bound here (the point of the
measurement is the bound's LOCATION — link, not RAM — plus the RSS
ceiling; on hardware with a local chip the same path is PCIe/disk
bound). RSS is sampled via resource.getrusage (ru_maxrss, whole
process), which includes dirty staging-memmap pages — an upper bound
on the residency the planner promises.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import resource
import shutil
import time

import numpy as np


def _rss_mb() -> int:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024


class _AnonHighWater:
    """Background sampler of RssAnon (/proc/self/status): the residency
    the planner actually promises. ru_maxrss counts file-BACKED memmap
    pages too — the OS keeps the whole payload resident while RAM is
    free, so whole-process RSS reads gigabytes of reclaimable page cache
    over the budget (observed 5.4 GB on a 4 GiB file with a 512 MB
    budget). Anonymous memory (heap + staging writes before writeback)
    is what would OOM a constrained host; sample its peak directly."""

    def __init__(self, period_s: float = 0.05):
        import threading
        self.max_mb = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, args=(period_s,),
                                   daemon=True)
        self._t.start()

    def _run(self, period_s):
        while not self._stop.wait(period_s):
            try:
                with open("/proc/self/status") as fh:
                    for line in fh:
                        if line.startswith("RssAnon:"):
                            self.max_mb = max(self.max_mb,
                                              int(line.split()[1]) // 1024)
                            break
            except OSError:
                return

    def stop(self) -> int:
        self._stop.set()
        self._t.join()
        return self.max_mb

    @staticmethod
    def now_mb() -> int:
        with open("/proc/self/status") as fh:
            for line in fh:
                if line.startswith("RssAnon:"):
                    return int(line.split()[1]) // 1024
        return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gib", type=float, default=4.0,
                    help="file size to stream (GiB)")
    ap.add_argument("--max-resident-mb", type=int, default=512,
                    help="residency budget handed to the planner")
    ap.add_argument("--workdir", default=".bench_io")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--repair", action="store_true",
                    help="after recover+verify, also time the in-place "
                         "repair of the still-missing block files and "
                         "audit back to healthy")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon plugin ignores "
                         "JAX_PLATFORMS; must be set before first use)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from fastecc_tpu import storage
    from fastecc_tpu.fields import GF32

    wd = pathlib.Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)
    src = wd / "payload.bin"
    size = int(args.gib * (1 << 30))

    # deterministic compressible-agnostic payload written in 64 MB
    # strides (raw bytes travel the link either way)
    rng = np.random.default_rng(0x10)
    stride = 64 << 20
    with open(src, "wb") as fh:
        left = size
        block = rng.integers(0, 256, stride, dtype=np.uint16).astype(
            np.uint8).tobytes()
        while left > 0:
            fh.write(block[: min(stride, left)])
            left -= stride
    base_rss = _rss_mb()

    coded = wd / "coded"
    if coded.exists():
        shutil.rmtree(coded)
    anon_base = _AnonHighWater.now_mb()
    anon = _AnonHighWater()
    t0 = time.perf_counter()
    man = storage.encode_file(
        src, coded, GF32,
        max_resident_bytes=args.max_resident_mb << 20)
    dt = time.perf_counter() - t0
    striped = storage.is_striped(man)
    print(json.dumps({
        "op": "encode_file", "striped": striped, "bytes": size,
        "seconds": round(dt, 1),
        "gb_per_sec": round(size / dt / 1e9, 4),
        "max_resident_mb_budget": args.max_resident_mb,
        "rss_anon_high_water_mb": anon.stop(),
        "rss_anon_before_mb": anon_base,
        "rss_high_water_mb": _rss_mb(),
        "rss_before_mb": base_rss,
        "stripes": len(man["stripes"]) if striped else 1,
        "k": man["stripe_blocks"] if striped else man["k"],
        "n": 2 * man["stripe_blocks"] if striped else man["n"]}),
        flush=True)

    # drop the maximum recoverable loss per codeword: delete HALF the
    # files (n-k of n) in every stripe, mixed kinds
    dirs = [coded / st["dir"] for st in man["stripes"]] if striped \
        else [coded]
    rng = np.random.default_rng(1)
    for d in dirs:
        files = sorted(d.glob("block_*.dat")) + \
            sorted(d.glob("block_*.par"))
        for i in rng.choice(len(files), size=len(files) // 2,
                            replace=False):
            files[i].unlink()

    back = wd / "recovered.bin"
    anon = _AnonHighWater()
    t0 = time.perf_counter()
    wrote = storage.recover_file(
        coded, back, max_resident_bytes=args.max_resident_mb << 20)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "op": "recover_file", "striped": striped, "bytes": size,
        "blocks_reconstructed": wrote,
        "seconds": round(dt, 1),
        "gb_per_sec": round(size / dt / 1e9, 4),
        "rss_anon_high_water_mb": anon.stop(),
        "rss_high_water_mb": _rss_mb()}), flush=True)

    ok = True
    with open(src, "rb") as a, open(back, "rb") as b:
        while True:
            ca, cb = a.read(1 << 24), b.read(1 << 24)
            if ca != cb:
                ok = False
                break
            if not ca:
                break
    print(json.dumps({"op": "verify", "bit_exact": ok}), flush=True)

    if args.repair and ok:
        # repair phase: the block files deleted above are still missing
        # (recover rebuilt the FILE, not the directory) — time rewriting
        # them in place (decode + batched native emission + CRC re-tag
        # checks), then audit back to healthy
        anon = _AnonHighWater()
        t0 = time.perf_counter()
        rewrote = storage.recover_file(
            coded, None, repair=True,
            max_resident_bytes=args.max_resident_mb << 20)
        dt = time.perf_counter() - t0
        rep, rc = storage.check_file(
            coded, max_resident_bytes=args.max_resident_mb << 20)
        print(json.dumps({
            "op": "repair_file", "striped": striped, "bytes": size,
            "blocks_rewritten": rewrote,
            "seconds": round(dt, 1),
            "gb_per_sec": round(size / dt / 1e9, 4),
            "rss_anon_high_water_mb": anon.stop(),
            "post_repair_check": rep["status"],
            "post_repair_rc": rc}), flush=True)
        ok = ok and rc == 0

    if not args.keep:
        shutil.rmtree(wd)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
