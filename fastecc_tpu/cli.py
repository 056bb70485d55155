"""Command-line interface mirroring the reference's two binaries (C17).

The reference ships `ntt` (algorithm verify/bench modes selected by
single-letter flags) and `rs` (encode N blocks of SIZE, report GB/s)
(SURVEY.md §3.1/§3.2). This CLI reproduces those modes as subcommands and
adds what a real deployment needs: file-level encode/recover.

    python -m fastecc_tpu.cli verify   --lg-n 10            # fast vs slow
    python -m fastecc_tpu.cli roundtrip --lg-n 16           # intt(ntt(x))==x
    python -m fastecc_tpu.cli gf-bench --variant all        # measured peaks
    python -m fastecc_tpu.cli ntt-bench --lg-n 20           # NTT GB/s
    python -m fastecc_tpu.cli rs-bench  --lg-k 19           # encode GB/s
    python -m fastecc_tpu.cli decode-bench --lg-n 13 --lg-e 12   # config :10
    python -m fastecc_tpu.cli encode   FILE -o DIR          # write parity
    python -m fastecc_tpu.cli recover  DIR  -o FILE [--check]  # survivors
    python -m fastecc_tpu.cli check    DIR                  # CRC + algebra
    python -m fastecc_tpu.cli repair   DIR                  # re-replicate
    python -m fastecc_tpu.cli scaling  --devices 8          # weak scaling

encode/recover/repair stream through np.memmap beyond --max-resident MB;
check/repair locate silently corrupted blocks algebraically (BM
syndromes) and repair re-tags forged manifest CRCs.

File format: `encode` splits FILE into 4KB data blocks (zero-padded tail,
original size recorded in manifest.json), writes the parity blocks and the
manifest into DIR. `recover` reads whatever block files still exist in DIR
(delete some to simulate loss) plus the original data blocks if present,
and reconstructs FILE from any >= k survivors.
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import pathlib
import sys

import numpy as np


def _field(name: str):
    from .fields import FIELDS
    return FIELDS[name.upper()]


def _rand(field, shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, field.p, size=shape, dtype=np.uint64).astype(
        np.uint32)


# ---------------------------------------------------------------------------
# verify / bench modes (reference `ntt` binary)
# ---------------------------------------------------------------------------

def cmd_verify(args):
    """Fast NTT vs naive O(N^2) DFT, plus four-step cross-check."""
    import jax.numpy as jnp
    from . import ntt as nttmod
    field = _field(args.field)
    n = 1 << args.lg_n
    assert args.lg_n <= 10, "naive oracle is O(N^2); use roundtrip beyond"
    x = _rand(field, (n, args.lanes))
    want = nttmod.naive_dft(x, field)
    got = np.asarray(nttmod.ntt_jit(jnp.asarray(x), field))
    mfa = np.asarray(nttmod.ntt_four_step_jit(jnp.asarray(x), field))
    ok = (got == want).all() and (mfa == want).all()
    print(f"verify lg_n={args.lg_n} {field.name}: "
          f"{'PASS' if ok else 'FAIL'} (stockham & four-step vs naive DFT)")
    return 0 if ok else 1


def cmd_roundtrip(args):
    import jax.numpy as jnp
    from . import ntt as nttmod
    field = _field(args.field)
    n = 1 << args.lg_n
    x = _rand(field, (n, args.lanes))
    back = np.asarray(nttmod.intt_jit(
        nttmod.ntt_jit(jnp.asarray(x), field), field))
    ok = (back == x).all()
    print(f"roundtrip lg_n={args.lg_n} {field.name}: "
          f"{'PASS' if ok else 'FAIL'} (intt(ntt(x)) == x)")
    return 0 if ok else 1


def cmd_gf_bench(args):
    """Mulmod microbenchmark (reference `ntt` 'b' mode, SURVEY.md §3.3).

    ``--variant`` mirrors the reference's scalar/SSE2/AVX2 mulmod A/B:
    Pallas in-VMEM dependent-chain benchmarks of the Solinas REDC vs the
    generic REDC vs raw u32 multiply/add vs GF16 Fermat reduction, plus
    an HBM stream kernel and an `all` mode that emits the full measured
    roofline peak table (feeds utils.profiling.encode_roofline)."""
    import json as _json

    if args.variant != "jnp":
        from .kernels import microbench
        if args.variant == "all":
            peaks = microbench.measure_peaks(iters=args.iters)
            print(_json.dumps({"op": "gf_peaks", **peaks}))
        elif args.variant == "stream":
            v = microbench.hbm_stream_gbps(iters=args.iters)
            print(_json.dumps({"op": "hbm_stream",
                               "gb_per_sec": round(v, 1)}))
        else:
            gops = microbench.vpu_chain_gops(args.variant,
                                             iters=args.iters)
            print(_json.dumps({"op": "gf_chain", "variant": args.variant,
                               "gops": round(gops, 1)}))
        return 0
    import jax, jax.numpy as jnp
    from . import gf
    from .utils.timer import time_fn
    field = _field(args.field)
    m = 1 << args.lg_size
    a = jnp.asarray(_rand(field, (m,), 1))
    b = jnp.asarray(_rand(field, (m,), 2))
    fn = jax.jit(lambda u, v: gf.mul(field, u, v))
    secs = time_fn(fn, a, b, iters=args.iters)
    print(json.dumps({"op": "gf_mul", "field": field.name,
                      "elements": m, "seconds": round(secs, 6),
                      "ops_per_sec": round(m / secs / 1e9, 3),
                      "unit": "Gmul/s"}))
    return 0


def cmd_ntt_bench(args):
    """NTT throughput; --algo mirrors the reference `ntt` binary's
    algorithm-variant selector (stockham/four-step/fused-Pallas/auto)."""
    import jax, jax.numpy as jnp
    from . import ntt as nttmod
    from .utils.timer import time_fn
    field = _field(args.field)
    n = 1 << args.lg_n
    x = jnp.asarray(_rand(field, (n, args.lanes)))
    algo = {
        "auto": lambda v: nttmod.ntt_auto(v, field, inverse=args.inverse),
        "stockham": lambda v: nttmod.ntt(v, field, inverse=args.inverse,
                                         radix=args.radix),
        "fourstep": lambda v: nttmod.ntt_four_step(v, field,
                                                   inverse=args.inverse),
        "pallas": lambda v: __import__(
            "fastecc_tpu.kernels.ntt_mfa", fromlist=["ntt_pallas"]
        ).ntt_pallas(v, field, inverse=args.inverse, radix=args.radix),
    }[args.algo]
    fn = jax.jit(algo)
    secs = time_fn(fn, x, iters=args.iters)
    gb = x.size * 4 / 1e9
    print(json.dumps({"op": "intt" if args.inverse else "ntt",
                      "algo": args.algo, "radix": args.radix,
                      "field": field.name, "lg_n": args.lg_n,
                      "lanes": args.lanes, "seconds": round(secs, 4),
                      "gb_per_sec": round(gb / secs, 2)}))
    return 0


@contextlib.contextmanager
def _seam_dispatch(mode: str):
    """Scope the PAIR_ENABLED A/B switch to one bench command: the flag
    is read at TRACE time, so leaving it flipped would silently demote
    every later encode/decode in the same process (e.g. an in-process
    cli.main sequence) to the 4-pass staged path."""
    from .kernels import ntt_mfa
    prev = ntt_mfa.PAIR_ENABLED
    if mode == "off":
        ntt_mfa.PAIR_ENABLED = False
    try:
        yield
    finally:
        ntt_mfa.PAIR_ENABLED = prev


def cmd_rs_bench(args):
    """RS encode throughput. ``--seam on/off`` A/Bs the 3-pass
    seam-fused transform pair against the two staged transforms
    (bit-exact paths; DESIGN.md §2), ``--pair-c-dim`` sweeps the pair's
    four-step split; ``auto`` is the production dispatch."""
    import jax, jax.numpy as jnp
    from . import rs
    from .utils.timer import time_fn
    field = _field(args.field)
    k, n = 1 << args.lg_k, 1 << (args.lg_k + 1)
    x = jnp.asarray(_rand(field, (k, args.lanes)))
    if args.seam == "on":
        from .kernels import ntt_mfa
        w_n = field.root_of_order(n)
        fn = jax.jit(lambda v: ntt_mfa.ntt_coset_pair_pallas(
            v, field, w_n, c_dim=args.pair_c_dim))
    else:
        # identical production call path; "off" disables the pair
        # dispatch for this command only (restored on exit)
        fn = jax.jit(lambda v: rs.encode_parity(v, field, n))
    with _seam_dispatch(args.seam):
        secs = time_fn(fn, x, iters=args.iters)
    # wire-format word size (GF16 lanes are 2-byte words on the wire);
    # report both the codeword-bytes and the computed-parity-bytes rate
    wb = 4 if field.use_mont else 2
    gb = n * args.lanes * wb / 1e9
    pgb = (n - k) * args.lanes * wb / 1e9
    print(json.dumps({"op": "rs_encode", "field": field.name,
                      "k": k, "n": n, "lanes": args.lanes,
                      "wire_word_bytes": wb, "seam": args.seam,
                      "seconds": round(secs, 4),
                      "gb_per_sec": round(gb / secs, 2),
                      "parity_gb_per_sec": round(pgb / secs, 2)}))
    return 0


def cmd_decode_bench(args):
    """Erasure-decode throughput: recover e erased rows of an [n, lanes]
    codeword (acceptance config BASELINE.json:10 at --lg-n 13 --lg-e 12)."""
    import jax, jax.numpy as jnp
    from . import decode as dec
    from . import rs
    from .utils.timer import time_fn
    field = _field(args.field)
    n, e = 1 << args.lg_n, 1 << args.lg_e
    assert e < n
    k = n // 2
    import time

    data = jnp.asarray(_rand(field, (k, args.lanes)))
    cw = np.asarray(rs.encode_jit(data, field, n))
    rng = np.random.default_rng(args.seed)
    erased = np.sort(rng.choice(n, size=e, replace=False)).astype(np.uint32)
    # garble the erased rows so recovered_ok actually proves recovery
    # (a passthrough decode must FAIL this check)
    garbled = cw.copy()
    garbled[erased] = _rand(field, (e, args.lanes), seed=args.seed + 1)
    gj = jnp.asarray(garbled)
    loc_secs = None
    # --seam off disables the 3-pass seam-fused pair so the staged
    # transforms run on the identical decode call path (restored on exit)
    with _seam_dispatch(getattr(args, "seam", "auto")):
        if args.device_locator:
            fn = jax.jit(lambda c, idx: dec.decode(c, idx, field, k=k))
            secs = time_fn(fn, gj, jnp.asarray(erased), iters=args.iters)
            out = np.asarray(fn(gj, jnp.asarray(erased)))
            locator = "fused-device"
        else:
            # product path: build the locator tables ONCE (their one-time
            # cost reports separately; prepare_decode_tables picks device
            # vs host), then time the steady-state device program
            t0 = time.perf_counter()
            targs = dec.prepare_decode_tables(erased, n, field)
            jax.block_until_ready(targs)
            loc_secs = round(time.perf_counter() - t0, 3)
            # fresh local jit (not the shared decode_prepared_jit): an
            # A/B trace with the pair disabled must not poison the
            # module-level jit's shape-keyed cache for later callers
            fn = jax.jit(lambda c: dec.decode_prepared(c, *targs, field))
            secs = time_fn(fn, gj, iters=args.iters)
            out = np.asarray(fn(gj))
            locator = "prepared"
    ok = bool((out == cw).all())
    wb = 4 if field.use_mont else 2
    gb = n * args.lanes * wb / 1e9
    print(json.dumps({"op": "rs_decode", "field": field.name,
                      "n": n, "erasures": e, "lanes": args.lanes,
                      "locator": locator,
                      "seconds": round(secs, 4),
                      "locator_build_seconds": loc_secs,
                      "gb_per_sec": round(gb / secs, 2),
                      "recovered_gb_per_sec": round(
                          e * args.lanes * wb / 1e9 / secs, 2),
                      "recovered_ok": ok}))
    return 0 if ok else 1


# ---------------------------------------------------------------------------
# file-level encode / recover (the product path, end to end)
# ---------------------------------------------------------------------------

def _load_survivors(src: pathlib.Path, man: dict, quiet: bool = False):
    """Scan a coded directory's block files against its manifest.

    Shared by recover/check/repair. Validates each file's position and
    size and CRC-checks it whenever the manifest has tags (native CRC32C
    when the library loads, bit-identical numpy fallback otherwise — CRC
    never silently disappears); invalid files are excluded (flagged,
    never fatal — the caller decides recoverability). Returns
    (survivors, flagged, crc_verified) where ``flagged`` lists
    (position, reason) for every excluded file.
    """
    from . import host, packing, rs
    field = _field(man["field"])
    n, k = man["n"], man["k"]
    bb = man.get("block_bytes", 4096)
    dpos = set(rs.data_positions(n, k).tolist())
    tags = man.get("crc32c") or {}
    if tags:
        host.available() or host.build()   # prefer the OpenMP path
    crc = bool(tags)
    survivors, flagged = {}, []

    def flag(pos, reason):
        flagged.append((pos, reason))
        if not quiet:
            print(f"block {pos}: {reason} — treating as erased")

    for f in sorted(src.glob("block_*.dat")) + sorted(src.glob("block_*.par")):
        try:
            pos = int(f.stem.split("_")[1])
        except (IndexError, ValueError):
            continue                      # not ours
        if not 0 <= pos < n:
            flag(pos, "position out of range")
            continue
        blob = f.read_bytes()
        want = bb if pos in dpos else packing.parity_bytes(field, bb)
        if len(blob) != want:
            flag(pos, f"bad size {len(blob)} != {want}")
            continue
        if crc and str(pos) in tags and host.crc32c(blob) != tags[str(pos)]:
            flag(pos, "CRC mismatch")
            continue
        survivors[pos] = blob
    return survivors, flagged, crc


def _file_blocks(path: pathlib.Path, block_bytes: int):
    raw = np.fromfile(path, dtype=np.uint8)
    k_data = max(1, -(-raw.size // block_bytes))
    k = 1 << (k_data - 1).bit_length()           # round up to power of two
    blocks = np.zeros((k, block_bytes), np.uint8)
    blocks.reshape(-1)[: raw.size] = raw
    return blocks, raw.size, k


def cmd_encode(args):
    import jax.numpy as jnp
    from . import host, rs
    field = _field(args.field)
    src = pathlib.Path(args.file)
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    from .packing import _word_count
    assert args.block_bytes > 0, "--block-bytes must be positive"
    _word_count(field, args.block_bytes)   # loud word-alignment check
    max_resident = args.max_resident << 20
    from . import storage
    total_blocks = max(1, -(-src.stat().st_size // args.block_bytes))
    if total_blocks > storage.stripe_capacity_blocks(field):
        # beyond one codeword's capacity (n = 2k caps at the transform
        # order): stripe across self-contained codeword subdirectories
        man = storage.encode_file(
            src, out, field, block_bytes=args.block_bytes,
            max_resident_bytes=max_resident)
        print(f"encoded {src} ({man['size']} bytes, "
              f"{len(man['stripes'])} stripes x {man['stripe_blocks']} "
              f"data blocks, streamed) -> {out}")
        return 0
    if src.stat().st_size > max_resident:
        # out-of-core path: memmap + lane-chunk streaming (storage.py);
        # output directory is bit-identical to the in-core path below
        man = storage.encode_file_stream(
            src, out, field, block_bytes=args.block_bytes,
            max_resident_bytes=max_resident)
        print(f"encoded {src} ({man['size']} bytes, streamed) -> "
              f"{man['k']} data + {man['k']} parity blocks in {out}")
        return 0
    blocks, size, k = _file_blocks(src, args.block_bytes)
    n = 2 * k
    parity = np.asarray(rs.encode_blocks_jit(jnp.asarray(blocks), field, n))
    dpos, ppos = rs.data_positions(n, k), rs.parity_positions(n, k)
    # per-block CRC32C integrity tags (recover uses them to demote
    # silently-corrupted blocks to erasures); native OpenMP when it
    # builds, bit-identical numpy fallback otherwise — always tagged
    host.available() or host.build()
    tags = {}
    dtags = host.crc32c_blocks(blocks)            # one batched call
    ptags = host.crc32c_blocks(parity)
    for i in range(k):
        tags[int(dpos[i])] = int(dtags[i])
        tags[int(ppos[i])] = int(ptags[i])
    for i in range(k):
        (out / f"block_{int(dpos[i]):06d}.dat").write_bytes(
            blocks[i].tobytes())
        (out / f"block_{int(ppos[i]):06d}.par").write_bytes(
            parity[i].tobytes())
    (out / "manifest.json").write_text(json.dumps({
        "file": src.name, "size": size, "k": k, "n": n,
        "field": field.name, "format": "fastecc-tpu-v1",
        "block_bytes": args.block_bytes,
        "crc32c": {str(p): t for p, t in tags.items()} or None}))
    print(f"encoded {src} ({size} bytes) -> {k} data + {k} parity blocks "
          f"in {out}")
    return 0


def _codeword_bytes(man) -> int:
    from . import packing
    field = _field(man["field"])
    bb = man.get("block_bytes", 4096)
    return man["n"] * packing.field_lanes(field, bb) * 4


def cmd_recover(args):
    from . import decode as dec
    from . import storage
    src = pathlib.Path(args.dir)
    man = json.loads((src / "manifest.json").read_text())
    if storage.is_striped(man):
        wrote = storage.recover_file(
            src, pathlib.Path(args.out),
            max_resident_bytes=args.max_resident << 20,
            check=args.check, progress=print)
        print(f"recovered {man['file']} -> {args.out} ({man['size']} "
              f"bytes, {len(man['stripes'])} stripes, {wrote} blocks "
              f"reconstructed)")
        return 0
    field = _field(man["field"])
    n, k, size = man["n"], man["k"], man["size"]
    out = pathlib.Path(args.out)
    if _codeword_bytes(man) > args.max_resident << 20:
        wrote = storage.recover_file_stream(
            src, out, max_resident_bytes=args.max_resident << 20,
            check=args.check, progress=print)
        print(f"recovered {man['file']} -> {out} ({size} bytes, "
              f"{wrote} blocks reconstructed, streamed)")
        return 0
    survivors, _, _ = _load_survivors(src, man)
    lost = n - len(survivors)
    print(f"{len(survivors)}/{n} blocks present ({lost} lost); "
          f"need any {k}")
    data = dec.decode_blocks(survivors, n, k, field,
                             block_bytes=man.get("block_bytes", 4096),
                             check=args.check)
    out.write_bytes(data.reshape(-1)[:size].tobytes())
    print(f"recovered {man['file']} -> {out} ({size} bytes)")
    return 0


def cmd_check(args):
    """Audit a coded directory: CRC every block file, then (if complete)
    verify the algebraic codeword property in one inverse transform.

    Exit codes: 0 = healthy; 1 = degraded but recoverable (>= k
    survivors — including silently-corrupted blocks that were LOCATED
    algebraically, status "corrupt-located"); 2 = unrecoverable (< k
    survivors); 3 = inconsistent but not locatable (corruption beyond
    capacity or a degenerate pattern — the most alarming state:
    something lied and repair cannot fix it).

    Location capacity: algebraic location finds at most
    min((n-k-e)/2, 16384) silently corrupt rows (the designed
    decode._BM_MAX syndrome-window cap — its O(w^2) host solve is ~9 s
    at the full window; corruption wider than that is CRC's job, and
    CRC-tagged corruption is caught block-by-block regardless).

    Directories whose codeword exceeds --max-resident stream through a
    memmap stage + lane-chunked verification (storage.check_file_stream)
    instead of loading every survivor blob into RAM.
    """
    import jax.numpy as jnp

    from . import decode as dec
    from . import rs
    src = pathlib.Path(args.dir)
    man = json.loads((src / "manifest.json").read_text())
    from . import storage
    if storage.is_striped(man):
        report, rc = storage.check_file(
            src, max_resident_bytes=args.max_resident << 20)
        print(json.dumps(report))
        return rc
    field = _field(man["field"])
    n, k = man["n"], man["k"]
    bb = man.get("block_bytes", 4096)
    if _codeword_bytes(man) > args.max_resident << 20:
        report, rc = storage.check_file_stream(
            src, max_resident_bytes=args.max_resident << 20)
        print(json.dumps(report))
        return rc
    survivors, flagged, crc_verified = _load_survivors(src, man, quiet=True)
    missing = sorted(set(range(n)) - set(survivors))
    consistent = None
    located = None
    if not missing:
        cw, _ = dec.survivors_to_codeword(survivors, n, k, field, bb)
        from .rs import _pad_lanes
        padded, _ = _pad_lanes(jnp.asarray(cw))
        consistent = bool(rs.verify_codeword_jit(padded, field, k))
        if not consistent:
            # corruption the CRC missed (or forged tags): locate the bad
            # rows algebraically (Berlekamp-Massey on the NTT-domain
            # syndromes — decode.locate_errors); `repair` can then fix
            # them without any CRC evidence at all
            pos = dec.locate_errors(padded, k, field)
            if pos is not None and pos.size:
                located = [int(x) for x in pos]
    status, recoverable, rc = storage.status_ladder(
        consistent, located, len(missing), len(survivors), k)
    print(json.dumps({
        "n": n, "k": k, "present": len(survivors),
        "flagged": [[p, why] for p, why in flagged],
        "missing_or_corrupt": missing,
        "located_corrupt": located,
        "crc_verified": crc_verified,
        "codeword_consistent": consistent,
        "recoverable": recoverable,
        "status": status}))
    return rc


def cmd_repair(args):
    """Regenerate missing/corrupt block FILES in a coded directory.

    The storage-maintenance workflow (re-replication after loss): where
    `recover` reconstructs the original file, `repair` rewrites every
    missing codeword block — data and parity — so the directory is back
    at full n-of-n redundancy. Silently-corrupt blocks (wrong bytes,
    valid-looking files) are located algebraically up to
    min((n-k-e)/2, 16384) rows per stripe (decode._BM_MAX; see
    `cli check`) and rewritten too, including forged manifest CRCs.
    """
    import jax.numpy as jnp

    from . import decode as dec
    from . import host, rs
    src = pathlib.Path(args.dir)
    man = json.loads((src / "manifest.json").read_text())
    from . import storage
    if storage.is_striped(man):
        wrote = storage.recover_file(
            src, None, max_resident_bytes=args.max_resident << 20,
            repair=True, check=True, progress=print)
        print(f"repaired {wrote} blocks in {src} "
              f"({len(man['stripes'])} stripes)")
        return 0
    field = _field(man["field"])
    n, k = man["n"], man["k"]
    bb = man.get("block_bytes", 4096)
    tags = man.get("crc32c") or {}
    if _codeword_bytes(man) > args.max_resident << 20:
        wrote = storage.recover_file_stream(
            src, None, max_resident_bytes=args.max_resident << 20,
            repair=True, check=True, progress=print)
        print(f"repaired {wrote} blocks in {src} (streamed)")
        return 0
    survivors, _, _ = _load_survivors(src, man)
    missing = sorted(set(range(n)) - set(survivors))
    dpos = set(rs.data_positions(n, k).tolist())
    from .rs import _pad_lanes
    located_set = set()
    if not missing:
        # no missing/CRC-flagged files: audit algebraically and repair
        # any silently corrupted rows at UNKNOWN positions (corruption
        # that defeated or forged the CRC tags) — locate via
        # Berlekamp-Massey syndromes, then erase-and-recover
        cw, _ = dec.survivors_to_codeword(survivors, n, k, field, bb)
        padded, real = _pad_lanes(jnp.asarray(cw))
        if bool(rs.verify_codeword_jit(padded, field, k)):
            print("nothing to repair")
            return 0
        fixed, pos = dec.correct_errors(padded, k, field)
        full = np.asarray(fixed)[:, :real]
        missing = [int(x) for x in pos]
        located_set = set(missing)
        print(f"located {len(missing)} silently corrupted blocks "
              f"algebraically: {missing}")
    else:
        assert len(survivors) >= k, (
            f"unrecoverable: {len(survivors)} survivors < k={k}")
        cw, _ = dec.survivors_to_codeword(survivors, n, k, field, bb)
        padded, real = _pad_lanes(jnp.asarray(cw))
        dec_full = dec.decode_host_prepared(
            padded, np.asarray(missing), field, k=k)
        if not bool(rs.verify_codeword_jit(dec_full, field, k)):
            # a SURVIVOR was silently corrupted on top of the missing
            # files: errors-and-erasures correction (e + 2t <= n-k)
            dec_full, pos = dec.correct_errors(padded, k, field,
                                               erased=np.asarray(missing))
            located_set = {int(x) for x in pos}
            missing = sorted(set(missing) | located_set)
            print(f"located {len(located_set)} silently corrupted "
                  f"survivors algebraically: {sorted(located_set)}")
        full = np.asarray(dec_full)[:, :real]
    # Batched emission (one unpack/serialize + one CRC call per 256
    # rows — a per-block loop paid one device dispatch per block, the
    # exact cost the streamed path batches away). Every branch above
    # ends in an algebraically VERIFIED codeword (verify_codeword or
    # correct_errors' internal audit), so a stored tag disagreeing with
    # a reconstruction is stale or forged — e.g. a crash between a block
    # write and its manifest write — and is re-tagged rather than
    # dead-ending the repair.
    from .storage import _rows_to_blobs
    retagged = []
    for kind, suffix, poss in (
            ("data", "dat", [p for p in missing if p in dpos]),
            ("parity", "par", [p for p in missing if p not in dpos])):
        for s in range(0, len(poss), 256):
            grp = poss[s: s + 256]
            blobs = _rows_to_blobs(full[grp], field, bb, kind)
            crcs = host.crc32c_blocks(blobs) if tags else None
            for j, pos in enumerate(grp):
                if tags and str(pos) in tags and \
                        int(crcs[j]) != tags[str(pos)]:
                    tags[str(pos)] = int(crcs[j])
                    retagged.append(pos)
                (src / f"block_{pos:06d}.{suffix}").write_bytes(
                    blobs[j].tobytes())
    if retagged:
        man["crc32c"] = tags
        (src / "manifest.json").write_text(json.dumps(man))
        print(f"re-tagged {len(retagged)} forged/stale manifest CRCs")
    print(f"repaired {len(missing)} blocks in {src}")
    return 0


def cmd_read(args):
    """Ranged read — the serving primitive: return bytes
    [--offset, --offset + --length) of the encoded payload without
    recovering the file. Missing/CRC-lying covering blocks trigger a
    degraded read: an erasure decode restricted to the word-column
    window the range touches (O(n * window), not O(n * block))."""
    from . import storage
    data = storage.read_file(args.dir, args.offset, args.length)
    if args.out:
        pathlib.Path(args.out).write_bytes(data)
        print(f"read {len(data)} bytes at offset {args.offset} "
              f"-> {args.out}")
    else:
        sys.stdout.buffer.write(data)
    return 0


def cmd_update(args):
    """Incremental partial write: splice FILE's bytes into the encoded
    payload at --offset and update the touched data blocks and all
    parity files in place — rank-1 parity updates
    (rs.update_parity_multi at directory level) instead of a full
    re-encode. The directory stays bit-identical to a fresh encode of
    the edited payload. For edits spanning more than ~2*log2(k) blocks
    a full re-encode is cheaper."""
    from . import storage
    data = pathlib.Path(args.file).read_bytes()
    nblocks = storage.update_file(args.dir, args.offset, data)
    print(f"updated {nblocks} data block(s) + parity at offset "
          f"{args.offset} ({len(data)} bytes)")
    return 0


def cmd_roofline(args):
    """Speed-of-light bound for a pipeline config (the DESIGN.md §4
    model, reproducible in one command): exact per-element VPU op
    counts priced at the measured raw op rates, plus the HBM pass
    bound. No device work — the peaks are the pinned v5e table unless
    ``--peaks-json`` supplies a re-measured one (`cli gf-bench
    --variant all` output on new hardware)."""
    from .utils import profiling

    peaks = None
    if args.peaks_json:
        with open(args.peaks_json) as fh:
            peaks = json.load(fh)
        peaks.pop("op", None)   # accept gf-bench's JSON line verbatim
    field = _field(args.field)
    n = 1 << args.lg_n
    seam = args.seam != "off"
    if args.pipeline == "encode":
        r = profiling.encode_roofline(n, args.lanes, peaks=peaks,
                                      field_name=field.name, seam=seam)
    elif args.pipeline == "decode":
        r = profiling.decode_roofline(n, args.lanes, peaks=peaks,
                                      field_name=field.name, seam=seam)
    elif args.pipeline == "encode-wire":
        # GF16's fused wire pair is the seam path; GF32 has no fused
        # wire form (the escape bitmap is extra codeword lanes)
        r = profiling.encode_blocks_roofline(
            n, args.block_bytes, field_name=field.name,
            fused=(field.name == "GF16" and seam), peaks=peaks)
    elif args.pipeline == "decode-wire":
        r = profiling.decode_blocks_roofline(
            n, args.block_bytes, field_name=field.name, peaks=peaks)
    else:
        r = profiling.ntt_roofline(n, args.lanes, peaks=peaks,
                                   field_name=field.name)
    out = {"op": "roofline", "pipeline": args.pipeline,
           "field": field.name, "lg_n": args.lg_n, "lanes": args.lanes,
           "seam": None if args.pipeline == "ntt" else seam}
    out.update({k: round(v, 6) if isinstance(v, float) else v
                for k, v in r.items()})
    if field.name == "GF16" and args.pipeline in ("encode", "decode",
                                                  "ntt"):
        # wire accounting: a GF16 lane is a 2-byte word (the in-HBM u32
        # rate is exactly 2x) — report both, like bench.py (the *-wire
        # pipelines already count wire/recovered bytes)
        out["speed_of_light_wire_gbps"] = round(
            r["speed_of_light_gbps"] / 2, 6)
    print(json.dumps(out))
    return 0


_MULTIPROC_WORKER = r'''
import json, os, sys
proc_id = int(sys.argv[1]); port = sys.argv[2]
nprocs = int(sys.argv[3]); mesh_coeff = int(sys.argv[4])
mesh_block = int(sys.argv[5]); lg_n = int(sys.argv[6])
lanes = int(sys.argv[7]); field_name = sys.argv[8]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nprocs, process_id=proc_id)
import numpy as np, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from fastecc_tpu import rs
from fastecc_tpu.fields import FIELDS
from fastecc_tpu.decode import prepare_decode_tables
from fastecc_tpu.parallel import make_mesh
from fastecc_tpu.parallel.ntt_dist import (decode_prepared_sharded_jit,
                                           encode_parity_sharded_jit,
                                           ntt_sharded, ntt_sharded_jit)
from fastecc_tpu.utils.timer import time_fn
field = FIELDS[field_name]
mesh = make_mesh(mesh_coeff, mesh_block)
n = 1 << lg_n; k = n // 2
rng = np.random.default_rng(0)
x = rng.integers(0, field.p, (n, lanes), dtype=np.uint64).astype(np.uint32)
sh = NamedSharding(mesh, P("coeff", "block"))
vsh = NamedSharding(mesh, P("coeff"))
mk = lambda a, spec: jax.make_array_from_callback(a.shape, spec,
                                                  lambda i: a[i])
xg, dg = mk(x, sh), mk(x[:k], sh)
phases, a2a = {}, {}
phases["ntt_s"] = time_fn(lambda v: ntt_sharded_jit(v, field, mesh), xg,
                          iters=2)
a2a["ntt"] = jax.jit(lambda v: ntt_sharded(v, field, mesh)).lower(
    xg).as_text().count("all_to_all")
phases["encode_s"] = time_fn(
    lambda v: encode_parity_sharded_jit(v, field, mesh, n), dg, iters=2)
a2a["encode"] = encode_parity_sharded_jit.lower(
    dg, field, mesh, n).as_text().count("all_to_all")
par = encode_parity_sharded_jit(dg, field, mesh, n)
pw = np.asarray(rs.encode_parity_jit(jnp.asarray(x[:k]), field, n))
bit_exact = all((np.asarray(s.data) == pw[s.index]).all()
                for s in par.addressable_shards)
cw = np.asarray(rs.encode_jit(jnp.asarray(x[:k]), field, n))
erased = np.sort(rng.choice(n, size=k, replace=False))
garbled = cw.copy()
garbled[erased] = 0
mask, lp, ip = (np.asarray(t) for t in prepare_decode_tables(
    erased, n, field, locator="host"))
cg, mg, lg, ig = mk(garbled, sh), mk(mask, vsh), mk(lp, vsh), mk(ip, vsh)
phases["decode_s"] = time_fn(
    lambda c: decode_prepared_sharded_jit(c, mg, lg, ig, field, mesh),
    cg, iters=2)
a2a["decode"] = decode_prepared_sharded_jit.lower(
    cg, mg, lg, ig, field, mesh).as_text().count("all_to_all")
out = decode_prepared_sharded_jit(cg, mg, lg, ig, field, mesh)
bit_exact = bit_exact and all(
    (np.asarray(s.data) == cw[s.index]).all()
    for s in out.addressable_shards)
if proc_id == 0:
    print("SCALEROW " + json.dumps({
        "phases": {kk: round(v, 4) for kk, v in phases.items()},
        "all_to_all": a2a, "bit_exact": bool(bit_exact),
        "process_count": nprocs, "devices": jax.device_count()}))
print(f"proc {proc_id}: OK")
'''


def _append_baseline_scaling_row(path, row):
    """Append one virtual-tagged structural row to BASELINE.md (round-5
    verdict directive 7): config :11 readiness stays continuously
    exercised AND visible, instead of only green in CI."""
    import datetime
    import subprocess
    header = "## Multihost structural proxies (virtual — NOT perf data)"
    commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                            capture_output=True, text=True,
                            cwd=pathlib.Path(path).resolve().parent
                            ).stdout.strip() or "?"
    ph, a2a = row["phases"], row["all_to_all"]
    line = (f"- {datetime.date.today()} ({commit}): "
            f"{row['process_count']}-process {row['mesh']} Gloo mesh, "
            f"{row['field']} n=2^{row['lg_n']}: all_to_all per program "
            f"ntt/encode/decode = {a2a['ntt']}/{a2a['encode']}/"
            f"{a2a['decode']}; phase walls ntt {ph['ntt_s']} s, "
            f"encode {ph['encode_s']} s, decode {ph['decode_s']} s; "
            f"bit-exact vs single-process: {row['bit_exact']}. "
            f"Virtual CPU devices over Gloo — structural readiness for "
            f"[BASELINE] config :11, not a throughput row.\n")
    p = pathlib.Path(path)
    text = p.read_text() if p.exists() else "# BASELINE\n"
    if header not in text:
        text = text.rstrip("\n") + f"\n\n{header}\n\n"
    else:
        text = text.rstrip("\n") + "\n"
    p.write_text(text + line)


def _scaling_multiproc(args):
    """Spawn the 4-process 2x2 (or N-process Nx1) Gloo mesh and emit ONE
    structural scaling row: per-phase walls + all_to_all collective
    counts + bit-exactness, tagged virtual (the multi-controller proxy
    of tests/test_multihost.py promoted to an operator-visible
    surface)."""
    import socket
    import subprocess
    import tempfile

    field = _field(args.field)
    procs = args.procs
    mesh_c, mesh_b = (2, 2) if procs == 4 else (procs, 1)
    lg_n = min(args.lg_k + 1, 10)   # Gloo on one core: structural size
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    with tempfile.TemporaryDirectory() as td:
        worker = pathlib.Path(td) / "scaling_worker.py"
        worker.write_text(_MULTIPROC_WORKER)
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        repo = str(pathlib.Path(__file__).resolve().parent.parent)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        argv_tail = [port, str(procs), str(mesh_c), str(mesh_b),
                     str(lg_n), str(args.lanes), field.name]
        ps = [subprocess.Popen(
            [sys.executable, str(worker), str(i)] + argv_tail, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
            for i in range(procs)]
        outs = []
        try:
            for p in ps:
                out, _ = p.communicate(timeout=550)
                outs.append(out)
        finally:
            for p in ps:
                if p.poll() is None:
                    p.kill()
                    p.communicate()
        for i, (p, out) in enumerate(zip(ps, outs)):
            if p.returncode != 0:
                print(out[-3000:], file=sys.stderr)
                print(f"worker {i} failed rc={p.returncode}",
                      file=sys.stderr)
                return 1
    row = None
    for ln in outs[0].splitlines():
        if ln.startswith("SCALEROW "):
            row = json.loads(ln[len("SCALEROW "):])
    assert row is not None, "worker 0 emitted no SCALEROW"
    row.update({"virtual": True, "transport": "gloo",
                "mesh": f"{mesh_c}x{mesh_b}", "field": field.name,
                "lg_n": lg_n})
    print(json.dumps(row))
    if args.update_baseline:
        _append_baseline_scaling_row(args.baseline_path, row)
    return 0


def cmd_scaling(args):
    """Weak-scaling sweep over mesh sizes (emits BASELINE.md-style rows).

    On a machine without a pod this exercises the sharded path on virtual
    CPU devices (structural check, not a perf number); on a real slice the
    same command measures true ICI scaling ([BASELINE] config :11).

    ``--procs N`` switches to the multi-controller structural row: N OS
    processes over a Gloo-backed 2x2 (N=4) or Nx1 mesh, per-phase walls
    + all_to_all counts + bit-exactness in one virtual-tagged JSON row;
    ``--update-baseline`` appends it to BASELINE.md."""
    if args.procs > 1:
        return _scaling_multiproc(args)
    # the CPU-platform device-count flag must be set before the CPU client
    # is created; harmless for real-hardware platforms
    from .utils.timer import ensure_host_device_flag
    ensure_host_device_flag(args.devices)
    import jax
    devices = jax.devices()
    if len(devices) < args.devices:
        # build the mesh from virtual CPU devices explicitly (requesting
        # the cpu client works even after another backend initialized)
        devices = jax.devices("cpu")
    assert len(devices) >= args.devices, (
        f"need {args.devices} devices, have {len(devices)}")
    # virtual CPU devices exercise the sharded program structurally; their
    # timings are NOT perf data — tag every row so a BASELINE.md entry can
    # never be built from them by accident
    virtual = devices[0].platform != "tpu"
    import jax.numpy as jnp
    from . import rs
    from .parallel import make_mesh
    from .parallel.ntt_dist import (decode_sharded,
                                    encode_parity_sharded_jit,
                                    ntt_sharded_jit,
                                    ntt_sharded_overlap_jit)
    from .utils.timer import time_fn
    field = _field(args.field)
    k = 1 << args.lg_k
    erased = (np.sort(np.random.default_rng(0).choice(
        2 * k, size=k, replace=False)).astype(np.uint32)
        if args.op == "decode" else None)
    rows = []
    d = 1
    base = None
    while d <= args.devices:
        mesh = make_mesh(d, 1, devices=devices[:d])
        lanes = args.lanes * d                     # weak scaling: grow work
        if args.op == "decode":
            # a real [n, lanes] codeword with the max n-k rows erased
            x = rs.encode_jit(jnp.asarray(_rand(field, (k, lanes))),
                              field, 2 * k)
        else:
            x = jnp.asarray(_rand(field, (k, lanes)))
        fn = {
            "encode": lambda v: encode_parity_sharded_jit(
                v, field, mesh, 2 * k),
            "decode": lambda v: decode_sharded(v, erased, field, mesh),
            "ntt": lambda v: ntt_sharded_jit(v, field, mesh),
            "ntt-overlap": lambda v: ntt_sharded_overlap_jit(
                v, field, mesh, chunks=min(args.overlap_chunks, lanes)),
        }[args.op]
        secs = time_fn(fn, x, iters=args.iters)
        # encode emits an n=2k codeword from [k, lanes]; decode consumes
        # one; the NTT ops transform [k, lanes] in place — count what
        # each op processes
        factor = 2 if args.op in ("encode", "decode") else 1
        gbps = factor * k * lanes * 4 / secs / 1e9
        eff = 1.0 if base is None else gbps / (base * d)
        base = base or gbps
        rows.append({"devices": d, "lanes": lanes,
                     "seconds": round(secs, 4),
                     "gb_per_sec": round(gbps, 4),
                     "weak_scaling_eff": round(eff, 3),
                     "virtual": virtual})
        print(json.dumps(rows[-1]))
        d *= 2
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="fastecc_tpu",
        description="TPU-native O(N log N) Reed-Solomon erasure coding")
    ap.add_argument("--field", default="GF32", choices=["GF32", "GF16",
                                                        "gf32", "gf16"])
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("verify", help="fast NTT vs naive DFT oracle")
    p.add_argument("--lg-n", type=int, default=8)
    p.add_argument("--lanes", type=int, default=4)
    p.set_defaults(fn=cmd_verify)

    p = sub.add_parser("roundtrip", help="intt(ntt(x)) == x at scale")
    p.add_argument("--lg-n", type=int, default=16)
    p.add_argument("--lanes", type=int, default=4)
    p.set_defaults(fn=cmd_roundtrip)

    p = sub.add_parser("gf-bench", help="mulmod microbenchmark")
    p.add_argument("--lg-size", type=int, default=24)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--variant", default="jnp",
                   choices=["jnp", "solinas", "solinas-bcast",
                            "solinas-masksel", "generic",
                            "gf16", "gf16-bcast", "gf16-tw", "addmod",
                            "addmod-masksel", "raw-mul", "raw-add",
                            "interleave", "stage-r2", "stage-r4",
                            "stage-r2-gf16", "stage-r4-gf16",
                            "stream", "all"],
                   help="Pallas in-VMEM A/B (reference ntt-binary mulmod "
                        "variant compare); 'all' emits the measured "
                        "roofline peak table")
    p.set_defaults(fn=cmd_gf_bench)

    p = sub.add_parser("ntt-bench", help="NTT throughput")
    p.add_argument("--lg-n", type=int, default=20)
    p.add_argument("--lanes", type=int, default=512)
    p.add_argument("--inverse", action="store_true")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--algo", default="auto",
                   choices=["auto", "stockham", "fourstep", "pallas"],
                   help="algorithm variant (reference `ntt` selector)")
    p.add_argument("--radix", type=int, default=4, choices=[2, 4])
    p.set_defaults(fn=cmd_ntt_bench)

    p = sub.add_parser("rs-bench", help="RS encode throughput")
    p.add_argument("--lg-k", type=int, default=19)
    p.add_argument("--lanes", type=int, default=1024)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--seam", default="auto", choices=["auto", "on", "off"],
                   help="A/B the 3-pass seam-fused pair vs the staged "
                        "transforms (auto = production dispatch)")
    p.add_argument("--pair-c-dim", type=int, default=None,
                   help="four-step split override for --seam on")
    p.set_defaults(fn=cmd_rs_bench)

    p = sub.add_parser("decode-bench", help="erasure decode throughput")
    p.add_argument("--lg-n", type=int, default=13)
    p.add_argument("--lg-e", type=int, default=12)
    p.add_argument("--lanes", type=int, default=1024)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--device-locator", action="store_true",
                   help="build the locator on-device (jit-composable "
                        "path) instead of the host-prepared fast path")
    p.add_argument("--seam", default="auto", choices=["auto", "off"],
                   help="off disables the 3-pass seam-fused pair for an "
                        "A/B on the identical decode call path")
    p.set_defaults(fn=cmd_decode_bench)

    p = sub.add_parser("encode", help="encode a file into data+parity blocks")
    p.add_argument("file")
    p.add_argument("-o", "--out", required=True, help="output directory")
    p.add_argument("--block-bytes", type=int, default=4096,
                   help="wire block size (reference `rs` SIZE arg); "
                        "multiple of 4 for GF32, 2 for GF16")
    p.add_argument("--max-resident", type=int, default=2048, metavar="MB",
                   help="stream files larger than this through np.memmap "
                        "lane chunks instead of loading them whole")
    p.set_defaults(fn=cmd_encode)

    p = sub.add_parser("recover", help="recover a file from survivors")
    p.add_argument("dir")
    p.add_argument("-o", "--out", required=True, help="recovered file path")
    p.add_argument("--max-resident", type=int, default=2048, metavar="MB",
                   help="stream codewords larger than this (memmap "
                        "staging + lane-chunk decode)")
    p.add_argument("--check", action="store_true",
                   help="verify the decoded codeword algebraically and "
                        "auto-correct silently corrupted survivors "
                        "(errors-and-erasures, e + 2t <= n-k)")
    p.set_defaults(fn=cmd_recover)

    p = sub.add_parser("check", help="audit a coded directory (CRC + "
                                     "algebraic consistency)")
    p.add_argument("dir")
    p.add_argument("--max-resident", type=int, default=2048, metavar="MB",
                   help="stream codewords larger than this (memmap "
                        "staging + lane-chunk verification)")
    p.set_defaults(fn=cmd_check)

    p = sub.add_parser("repair", help="regenerate missing block files "
                                      "(back to full n-of-n redundancy)")
    p.add_argument("dir")
    p.add_argument("--max-resident", type=int, default=2048, metavar="MB",
                   help="stream codewords larger than this (memmap "
                        "staging + lane-chunk decode)")
    p.set_defaults(fn=cmd_repair)

    p = sub.add_parser("read", help="ranged read from a coded directory "
                                    "(degraded reads decode only the "
                                    "touched column window)")
    p.add_argument("dir")
    p.add_argument("--offset", type=int, required=True)
    p.add_argument("--length", type=int, required=True)
    p.add_argument("-o", "--out", default=None,
                   help="output file (default: stdout)")
    p.set_defaults(fn=cmd_read)

    p = sub.add_parser("update", help="splice changed bytes into a "
                                      "coded directory (incremental "
                                      "parity update, no re-encode)")
    p.add_argument("dir")
    p.add_argument("file", help="file holding the new bytes")
    p.add_argument("--offset", type=int, required=True,
                   help="byte offset of the edit in the encoded payload "
                        "(the file size cannot change)")
    p.set_defaults(fn=cmd_update)

    p = sub.add_parser("roofline", help="speed-of-light bound for a "
                                        "pipeline config (op-count "
                                        "model, DESIGN.md §4)")
    p.add_argument("--pipeline", default="encode",
                   choices=["encode", "decode", "ntt", "encode-wire",
                            "decode-wire"])
    p.add_argument("--lg-n", type=int, default=20,
                   help="log2 of total codeword blocks (encode/decode) "
                        "or transform points (ntt)")
    p.add_argument("--lanes", type=int, default=1024)
    p.add_argument("--block-bytes", type=int, default=4096,
                   help="wire block size for the *-wire pipelines")
    p.add_argument("--seam", default="on", choices=["on", "off"],
                   help="price the 3-pass seam-fused transform pair vs "
                        "the 4 staged passes (ignored for ntt)")
    p.add_argument("--peaks-json", default=None, metavar="FILE",
                   help="re-measured peaks table (`gf-bench --variant "
                        "all` JSON) instead of the pinned v5e peaks")
    p.set_defaults(fn=cmd_roofline)

    p = sub.add_parser("scaling", help="weak-scaling sweep over mesh sizes")
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--lg-k", type=int, default=10)
    p.add_argument("--lanes", type=int, default=8)
    p.add_argument("--iters", type=int, default=2)
    p.add_argument("--op", default="encode",
                   choices=["encode", "decode", "ntt", "ntt-overlap"],
                   help="pipeline under test (decode = sharded erasure "
                        "decode at max loss; ntt-overlap = the double-"
                        "buffered collective/compute variant)")
    p.add_argument("--overlap-chunks", type=int, default=2)
    p.add_argument("--procs", type=int, default=1,
                   help="multi-controller structural row: spawn this "
                        "many OS processes over a Gloo mesh (4 -> 2x2) "
                        "instead of the in-process device sweep")
    p.add_argument("--update-baseline", action="store_true",
                   help="append the --procs row to BASELINE.md "
                        "(virtual-tagged)")
    p.add_argument("--baseline-path", default="BASELINE.md")
    p.set_defaults(fn=cmd_scaling)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
