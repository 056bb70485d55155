"""CLI end-to-end (C17): verify modes + file encode/delete-half/recover."""

import hashlib
import pathlib
import random

import numpy as np
import pytest

from fastecc_tpu.cli import main


def test_verify_and_roundtrip(capsys):
    assert main(["verify", "--lg-n", "6"]) == 0
    assert main(["--field", "gf16", "verify", "--lg-n", "6"]) == 0
    assert main(["roundtrip", "--lg-n", "10"]) == 0
    out = capsys.readouterr().out
    assert out.count("PASS") == 3


def test_file_encode_recover(tmp_path):
    src = tmp_path / "sample.bin"
    rng = np.random.default_rng(9)
    payload = rng.integers(0, 256, size=50000, dtype=np.uint16).astype(
        np.uint8).tobytes()
    src.write_bytes(payload)
    coded = tmp_path / "coded"
    assert main(["encode", str(src), "-o", str(coded)]) == 0

    blocks = sorted(coded.glob("block_*"))
    random.seed(11)
    for victim in random.sample(blocks, len(blocks) // 2):
        victim.unlink()

    out = tmp_path / "recovered.bin"
    assert main(["recover", str(coded), "-o", str(out)]) == 0
    assert hashlib.sha256(out.read_bytes()).hexdigest() == \
        hashlib.sha256(payload).hexdigest()


def test_recover_insufficient(tmp_path):
    src = tmp_path / "s.bin"
    src.write_bytes(b"\x55" * 9000)
    coded = tmp_path / "coded"
    main(["encode", str(src), "-o", str(coded)])
    blocks = sorted(coded.glob("block_*"))
    # keep fewer than k block files
    manifest_k = 4  # 9000 bytes -> 3 blocks -> k=4
    for victim in blocks[: len(blocks) - (manifest_k - 1)]:
        victim.unlink()
    with pytest.raises(AssertionError, match="unrecoverable"):
        main(["recover", str(coded), "-o", str(tmp_path / "r.bin")])


def test_file_encode_recover_custom_block_size(tmp_path):
    """--block-bytes flows through manifest -> recover (reference SIZE arg)."""
    from fastecc_tpu import cli
    src = tmp_path / "input.bin"
    rng = np.random.default_rng(9)
    src.write_bytes(rng.integers(0, 256, 3000, dtype=np.uint16)
                    .astype(np.uint8).tobytes())
    out = tmp_path / "coded"
    assert cli.main(["encode", str(src), "-o", str(out),
                     "--block-bytes", "512"]) == 0
    # delete two blocks (k=8 at 512B: 3000 -> 6 blocks -> k=8, n=16)
    victims = sorted(out.glob("block_*"))[:2]
    for v in victims:
        v.unlink()
    dst = tmp_path / "restored.bin"
    assert cli.main(["recover", str(out), "-o", str(dst)]) == 0
    assert dst.read_bytes() == src.read_bytes()


def test_repair_restores_full_redundancy(tmp_path):
    """repair rewrites lost data AND parity files; recover then works even
    after a second, different loss wave."""
    from fastecc_tpu import cli
    src = tmp_path / "input.bin"
    rng = np.random.default_rng(11)
    src.write_bytes(rng.integers(0, 256, 5000, dtype=np.uint16)
                    .astype(np.uint8).tobytes())
    out = tmp_path / "coded"
    assert cli.main(["encode", str(src), "-o", str(out)]) == 0
    files = sorted(out.glob("block_*"))
    n = len(files)
    before = {f.name: f.read_bytes() for f in files}
    for f in files[: n // 2]:           # lose half (max tolerable)
        f.unlink()
    assert cli.main(["repair", str(out)]) == 0
    after = {f.name: f.read_bytes() for f in sorted(out.glob("block_*"))}
    assert after == before              # bit-exact regeneration
    # second wave: lose a different half, recover the file
    files = sorted(out.glob("block_*"))
    for f in files[n // 2:]:
        f.unlink()
    dst = tmp_path / "restored.bin"
    assert cli.main(["recover", str(out), "-o", str(dst)]) == 0
    assert dst.read_bytes() == src.read_bytes()


def test_decode_stream_bit_identical():
    from fastecc_tpu import decode as dec
    from fastecc_tpu import rs
    from fastecc_tpu.fields import GF32
    import jax.numpy as jnp
    rng = np.random.default_rng(13)
    k, lanes = 64, 48
    data = rng.integers(0, GF32.p, (k, lanes), dtype=np.uint64).astype(
        np.uint32)
    cw = np.asarray(rs.encode(jnp.asarray(data), GF32, 2 * k))
    erased = np.sort(rng.choice(2 * k, size=k, replace=False))
    garbled = cw.copy()
    garbled[erased] = 0
    want = np.asarray(dec.decode_host_prepared(jnp.asarray(garbled),
                                               erased, GF32))
    got = dec.decode_stream(garbled, erased, GF32, chunk_lanes=16)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, cw)


def test_check_audit_states(tmp_path):
    """check: healthy -> silent corruption caught -> degraded -> repaired."""
    from fastecc_tpu import cli
    src = tmp_path / "input.bin"
    src.write_bytes(np.random.default_rng(5).integers(
        0, 256, 4000, dtype=np.uint16).astype(np.uint8).tobytes())
    out = tmp_path / "coded"
    assert cli.main(["encode", str(src), "-o", str(out)]) == 0
    assert cli.main(["check", str(out)]) == 0            # healthy
    victim = sorted(out.glob("block_*.par"))[0]
    blob = bytearray(victim.read_bytes())
    blob[100] ^= 0xFF
    victim.write_bytes(bytes(blob))                      # silent corruption
    assert cli.main(["check", str(out)]) == 1            # degraded (CRC)
    assert cli.main(["repair", str(out)]) == 0
    assert cli.main(["check", str(out)]) == 0            # healthy again


def test_check_handles_malformed_files(tmp_path):
    """Truncated and stray block files must be REPORTED, not crash check."""
    from fastecc_tpu import cli
    src = tmp_path / "input.bin"
    src.write_bytes(bytes(range(256)) * 40)
    out = tmp_path / "coded"
    assert cli.main(["encode", str(src), "-o", str(out)]) == 0
    # truncate one data block, drop a stray out-of-range file
    victim = sorted(out.glob("block_*.dat"))[0]
    victim.write_bytes(victim.read_bytes()[:100])
    (out / "block_999999.dat").write_bytes(b"junk")
    rc = cli.main(["check", str(out)])
    assert rc == 1          # degraded but recoverable, no crash
    assert cli.main(["repair", str(out)]) == 0
    assert cli.main(["check", str(out)]) == 0


def test_encode_rejects_bad_block_bytes(tmp_path):
    from fastecc_tpu import cli
    src = tmp_path / "f.bin"
    src.write_bytes(b"x" * 100)
    out = tmp_path / "o"
    import pytest as _pytest
    with _pytest.raises(AssertionError, match="block_bytes"):
        cli.main(["encode", str(src), "-o", str(out), "--block-bytes", "4094"])


def test_file_encode_recover_gf16(tmp_path):
    """The 16-bit field variant through the full file wire path."""
    from fastecc_tpu import cli
    src = tmp_path / "input.bin"
    rng = np.random.default_rng(21)
    src.write_bytes(rng.integers(0, 256, 9001, dtype=np.uint16)
                    .astype(np.uint8).tobytes())
    out = tmp_path / "coded"
    assert cli.main(["--field", "gf16", "encode", str(src),
                     "-o", str(out)]) == 0
    files = sorted(out.glob("block_*"))
    for f in files[: len(files) // 2]:    # max tolerable loss
        f.unlink()
    dst = tmp_path / "restored.bin"
    assert cli.main(["recover", str(out), "-o", str(dst)]) == 0
    assert dst.read_bytes() == src.read_bytes()


def test_check_locates_and_repair_fixes_forged_crc_corruption(
        tmp_path, capsys):
    """Corruption that defeats CRC (tag forged to match) with all n
    blocks present: check must LOCATE it algebraically (status
    corrupt-located, rc 1, not a blind 'inconsistent'), and repair must
    fix the block and re-tag the forged manifest CRC — full silent-
    corruption recovery with zero trustworthy integrity metadata."""
    import json as js

    from fastecc_tpu import cli, host
    src = tmp_path / "input.bin"
    src.write_bytes(bytes(range(256)) * 32)
    out = tmp_path / "coded"
    assert cli.main(["encode", str(src), "-o", str(out)]) == 0
    victim = sorted(out.glob("block_*.par"))[0]
    good = victim.read_bytes()
    blob = bytearray(good)
    blob[12] ^= 0x55
    victim.write_bytes(bytes(blob))
    # forge the manifest tag so CRC passes and only the algebraic
    # consistency check can notice
    man = js.loads((out / "manifest.json").read_text())
    pos = int(victim.stem.split("_")[1])
    man["crc32c"][str(pos)] = int(host.crc32c(bytes(blob)))
    (out / "manifest.json").write_text(js.dumps(man))
    assert cli.main(["check", str(out)]) == 1
    rep = js.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["status"] == "corrupt-located"
    assert rep["located_corrupt"] == [pos]
    assert cli.main(["repair", str(out)]) == 0
    assert victim.read_bytes() == good
    assert cli.main(["check", str(out)]) == 0   # incl. re-tagged CRC


def test_check_reports_crc_verified_without_native(tmp_path, monkeypatch):
    """With the native library unavailable, CRC checking must still run
    (numpy fallback) and catch corruption."""
    from fastecc_tpu import cli, host
    src = tmp_path / "input.bin"
    src.write_bytes(bytes(range(256)) * 16)
    out = tmp_path / "coded"
    assert cli.main(["encode", str(src), "-o", str(out)]) == 0
    monkeypatch.setattr(host, "_lib", None)
    monkeypatch.setattr(host, "_load", lambda: False)
    monkeypatch.setattr(host, "build", lambda quiet=True: False)
    victim = sorted(out.glob("block_*.par"))[0]
    blob = bytearray(victim.read_bytes())
    blob[7] ^= 0xFF
    victim.write_bytes(bytes(blob))
    assert cli.main(["check", str(out)]) == 1   # caught by numpy CRC


def test_repair_mixed_missing_and_silent_corruption(tmp_path):
    """Missing files AND a silently corrupted survivor (forged CRC) in
    the same directory: repair must recover both (errors-and-erasures)."""
    import json as js

    from fastecc_tpu import cli, host
    src = tmp_path / "input.bin"
    src.write_bytes(bytes(range(256)) * 48)
    out = tmp_path / "coded"
    assert cli.main(["encode", str(src), "-o", str(out)]) == 0
    # delete two files
    gone = sorted(out.glob("block_*.dat"))[:2]
    originals = {g.name: g.read_bytes() for g in gone}
    for g in gone:
        g.unlink()
    # silently corrupt a third, forging its CRC tag
    victim = sorted(out.glob("block_*.par"))[1]
    vgood = victim.read_bytes()
    blob = bytearray(vgood)
    blob[33] ^= 0x1F
    victim.write_bytes(bytes(blob))
    man = js.loads((out / "manifest.json").read_text())
    vpos = int(victim.stem.split("_")[1])
    man["crc32c"][str(vpos)] = int(host.crc32c(bytes(blob)))
    (out / "manifest.json").write_text(js.dumps(man))

    assert cli.main(["repair", str(out)]) == 0
    for name, data in originals.items():
        assert (out / name).read_bytes() == data
    assert victim.read_bytes() == vgood
    assert cli.main(["check", str(out)]) == 0


def test_recover_check_corrects_lying_survivor(tmp_path):
    """recover --check must auto-correct a silently corrupted survivor
    instead of writing a corrupt file."""
    import json as js

    from fastecc_tpu import cli, host
    src = tmp_path / "input.bin"
    src.write_bytes(bytes(range(256)) * 40)
    out = tmp_path / "coded"
    assert cli.main(["encode", str(src), "-o", str(out)]) == 0
    # corrupt a DATA survivor silently (forged tag) and drop one parity
    victim = sorted(out.glob("block_*.dat"))[1]
    blob = bytearray(victim.read_bytes())
    blob[100] ^= 0x77
    victim.write_bytes(bytes(blob))
    man = js.loads((out / "manifest.json").read_text())
    vpos = int(victim.stem.split("_")[1])
    man["crc32c"][str(vpos)] = int(host.crc32c(bytes(blob)))
    (out / "manifest.json").write_text(js.dumps(man))
    sorted(out.glob("block_*.par"))[0].unlink()

    dst = tmp_path / "back.bin"
    assert cli.main(["recover", str(out), "-o", str(dst), "--check"]) == 0
    assert dst.read_bytes() == src.read_bytes()


def test_roofline_pins_design_table(capsys, tmp_path):
    """`cli roofline` must reproduce the DESIGN.md §4 speed-of-light
    table exactly (staged-pass pricing, --seam off): encode 0.107 s,
    NTT 0.054 s, decode 0.116 s compute-bound; GF16 encode 0.0149 s
    MEMORY-bound. Pins both the op-count model and the doc."""
    import json

    def row(argv):
        assert main(argv) == 0
        return json.loads(capsys.readouterr().out.strip())

    r = row(["roofline", "--pipeline", "encode", "--lg-n", "20",
             "--lanes", "1024", "--seam", "off"])
    assert r["bound"] == "compute"
    assert round(r["speed_of_light_s"], 3) == 0.107

    r = row(["roofline", "--pipeline", "ntt", "--lg-n", "20",
             "--lanes", "512"])
    assert r["seam"] is None
    assert round(r["speed_of_light_s"], 3) == 0.054

    r = row(["roofline", "--pipeline", "decode", "--lg-n", "20",
             "--lanes", "512", "--seam", "off"])
    assert r["bound"] == "compute"
    assert round(r["speed_of_light_s"], 3) == 0.116

    r = row(["--field", "gf16", "roofline", "--pipeline", "encode",
             "--lg-n", "14", "--lanes", "32768", "--seam", "off"])
    assert r["bound"] == "memory"
    assert round(r["speed_of_light_s"], 4) == 0.0149
    assert round(r["speed_of_light_wire_gbps"], 1) == round(
        r["speed_of_light_gbps"] / 2, 1)

    # the seam pricing drops the GF16 memory bound by exactly 1/4 and a
    # --peaks-json override is honored (double the HBM rate -> half the
    # memory-bound time)
    r_seam = row(["--field", "gf16", "roofline", "--pipeline", "encode",
                  "--lg-n", "14", "--lanes", "32768"])
    assert round(r_seam["t_memory_bound_s"] / r["t_memory_bound_s"], 3) \
        == 0.75
    from fastecc_tpu.utils.profiling import MEASURED_PEAKS_V5E
    fake = dict(MEASURED_PEAKS_V5E,
                hbm_stream_gbps=2 * MEASURED_PEAKS_V5E["hbm_stream_gbps"])
    pf = tmp_path / "peaks.json"
    pf.write_text(json.dumps({"op": "gf_peaks", **fake}))
    r2 = row(["--field", "gf16", "roofline", "--pipeline", "encode",
              "--lg-n", "14", "--lanes", "32768", "--seam", "off",
              "--peaks-json", str(pf)])
    assert round(r2["t_memory_bound_s"] / r["t_memory_bound_s"], 3) == 0.5


def test_update_splices_and_stays_recoverable(tmp_path):
    """cli update: incremental partial write, then recover returns the
    edited payload."""
    rng = np.random.default_rng(0xED17)
    payload = bytearray(rng.integers(0, 256, 3 * 4096 + 99,
                                     dtype=np.uint16)
                        .astype(np.uint8).tobytes())
    src = tmp_path / "doc.bin"
    src.write_bytes(bytes(payload))
    coded = tmp_path / "coded"
    assert main(["encode", str(src), "-o", str(coded)]) == 0

    edit = b"the new contents of the middle of the document"
    off = 4096 + 17
    payload[off: off + len(edit)] = edit
    patch = tmp_path / "patch.bin"
    patch.write_bytes(edit)
    assert main(["update", str(coded), str(patch),
                 "--offset", str(off)]) == 0

    for f in sorted(coded.glob("block_*.dat")):
        f.unlink()                 # lose ALL data blocks
    back = tmp_path / "back.bin"
    assert main(["recover", str(coded), "-o", str(back)]) == 0
    assert back.read_bytes() == bytes(payload)


def test_read_serves_range_from_degraded_dir(tmp_path, capsys):
    """cli read: ranged read to a file, served through a degraded
    directory."""
    rng = np.random.default_rng(0x4EAD)
    payload = rng.integers(0, 256, 4 * 4096 + 55, dtype=np.uint16) \
        .astype(np.uint8).tobytes()
    src = tmp_path / "d.bin"
    src.write_bytes(payload)
    coded = tmp_path / "coded"
    assert main(["encode", str(src), "-o", str(coded)]) == 0
    for f in sorted(coded.glob("block_*.dat")):
        f.unlink()                        # all data gone; parity serves
    out = tmp_path / "range.bin"
    assert main(["read", str(coded), "--offset", "4000",
                 "--length", "500", "-o", str(out)]) == 0
    assert out.read_bytes() == payload[4000:4500]


def test_design_s6_pins_code_constants():
    """DESIGN.md §6 drifted to round-2 numbers in round 3 while §4 stayed
    pinned (round-3 verdict weak #3). Pin §6 the other way: it may not
    quote decode marginal GB/s at all (it defers to §4's pinned table),
    and its BM capacity claims must equal decode._BM_MAX — as must the
    capacity stated in the cli check/repair docstrings."""
    import pathlib
    import re

    from fastecc_tpu import cli as cli_mod
    from fastecc_tpu import decode as dec

    text = pathlib.Path(__file__).resolve().parents[1].joinpath(
        "docs", "DESIGN.md").read_text()
    s6 = text.split("## 6. Decode")[1].split("\n## 7.")[0]
    cap = dec._BM_MAX // 2
    assert f"{cap:,}" in s6, "§6 must state the designed location capacity"
    assert f"2^{dec._BM_MAX.bit_length() - 1}" in s6
    assert dec._BM_MAX == 1 << (dec._BM_MAX.bit_length() - 1)
    assert "4096" not in s6, "stale round-2 cap claim"
    assert not re.search(r"\d+(\.\d+)?\s*GB/s marginal", s6), (
        "decode throughput figures live only in §4's pinned table")
    assert "§4's table" in s6
    for fn in (cli_mod.cmd_check, cli_mod.cmd_repair):
        assert str(cap) in fn.__doc__, (
            f"{fn.__name__} docstring must state the location capacity")
    assert dec._BM_LADDER[-1] == dec._BM_MAX


def test_roofline_wire_pipelines(capsys):
    """The wire-domain rooflines (encode_blocks / decode_wire_parts
    pricing) are reachable from the CLI like the field-domain ones."""
    import json

    assert main(["--field", "gf16", "roofline", "--pipeline",
                 "encode-wire", "--lg-n", "14",
                 "--block-bytes", "65536"]) == 0
    r = json.loads(capsys.readouterr().out.strip())
    assert r["fused"] is True and r["bound"] == "compute"
    assert "speed_of_light_wire_gbps" not in r  # already wire bytes
    assert main(["roofline", "--pipeline", "decode-wire",
                 "--lg-n", "18"]) == 0
    r = json.loads(capsys.readouterr().out.strip())
    assert round(r["speed_of_light_gbps"], 1) == 20.9
