"""Byte-level wire-format goldens: the on-disk contract, frozen.

The wire format (SURVEY.md C13 — "MUST be deterministic & documented")
is the compatibility contract between encoders and every future
decoder: the GF32 escape-bitmap layout, the GF16 0x10000 parity escape,
parity serialization, the block-file naming, and the manifest. The
round-2 golden pins covered field-domain codewords only; roundtrip
tests cannot catch a silent convention change that stays
self-consistent (pack' + unpack' both "working" while emitting
different bytes). These SHA-256 pins fail on ANY byte change.

If one of these digests ever changes intentionally, that is a wire
FORMAT change: bump `manifest["format"]` past "fastecc-tpu-v1" and
re-pin — never re-pin under the same format tag.

Reference note: the reference mount is empty (SURVEY.md §0), so these
bytes pin OUR deterministic scheme (the packing.py module docstring is
the prose spec). tools/refcheck.py re-opens this contract against the
real binary the day the mount is populated.
"""

import hashlib
import json
import pathlib

import numpy as np
import pytest

import jax.numpy as jnp

from fastecc_tpu import cli, packing, rs
from fastecc_tpu.fields import GF16, GF32


def _sha(arr_or_bytes) -> str:
    b = (arr_or_bytes if isinstance(arr_or_bytes, (bytes, bytearray))
         else np.ascontiguousarray(arr_or_bytes).tobytes())
    return hashlib.sha256(b).hexdigest()


def _data_blocks_gf32() -> np.ndarray:
    """[4, 4096] uint8 with crafted escape-relevant words up front
    (0, 1, p-1, p, p+1, 0xFFFFFFFF, ...) then fixed-seed randomness."""
    rng = np.random.default_rng(0xC13)
    w = rng.integers(0, 1 << 32, size=(4, 1024),
                     dtype=np.uint64).astype(np.uint32)
    w[0, :8] = [0, 1, GF32.p - 1, GF32.p, GF32.p + 1,
                0xFFFFFFFF, 0xFFF00000, 0xFFFFFFFE]
    raw = np.frombuffer(w.astype("<u4").tobytes(),
                        np.uint8).reshape(4, 4096).copy()
    # input self-check: a drifting generator must not masquerade as a
    # format change
    assert _sha(raw) == ("97a84b82e7a7e222bceb2db7c583f934"
                         "df85cfc613fa36f06c360298177a9dc5")
    return raw


def _data_blocks_gf16() -> np.ndarray:
    rng = np.random.default_rng(0xC13)
    rng.integers(0, 1 << 32, size=(4, 1024), dtype=np.uint64)  # skip
    raw = rng.integers(0, 256, size=(4, 4096),
                       dtype=np.uint16).astype(np.uint8)
    assert _sha(raw) == ("a31ddcd1d0ef05689af763482cd9a660"
                         "5b9771a39cc96798567c1ad9246efe65")
    return raw


def test_pack_data_golden_gf32():
    """GF32 data packing: stored lanes + 16-bit escape bitmap lanes."""
    packed = np.asarray(packing.pack_data(
        jnp.asarray(_data_blocks_gf32()), GF32))
    assert packed.shape == (4, 1088)        # 1024 words + 64 bitmap lanes
    assert _sha(packed) == ("991b8acb76af423f6fe33d94942ffe7e"
                            "431e417c3361ba06b6f42fc09c18a08d")


def test_pack_data_golden_gf16():
    """GF16 data packing: plain little-endian u16 words, no escaping."""
    packed = np.asarray(packing.pack_data(
        jnp.asarray(_data_blocks_gf16()), GF16))
    assert packed.shape == (4, 2048)
    assert _sha(packed) == ("7bd98a7b738591fa2a830cd9425a2158"
                            "1f01e74b909c15940611ff0d893b95b7")


def test_serialize_parity_golden_gf32():
    """GF32 parity wire bytes: 4-byte little-endian words, no escaping."""
    rng = np.random.default_rng(0xC13)
    rng.integers(0, 1 << 32, size=(4, 1024), dtype=np.uint64)      # skip
    rng.integers(0, 256, size=(4, 4096), dtype=np.uint16)          # skip
    pf = rng.integers(0, GF32.p, size=(3, 1088),
                      dtype=np.uint64).astype(np.uint32)
    ser = np.asarray(packing.serialize_parity(jnp.asarray(pf), GF32))
    assert ser.shape == (3, 4352)
    assert _sha(ser) == ("fe62c51587def8c07207d9a893a094af"
                         "cce9dab3313086c5c6ba918330fdcc34")


def test_serialize_parity_golden_gf16():
    """GF16 parity wire bytes INCLUDING the 0x10000 escape bitmap (the
    awkward value that does not fit a u16 — first/last word, a bitmap
    group boundary, and a middle row are all exercised)."""
    rng = np.random.default_rng(0xC13)
    rng.integers(0, 1 << 32, size=(4, 1024), dtype=np.uint64)      # skip
    rng.integers(0, 256, size=(4, 4096), dtype=np.uint16)          # skip
    rng.integers(0, GF32.p, size=(3, 1088), dtype=np.uint64)       # skip
    pf = rng.integers(0, GF16.p - 1, size=(3, 2048),
                      dtype=np.uint64).astype(np.uint32)
    pf[0, [0, 15, 16, 2047]] = 0x10000
    pf[2, 100] = 0x10000
    ser = np.asarray(packing.serialize_parity(jnp.asarray(pf), GF16))
    assert ser.shape == (3, 4352)
    assert _sha(ser) == ("ac60b01d7b6b5612272368c4e3eb3b8b"
                         "b5cf3f5106420c22784722e8253795ca")
    # and the roundtrip still inverts the pinned bytes
    back = np.asarray(packing.deserialize_parity(jnp.asarray(ser), GF16))
    np.testing.assert_array_equal(back, pf)


def test_encode_blocks_parity_blob_golden_gf32():
    """Full bytes-in -> parity-wire-bytes-out pipeline, GF32."""
    blob = np.asarray(rs.encode_blocks(
        jnp.asarray(_data_blocks_gf32()), GF32, 8))
    assert blob.shape == (4, 4352)
    assert _sha(blob) == ("c480d93efb75815a9cbb06c65f014789"
                          "f4ea901e9929f50c11fc62cd542c7a9f")


def test_encode_blocks_parity_blob_golden_gf16():
    blob = np.asarray(rs.encode_blocks(
        jnp.asarray(_data_blocks_gf16()), GF16, 8))
    assert blob.shape == (4, 4352)
    assert _sha(blob) == ("bcc7aac37e2f7a4be2e6007fe7e881f0"
                          "e0b4a42e8c2751f80862281d211d7b0e")


# canonical coded-directory fixture: manifest JSON text, block-file
# names, and the concatenation of every block file, all pinned
_DIR_PAYLOAD_SHA = ("80a52854f4cf89dc9f8aae70b7d2396b"
                    "4dd3d572c4b187bc81917656a4716cb0")
_DIR_MANIFEST = {
    "file": "golden.bin", "size": 12788, "k": 4, "n": 8,
    "field": "GF32", "format": "fastecc-tpu-v1", "block_bytes": 4096,
    "crc32c": {"0": 3658874080, "1": 2134085531, "2": 2669756950,
               "3": 2167416627, "4": 701234496, "5": 4041849624,
               "6": 2004969996, "7": 327707185}}
_DIR_MANIFEST_SHA = ("c90c6d24cc0986c74cab01002acff4bf"
                     "beeb2cbb725fc346252b2028d84b8448")
_DIR_BLOB_SHA = ("8aeafe89badc88b9e2226286edbee06d"
                 "7b422c60596e3f7cfde3ee17476f0c29")


def test_encode_directory_golden(tmp_path):
    """cli encode of a pinned payload produces a bit-identical coded
    directory: file names, every block file's bytes, and the manifest
    (CRC32C tags included — the CRC implementation is part of the
    contract too)."""
    rng = np.random.default_rng(0xF11E)
    payload = bytearray(rng.integers(0, 256, 3 * 4096 + 500,
                                     dtype=np.uint16)
                        .astype(np.uint8).tobytes())
    payload[0:8] = b"\xff\xff\xff\xff\x01\x00\xf0\xff"   # escape words
    payload = bytes(payload)
    assert _sha(payload) == _DIR_PAYLOAD_SHA
    src = tmp_path / "golden.bin"
    src.write_bytes(payload)
    out = tmp_path / "coded"
    assert cli.main(["encode", str(src), "-o", str(out)]) == 0

    man_text = (out / "manifest.json").read_text()
    assert json.loads(man_text) == _DIR_MANIFEST
    assert _sha(man_text.encode()) == _DIR_MANIFEST_SHA

    names = sorted(p.name for p in out.iterdir()
                   if p.name != "manifest.json")
    assert names == [f"block_{i:06d}.{'dat' if i % 2 == 0 else 'par'}"
                     for i in range(8)]
    cat = b"".join((out / f).read_bytes() for f in names)
    assert _sha(cat) == _DIR_BLOB_SHA

    # and the pinned directory still recovers the pinned payload after
    # max loss (any k of n)
    for i in (1, 2, 4, 7):
        (out / names[i]).unlink()
    back = tmp_path / "back.bin"
    assert cli.main(["recover", str(out), "-o", str(back)]) == 0
    assert back.read_bytes() == payload


# striped (v2) layout fixture: the top-level manifest text, the stripe
# directory naming, and the concatenation of every file in every stripe
_STRIPED_PAYLOAD_SHA = ("d6b1c2c130d6471b62b892c9824d89af"
                        "c4a3d712083c06f25336f0040c626d74")
_STRIPED_MANIFEST_SHA = ("c02e87d44b6bc0dd62938eb8ae62120a"
                         "bf8deb08a8059b5b4139b2e68dd975e7")
_STRIPED_BLOB_SHA = ("da390ae87cd2191296472e49d6005901"
                     "43af80d35a4de0ecdfe6904a8067844a")


def test_striped_layout_golden(tmp_path):
    """The v2 striped layout is the large-file on-disk contract: pinned
    top-level manifest bytes, stripe directory naming, per-stripe v1
    self-containment, and every block file's bytes (via one blob SHA).
    A 10-block payload at stripe_blocks=4 exercises a partial tail
    stripe (k=2)."""
    from fastecc_tpu import storage

    rng = np.random.default_rng(0x57B1)
    payload = bytearray(rng.integers(0, 256, 9 * 4096 + 333,
                                     dtype=np.uint16)
                        .astype(np.uint8).tobytes())
    payload[0:8] = b"\xff\xff\xff\xff\x01\x00\xf0\xff"   # escape words
    payload = bytes(payload)
    assert _sha(payload) == _STRIPED_PAYLOAD_SHA
    src = tmp_path / "golden.bin"
    src.write_bytes(payload)
    out = tmp_path / "coded"
    man = storage.encode_file(src, out, GF32, stripe_blocks=4)

    man_text = (out / "manifest.json").read_text()
    assert json.loads(man_text) == man      # returned == written
    assert man["format"] == "fastecc-tpu-v2-striped"
    assert [st["dir"] for st in man["stripes"]] == [
        "stripe_0000", "stripe_0001", "stripe_0002"]
    assert [st["k"] for st in man["stripes"]] == [4, 4, 2]
    assert _sha(man_text.encode()) == _STRIPED_MANIFEST_SHA

    names = []
    for d in sorted(out.iterdir()):
        if d.is_dir():
            sub = json.loads((d / "manifest.json").read_text())
            assert sub["format"] == "fastecc-tpu-v1"    # self-contained
            names.extend(f"{d.name}/{p.name}" for p in sorted(d.iterdir()))
    assert len(names) == 23                 # 8 + 8 + 4 blocks + 3 manifests
    cat = b"".join((out / f).read_bytes() for f in names)
    assert _sha(cat) == _STRIPED_BLOB_SHA
