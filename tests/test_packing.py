"""Word-escape packing roundtrips (SURVEY.md C13) on adversarial bytes."""

import numpy as np
import pytest

import jax.numpy as jnp

from fastecc_tpu import packing
from fastecc_tpu.fields import GF16, GF32

RNG = np.random.default_rng(0xC13)


def adversarial_blocks(k=8):
    """Blocks stuffed with the values that stress the escape path."""
    raw = RNG.integers(0, 256, size=(k, 4096), dtype=np.uint16).astype(np.uint8)
    raw[0, :] = 0xFF                      # all words 0xFFFFFFFF (>= p)
    raw[1, :] = 0x00
    words = np.full(1024, GF32.p, dtype=np.uint64)   # exactly p
    raw[2] = words.astype(np.uint32).view(np.uint8)
    words = np.full(1024, GF32.p - 1, dtype=np.uint64)  # just below p
    raw[3] = words.astype(np.uint32).view(np.uint8)
    return raw


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
def test_pack_unpack_roundtrip(field):
    raw = adversarial_blocks()
    f = packing.pack_data(jnp.asarray(raw), field)
    assert f.shape == (raw.shape[0], packing.field_lanes(field))
    # every packed lane is a valid field element
    assert int(jnp.max(f)) < field.p
    back = np.asarray(packing.unpack_data(f, field))
    np.testing.assert_array_equal(back, raw)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
def test_parity_serialize_roundtrip(field):
    m, lanes = 6, packing.field_lanes(field)
    vals = RNG.integers(0, field.p, size=(m, lanes), dtype=np.uint64).astype(
        np.uint32)
    if not field.use_mont:
        vals[0, :5] = 0x10000             # the awkward GF16 element
        vals[1, :] = 0x10000
    wire = packing.serialize_parity(jnp.asarray(vals), field)
    assert wire.shape == (m, packing.parity_bytes(field))
    back = np.asarray(packing.deserialize_parity(wire, field))
    np.testing.assert_array_equal(back, vals)


def test_gf32_escape_semantics():
    """Pinned wire semantics: stored = w - p for w >= p, bit set in bitmap."""
    raw = np.zeros((1, 4096), np.uint8)
    w = np.zeros(1024, np.uint32)
    w[0] = 0xFFFFFFFF
    w[17] = GF32.p
    w[999] = GF32.p - 1  # NOT escaped
    raw[0] = w.view(np.uint8)
    f = np.asarray(packing.pack_data(jnp.asarray(raw), GF32))[0]
    assert f[0] == 0xFFFFFFFF - GF32.p
    assert f[17] == 0
    assert f[999] == GF32.p - 1
    bitmap = f[1024:]
    assert bitmap[0] == (1 << 0)          # word 0 escaped
    assert bitmap[17 // 16] == (1 << (17 % 16))
    assert bitmap[999 // 16] == 0


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
@pytest.mark.parametrize("block_bytes", [4, 64, 520, 1024, 16384])
def test_arbitrary_block_size_roundtrip(field, block_bytes):
    """The reference `rs` binary takes SIZE as an argument: any block size
    (word-aligned) must pack/unpack and serialize losslessly."""
    if block_bytes % (4 if field.use_mont else 2):
        pytest.skip("not word-aligned for this field")
    k = 8
    raw = RNG.integers(0, 256, (k, block_bytes), dtype=np.uint16).astype(
        np.uint8)
    raw[0, :] = 0xFF  # escape-path stress for GF32
    lanes = packing.field_lanes(field, block_bytes)
    packed = packing.pack_data(jnp.asarray(raw), field)
    assert packed.shape == (k, lanes)
    back = np.asarray(packing.unpack_data(packed, field))
    np.testing.assert_array_equal(back, raw)
    # parity wire roundtrip at the same lane count
    vals = RNG.integers(0, field.p, (k, lanes), dtype=np.uint64).astype(
        np.uint32)
    if not field.use_mont:
        vals[0, :] = 0x10000  # GF16 escape value stress
    wire = packing.serialize_parity(jnp.asarray(vals), field)
    assert wire.shape == (k, packing.parity_bytes(field, block_bytes))
    again = np.asarray(packing.deserialize_parity(wire, field))
    np.testing.assert_array_equal(again, vals)
