"""Raw-bytes <-> field-element packing ("word escaping", SURVEY.md C13).

The codec operates on field elements < p, but a 4KB data block is arbitrary
bytes: for GF32 (p = 0xFFF00001) a uint32 word >= p occurs in real data far
more often than the random-data estimate (about 6% of words in compiled
binaries, because 0xFFFFFFFF padding is common). The reference README
discusses an escape mapping; its exact mechanism is unavailable (reference
mount empty, SURVEY.md §0), so this module pins OUR deterministic scheme,
which is part of the codec's bit-exactness contract:

GF32 data blocks (4096 bytes -> 1088 field lanes):
  * 1024 little-endian uint32 words w_i.
  * escape bit e_i = (w_i >= p); stored lane s_i = w_i - e_i * p
    (note w - p < 2^20 - 1 < p, so s_i is always a valid field element).
  * the 1024 escape bits are appended as 64 extra lanes, 16 bits per lane
    (lane 1024 + m holds bits for words m*16 .. m*16+15, bit j <-> word
    m*16 + j). 16-bit values are always < p.
  All 1088 lanes are independent codewords, so erased data blocks recover
  exactly, bitmap included. Parity blocks are field vectors of the same
  1088 lanes; every value < p < 2^32 fits in 4 wire bytes (no escaping),
  giving a 4352-byte parity block (6.25% overhead for the escape channel).

GF16 data blocks (4096 bytes -> 2048 field lanes):
  * 2048 little-endian uint16 words, all < p = 0x10001: no escaping needed.
  * parity field elements can take the value 0x10000, which does not fit in
    a uint16: parity serialization stores 0 in the word and sets a bit in a
    2048-bit bitmap appended as 128 uint16 words -> 4352-byte parity block.
"""

from __future__ import annotations

import jax.numpy as jnp

from .fields import FieldSpec, GF16, GF32

BLOCK_BYTES = 4096

_U32 = jnp.uint32


def field_lanes(field: FieldSpec) -> int:
    """Number of field-element lanes a 4KB data block maps to."""
    return 1088 if field.use_mont else 2048


def parity_bytes(field: FieldSpec) -> int:
    """Wire size of one serialized parity block."""
    return 4352  # both fields, by coincidence of the two layouts


def _bytes_to_u32(raw, word_bytes: int):
    """[..., nbytes] uint8 -> [..., nbytes/word_bytes] uint32, little-endian."""
    shape = raw.shape[:-1] + (raw.shape[-1] // word_bytes, word_bytes)
    b = raw.reshape(shape).astype(jnp.uint32)
    w = b[..., 0]
    for i in range(1, word_bytes):
        w = w | (b[..., i] << _U32(8 * i))
    return w


def _u32_to_bytes(words, word_bytes: int):
    """Inverse of :func:`_bytes_to_u32`."""
    parts = [((words >> _U32(8 * i)) & _U32(0xFF)).astype(jnp.uint8)
             for i in range(word_bytes)]
    out = jnp.stack(parts, axis=-1)
    return out.reshape(out.shape[:-2] + (out.shape[-2] * word_bytes,))


def _pack_bits(bits, group: int):
    """[..., L] 0/1 uint32 -> [..., L/group] words (bit j of word m is
    element m*group + j)."""
    shape = bits.shape[:-1] + (bits.shape[-1] // group, group)
    b = bits.reshape(shape)
    shifts = jnp.arange(group, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)


def _unpack_bits(words, group: int):
    """Inverse of :func:`_pack_bits`."""
    shifts = jnp.arange(group, dtype=jnp.uint32)
    bits = (words[..., None] >> shifts) & _U32(1)
    return bits.reshape(words.shape[:-1] + (words.shape[-1] * group,))


# ---------------------------------------------------------------------------
# Data blocks: raw bytes -> field lanes (and back).
# ---------------------------------------------------------------------------

def pack_data(raw, field: FieldSpec):
    """[k, 4096] uint8 -> [k, field_lanes] uint32 field elements."""
    assert raw.shape[-1] == BLOCK_BYTES and raw.dtype == jnp.uint8
    if field is GF16 or not field.use_mont:
        return _bytes_to_u32(raw, 2)
    words = _bytes_to_u32(raw, 4)                      # [k, 1024]
    esc = (words >= _U32(field.p)).astype(jnp.uint32)
    stored = words - esc * _U32(field.p)
    bitmap = _pack_bits(esc, 16)                       # [k, 64], each < 2^16
    return jnp.concatenate([stored, bitmap], axis=-1)  # [k, 1088]


def unpack_data(fields, field: FieldSpec):
    """[k, field_lanes] uint32 field elements -> [k, 4096] uint8."""
    if not field.use_mont:
        return _u32_to_bytes(fields, 2)
    stored, bitmap = fields[..., :1024], fields[..., 1024:]
    esc = _unpack_bits(bitmap, 16)
    words = stored + esc * _U32(field.p)
    return _u32_to_bytes(words, 4)


# ---------------------------------------------------------------------------
# Parity blocks: field lanes -> wire bytes (and back).
# ---------------------------------------------------------------------------

def serialize_parity(fields, field: FieldSpec):
    """[m, field_lanes] uint32 field elements -> [m, 4352] uint8."""
    if field.use_mont:
        return _u32_to_bytes(fields, 4)               # 1088 * 4 = 4352
    esc = (fields == _U32(0x10000)).astype(jnp.uint32)
    stored = fields * (_U32(1) - esc)                 # 0 where escaped
    bitmap = _pack_bits(esc, 16)                      # [m, 128]
    out = jnp.concatenate([stored, bitmap], axis=-1)  # [m, 2176] u16 values
    return _u32_to_bytes(out, 2)                      # 2176 * 2 = 4352


def deserialize_parity(raw, field: FieldSpec):
    """[m, 4352] uint8 -> [m, field_lanes] uint32 field elements."""
    assert raw.shape[-1] == parity_bytes(field)
    if field.use_mont:
        return _bytes_to_u32(raw, 4)
    words = _bytes_to_u32(raw, 2)                     # [m, 2176]
    stored, bitmap = words[..., :2048], words[..., 2048:]
    esc = _unpack_bits(bitmap, 16)
    return stored + esc * _U32(0x10000)
