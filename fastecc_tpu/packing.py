"""Raw-bytes <-> field-element packing ("word escaping", SURVEY.md C13).

The codec operates on field elements < p, but a data block is arbitrary
bytes: for GF32 (p = 0xFFF00001) a uint32 word >= p occurs in real data far
more often than the random-data estimate (about 6% of words in compiled
binaries, because 0xFFFFFFFF padding is common). The reference README
discusses an escape mapping; its exact mechanism is unavailable (reference
mount empty, SURVEY.md §0), so this module pins OUR deterministic scheme,
which is part of the codec's bit-exactness contract.

Block size is a parameter (the reference `rs` binary takes SIZE on the
command line); the default wire format uses 4096-byte blocks. For a block
of B bytes:

GF32 data blocks (B bytes -> B/4 + ceil(B/4/16) field lanes):
  * W = B/4 little-endian uint32 words w_i (B must be a multiple of 4).
  * escape bit e_i = (w_i >= p); stored lane s_i = w_i - e_i * p
    (note w - p < 2^20 - 1 < p, so s_i is always a valid field element).
  * the W escape bits are appended as ceil(W/16) extra lanes, 16 bits per
    lane (lane W + m holds bits for words m*16 .. m*16+15, bit j <-> word
    m*16 + j; trailing bits of the last lane are zero). 16-bit values are
    always < p.
  All lanes are independent codewords, so erased data blocks recover
  exactly, bitmap included. Parity blocks are field vectors of the same
  lane count; every value < p < 2^32 fits in 4 wire bytes (no escaping),
  giving a 4*(W + ceil(W/16))-byte parity block (~6.25% overhead for the
  escape channel). B = 4096: 1088 lanes, 4352-byte parity.

GF16 data blocks (B bytes -> B/2 field lanes):
  * W = B/2 little-endian uint16 words, all < p = 0x10001: no escaping.
  * parity field elements can take the value 0x10000, which does not fit
    in a uint16: parity serialization stores 0 in the word and sets a bit
    in a W-bit bitmap appended as ceil(W/16) uint16 words ->
    2*(W + ceil(W/16))-byte parity block. B = 4096: 4352-byte parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .fields import FieldSpec

BLOCK_BYTES = 4096  # default wire-format block size

_U32 = jnp.uint32


def _word_count(field: FieldSpec, block_bytes: int) -> int:
    wb = 4 if field.use_mont else 2
    assert block_bytes % wb == 0, (
        f"{field.name} needs block_bytes % {wb} == 0, got {block_bytes}")
    return block_bytes // wb


def _bitmap_lanes(words: int) -> int:
    return -(-words // 16)


def field_lanes(field: FieldSpec, block_bytes: int = BLOCK_BYTES) -> int:
    """Number of field-element lanes a data block maps to."""
    w = _word_count(field, block_bytes)
    return w + _bitmap_lanes(w) if field.use_mont else w


def parity_bytes(field: FieldSpec, block_bytes: int = BLOCK_BYTES) -> int:
    """Wire size of one serialized parity block."""
    w = _word_count(field, block_bytes)
    if field.use_mont:
        return 4 * (w + _bitmap_lanes(w))
    return 2 * (w + _bitmap_lanes(w))


def _bytes_to_u32(raw, word_bytes: int):
    """[..., nbytes] uint8 -> [..., nbytes/word_bytes] uint32, little-endian.

    A BITCAST, not byte arithmetic: the shift-and-or formulation
    materialized a u32 copy of every byte (4x inflation — it OOMed the
    GF32 wire bench chain) and TPU u8 vector math is slow; XLA's
    bitcast-convert collapses the minor byte axis in the platform's
    little-endian layout for free. Bit-exactness vs the arithmetic form
    is pinned by the byte-level wire goldens (test_wire_golden) and the
    on-chip wire checks (test_tpu)."""
    shape = raw.shape[:-1] + (raw.shape[-1] // word_bytes, word_bytes)
    b = raw.reshape(shape)
    if word_bytes == 4:
        return jax.lax.bitcast_convert_type(b, jnp.uint32)
    assert word_bytes == 2
    return jax.lax.bitcast_convert_type(b, jnp.uint16).astype(jnp.uint32)


def _u32_to_bytes(words, word_bytes: int):
    """Inverse of :func:`_bytes_to_u32` (same bitcast rationale)."""
    if word_bytes == 4:
        out = jax.lax.bitcast_convert_type(words.astype(jnp.uint32),
                                           jnp.uint8)
    else:
        assert word_bytes == 2
        out = jax.lax.bitcast_convert_type(words.astype(jnp.uint16),
                                           jnp.uint8)
    return out.reshape(out.shape[:-2] + (out.shape[-2] * word_bytes,))


def _pack_bits(bits, group: int):
    """[..., L] 0/1 uint32 -> [..., ceil(L/group)] words (bit j of word m
    is element m*group + j; trailing bits zero).

    On TPU the group-pack runs as an MXU matmul: bit t of the lane axis
    times a selection matrix carrying 2^(t%group) at row t, column
    t//group — the lane-group reduction is a relayout the VPU pays
    dearly for (the shift-reduce form measured ~55 ms device time on
    the GF32 wire-encode pack alone, tools/onchip_r5_gf32wire.py),
    while the idle MXU does it in noise. EXACT even through bf16
    matmul lowering: operands are 0/1 and powers of two (< 2^group <=
    2^16), products and the disjoint-bit sums are exactly
    representable — the same argument as the wire kernels' in-kernel
    bitmap compaction, pinned on chip by the saturated-group test. The
    VPU form remains the non-TPU path (on CPU the matmul would be
    group-times more work)."""
    length = bits.shape[-1]
    pad = (-length) % group
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.zeros(bits.shape[:-1] + (pad,), jnp.uint32)], axis=-1)
    n_words = bits.shape[-1] // group
    if jax.default_backend() == "tpu" and group <= 16:
        lanes = bits.shape[-1]
        t = jax.lax.broadcasted_iota(jnp.int32, (lanes, n_words), 0)
        g = jax.lax.broadcasted_iota(jnp.int32, (lanes, n_words), 1)
        w = (jnp.int32(1) << (t % group)).astype(jnp.float32)
        sel = jnp.where(t // group == g, w, jnp.float32(0))
        flat = bits.reshape(-1, lanes).astype(jnp.int32).astype(
            jnp.float32)
        out = jnp.dot(flat, sel, preferred_element_type=jnp.float32)
        return out.astype(jnp.int32).astype(jnp.uint32).reshape(
            bits.shape[:-1] + (n_words,))
    shape = bits.shape[:-1] + (n_words, group)
    b = bits.reshape(shape)
    shifts = jnp.arange(group, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)


def _unpack_bits(words, group: int, length: int | None = None):
    """Inverse of :func:`_pack_bits` (truncated to ``length`` elements)."""
    shifts = jnp.arange(group, dtype=jnp.uint32)
    bits = (words[..., None] >> shifts) & _U32(1)
    flat = bits.reshape(words.shape[:-1] + (words.shape[-1] * group,))
    if length is not None:
        flat = flat[..., :length]
    return flat


# ---------------------------------------------------------------------------
# Data blocks: raw bytes -> field lanes (and back).
# ---------------------------------------------------------------------------

def pack_data(raw, field: FieldSpec):
    """[k, B] uint8 -> [k, field_lanes(field, B)] uint32 field elements."""
    assert raw.dtype == jnp.uint8
    if not field.use_mont:
        return _bytes_to_u32(raw, 2)
    words = _bytes_to_u32(raw, 4)                      # [k, W]
    esc = (words >= _U32(field.p)).astype(jnp.uint32)
    stored = words - esc * _U32(field.p)
    bitmap = _pack_bits(esc, 16)                       # [k, ceil(W/16)]
    return jnp.concatenate([stored, bitmap], axis=-1)


def unpack_data(fields, field: FieldSpec):
    """[k, field_lanes] uint32 field elements -> [k, B] uint8."""
    if not field.use_mont:
        return _u32_to_bytes(fields, 2)
    lanes = fields.shape[-1]
    # lanes = W + ceil(W/16)  =>  W = the unique solution
    words_n = _words_from_lanes(lanes)
    stored, bitmap = fields[..., :words_n], fields[..., words_n:]
    esc = _unpack_bits(bitmap, 16, words_n)
    words = stored + esc * _U32(field.p)
    return _u32_to_bytes(words, 4)


def _words_from_lanes(lanes: int) -> int:
    """Invert lanes = W + ceil(W/16): W = floor(lanes * 16 / 17) fixed up."""
    w = lanes * 16 // 17
    while w + _bitmap_lanes(w) < lanes:
        w += 1
    assert w + _bitmap_lanes(w) == lanes, f"invalid lane count {lanes}"
    return w


# ---------------------------------------------------------------------------
# Parity blocks: field lanes -> wire bytes (and back).
# ---------------------------------------------------------------------------

def serialize_parity(fields, field: FieldSpec):
    """[m, field_lanes] uint32 field elements -> [m, parity_bytes] uint8."""
    if field.use_mont:
        return _u32_to_bytes(fields, 4)
    esc = (fields == _U32(0x10000)).astype(jnp.uint32)
    stored = fields * (_U32(1) - esc)                 # 0 where escaped
    bitmap = _pack_bits(esc, 16)                      # [m, ceil(W/16)]
    out = jnp.concatenate([stored, bitmap], axis=-1)  # u16 values
    return _u32_to_bytes(out, 2)


def deserialize_parity(raw, field: FieldSpec):
    """[m, parity_bytes] uint8 -> [m, field_lanes] uint32 field elements."""
    if field.use_mont:
        return _bytes_to_u32(raw, 4)
    words = _bytes_to_u32(raw, 2)
    words_n = _words_from_lanes(words.shape[-1])
    stored, bitmap = words[..., :words_n], words[..., words_n:]
    esc = _unpack_bits(bitmap, 16, words_n)
    return stored + esc * _U32(0x10000)


# ---------------------------------------------------------------------------
# Parts forms: u32 little-endian byte images instead of uint8 arrays.
# The wire bytes ARE these u32 arrays' byte image (a free host
# reinterpretation: np.ascontiguousarray(x).view(...)), and keeping the
# device side in u32 avoids TPU u8 vector math entirely — the serving
# and bench paths use these (mirrors rs.encode_blocks_gf16_parts).
# ---------------------------------------------------------------------------

def pack_data_pairs(words, field: FieldSpec):
    """[k, B/4] u32 LE byte-image of raw data blocks ->
    [k, field_lanes] u32 field elements (parts twin of
    :func:`pack_data`: the uint8 endpoint's bitcast is a TILED-LAYOUT
    RELAYOUT on TPU — u8 arrays tile (32, 128), so regrouping 4 bytes
    into a u32 shuffles lanes — measured ~20-30 ms per endpoint at the
    2^17-block bench shape)."""
    if field.use_mont:
        esc = (words >= _U32(field.p)).astype(jnp.uint32)
        stored = words - esc * _U32(field.p)
        bitmap = _pack_bits(esc, 16)
        return jnp.concatenate([stored, bitmap], axis=-1)
    m = words.shape[0]
    lo = words & _U32(0xFFFF)
    hi = words >> _U32(16)
    return jnp.stack([lo, hi], axis=-1).reshape(m, words.shape[-1] * 2)


def deserialize_parity_pairs(pairs, field: FieldSpec):
    """[m, parity_bytes/4] u32 LE byte-image of wire parity ->
    [m, field_lanes] u32 field elements (parts twin of
    :func:`deserialize_parity`; requires parity_bytes % 4 == 0, true
    for every standard block size)."""
    if field.use_mont:
        return pairs                      # GF32 wire IS the u32 lanes
    m = pairs.shape[0]
    lo = pairs & _U32(0xFFFF)
    hi = pairs >> _U32(16)
    words = jnp.stack([lo, hi], axis=-1).reshape(m, pairs.shape[-1] * 2)
    words_n = _words_from_lanes(words.shape[-1])
    stored, bitmap = words[..., :words_n], words[..., words_n:]
    esc = _unpack_bits(bitmap, 16, words_n)
    return stored + esc * _U32(0x10000)


def data_rows_to_pairs(rows, field: FieldSpec):
    """[k, field_lanes] u32 DATA-block field rows -> [k, B/4] u32 LE
    byte-image of the raw blocks (inverse of :func:`pack_data` up to
    the free byte view; parts twin of :func:`unpack_data`)."""
    if field.use_mont:
        lanes = rows.shape[-1]
        words_n = _words_from_lanes(lanes)
        stored, bitmap = rows[..., :words_n], rows[..., words_n:]
        esc = _unpack_bits(bitmap, 16, words_n)
        return stored + esc * _U32(field.p)
    lo, hi = rows[..., 0::2], rows[..., 1::2]
    return lo | (hi << _U32(16))
