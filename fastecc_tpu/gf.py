"""Portable GF(p) arithmetic in pure jax.numpy (uint32 lanes).

TPU-native replacement for the reference's scalar/SIMD GF(p) layer
(``GF(p).cpp``: C1 add/sub, C2/C3 mulmod, C4 pow/inv in SURVEY.md §2).
The reference computes ``a*b mod p`` with a 64-bit product; TPU has no
64-bit integer multiply, so multiplication is Montgomery REDC with R = 2^32
built from 16x16->32-bit partial products (SURVEY.md Appendix A, verified).

Conventions:
  * Field elements live in **normal domain** uint32 arrays, values < p
    (for GF16, values <= 0x10000 stored in uint32).
  * Hot-path multiplications use *Montgomery-scaled constants*: for a
    constant c, precompute c~ = c * R mod p; then ``mont_mul(x, c~) =
    x * c mod p`` directly in normal domain — one REDC per multiply and no
    domain conversions of the data. NTT twiddles are stored pre-scaled.
  * ``mul`` (two arbitrary normal-domain operands) costs two REDCs for GF32.

Everything here is shape-polymorphic and jit/pallas-friendly: uint32 in,
uint32 out, no data-dependent control flow.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .fields import FieldSpec, GF16

# numpy scalars (not jnp arrays) so constants inline into ops — required
# for use inside Pallas kernels, which reject captured array constants.
_U32 = np.uint32
_MASK16 = np.uint32(0xFFFF)


def _u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# add / sub (C1): branch-free via compare-select, same trick as the
# reference's SSE2 compare-mask add/sub but expressed as jnp.where.
# ---------------------------------------------------------------------------

def add(field: FieldSpec, a, b):
    """(a + b) mod p, elementwise. a, b uint32 < p (<= p for GF16's 0x10000).

    For p > 2^31 a plain compare-subtract needs two compares (the u32 sum
    itself wraps). The carry trick needs one: pre-bias one operand by
    p' = 2^32 - p, so s = a + (b + p') wraps exactly when a + b >= p —
    wrapped s is already a + b - p, unwrapped s just needs the bias removed.
    (b + p' cannot overflow since b < p.) Measured ~2x faster than the
    two-compare form on the TPU VPU.
    """
    p = _U32(field.p)
    if field.p > (1 << 31):
        t = b + _U32((1 << 32) - field.p)
        s = a + t
        return jnp.where(s < t, s, s - _U32((1 << 32) - field.p))
    s = a + b
    return jnp.where(s >= p, s - p, s)


def sub(field: FieldSpec, a, b):
    """(a - b) mod p, elementwise."""
    p = _U32(field.p)
    d = a - b  # wraps when a < b
    return jnp.where(a >= b, d, d + p)


def neg(field: FieldSpec, a):
    p = _U32(field.p)
    return jnp.where(a == 0, a, p - a)


# ---------------------------------------------------------------------------
# 64-bit product from 16-bit limbs (no u64 anywhere).
# ---------------------------------------------------------------------------

def _mul_wide(a, b):
    """Full 64-bit product of two uint32 arrays as (hi, lo) uint32 pair.

    Four 16x16->32 partial products; every intermediate fits in uint32
    (bounds in SURVEY.md Appendix A / gf tests).
    """
    al = a & _MASK16
    ah = a >> _U32(16)
    bl = b & _MASK16
    bh = b >> _U32(16)
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    # carry column: (ll >> 16) + low16(lh) + low16(hl) < 2^18
    t = (ll >> _U32(16)) + (lh & _MASK16) + (hl & _MASK16)
    lo = (t << _U32(16)) | (ll & _MASK16)
    hi = hh + (lh >> _U32(16)) + (hl >> _U32(16)) + (t >> _U32(16))
    return hi, lo


# ---------------------------------------------------------------------------
# Montgomery multiplication (GF32 path; C2/C3).
# ---------------------------------------------------------------------------

def mont_mul(field: FieldSpec, a, b, generic: bool = False):
    """REDC(a * b) = a * b * R^-1 mod p, R = 2^32. Requires a, b < p.

    If b is a Montgomery-scaled constant (b = c * R mod p), the result is
    a * c mod p in normal domain — the hot-path butterfly form.

    For the codec prime p = 0xFFF00001 = 2^32 - 2^20 + 1 (Solinas-
    structured, and n' = -p^-1 mod 2^32 = p - 2), both REDC multiplies
    collapse to shift/add chains, cutting the hardware multiply count from
    9 to 4 per mulmod (the VPU is the bottleneck, not HBM):
      m     = lo * n' mod 2^32 = -(lo + (lo << 20))          [n' = p - 2]
      m * p = (m - (m >> 12)) * 2^32 + (m - ((m & 0xFFF) << 20))
    so (m*p) >> 32 = m - (m >> 12) - [m < ((m & 0xFFF) << 20)].
    Bit-identical to the generic path (test-enforced); ``generic=True``
    forces the limb-product REDC even for the Solinas prime (the
    microbenchmark A/B — SURVEY.md §3.3's mulmod-variant comparison).
    """
    assert field.use_mont
    p = _U32(field.p)
    hi, lo = _mul_wide(a, b)
    if field.p == 0xFFF00001 and not generic:
        m = _U32(0) - (lo + (lo << _U32(20)))        # wraps mod 2^32
        s20 = (m & _U32(0xFFF)) << _U32(20)
        mp_hi = m - (m >> _U32(12)) - (m < s20).astype(jnp.uint32)
    else:
        m = lo * _U32(field.n_prime)  # native low-32 multiply
        mp_hi, _ = _mul_wide(m, p)
    # t + m*p has zero low word; carry out of the low word is 1 iff lo != 0
    # (mp_lo == 2^32 - lo when lo > 0, else 0).
    carry = (lo != 0).astype(jnp.uint32)
    # Final reduction via the carry trick (see add): true u = hi + mp_hi +
    # carry < 2p needs u mod p. Pre-bias by p' = 2^32 - p: t2 = hi + carry
    # + p' never overflows (hi <= floor((p-1)^2 / 2^32), and
    # (p-1)^2/2^32 + 1 + 2^32 - p < 2^32 for every p < 2^32), and
    # s = mp_hi + t2 wraps exactly when u >= p.
    pp = _U32((1 << 32) - field.p)
    t2 = hi + carry + pp
    s = mp_hi + t2
    return jnp.where(s < t2, s, s - pp)


def to_mont(field: FieldSpec, a):
    """a -> a * R mod p (enter Montgomery domain)."""
    return mont_mul(field, a, _U32(field.r2_mod_p))


def from_mont(field: FieldSpec, a):
    """a * R mod p -> a (leave Montgomery domain)."""
    return mont_mul(field, a, _U32(1))


# ---------------------------------------------------------------------------
# General normal-domain multiply (dispatches per field).
# ---------------------------------------------------------------------------

def _mul_gf16(a, b):
    """(a * b) mod 0x10001 with operands in [0, 0x10000], stored uint32.

    Products fit in 32 bits except 0x10000 * 0x10000 = 2^32 (wraps to 0);
    2^32 mod p = 1, and the wrap indicator restores it. Reduction uses
    2^16 = -1 (mod p): x = x_hi*2^16 + x_lo = x_lo - x_hi.
    """
    p = _U32(GF16.p)
    t = a * b  # wraps only for 0x10000 * 0x10000
    ov = ((a == _U32(0x10000)) & (b == _U32(0x10000))).astype(jnp.uint32)
    lo = t & _MASK16
    hi = t >> _U32(16)
    r = jnp.where(lo >= hi, lo - hi, lo - hi + p)  # < p... <= p-1? see tests
    r = r + ov  # 2^32 contributes +1; r + 1 <= p
    return jnp.where(r >= p, r - p, r)


def _mul_gf16_tw(a, b):
    """(a * b) mod 0x10001 with a in [0, 0x10000] and b STRICTLY below
    2^16 — the butterfly-twiddle form.

    Butterfly stage tables can never contain 0x10000 (= -1 mod p): the
    size-a table holds w_a^j for j in [0, a/2) (and the radix-4 side
    tables w^2j with 2j < a/2, w^3j with 3j != a/2 mod a for power-of-2
    a, i4 = w^(a/4) whose square is -1), while w^j = -1 only at
    j = a/2 — outside every table (asserted at table build,
    ntt._assert_gf16_stage_table). With b < 2^16 the product never
    wraps u32 (max 2^16 * (2^16 - 1)) and lo16 - hi16 lands in
    (-2^16, 2^16), so both select branches are already < p: the
    0x10000 * 0x10000 wrap check AND the final >= p select of
    :func:`_mul_gf16` drop out — 5 VPU ops vs ~10 (the round-3 GF16
    butterfly speedup; measured as the `gf16-tw` microbench variant).
    """
    p = _U32(GF16.p)
    t = a * b
    lo = t & _MASK16
    hi = t >> _U32(16)
    return jnp.where(lo >= hi, lo - hi, lo - hi + p)


def mul(field: FieldSpec, a, b):
    """(a * b) mod p for arbitrary normal-domain uint32 operands < p."""
    if field.use_mont:
        return mont_mul(field, mont_mul(field, a, b), _U32(field.r2_mod_p))
    return _mul_gf16(_u32(a), _u32(b))


def mul_const(field: FieldSpec, a, c: int):
    """a * c mod p where c is a Python-int constant (pre-scaled at trace)."""
    if field.use_mont:
        return mont_mul(field, a, _U32(field.to_mont_host(c)))
    return _mul_gf16(a, _U32(c % field.p))


# ---------------------------------------------------------------------------
# pow / inverse (C4): fixed 32-step square-and-multiply, exponent static.
# ---------------------------------------------------------------------------

def pow_const(field: FieldSpec, a, e: int):
    """a ** e mod p with a static Python-int exponent (unrolled at
    trace; negative e means inverse powers via Python's nonnegative %).

    Fermat reduction e mod (p-1) is only valid for nonzero bases; a
    nonzero original exponent that reduces to 0 maps to p-1 instead so
    that pow_const(field, 0, m*(p-1)) correctly returns 0 (not 0^0=1)
    while nonzero bases still get their a^(p-1) = 1."""
    orig_nonzero = e != 0
    e %= field.p - 1
    if e == 0 and orig_nonzero:
        e = field.p - 1
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(field, result, base)
        e >>= 1
        if e:
            base = mul(field, base, base)
    if result is None:
        return jnp.full_like(a, _U32(1))
    return result


def inv(field: FieldSpec, a):
    """Elementwise inverse a^(p-2) mod p. inv(0) is undefined (returns 0)."""
    return pow_const(field, a, field.p - 2)


def pow_base(field: FieldSpec, base: int, e):
    """base ** e mod p with a static base and a *traced* integer exponent
    array (square-and-multiply over e's bits; e < 2^max_log2 assumed,
    used for per-position twiddles w^j from erasure indices)."""
    e = jnp.asarray(e, dtype=jnp.uint32)
    result = jnp.ones(e.shape, dtype=jnp.uint32)
    sq = base % field.p
    for t in range(field.max_log2 + 1):
        bit = (e >> _U32(t)) & _U32(1)
        stepped = mul_const(field, result, sq)
        result = jnp.where(bit == 1, stepped, result)
        sq = (sq * sq) % field.p
    return result


def prepare_device(field: FieldSpec, v):
    """Device-side analog of ntt.prepare_consts for *traced* values: one
    conversion REDC so later ``gf.mont_mul(x, prepared)``/GF16 ``mul`` cost
    a single reduction per element."""
    if field.use_mont:
        return to_mont(field, v)
    return v


def mul_prepared_device(field: FieldSpec, x, prepared):
    """x * v mod p where ``prepared = prepare_device(field, v)``."""
    if field.use_mont:
        return mont_mul(field, x, prepared)
    return _mul_gf16(x, prepared)
