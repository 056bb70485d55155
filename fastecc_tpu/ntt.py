"""Number-theoretic transforms over GF(p), TPU-first formulation.

Rebuilds the reference's NTT engine (``ntt.cpp``: SURVEY.md §2 C6-C10) with
TPU-idiomatic algorithms instead of translating the C++:

  * ``ntt``/``intt``: **Stockham autosort DIF**, radix-2 — no bit-reversal
    gather anywhere (bit-reversal permutes sublanes, which is hostile to the
    TPU vector unit; Stockham's contiguous slice + interleave reshapes lower
    to cheap relayouts). Replaces the reference's recursive (C7) and
    iterative bit-reverse (C8) variants.
  * ``ntt_four_step``: the Matrix Fourier Algorithm / four-step decomposition
    (C9) - view a length-N transform as C x R, column NTTs, twiddle by
    w_N^(k_c * r), row NTTs, transpose. On one chip this is the cache/VMEM
    blocking template; across chips the middle transpose becomes an
    ``all_to_all`` (see parallel/ntt_dist.py).
  * ``naive_dft``: O(N^2) bigint oracle (C6), test-only.

Data layout: the transform always runs along **axis 0**; all trailing axes
are independent lanes (the 1024 words of a 4KB block, SURVEY.md §1 "key
data-layout fact"). Twiddles are host-precomputed Python-int powers, stored
Montgomery-scaled for GF32 so the butterfly costs exactly one REDC
(gf.mont_mul) with the data staying in normal domain.

Transform convention (pinned; defines bit-exactness per SURVEY.md §0):
  forward:  X[k] = sum_n x[n] * w^(n*k) mod p,   w = field.root_of_order(N)
  inverse:  x[n] = N^-1 * sum_k X[k] * w^(-n*k) mod p
with natural-order input AND output for both directions.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import gf
from .fields import FieldSpec, FIELDS


def _log2(n: int) -> int:
    t = n.bit_length() - 1
    assert 1 << t == n, f"size must be a power of two, got {n}"
    return t


# ---------------------------------------------------------------------------
# Twiddle machinery (C5): host-side powers, prepared for the device hot path.
# ---------------------------------------------------------------------------

def powers_host(field: FieldSpec, base: int, count: int) -> np.ndarray:
    """[base^0, base^1, ..., base^(count-1)] mod p as numpy uint32.

    Vectorized u64 doubling — out[f:2f] = out[:f] * base^f — so a 2^20
    table is ~20 numpy passes, not 2^20 Python iterations (first-call
    trace-time table builds at n=2^20 were seconds of Python looping)."""
    if count <= 0:
        return np.empty(0, dtype=np.uint32)
    p = np.uint64(field.p)
    out = np.empty(count, dtype=np.uint64)
    out[0] = 1
    filled, step = 1, np.uint64(base % field.p)
    while filled < count:
        take = min(filled, count - filled)
        out[filled:filled + take] = out[:take] * step % p
        filled += take
        step = step * step % p
    return out.astype(np.uint32)


def powers_outer_host(field: FieldSpec, bases: np.ndarray,
                      count: int) -> np.ndarray:
    """[len(bases), count] table T[i, j] = bases[i]^j mod p (vectorized u64
    doubling along axis 1; the workhorse behind every two-axis twiddle
    table — four-step diagonals, coset rows, pass-A seeds)."""
    m = int(np.asarray(bases).shape[0])
    if count <= 0 or m == 0:
        return np.empty((m, max(count, 0)), dtype=np.uint32)
    p = np.uint64(field.p)
    out = np.empty((m, count), dtype=np.uint64)
    out[:, 0] = 1
    filled = 1
    step = np.asarray(bases, dtype=np.uint64) % p
    while filled < count:
        take = min(filled, count - filled)
        out[:, filled:filled + take] = out[:, :take] * step[:, None] % p
        filled += take
        step = step * step % p
    return out.astype(np.uint32)


def prepare_consts(field: FieldSpec, vals: np.ndarray) -> np.ndarray:
    """Prepare constants for the device multiply hot path.

    GF32: scale into the Montgomery domain so ``gf.mont_mul(x, prepared)``
    yields the normal-domain product. GF16: identity (Fermat reduction
    needs no scaling).
    """
    if field.use_mont:
        # (v << 32) % p in u64: v < 2^32 so v << 32 <= 2^64 - 2^32 fits
        return ((vals.astype(np.uint64) << np.uint64(32))
                % np.uint64(field.p)).astype(np.uint32)
    return vals.astype(np.uint32)


def mul_prepared(field: FieldSpec, x, prepared):
    """x * c mod p where ``prepared`` came from :func:`prepare_consts`."""
    if field.use_mont:
        return gf.mont_mul(field, x, prepared)
    return gf._mul_gf16(x, prepared)


def mul_prepared_tw(field: FieldSpec, x, prepared):
    """x * c mod p where ``prepared`` is a BUTTERFLY STAGE table entry.

    Identical to :func:`mul_prepared` for GF32; for GF16 it uses the
    escape-free reduced form (gf._mul_gf16_tw) — stage tables provably
    never contain 0x10000 (asserted at build,
    :func:`_assert_gf16_stage_table`), which drops the wrap check and
    the final select from every butterfly twiddle multiply. Do NOT use
    for the four-step diagonal, coset, scale-folded, or decode tables:
    those CAN evaluate to -1 = 0x10000."""
    if field.use_mont:
        return gf.mont_mul(field, x, prepared)
    return gf._mul_gf16_tw(x, prepared)


def _assert_gf16_stage_table(field: FieldSpec, vals: np.ndarray):
    """Build-time proof hook for the mul_prepared_tw contract: a GF16
    stage table must be 0x10000-free (w^j = -1 only at j = a/2, which
    no stage table includes — see gf._mul_gf16_tw)."""
    if not field.use_mont:
        assert not (np.asarray(vals) == 0x10000).any(), (
            "GF16 stage table contains -1 (0x10000): the tw-specialized "
            "butterfly multiply would be wrong")
    return vals


@functools.lru_cache(maxsize=None)
def _stage_twiddles(field_name: str, a: int, inverse: bool):
    """Prepared twiddles w_a^n, n in [0, a/2), for a Stockham stage of size a.

    Stage tables depend only on the current sub-transform size ``a`` (all
    sub-transforms at a stage share them - the DIF invariant), so they are
    cached per (field, a, direction) and reused across transform sizes.
    """
    field = FIELDS[field_name]
    w = field.root_of_order(a)
    if inverse:
        w = field.inv_host(w)
    return _assert_gf16_stage_table(field, np.asarray(
        prepare_consts(field, powers_host(field, w, a // 2))))


@functools.lru_cache(maxsize=None)
def _four_step_twiddles(field_name: str, n: int, c: int, inverse: bool):
    """Prepared [C, R] table T[k_c, r] = w_N^(+-k_c * r) for the four-step."""
    field = FIELDS[field_name]
    r_dim = n // c
    w = field.root_of_order(n)
    if inverse:
        w = field.inv_host(w)
    col = powers_host(field, w, c)  # w^{k_c}
    rows = powers_outer_host(field, col, r_dim)        # w^(k_c * r)
    return np.asarray(prepare_consts(field, rows))


# ---------------------------------------------------------------------------
# Stockham autosort NTT (C8 replacement).
# ---------------------------------------------------------------------------

def ntt(x, field: FieldSpec, inverse: bool = False, scale: bool = True,
        radix: int = 2):
    """Length-N NTT along axis 0; natural order in and out.

    Stockham DIF: each stage splits every pending sub-transform into
    even/odd output halves via one butterfly over contiguous slices, then
    *prepends* the new output bit to the completed-splits axis, so after
    log2(N) stages the completed axis reads as the natural output index
    (no bit-reversal pass). ``scale`` controls the final N^-1 multiply of
    the inverse (disabled when a caller folds it elsewhere).

    ``radix=4`` merges stage pairs into radix-4 butterflies (same GF mulmod
    count — the 4th root of unity is not free in GF(p), unlike complex i —
    but half the inter-stage interleaves; a leading radix-2 stage handles
    odd log2(N)). Bit-exact equal to the radix-2 path.
    """
    assert radix in (2, 4)
    n = x.shape[0]
    t = _log2(n)
    rest = x.shape[1:]
    if t == 0:
        return x
    y = x.reshape((n, 1) + rest)
    s = 0
    if radix == 4 and t % 2 == 1:
        y = _stage_r2(y, field, n, 0, inverse, rest)
        s = 1
    while s < t:
        if radix == 4 and s + 1 < t:
            y = _stage_r4(y, field, n, s, inverse, rest)
            s += 2
        else:
            y = _stage_r2(y, field, n, s, inverse, rest)
            s += 1
    out = y.reshape((n,) + rest)
    if inverse and scale:
        out = gf.mul_const(field, out, field.inv_host(n))
    return out


def _stage_r2(y, field: FieldSpec, n: int, s: int, inverse: bool, rest):
    """One radix-2 Stockham DIF stage on y [half*2, done, *rest]."""
    a = n >> s           # current sub-transform length
    half = a >> 1
    tw = jnp.asarray(_stage_twiddles(field.name, a, inverse))
    tw = tw.reshape((half, 1) + (1,) * len(rest))
    lo = y[:half]
    hi = y[half:]
    even = gf.add(field, lo, hi)
    odd = mul_prepared_tw(field, gf.sub(field, lo, hi), tw)
    # prepend the new output bit to the completed axis -> natural order
    return jnp.stack([even, odd], axis=1).reshape(
        (half, 2 * y.shape[1]) + rest)


def _stage_r4(y, field: FieldSpec, n: int, s: int, inverse: bool, rest):
    """One radix-4 Stockham DIF stage == two fused radix-2 stages.

    With quarters q0..q3 of each size-a sub-transform, j in [0, a/4),
    w = w_a, and i4 = w_a^(a/4) (the 4th root of unity on this path),
    the two fused radix-2 stages produce (in two-stage interleave order —
    the done-axis bits read (stage2_bit, stage1_bit)):
      slot (0,0): (q0+q2) + (q1+q3)
      slot (0,1): ((q0-q2) + i4*(q1-q3)) * w^j
      slot (1,0): ((q0+q2) - (q1+q3)) * w^(2j)
      slot (1,1): ((q0-q2) - i4*(q1-q3)) * w^(3j)
    Bit-exact equal to running stages s and s+1 of the radix-2 path, at
    half the inter-stage relayouts.
    """
    a = n >> s
    q = a >> 2
    w1, i4, w2, w3 = (jnp.asarray(v).reshape((q, 1) + (1,) * len(rest))
                      for v in _r4_twiddles(field.name, a, inverse))
    q0, q1, q2, q3 = y[:q], y[q:2 * q], y[2 * q:3 * q], y[3 * q:]
    s0, s1 = gf.add(field, q0, q2), gf.add(field, q1, q3)
    d0 = gf.sub(field, q0, q2)
    d1 = mul_prepared_tw(field, gf.sub(field, q1, q3), i4)
    o00 = gf.add(field, s0, s1)
    o10 = mul_prepared_tw(field, gf.sub(field, s0, s1), w2)
    o01 = mul_prepared_tw(field, gf.add(field, d0, d1), w1)
    o11 = mul_prepared_tw(field, gf.sub(field, d0, d1), w3)
    return jnp.stack([o00, o01, o10, o11], axis=1).reshape(
        (q, 4 * y.shape[1]) + rest)


@functools.lru_cache(maxsize=None)
def _r4_twiddles(field_name: str, a: int, inverse: bool):
    """Prepared (w^j, i4 broadcast, w^2j, w^3j) tables for a radix-4 stage
    of size a, j in [0, a/4); i4 = w^(a/4) is premultiplied into no table
    (it scales the q1-q3 difference once)."""
    field = FIELDS[field_name]
    w = field.root_of_order(a)
    if inverse:
        w = field.inv_host(w)
    q = a // 4
    w1 = powers_host(field, w, q)
    i4 = np.full(q, field.pow_host(w, q), dtype=np.uint32)
    w2 = powers_host(field, field.pow_host(w, 2), q)
    w3 = powers_host(field, field.pow_host(w, 3), q)
    return tuple(_assert_gf16_stage_table(
        field, np.asarray(prepare_consts(field, v)))
        for v in (w1, i4, w2, w3))


def intt(x, field: FieldSpec, scale: bool = True):
    """Inverse NTT along axis 0 (w^-1 twiddles + N^-1 scale)."""
    return ntt(x, field, inverse=True, scale=scale)


# Jitted entry points (one XLA compilation per shape instead of per-op
# eager dispatch; FieldSpec is frozen/hashable so it jits as a static arg).
ntt_jit = jax.jit(ntt, static_argnames=("field", "inverse", "scale"))
intt_jit = jax.jit(intt, static_argnames=("field", "scale"))


def ntt_auto(x, field: FieldSpec, inverse: bool = False, scale: bool = True,
             pre_seed: int | None = None, pre_vec=None, post_vec=None,
             sel_mask=None, sel_orig=None):
    """Best-backend NTT along axis 0: the fused two-pass Pallas MFA kernel
    on TPU for supported shapes (kernels/ntt_mfa.py), else the staged jnp
    Stockham path. ``pre_seed=g`` applies the input-side multiply
    x[m] *= g^m; ``pre_vec`` (a prepared traced [N] table, exclusive with
    pre_seed) applies a general input-side multiply x[m] *= v[m].
    ``post_vec`` applies an output-side multiply out[k] *= v[k];
    ``sel_mask``/``sel_orig`` (together, and only with post_vec) apply the
    row merge where(mask != 0, out, orig) — decode's Forney divide and
    erased-row select. All fusions are free HBM-wise in the Pallas path
    (kernel prologue/epilogue), extra elementwise passes in the fallback.
    Bit-exact across backends.
    """
    from .kernels import ntt_mfa  # local import: kernels pull in pallas

    assert pre_seed is None or pre_vec is None, (
        "pre_seed and pre_vec are mutually exclusive")
    assert (sel_mask is None) == (sel_orig is None)
    assert sel_mask is None or post_vec is not None
    if (x.ndim == 2 and jax.default_backend() == "tpu"
            and ntt_mfa._supported(x.shape[0], x.shape[1])):
        return ntt_mfa.ntt_pallas(x, field, inverse=inverse, scale=scale,
                                  pre_seed=pre_seed, pre_vec=pre_vec,
                                  post_vec=post_vec, sel_mask=sel_mask,
                                  sel_orig=sel_orig)
    n = x.shape[0]
    rest = (1,) * (x.ndim - 1)
    if pre_seed is not None:
        pre = _pre_powers(field.name, pre_seed % field.p, n)
        x = mul_prepared(field, x, jnp.asarray(pre).reshape((n,) + rest))
    if pre_vec is not None:
        x = mul_prepared(field, x, pre_vec.reshape((n,) + rest))
    out = ntt(x, field, inverse=inverse, scale=scale)
    if post_vec is not None:
        out = mul_prepared(field, out, post_vec.reshape((n,) + rest))
    if sel_mask is not None:
        out = jnp.where((sel_mask != 0).reshape((n,) + rest), out, sel_orig)
    return out


@functools.lru_cache(maxsize=None)
def _pre_powers(field_name: str, g: int, n: int):
    field = FIELDS[field_name]
    return np.asarray(prepare_consts(field, powers_host(field, g, n)))


# ---------------------------------------------------------------------------
# Four-step / MFA decomposition (C9).
# ---------------------------------------------------------------------------

def ntt_four_step(x, field: FieldSpec, inverse: bool = False,
                  c_dim: int | None = None, scale: bool = True):
    """N-point NTT along axis 0 via the four-step C x R decomposition.

    With n = r + R*c and k = k_c + C*k_r:
        X[k_c + C*k_r] = sum_r w_R^(r*k_r) * w_N^(r*k_c)
                         * [ sum_c x[r + R*c] * w_C^(c*k_c) ]
    i.e. (1) C-point NTTs along the slow input axis, (2) twiddle by
    w_N^(k_c*r), (3) R-point NTTs along the fast axis, (4) transpose.
    Bit-exact equal to :func:`ntt` (both natural order).
    """
    n = x.shape[0]
    t = _log2(n)
    if c_dim is None:
        c_dim = 1 << (t // 2)
    r_dim = n // c_dim
    assert c_dim * r_dim == n and c_dim > 1 and r_dim > 1
    rest = x.shape[1:]

    y = x.reshape((c_dim, r_dim) + rest)          # y[c, r] = x[r + R*c]
    y = ntt(y, field, inverse=inverse, scale=False)   # axis 0: c -> k_c
    tw = jnp.asarray(_four_step_twiddles(field.name, n, c_dim, inverse))
    y = mul_prepared(field, y, tw.reshape((c_dim, r_dim) + (1,) * len(rest)))
    y = jnp.moveaxis(y, 1, 0)                     # [r, k_c, ...]
    y = ntt(y, field, inverse=inverse, scale=False)   # axis 0: r -> k_r
    out = y.reshape((n,) + rest)                  # k = k_c + C*k_r, k_r slow
    if inverse and scale:
        out = gf.mul_const(field, out, field.inv_host(n))
    return out


ntt_four_step_jit = jax.jit(
    ntt_four_step, static_argnames=("field", "inverse", "c_dim", "scale"))


# ---------------------------------------------------------------------------
# Host-side numpy NTT: vectorized u64 mulmod (no Montgomery needed on the
# host). Used for trace-time table construction over *runtime-known* data —
# e.g. the decode locator machinery, where erasure positions are known on
# the host and a device product tree would cost thousands of tiny
# sequential TPU ops (decode.py) — and as a mid-size test oracle.
# ---------------------------------------------------------------------------

def ntt_host(x: np.ndarray, field: FieldSpec, inverse: bool = False,
             scale: bool = True) -> np.ndarray:
    """Stockham NTT along axis 0 in numpy; bit-exact equal to :func:`ntt`."""
    x = np.asarray(x)
    n = x.shape[0]
    t = _log2(n)
    rest = x.shape[1:]
    if t == 0:
        return x.astype(np.uint32)
    p = np.uint64(field.p)
    y = x.reshape((n, 1) + rest).astype(np.uint64)
    for s in range(t):
        a = n >> s
        half = a >> 1
        w = field.root_of_order(a)
        if inverse:
            w = field.inv_host(w)
        tw = powers_host(field, w, half).astype(np.uint64).reshape(
            (half, 1) + (1,) * len(rest))
        lo, hi = y[:half], y[half:]
        even = (lo + hi) % p
        odd = (lo + p - hi) % p * tw % p
        y = np.stack([even, odd], axis=1).reshape(
            (half, 2 * y.shape[1]) + rest)
    out = y.reshape((n,) + rest)
    if inverse and scale:
        out = out * np.uint64(field.inv_host(n)) % p
    return out.astype(np.uint32)


# ---------------------------------------------------------------------------
# Naive O(N^2) DFT oracle (C6) - numpy bigint, test-only.
# ---------------------------------------------------------------------------

def naive_dft(x: np.ndarray, field: FieldSpec, inverse: bool = False):
    """Exact bigint DFT along axis 0. Only for small N in tests."""
    x = np.asarray(x)
    n = x.shape[0]
    w = field.root_of_order(n)
    if inverse:
        w = field.inv_host(w)
    mat = np.empty((n, n), dtype=object)
    for j in range(n):
        mat[j] = powers_host(field, field.pow_host(w, j), n).astype(object)
    flat = x.reshape(n, -1).astype(object)
    out = (mat @ flat) % field.p
    if inverse:
        out = (out * field.inv_host(n)) % field.p
    return out.reshape(x.shape).astype(np.uint32)
