"""Erasure decoder vs. Lagrange-interpolation oracle + roundtrips.

Covers [BASELINE] config :10 — recover 2^12 lost blocks from an arbitrary
surviving subset of 2^13 codeword blocks — plus adversarial erasure
patterns, non-power-of-two erasure counts, and the wire-format path.
The oracle is exact bigint Lagrange interpolation (SURVEY.md Appendix B:
any k surviving positions determine the degree-<k polynomial).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fastecc_tpu import decode as dec
from fastecc_tpu import packing, rs
from fastecc_tpu.fields import GF16, GF32

RNG = np.random.default_rng(0xDEC0DE)


def rand_field(field, shape):
    return RNG.integers(0, field.p, size=shape, dtype=np.uint64).astype(
        np.uint32)


def lagrange_eval_all(survivor_pos, survivor_vals, n, field):
    """Bigint oracle: interpolate through k survivors, evaluate at all
    w^j. survivor_vals: [k, lanes]."""
    p = field.p
    w = field.root_of_order(n)
    xs = [field.pow_host(w, int(s)) for s in survivor_pos]
    lanes = survivor_vals.shape[1]
    out = np.zeros((n, lanes), dtype=object)
    for j in range(n):
        x = field.pow_host(w, j)
        acc = np.zeros(lanes, dtype=object)
        for i, xi in enumerate(xs):
            num, den = 1, 1
            for m, xm in enumerate(xs):
                if m != i:
                    num = num * ((x - xm) % p) % p
                    den = den * ((xi - xm) % p) % p
            li = num * pow(den, p - 2, p) % p
            acc = (acc + survivor_vals[i].astype(object) * li) % p
        out[j] = acc
    return out.astype(np.uint32)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
def test_decode_vs_lagrange_oracle(field):
    k, n, e = 8, 16, 8
    data = rand_field(field, (k, 2))
    cw = np.asarray(rs.encode_jit(jnp.asarray(data), field, n))
    erased = np.asarray(sorted(RNG.choice(n, size=e, replace=False)))
    surv = np.setdiff1d(np.arange(n), erased)[:k]
    want = lagrange_eval_all(surv, cw[surv], n, field)
    corrupted = cw.copy()
    corrupted[erased] = 0xDEADBEEF % field.p  # garbage, not zeros
    got = np.asarray(
        dec.decode_jit(jnp.asarray(corrupted), jnp.asarray(erased), field))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, cw)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
@pytest.mark.parametrize("e", [1, 3, 5, 8])  # incl. non-power-of-two
def test_decode_roundtrip_patterns(field, e):
    k, n = 8, 16
    data = rand_field(field, (k, 3))
    cw = np.asarray(rs.encode_jit(jnp.asarray(data), field, n))
    erased = np.asarray(sorted(RNG.choice(n, size=e, replace=False)))
    corrupted = cw.copy()
    corrupted[erased] = 12345
    got = np.asarray(
        dec.decode_jit(jnp.asarray(corrupted), jnp.asarray(erased), field))
    np.testing.assert_array_equal(got, cw)


@pytest.mark.parametrize("which", ["all_data", "all_parity"])
def test_decode_extreme_patterns(which):
    """Erase exactly the data blocks, or exactly the parity blocks."""
    field, k, n = GF32, 32, 64
    data = rand_field(field, (k, 2))
    cw = np.asarray(rs.encode_jit(jnp.asarray(data), field, n))
    erased = (rs.data_positions(n, k) if which == "all_data"
              else rs.parity_positions(n, k))
    corrupted = cw.copy()
    corrupted[erased] = 0
    got = np.asarray(
        dec.decode_jit(jnp.asarray(corrupted), jnp.asarray(erased), field))
    np.testing.assert_array_equal(got, cw)


def test_config10_scale():
    """[BASELINE] config :10: recover 2^12 lost of 2^13 (lanes thinned)."""
    field = GF32
    k, n = 1 << 12, 1 << 13
    data = rand_field(field, (k, 2))
    cw = np.asarray(rs.encode_jit(jnp.asarray(data), field, n))
    erased = np.asarray(
        sorted(RNG.choice(n, size=n - k, replace=False)))
    corrupted = cw.copy()
    corrupted[erased] = 7
    got = np.asarray(
        dec.decode_jit(jnp.asarray(corrupted), jnp.asarray(erased), field))
    np.testing.assert_array_equal(got, cw)


def test_decode_blocks_wire_roundtrip():
    """Wire-level: encode blocks, lose half (mixed data+parity), recover."""
    field, k, n = GF32, 16, 32
    raw = RNG.integers(0, 256, size=(k, 4096), dtype=np.uint16).astype(
        np.uint8)
    raw[0, :] = 0xFF  # escape-path stress
    parity = np.asarray(rs.encode_blocks_jit(jnp.asarray(raw), field))
    dpos = rs.data_positions(n, k)
    ppos = rs.parity_positions(n, k)
    # lose 9 data blocks and 7 parity blocks
    lost_d = set(RNG.choice(k, size=9, replace=False).tolist())
    lost_p = set(RNG.choice(k, size=7, replace=False).tolist())
    survivors = {}
    for i in range(k):
        if i not in lost_d:
            survivors[int(dpos[i])] = raw[i].tobytes()
        if i not in lost_p:
            survivors[int(ppos[i])] = parity[i].tobytes()
    got = dec.decode_blocks(survivors, n, k, field)
    np.testing.assert_array_equal(got, raw)


def test_decode_blocks_gf16_wire_roundtrip():
    field, k, n = GF16, 8, 16
    raw = RNG.integers(0, 256, size=(k, 4096), dtype=np.uint16).astype(
        np.uint8)
    parity = np.asarray(rs.encode_blocks_jit(jnp.asarray(raw), field))
    dpos, ppos = rs.data_positions(n, k), rs.parity_positions(n, k)
    survivors = {int(ppos[i]): parity[i].tobytes() for i in range(k)}
    # zero data blocks survive: recover everything from parity alone
    got = dec.decode_blocks(survivors, n, k, field)
    np.testing.assert_array_equal(got, raw)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
def test_decode_wire_parity_matches_decode_blocks(field):
    """The fully traced wire-domain decode (decode_wire_parity, the
    bench/serving path — round-5 verdict directive 6) must equal
    decode_blocks' host-assembled answer on the same all-data-erased
    survivors, raw bytes to raw bytes."""
    k = 16
    n = 2 * k
    raw = RNG.integers(0, 256, size=(k, 4096), dtype=np.uint16).astype(
        np.uint8)
    raw[0, :] = 0xFF  # GF32 escape-path stress
    parity = np.asarray(rs.encode_blocks_jit(jnp.asarray(raw), field, n))
    ppos = rs.parity_positions(n, k)
    survivors = {int(ppos[i]): parity[i].tobytes() for i in range(k)}
    want = dec.decode_blocks(survivors, n, k, field)
    np.testing.assert_array_equal(want, raw)
    got = np.asarray(dec.decode_wire_parity_jit(
        jnp.asarray(parity), n, k, field))
    np.testing.assert_array_equal(got, raw)
    # parts form (u32 byte-images end to end — the bench/serving path):
    # the wire bytes are the arrays' byte image on both sides
    pairs = jnp.asarray(np.ascontiguousarray(parity).view(np.uint32))
    out_pairs = np.asarray(dec.decode_wire_parts_jit(pairs, n, k, field))
    np.testing.assert_array_equal(
        np.ascontiguousarray(out_pairs).view(np.uint8), raw)
    # field-domain coset mirror vs the prepared-tables decode
    erased = jnp.asarray(rs.data_positions(n, k).astype(np.uint32))
    tables = dec.prepare_decode_tables_device(erased, n, field)
    par_fields = packing.deserialize_parity(jnp.asarray(parity), field)
    got_f = np.asarray(dec.decode_data_from_parity(par_fields, field, n))
    cw = jnp.stack([jnp.zeros_like(par_fields), par_fields],
                   axis=1).reshape(n, par_fields.shape[1])
    want_f = np.asarray(dec.decode_prepared(cw, *tables, field))[::2]
    np.testing.assert_array_equal(got_f, want_f)


def test_decode_blocks_insufficient_survivors():
    field, k, n = GF32, 8, 16
    raw = np.zeros((k, 4096), np.uint8)
    parity = np.asarray(rs.encode_blocks_jit(jnp.asarray(raw), field))
    ppos = rs.parity_positions(n, k)
    survivors = {int(ppos[i]): parity[i].tobytes() for i in range(k - 1)}
    with pytest.raises(AssertionError, match="unrecoverable"):
        dec.decode_blocks(survivors, n, k, field)


def test_locator_is_monic_product():
    """Locator coefficients vs. bigint polynomial expansion."""
    field, n = GF32, 64
    for e in (1, 2, 3, 7, 8):
        erased = np.asarray(sorted(RNG.choice(n, size=e, replace=False)))
        got = np.asarray(dec.locator_coeffs(
            jnp.asarray(erased, jnp.uint32), n, field))
        w = field.root_of_order(n)
        poly2 = [1]  # bigint expansion of prod (x - w^j)
        for j in erased:
            r = field.pow_host(w, int(j))
            nxt = [0] * (len(poly2) + 1)
            for m, cm in enumerate(poly2):
                nxt[m + 1] = (nxt[m + 1] + cm) % field.p       # x * cm
                nxt[m] = (nxt[m] - r * cm) % field.p           # -r * cm
            poly2 = nxt
        want = np.array(poly2, dtype=np.uint32)
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
@pytest.mark.parametrize("n,e", [(64, 17), (128, 64), (256, 1)])
def test_host_prepared_decode_matches_device(field, n, e):
    """decode_host_prepared (numpy locator tables + slim device program)
    must be bit-exact vs the all-device decode and the true codeword."""
    k = n // 2
    data = rand_field(field, (k, 5))
    cw = np.asarray(rs.encode(jnp.asarray(data), field, n))
    erased = np.sort(RNG.choice(n, size=e, replace=False))
    garbled = cw.copy()
    garbled[erased] = rand_field(field, (e, 5))
    dev = np.asarray(dec.decode(jnp.asarray(garbled),
                                jnp.asarray(erased), field))
    host = np.asarray(dec.decode_host_prepared(jnp.asarray(garbled),
                                               erased, field))
    np.testing.assert_array_equal(dev, cw)
    np.testing.assert_array_equal(host, cw)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
def test_locator_host_matches_device_tables(field):
    """Host numpy locator evaluations == device locator_coeffs pipeline.

    The host lp table uses the UNSHIFTED x*l'(x) convention (decode fuses
    its h-side counterpart as a transform input multiply): at position j
    it holds inv(w^j * l'(w^j))."""
    from fastecc_tpu import gf
    from fastecc_tpu.ntt import mul_prepared, ntt
    n, e = 128, 37
    erased = np.sort(RNG.choice(n, size=e, replace=False))
    l_eval_h, lp_inv_h = dec.locator_host(erased, n, field)
    lc = dec.locator_coeffs(jnp.asarray(erased, dtype=jnp.uint32), n, field)
    lpad = jnp.concatenate([lc, jnp.zeros(n - e - 1, jnp.uint32)])
    l_eval_d = np.asarray(ntt(lpad, field))
    np.testing.assert_array_equal(l_eval_h, l_eval_d)
    # x*l' coefficients are m * l_m (padding rows stay zero)
    dx = jnp.asarray(dec._xderiv_consts(field.name, n))
    lpx = mul_prepared(field, lpad, dx)
    lpx_eval_d = np.asarray(ntt(lpx, field))
    lpx_inv_d = np.asarray(gf.inv(field, jnp.asarray(lpx_eval_d)))
    np.testing.assert_array_equal(lp_inv_h[erased], lpx_inv_d[erased])


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
def test_adversarial_erasure_suite(field):
    """Decode every pattern of the fault-injection suite at max loss."""
    from fastecc_tpu.testing import adversarial_suite
    n, k, lanes = 128, 64, 3
    data = rand_field(field, (k, lanes))
    cw = np.asarray(rs.encode(jnp.asarray(data), field, n))
    for name, erased in adversarial_suite(n, k, seed=3):
        garbled = cw.copy()
        garbled[erased] = rand_field(field, (len(erased), lanes))
        out = np.asarray(dec.decode_host_prepared(
            jnp.asarray(garbled), erased, field))
        np.testing.assert_array_equal(out, cw, err_msg=f"pattern {name}")


def test_decode_recoverability_guard():
    """e > n - k with k given must fail loudly, not return garbage."""
    import pytest

    from fastecc_tpu.fields import GF32
    n, k = 32, 16
    cw = jnp.asarray(np.zeros((n, 4), np.uint32))
    bad = np.arange(17, dtype=np.uint32)  # 17 > n - k = 16
    with pytest.raises(AssertionError, match="unrecoverable"):
        dec.decode(cw, jnp.asarray(bad), GF32, k=k)
    with pytest.raises(AssertionError, match="unrecoverable"):
        dec.decode_host_prepared(cw, bad, GF32, k=k)
    # e == n - k is allowed
    dec.decode_host_prepared(
        jnp.asarray(np.asarray(rs.encode_jit(
            jnp.asarray(np.zeros((k, 4), np.uint32)), GF32, n))),
        np.arange(16, dtype=np.uint32), GF32, k=k)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
def test_prepare_tables_device_matches_host(field):
    """The one-jitted-program device table build (mask, l_eval, lp_inv)
    must match the host numpy build bit-exactly at every meaningful
    position (lp_inv is don't-care off the erased set)."""
    n, e = 256, 100
    erased = np.sort(RNG.choice(n, size=e, replace=False))
    mh, lh, ih = dec.prepare_decode_tables(erased, n, field,
                                           locator="host")
    md, ld, id_ = dec.prepare_decode_tables(erased, n, field,
                                            locator="device")
    np.testing.assert_array_equal(np.asarray(mh), np.asarray(md))
    np.testing.assert_array_equal(np.asarray(lh), np.asarray(ld))
    np.testing.assert_array_equal(np.asarray(ih)[erased],
                                  np.asarray(id_)[erased])
    # and the tables actually decode
    k = n // 2
    data = rand_field(field, (k, 3))
    cw = np.asarray(rs.encode(jnp.asarray(data), field, n))
    garbled = cw.copy()
    garbled[erased] = rand_field(field, (e, 3))
    out = np.asarray(dec.decode_prepared_jit(
        jnp.asarray(garbled), md, ld, id_, field))
    np.testing.assert_array_equal(out, cw)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
@pytest.mark.parametrize("t", [1, 2, 7, 31])
def test_locate_and_correct_unknown_errors(field, t):
    """Unknown-position error correction: corrupt t <= (n-k)/2 random
    rows (no erasure information at all), locate them via the
    Berlekamp-Massey syndrome pipeline, and recover exactly."""
    n, k, lanes = 256, 128, 5
    data = rand_field(field, (k, lanes))
    cw = np.asarray(rs.encode(jnp.asarray(data), field, n))
    rng = np.random.default_rng(100 + t)
    pos = np.sort(rng.choice(n, size=t, replace=False))
    bad = cw.copy()
    # ensure every corrupted row actually differs (add 1 mod p)
    bad[pos] = (bad[pos].astype(np.uint64) + 1) % field.p
    located = dec.locate_errors(jnp.asarray(bad), k, field)
    np.testing.assert_array_equal(located, pos)
    fixed, fpos = dec.correct_errors(jnp.asarray(bad), k, field)
    np.testing.assert_array_equal(np.asarray(fixed), cw)
    np.testing.assert_array_equal(fpos, pos)


def test_locate_errors_clean_codeword():
    n, k, lanes = 128, 64, 3
    data = rand_field(GF32, (k, lanes))
    cw = rs.encode(jnp.asarray(data), GF32, n)
    located = dec.locate_errors(cw, k, GF32)
    assert located is not None and located.size == 0
    fixed, pos = dec.correct_errors(cw, k, GF32)
    assert pos.size == 0
    np.testing.assert_array_equal(np.asarray(fixed), np.asarray(cw))


def test_correct_errors_beyond_capacity_fails_loudly():
    """More than (n-k)/2 corrupted rows must raise, not mis-correct."""
    n, k, lanes = 128, 64, 3
    data = rand_field(GF32, (k, lanes))
    cw = np.asarray(rs.encode(jnp.asarray(data), GF32, n))
    rng = np.random.default_rng(9)
    pos = np.sort(rng.choice(n, size=(n - k) // 2 + 5, replace=False))
    bad = cw.copy()
    bad[pos] = (bad[pos].astype(np.uint64) + 3) % GF32.p
    with pytest.raises(ValueError):
        dec.correct_errors(jnp.asarray(bad), k, GF32)


def test_correct_errors_at_exact_capacity():
    """t == (n-k)/2 is the information-theoretic limit and must work."""
    n, k, lanes = 128, 64, 4
    t = (n - k) // 2
    data = rand_field(GF32, (k, lanes))
    cw = np.asarray(rs.encode(jnp.asarray(data), GF32, n))
    rng = np.random.default_rng(77)
    pos = np.sort(rng.choice(n, size=t, replace=False))
    bad = cw.copy()
    bad[pos] = rand_field(GF32, (t, lanes))
    # regenerated rows might coincide with the original by chance on a
    # lane; the LOCATOR must still find exactly the rows that differ
    diff = np.nonzero((bad != cw).any(axis=1))[0]
    fixed, fpos = dec.correct_errors(jnp.asarray(bad), k, GF32)
    np.testing.assert_array_equal(fpos, diff)
    np.testing.assert_array_equal(np.asarray(fixed), cw)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
def test_errors_and_erasures_combined(field):
    """Full e + 2t <= n-k capacity: e known-lost rows AND t unknown
    corrupted rows recovered together."""
    n, k, lanes = 256, 128, 4
    e, t = 100, 14                      # 100 + 2*14 = 128 = n - k
    data = rand_field(field, (k, lanes))
    cw = np.asarray(rs.encode(jnp.asarray(data), field, n))
    rng = np.random.default_rng(5)
    both = rng.choice(n, size=e + t, replace=False)
    erased, errs = np.sort(both[:e]), np.sort(both[e:])
    bad = cw.copy()
    bad[erased] = rand_field(field, (e, lanes))   # garbage (declared lost)
    bad[errs] = (bad[errs].astype(np.uint64) + 1) % field.p  # silent
    fixed, pos = dec.correct_errors(jnp.asarray(bad), k, field,
                                    erased=erased)
    np.testing.assert_array_equal(pos, errs)
    np.testing.assert_array_equal(np.asarray(fixed), cw)


def test_errors_and_erasures_beyond_capacity():
    n, k, lanes = 128, 64, 3
    e, t = 50, 10                       # 50 + 20 > 64
    data = rand_field(GF32, (k, lanes))
    cw = np.asarray(rs.encode(jnp.asarray(data), GF32, n))
    rng = np.random.default_rng(6)
    both = rng.choice(n, size=e + t, replace=False)
    erased, errs = np.sort(both[:e]), np.sort(both[e:])
    bad = cw.copy()
    bad[erased] = 0
    bad[errs] = (bad[errs].astype(np.uint64) + 9) % GF32.p
    with pytest.raises(ValueError):
        dec.correct_errors(jnp.asarray(bad), k, GF32, erased=erased)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
def test_decode_prepared_unmerged_rows(field):
    """merge=False must equal the merged decode at every ERASED row."""
    n, k, lanes = 128, 64, 4
    data = rand_field(field, (k, lanes))
    cw = np.asarray(rs.encode(jnp.asarray(data), field, n))
    erased = np.sort(RNG.choice(n, size=40, replace=False))
    garbled = cw.copy()
    garbled[erased] = rand_field(field, (40, lanes))
    targs = dec.prepare_decode_tables(erased, n, field)
    merged = np.asarray(dec.decode_prepared_jit(
        jnp.asarray(garbled), *targs, field))
    raw = np.asarray(dec.decode_prepared_jit(
        jnp.asarray(garbled), *targs, field, merge=False))
    np.testing.assert_array_equal(raw[erased], merged[erased])
    np.testing.assert_array_equal(merged, cw)


# ---------------------------------------------------------------------------
# Berlekamp-Massey: vectorized numpy vs literal pure-Python transcription.
# ---------------------------------------------------------------------------

def _bm_reference(s, p):
    """Literal transcription of the (slow) pure-Python BM the vectorized
    decode._berlekamp_massey replaced — the equivalence oracle."""
    c, b = [1], [1]
    L, m, bb = 0, 1, 1
    for r in range(len(s)):
        d = 0
        for i in range(L + 1):
            d = (d + c[i] * s[r - i]) % p
        if d == 0:
            m += 1
        elif 2 * L <= r:
            t0 = list(c)
            coef = d * pow(bb, p - 2, p) % p
            c = c + [0] * (len(b) + m - len(c))
            for i, bi in enumerate(b):
                c[i + m] = (c[i + m] - coef * bi) % p
            L, b, bb, m = r + 1 - L, t0, d, 1
        else:
            coef = d * pow(bb, p - 2, p) % p
            c = c + [0] * max(0, len(b) + m - len(c))
            for i, bi in enumerate(b):
                c[i + m] = (c[i + m] - coef * bi) % p
            m += 1
    return c[: L + 1]


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
@pytest.mark.parametrize("kind", ["random", "lfsr", "zeros-prefix"])
def test_berlekamp_massey_matches_reference(field, kind):
    """The vectorized numpy BM must equal the pure-Python original on
    random sequences, genuine short-LFSR sequences, and sequences with
    leading zeros (the degenerate branch order matters)."""
    rng = np.random.default_rng(hash((field.p, kind)) & 0xFFFF)
    p = field.p
    for trial in range(8):
        w = int(rng.integers(4, 160))
        if kind == "random":
            s = rng.integers(0, p, size=w, dtype=np.uint64)
        elif kind == "lfsr":
            t = int(rng.integers(1, max(2, w // 3)))
            lam = rng.integers(0, p, size=t, dtype=np.uint64)
            s = np.zeros(w, dtype=np.uint64)
            s[:t] = rng.integers(0, p, size=t, dtype=np.uint64)
            for r in range(t, w):
                acc = 0
                for i in range(t):
                    acc = (acc + int(lam[i]) * int(s[r - 1 - i])) % p
                s[r] = acc
        else:
            s = rng.integers(0, p, size=w, dtype=np.uint64)
            s[: int(rng.integers(0, w // 2 + 1))] = 0
        got = dec._berlekamp_massey(s, p)
        want = _bm_reference([int(v) for v in s], p)
        assert [int(v) for v in got] == [v % p for v in want], (
            f"{kind} trial {trial} w={w}")


def test_berlekamp_massey_full_window_fast():
    """The _BM_MAX worst case (random sequence, L grows to w/2) must be
    sub-interactive — the round-2 weakness was a ~20 s pure-Python stall
    on exactly this path. Generous bound for shared-CI machines."""
    import time
    rng = np.random.default_rng(3)
    s = rng.integers(0, GF32.p, size=dec._BM_MAX, dtype=np.uint64)
    t0 = time.perf_counter()
    lam = dec._berlekamp_massey(s, GF32.p)
    dt = time.perf_counter() - t0
    assert lam.shape[0] - 1 == dec._BM_MAX // 2
    assert dt < 15.0, f"BM at window {dec._BM_MAX} took {dt:.1f}s"


def test_locate_errors_survives_fixed_combo_annihilation():
    """Adversarial combo annihilation (round-2 verdict weak #4): craft
    corruption whose lane combination vanishes under BOTH of the
    formerly-fixed combo seeds (0xE0C / 0x5EED). With fixed seeds this
    corruption was invisible to locate_errors (correct_errors then
    raised 'inconsistent but nothing located'); with entropy-seeded
    combos it must be located and corrected."""
    n, k, lanes = 128, 64, 8
    field = GF32
    p = field.p
    data = rand_field(field, (k, lanes))
    cw = np.asarray(rs.encode(jnp.asarray(data), field, n))

    # the exact combo generation the old fixed-seed code used
    old1 = np.random.default_rng(0xE0C).integers(
        1, p, size=lanes, dtype=np.uint64)
    old2 = np.random.default_rng(0x5EED).integers(
        1, p, size=lanes, dtype=np.uint64)
    # one corrupt row, three touched lanes: solve the 2x3 null space
    # a1*e0 + a2*e1 + a3*e2 = 0 and b1*e0 + b2*e1 + b3*e2 = 0 with e2 = 1
    a1, a2, a3 = (int(old1[i]) for i in range(3))
    b1, b2, b3 = (int(old2[i]) for i in range(3))
    det = (a1 * b2 - a2 * b1) % p
    assert det != 0
    inv_det = pow(det, p - 2, p)
    e0 = (-(a3 * b2 - a2 * b3)) * inv_det % p
    e1 = (-(a1 * b3 - a3 * b1)) * inv_det % p
    e2 = 1
    assert (a1 * e0 + a2 * e1 + a3 * e2) % p == 0
    assert (b1 * e0 + b2 * e1 + b3 * e2) % p == 0
    row = 37
    bad = cw.copy()
    for lane, err in ((0, e0), (1, e1), (2, e2)):
        bad[row, lane] = (int(bad[row, lane]) + err) % p
    assert (bad[row] != cw[row]).any()

    # sanity: under the OLD fixed combos this corruption is invisible —
    # the lane combo commutes with the per-lane iNTT, so zero combined
    # error rows mean identically-zero syndrome sequences
    err_cw = (bad.astype(np.int64) - cw.astype(np.int64)) % p
    for combo in (old1, old2):
        syn = (err_cw.astype(np.uint64) * combo[None, :] % p).sum(
            axis=1) % p
        assert not syn.any(), "construction failed to annihilate"

    located = dec.locate_errors(jnp.asarray(bad), k, field)
    assert located is not None
    np.testing.assert_array_equal(located, [row])
    fixed, pos = dec.correct_errors(jnp.asarray(bad), k, field)
    np.testing.assert_array_equal(np.asarray(fixed), cw)
    np.testing.assert_array_equal(pos, [row])


def test_locate_errors_reproducible_entropy():
    """entropy= pins the combo draw for reproducible runs."""
    n, k, lanes = 128, 64, 4
    data = rand_field(GF32, (k, lanes))
    cw = np.asarray(rs.encode(jnp.asarray(data), GF32, n))
    bad = cw.copy()
    bad[5] = (bad[5].astype(np.uint64) + 1) % GF32.p
    a = dec.locate_errors(jnp.asarray(bad), k, GF32, entropy=42)
    b = dec.locate_errors(jnp.asarray(bad), k, GF32, entropy=42)
    np.testing.assert_array_equal(a, [5])
    np.testing.assert_array_equal(a, b)


def test_survivors_to_codeword_rejects_out_of_range_positions():
    """A negative survivor key would WRAP via numpy fancy indexing and
    silently overwrite a real row (found in review) — must raise."""
    import pytest

    from fastecc_tpu import decode as dec
    from fastecc_tpu.fields import GF32
    from fastecc_tpu import packing

    blob = bytes(packing.parity_bytes(GF32))
    with pytest.raises(ValueError, match="outside"):
        dec.survivors_to_codeword({-1: blob}, 8, 4, GF32)
    with pytest.raises(ValueError, match="outside"):
        dec.survivors_to_codeword({8: blob}, 8, 4, GF32)


def test_decode_stream_guards_over_capacity():
    """decode_stream(k=...) must refuse e > n-k loudly like the in-core
    paths (it previously streamed garbage silently)."""
    import pytest

    from fastecc_tpu import decode as dec
    from fastecc_tpu.fields import GF32

    cw = np.zeros((8, 4), np.uint32)
    with pytest.raises(AssertionError, match="recover"):
        dec.decode_stream(cw, np.arange(5, dtype=np.uint32), GF32, k=4)


def test_adversarial_suite_patterns_are_distinct():
    """Every named pattern in the fault-injection suite must be a
    DISTINCT erasure set (found in review: 'stride' duplicated
    'all_data' for every rate-1/2 shape)."""
    from fastecc_tpu.testing import adversarial_suite

    suite = adversarial_suite(16, 8)
    seen = {}
    for name, pos in suite:
        key = tuple(int(x) for x in pos)
        assert key not in seen, f"{name} duplicates {seen[key]}"
        seen[key] = name
