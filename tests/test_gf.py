"""GF(p) arithmetic vs. Python bigint oracle (SURVEY.md §4: unit tier).

Mirrors the reference's implicit GF verification (its `ntt` binary 'b' mode
benchmarks/checks GF_Mul variants against each other); here the oracle is
exact bigint arithmetic, which is stronger.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fastecc_tpu import gf
from fastecc_tpu.fields import GF16, GF32

RNG = np.random.default_rng(0xFA57ECC)


def rand_elems(field, n):
    hi = field.p if field.use_mont else field.p  # elements in [0, p)
    return RNG.integers(0, hi, size=n, dtype=np.uint64).astype(np.uint32)


def edge_elems(field):
    vals = [0, 1, 2, field.p - 1, field.p - 2, field.p // 2,
            (1 << 16) - 1, 1 << 16, (1 << 16) + 1]
    if field.use_mont:
        vals += [field.r_mod_p, field.r2_mod_p, (1 << 31), (1 << 32) - (1 << 20)]
    vals = [v % field.p for v in vals]
    return np.array(vals, dtype=np.uint32)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
class TestGF:
    def _pairs(self, field, n=20000):
        a = np.concatenate([rand_elems(field, n), edge_elems(field)])
        b = np.concatenate([rand_elems(field, n), edge_elems(field)[::-1]])
        m = min(len(a), len(b))
        return a[:m], b[:m]

    def test_add(self, field):
        a, b = self._pairs(field)
        got = np.asarray(gf.add(field, jnp.asarray(a), jnp.asarray(b)))
        want = (a.astype(np.uint64) + b.astype(np.uint64)) % field.p
        np.testing.assert_array_equal(got, want.astype(np.uint32))

    def test_sub(self, field):
        a, b = self._pairs(field)
        got = np.asarray(gf.sub(field, jnp.asarray(a), jnp.asarray(b)))
        want = (a.astype(np.int64) - b.astype(np.int64)) % field.p
        np.testing.assert_array_equal(got, want.astype(np.uint32))

    def test_neg(self, field):
        a, _ = self._pairs(field)
        got = np.asarray(gf.neg(field, jnp.asarray(a)))
        want = (-a.astype(np.int64)) % field.p
        np.testing.assert_array_equal(got, want.astype(np.uint32))

    def test_mul(self, field):
        a, b = self._pairs(field)
        got = np.asarray(gf.mul(field, jnp.asarray(a), jnp.asarray(b)))
        want = (a.astype(object) * b.astype(object)) % field.p
        np.testing.assert_array_equal(got, want.astype(np.uint32))

    def test_pow_inv(self, field):
        a, _ = self._pairs(field, n=2000)
        a = a[a != 0]
        ai = np.asarray(gf.inv(field, jnp.asarray(a)))
        prod = np.asarray(gf.mul(field, jnp.asarray(a), jnp.asarray(ai)))
        np.testing.assert_array_equal(prod, np.ones_like(a))
        # a^5 vs oracle
        got5 = np.asarray(gf.pow_const(field, jnp.asarray(a), 5))
        want5 = np.array([pow(int(x), 5, field.p) for x in a], dtype=np.uint32)
        np.testing.assert_array_equal(got5, want5)


def test_mont_roundtrip():
    a = np.concatenate([rand_elems(GF32, 20000), edge_elems(GF32)])
    am = gf.to_mont(GF32, jnp.asarray(a))
    back = np.asarray(gf.from_mont(GF32, am))
    np.testing.assert_array_equal(back, a)
    # to_mont matches host-side definition
    np.testing.assert_array_equal(
        np.asarray(am),
        np.array([(int(x) << 32) % GF32.p for x in a], dtype=np.uint32))


def test_mont_mul_is_scaled_mul():
    """mont_mul(x, c*R mod p) == x*c mod p — the twiddle hot path."""
    x = rand_elems(GF32, 5000)
    c = rand_elems(GF32, 5000)
    c_scaled = gf.to_mont(GF32, jnp.asarray(c))
    got = np.asarray(gf.mont_mul(GF32, jnp.asarray(x), c_scaled))
    want = (x.astype(object) * c.astype(object)) % GF32.p
    np.testing.assert_array_equal(got, want.astype(np.uint32))


def test_gf16_full_domain_mul():
    """GF16 includes the awkward element 0x10000 = -1 (SURVEY C14)."""
    a = np.array([0x10000, 0x10000, 1, 0x10000, 12345], dtype=np.uint32)
    b = np.array([0x10000, 1, 0x10000, 65535, 0x10000], dtype=np.uint32)
    got = np.asarray(gf.mul(GF16, jnp.asarray(a), jnp.asarray(b)))
    want = (a.astype(object) * b.astype(object)) % GF16.p
    np.testing.assert_array_equal(got, want.astype(np.uint32))


def test_field_constants():
    """Canonical constants from SURVEY.md Appendix A."""
    assert GF32.p == 0xFFF00001 and GF32.g == 19
    assert GF32.root_of_order(1 << 20) == 0xBC26110E
    assert GF32.n_prime == 0xFFEFFFFF and GF32.r2_mod_p == 0x0FDFFF01
    assert GF16.p == 0x10001 and GF16.root_of_order(1 << 16) == 3
    # root chain consistency: w_{2k}^2 == w_k
    for f in (GF32, GF16):
        for lg in range(1, f.max_log2):
            w2 = f.root_of_order(1 << (lg + 1))
            assert (w2 * w2) % f.p == f.root_of_order(1 << lg) % f.p


def test_generic_redc_branch_non_solinas_prime():
    """GF32's p takes the multiplier-free Solinas REDC; the generic
    n'-multiply branch must stay correct for other Montgomery moduli
    (exercised here with p = 3*2^30 + 1, a classic NTT prime)."""
    import jax.numpy as jnp
    from fastecc_tpu.fields import FieldSpec
    from fastecc_tpu import gf
    p = 3 * (1 << 30) + 1
    field = FieldSpec(
        name="GF_P3", p=p, bits=32, g=5, max_log2=30, use_mont=True,
        r_mod_p=(1 << 32) % p, r2_mod_p=(1 << 64) % p,
        n_prime=(-pow(p, -1, 1 << 32)) % (1 << 32))
    rng = np.random.default_rng(77)
    a = rng.integers(0, p, 100000, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, p, 100000, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(gf.mont_mul(field, jnp.asarray(a), jnp.asarray(b)))
    rinv = pow(1 << 32, p - 2, p)
    want = (a.astype(object) * b.astype(object) * rinv) % p
    assert (got.astype(object) == want).all()
    # full mul + add/sub round out the non-Solinas path
    gm = np.asarray(gf.mul(field, jnp.asarray(a), jnp.asarray(b)))
    assert (gm.astype(object) == (a.astype(object) * b) % p).all()
    ga = np.asarray(gf.add(field, jnp.asarray(a), jnp.asarray(b)))
    assert (ga.astype(object) == (a.astype(object) + b) % p).all()


def test_masksel_experimental_variants_match_reference():
    """The mask-arithmetic select experiments in kernels/microbench.py
    must be bit-identical to gf.add / gf.mont_mul (they are candidate
    replacements; equality is the precondition for ever swapping)."""
    import jax.numpy as jnp

    from fastecc_tpu import gf
    from fastecc_tpu.fields import GF32
    from fastecc_tpu.kernels.microbench import (_addmod_masksel,
                                                _mont_mul_masksel)
    rng = np.random.default_rng(0xA5)
    a = jnp.asarray(rng.integers(0, GF32.p, 4096, np.uint64).astype(
        np.uint32))
    b = jnp.asarray(rng.integers(0, GF32.p, 4096, np.uint64).astype(
        np.uint32))
    np.testing.assert_array_equal(np.asarray(_addmod_masksel(a, b)),
                                  np.asarray(gf.add(GF32, a, b)))
    np.testing.assert_array_equal(np.asarray(_mont_mul_masksel(a, b)),
                                  np.asarray(gf.mont_mul(GF32, a, b)))
    # edge values
    edges = jnp.asarray(np.array([0, 1, GF32.p - 1, 0xFFF, 0x1000,
                                  1 << 20, GF32.p - 2, 2], np.uint32))
    np.testing.assert_array_equal(
        np.asarray(_mont_mul_masksel(edges, edges[::-1])),
        np.asarray(gf.mont_mul(GF32, edges, edges[::-1])))


def test_mul_gf16_tw_matches_full_mul():
    """The escape-free butterfly multiply must equal _mul_gf16 for every
    a in [0, 0x10000] x every b in [0, 0x10000) — exhaustive on the
    boundary band plus dense random coverage (the b = 0x10000 column is
    excluded by contract: stage tables never contain -1)."""
    import numpy as np
    import jax.numpy as jnp
    from fastecc_tpu import gf

    rng = np.random.default_rng(0x16F)
    edge = np.array([0, 1, 2, 0xFFFF, 0x10000], dtype=np.uint32)
    a = np.concatenate([edge.repeat(5),
                        rng.integers(0, 0x10001, 4096, dtype=np.uint32)])
    b = np.concatenate([np.tile(edge, 5),
                        rng.integers(0, 0x10000, 4096, dtype=np.uint32)])
    b = np.where(b == 0x10000, 0xFFFF, b)      # contract: b < 2^16
    got = np.asarray(gf._mul_gf16_tw(jnp.asarray(a), jnp.asarray(b)))
    want = np.asarray(gf._mul_gf16(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(got, want)
    # bigint oracle too
    ref = (a.astype(object) * b.astype(object)) % 0x10001
    np.testing.assert_array_equal(got.astype(object), ref)


def test_gf16_stage_tables_are_escape_free():
    """The mul_prepared_tw contract: no stage table (radix-2 or radix-4,
    forward or inverse, any size) contains 0x10000. Checked exhaustively
    over every GF16 order."""
    import numpy as np
    from fastecc_tpu.fields import GF16
    from fastecc_tpu.ntt import _r4_twiddles, _stage_twiddles

    for t in range(1, GF16.max_log2 + 1):
        a = 1 << t
        for inv in (False, True):
            assert not (np.asarray(_stage_twiddles(GF16.name, a, inv))
                        == 0x10000).any(), (a, inv)
            if a >= 4:
                for tbl in _r4_twiddles(GF16.name, a, inv):
                    assert not (np.asarray(tbl) == 0x10000).any(), (a, inv)


def test_pow_const_zero_base_multiple_of_group_order():
    """0^(m*(p-1)) must be 0, not 1 (Fermat reduction is only valid for
    nonzero bases — found in review); nonzero bases still reduce."""
    import jax.numpy as jnp

    from fastecc_tpu import gf
    from fastecc_tpu.fields import GF16, GF32

    for field in (GF32, GF16):
        z = jnp.zeros(3, jnp.uint32)
        a = jnp.asarray([2, 3, 5], jnp.uint32)
        for mult in (1, 2):
            e = mult * (field.p - 1)
            assert int(gf.pow_const(field, z, e)[0]) == 0
            assert all(int(v) == 1 for v in gf.pow_const(field, a, e))
        assert int(gf.pow_const(field, z, 0)[0]) == 1   # 0^0 = 1 pinned
