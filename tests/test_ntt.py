"""NTT engine vs. naive-DFT oracle + roundtrip identities (SURVEY.md §4).

Mirrors the reference `ntt` binary's verify modes: fast-vs-slow compare at
small N, intt(ntt(x)) == x roundtrip at large N, and cross-checks between
algorithm variants (Stockham vs. four-step here; recursive vs. iterative vs.
MFA in the reference).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fastecc_tpu import ntt as nttmod
from fastecc_tpu.fields import GF16, GF32

RNG = np.random.default_rng(0x17771)


def rand_field(field, shape):
    return RNG.integers(0, field.p, size=shape, dtype=np.uint64).astype(
        np.uint32)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
@pytest.mark.parametrize("n", [2, 4, 8, 64, 256])
def test_ntt_vs_naive(field, n):
    x = rand_field(field, (n, 3))
    want = nttmod.naive_dft(x, field)
    got = np.asarray(nttmod.ntt_jit(jnp.asarray(x), field))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
@pytest.mark.parametrize("n", [4, 64, 256])
def test_intt_vs_naive(field, n):
    x = rand_field(field, (n, 2))
    want = nttmod.naive_dft(x, field, inverse=True)
    got = np.asarray(nttmod.intt_jit(jnp.asarray(x), field))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
@pytest.mark.parametrize("n", [1 << 10, 1 << 16])
def test_roundtrip_large(field, n):
    """intt(ntt(x)) == x at sizes the naive oracle can't reach."""
    x = rand_field(field, (n, 4))
    xj = jnp.asarray(x)
    back = np.asarray(nttmod.intt_jit(nttmod.ntt_jit(xj, field), field))
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
@pytest.mark.parametrize("n,c", [(16, 4), (64, 8), (1 << 10, 1 << 5),
                                 (1 << 12, 1 << 4)])
def test_four_step_matches_stockham(field, n, c):
    """Algorithm cross-check (reference: recursive vs iterative vs MFA)."""
    x = rand_field(field, (n, 2))
    xj = jnp.asarray(x)
    base = np.asarray(nttmod.ntt_jit(xj, field))
    mfa = np.asarray(nttmod.ntt_four_step_jit(xj, field, c_dim=c))
    np.testing.assert_array_equal(mfa, base)
    basei = np.asarray(nttmod.intt_jit(xj, field))
    mfai = np.asarray(nttmod.ntt_four_step_jit(xj, field, inverse=True, c_dim=c))
    np.testing.assert_array_equal(mfai, basei)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
@pytest.mark.parametrize("n", [2, 4, 8, 16, 64, 512, 1 << 10])
@pytest.mark.parametrize("inverse", [False, True])
def test_radix4_matches_radix2(field, n, inverse):
    """Radix-4 merged stages must be bit-exact vs the radix-2 path
    (SURVEY.md C8: the reference's radix-2/radix-4 decimation variants)."""
    x = jnp.asarray(rand_field(field, (n, 2)))
    want = np.asarray(nttmod.ntt(x, field, inverse=inverse))
    got = np.asarray(nttmod.ntt(x, field, inverse=inverse, radix=4))
    np.testing.assert_array_equal(got, want)


def test_ntt_linearity_and_impulse():
    """DFT of a delta at position j is the j-th twiddle row (spec anchor)."""
    field = GF32
    n = 32
    for j in (0, 1, 5):
        x = np.zeros((n, 1), np.uint32)
        x[j, 0] = 1
        got = np.asarray(nttmod.ntt_jit(jnp.asarray(x), field))[:, 0]
        w = field.root_of_order(n)
        want = nttmod.powers_host(field, field.pow_host(w, j), n)
        np.testing.assert_array_equal(got, want)


def test_ntt_size_1_and_bad_size():
    x = jnp.asarray(rand_field(GF32, (1, 3)))
    np.testing.assert_array_equal(np.asarray(nttmod.ntt(x, GF32)), x)
    with pytest.raises(AssertionError):
        nttmod.ntt(jnp.asarray(rand_field(GF32, (3, 2))), GF32)


def test_max_order_guard():
    """Transform order beyond 2^max_log2 must be rejected loudly."""
    with pytest.raises(AssertionError):
        GF16.root_of_order(1 << 17)
