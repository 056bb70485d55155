"""Pallas MFA kernel vs. Stockham, in interpreter mode (CPU-runnable).

The fused two-pass kernel must be bit-exact against ntt.ntt for both
fields, both directions, and with the fused coset pre-multiply
(SURVEY.md C3/C8/C9; the real-chip run is covered by bench.py and the
verification drill).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fastecc_tpu.fields import GF16, GF32
from fastecc_tpu.ntt import mul_prepared, ntt, powers_host, prepare_consts
from fastecc_tpu.kernels.ntt_mfa import _supported, ntt_pallas

RNG = np.random.default_rng(0xA11A5)


def rand_field(field, shape):
    return RNG.integers(0, field.p, size=shape, dtype=np.uint64).astype(
        np.uint32)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
@pytest.mark.parametrize("n", [1 << 7, 1 << 9, 1 << 10])
@pytest.mark.parametrize("inverse", [False, True])
@pytest.mark.parametrize("radix", [2, 4])
def test_pallas_matches_stockham(field, n, inverse, radix):
    x = jnp.asarray(rand_field(field, (n, 128)))
    want = np.asarray(ntt(x, field, inverse=inverse))
    got = np.asarray(ntt_pallas(x, field, inverse=inverse, interpret=True,
                                radix=radix))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
def test_pallas_fused_coset_premul(field):
    """pre_seed=g must equal an explicit x[m] *= g^m followed by the NTT."""
    n = 1 << 8
    x = jnp.asarray(rand_field(field, (n, 128)))
    g = field.root_of_order(2 * n)  # the RS coset seed
    pre = jnp.asarray(
        prepare_consts(field, powers_host(field, g, n))).reshape(n, 1)
    want = np.asarray(ntt(mul_prepared(field, x, pre), field))
    got = np.asarray(ntt_pallas(x, field, pre_seed=g, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_unscaled_inverse():
    n = 1 << 8
    x = jnp.asarray(rand_field(GF32, (n, 128)))
    want = np.asarray(ntt(x, GF32, inverse=True, scale=False))
    got = np.asarray(
        ntt_pallas(x, GF32, inverse=True, scale=False, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_supported_predicate():
    assert _supported(1 << 10, 1024)
    assert not _supported(1 << 10, 1088)   # packed GF32 lanes: jnp fallback
    assert not _supported(16, 128)         # R < 8


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
def test_pallas_fused_general_prevec(field):
    """pre_vec must equal an explicit x[m] *= v[m] followed by the NTT."""
    n = 1 << 8
    x = jnp.asarray(rand_field(field, (n, 128)))
    v = rand_field(field, (n,))
    vp = jnp.asarray(prepare_consts(field, v))
    want = np.asarray(ntt(mul_prepared(field, x, vp[:, None]), field))
    got = np.asarray(ntt_pallas(x, field, pre_vec=vp, interpret=True))
    np.testing.assert_array_equal(got, want)
    # inverse direction too (decode's first transform)
    wanti = np.asarray(ntt(mul_prepared(field, x, vp[:, None]), field,
                           inverse=True))
    goti = np.asarray(ntt_pallas(x, field, pre_vec=vp, inverse=True,
                                 interpret=True))
    np.testing.assert_array_equal(goti, wanti)
