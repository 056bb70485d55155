"""Randomized end-to-end property sweep (seeded, deterministic).

One test walks many random (field, k, n, lanes, erasure-count) configs
through the full array-level pipeline: encode -> garble an arbitrary
recoverable subset -> decode -> bit-exact. Complements the targeted
suites with coverage of odd shape combinations (non-2x expansion, tiny
lanes, maximal loss, both decode paths).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fastecc_tpu import decode as dec
from fastecc_tpu import rs
from fastecc_tpu.fields import GF16, GF32

RNG = np.random.default_rng(0xF022)


def rand_field(field, shape):
    return RNG.integers(0, field.p, size=shape, dtype=np.uint64).astype(
        np.uint32)


@pytest.mark.parametrize("trial", range(12))
def test_fuzz_roundtrip(trial):
    field = (GF32, GF16)[trial % 2]
    lg_k = int(RNG.integers(1, 7))
    k = 1 << lg_k
    c = int(RNG.choice([2, 4]))            # expansion factor n/k
    n = c * k
    lanes = int(RNG.integers(1, 9))
    e = int(RNG.integers(1, n - k + 1))    # up to maximal tolerable loss
    data = rand_field(field, (k, lanes))

    cw = np.asarray(rs.encode(jnp.asarray(data), field, n))
    # systematic property: data at stride-c positions
    np.testing.assert_array_equal(cw[rs.data_positions(n, k)], data)
    # parity rows match the coset fast path
    par = np.asarray(rs.encode_parity_jit(jnp.asarray(data), field, n))
    np.testing.assert_array_equal(cw[rs.parity_positions(n, k)], par)

    erased = np.sort(RNG.choice(n, size=e, replace=False))
    garbled = cw.copy()
    garbled[erased] = rand_field(field, (e, lanes))
    out_host = np.asarray(dec.decode_host_prepared(
        jnp.asarray(garbled), erased, field))
    np.testing.assert_array_equal(out_host, cw)
    if trial % 3 == 0:  # the all-device path is slower; sample it
        out_dev = np.asarray(dec.decode(
            jnp.asarray(garbled), jnp.asarray(erased), field))
        np.testing.assert_array_equal(out_dev, cw)
