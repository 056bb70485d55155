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


@pytest.mark.parametrize("trial", range(8))
def test_fuzz_errors_and_erasures(trial):
    """Random (field, n, e, t) within e + 2t <= n-k: correct_errors must
    recover exactly and report exactly the genuinely-corrupt rows."""
    field = (GF32, GF16)[trial % 2]
    lg_k = int(RNG.integers(3, 7))
    k = 1 << lg_k
    n = 2 * k
    lanes = int(RNG.integers(1, 6))
    cap = n - k
    e = int(RNG.integers(0, cap))
    t = int(RNG.integers(0 if e else 1, (cap - e) // 2 + 1)) \
        if (cap - e) >= 2 or e == 0 else 0
    if e + 2 * t > cap or (e == 0 and t == 0):
        t = max(1, t)
        e = min(e, cap - 2 * t)
    data = rand_field(field, (k, lanes))
    cw = np.asarray(rs.encode(jnp.asarray(data), field, n))
    both = RNG.choice(n, size=e + t, replace=False)
    erased = np.sort(both[:e]) if e else None
    errs = np.sort(both[e:])
    bad = cw.copy()
    if e:
        bad[erased] = rand_field(field, (e, lanes))
    if t:
        bad[errs] = (bad[errs].astype(np.uint64) + trial + 1) % field.p
    fixed, pos = dec.correct_errors(jnp.asarray(bad), k, field,
                                    erased=erased)
    np.testing.assert_array_equal(np.asarray(fixed), cw,
                                  err_msg=f"trial {trial} "
                                          f"(e={e}, t={t}, n={n})")
    np.testing.assert_array_equal(pos, errs)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
def test_update_parity_multi_matches_reencode(field):
    """Batched incremental parity update == full re-encode."""
    k, n, lanes = 32, 64, 7
    data = rand_field(field, (k, lanes))
    par = rs.encode_parity(jnp.asarray(data), field, n)
    idxs = (3, 17, 30)
    new = data.copy()
    news = rand_field(field, (len(idxs), lanes))
    olds = np.stack([data[i] for i in idxs])
    for j, i in enumerate(idxs):
        new[i] = news[j]
    got = np.asarray(rs.update_parity_multi_jit(
        par, idxs, jnp.asarray(olds), jnp.asarray(news), field, n))
    want = np.asarray(rs.encode_parity(jnp.asarray(new), field, n))
    np.testing.assert_array_equal(got, want)
