"""Distributed four-step NTT on 8 virtual devices (SURVEY.md §4 item 3).

Exercises the real shard_map/all_to_all path ([BASELINE] configs :8/:11
pattern) without TPU hardware, cross-checked bit-exactly against the
single-chip Stockham transform, plus lowering asserts that the collectives
actually appear.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastecc_tpu import rs
from fastecc_tpu.fields import GF16, GF32
from fastecc_tpu.ntt import intt, ntt
from fastecc_tpu.parallel import make_mesh
from fastecc_tpu.parallel.ntt_dist import (
    encode_parity_sharded_jit, ntt_sharded, ntt_sharded_jit)

RNG = np.random.default_rng(0xD157)


def rand_field(field, shape):
    return RNG.integers(0, field.p, size=shape, dtype=np.uint64).astype(
        np.uint32)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
@pytest.mark.parametrize("d,b", [(2, 1), (4, 2), (8, 1)])
@pytest.mark.parametrize("inverse", [False, True])
def test_ntt_sharded_matches_single(field, d, b, inverse):
    mesh = make_mesh(d, b)
    n, lanes = 1 << 8, 8
    x = rand_field(field, (n, lanes))
    want = np.asarray(ntt(jnp.asarray(x), field, inverse=inverse))
    got = np.asarray(
        ntt_sharded_jit(jnp.asarray(x), field, mesh, inverse=inverse))
    np.testing.assert_array_equal(got, want)


def test_ntt_sharded_d1_passthrough():
    mesh = make_mesh(1, 8)
    x = rand_field(GF32, (64, 16))
    got = np.asarray(ntt_sharded_jit(jnp.asarray(x), GF32, mesh))
    np.testing.assert_array_equal(got, np.asarray(ntt(jnp.asarray(x), GF32)))


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
def test_encode_parity_sharded_matches_single(field):
    mesh = make_mesh(4, 2)
    k, lanes = 1 << 8, 8
    data = rand_field(field, (k, lanes))
    want = np.asarray(rs.encode_parity_jit(jnp.asarray(data), field))
    got = np.asarray(
        encode_parity_sharded_jit(jnp.asarray(data), field, mesh))
    np.testing.assert_array_equal(got, want)


def test_sharded_roundtrip():
    mesh = make_mesh(8, 1)
    x = rand_field(GF32, (1 << 10, 4))
    xj = jnp.asarray(x)
    y = ntt_sharded_jit(xj, GF32, mesh)
    back = np.asarray(ntt_sharded_jit(y, GF32, mesh, inverse=True))
    np.testing.assert_array_equal(back, x)


def test_lowering_contains_all_to_all():
    """Golden-text assert: the collective really is in the compiled module
    (SURVEY.md §4: jit(...).lower().as_text() collective placement)."""
    mesh = make_mesh(4, 2)
    x = jnp.asarray(rand_field(GF32, (1 << 8, 8)))
    txt = jax.jit(
        lambda v: ntt_sharded(v, GF32, mesh)).lower(x).as_text()
    assert txt.count("all_to_all") >= 3, "expected 3 all_to_all collectives in HLO"


def test_mesh_too_small_for_split():
    """N < D^2 must fail loudly, not silently mis-shard."""
    mesh = make_mesh(8, 1)
    x = jnp.asarray(rand_field(GF32, (16, 4)))
    with pytest.raises(AssertionError, match="divide"):
        ntt_sharded(x, GF32, mesh)
