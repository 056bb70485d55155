"""RS encoder vs. the executable spec (SURVEY.md Appendix B) + golden pins.

Covers [BASELINE] config :7 (2^10+2^10 blocks x 4KB, GF(0xFFF00001),
CPU-runnable) and config :9 (GF(0x10001) variant) at the field level, plus
the systematic property, the coset fast path vs. the padded-NTT oracle, and
a polynomial-evaluation bigint oracle at small sizes.
"""

import hashlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastecc_tpu import packing, rs
from fastecc_tpu.fields import GF16, GF32
from fastecc_tpu.ntt import naive_dft

RNG = np.random.default_rng(0x5EED)


def rand_field(field, shape):
    return RNG.integers(0, field.p, size=shape, dtype=np.uint64).astype(
        np.uint32)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
@pytest.mark.parametrize("k,n", [(8, 16), (8, 32), (16, 64)])
def test_encode_vs_bigint_poly_eval(field, k, n):
    """codeword[j] must equal f(w_n^j) where f interpolates the data."""
    data = rand_field(field, (k, 2))
    cw = np.asarray(rs.encode_jit(jnp.asarray(data), field, n))
    coeffs = naive_dft(data, field, inverse=True).astype(object)
    w = field.root_of_order(n)
    for j in range(n):
        x = field.pow_host(w, j)
        want = np.zeros(2, dtype=object)
        xm = 1
        for m in range(k):
            want = (want + coeffs[m] * xm) % field.p
            xm = (xm * x) % field.p
        np.testing.assert_array_equal(cw[j], want.astype(np.uint32))


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
@pytest.mark.parametrize("k,n", [(8, 16), (64, 128), (256, 512), (64, 256)])
def test_systematic_property(field, k, n):
    """codeword[(n/k)*i] == data[i] (Appendix B; evens for n=2k)."""
    data = rand_field(field, (k, 3))
    cw = np.asarray(rs.encode_jit(jnp.asarray(data), field, n))
    np.testing.assert_array_equal(cw[rs.data_positions(n, k)], data)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
@pytest.mark.parametrize("k,n", [(8, 16), (256, 512), (64, 256)])
def test_coset_parity_matches_full_encode(field, k, n):
    """The interleaved fast encode must equal the independent padded-NTT
    pipeline (the reference RS.cpp structure) row for row."""
    data = rand_field(field, (k, 2))
    cw = np.asarray(rs.encode_jit(jnp.asarray(data), field, n))
    padded = np.asarray(jax.jit(
        rs.encode_padded, static_argnames=("field", "n"))(
            jnp.asarray(data), field, n))
    np.testing.assert_array_equal(cw, padded)
    par = np.asarray(rs.encode_parity_jit(jnp.asarray(data), field, n))
    np.testing.assert_array_equal(par, cw[rs.parity_positions(n, k)])


def test_config7_shape_gf32():
    """[BASELINE] config :7 at full block count (lanes thinned for CPU)."""
    k = 1 << 10
    data = rand_field(GF32, (k, 8))
    cw = np.asarray(rs.encode_jit(jnp.asarray(data), GF32, 2 * k))
    np.testing.assert_array_equal(cw[0::2], data)
    assert cw.shape == (2 * k, 8)


def test_config9_shape_gf16():
    """[BASELINE] config :9: GF(0x10001), 2^14 blocks (lanes thinned)."""
    k = 1 << 13
    data = rand_field(GF16, (k, 4))
    cw = np.asarray(rs.encode_jit(jnp.asarray(data), GF16, 1 << 14))
    np.testing.assert_array_equal(cw[0::2], data)


def test_encode_blocks_wire_format():
    """Raw 4KB blocks -> parity bytes, with adversarial escape content."""
    k = 16
    raw = RNG.integers(0, 256, size=(k, 4096), dtype=np.uint16).astype(np.uint8)
    raw[0, :] = 0xFF  # all-0xFFFFFFFF words force the escape path
    parity = np.asarray(rs.encode_blocks_jit(jnp.asarray(raw), GF32))
    assert parity.shape == (k, packing.parity_bytes(GF32))
    # parity deserializes to valid field elements
    pf = np.asarray(packing.deserialize_parity(jnp.asarray(parity), GF32))
    assert pf.max() < GF32.p
    # and equals the field-domain parity of the packed data
    fields = packing.pack_data(jnp.asarray(raw), GF32)
    want = np.asarray(rs.encode_parity_jit(fields, GF32))
    np.testing.assert_array_equal(pf, want)
    # parts form (u32 byte-images end to end — the bench/serving path,
    # free host reinterpretation on both sides)
    words = jnp.asarray(np.ascontiguousarray(raw).view(np.uint32))
    parts = np.asarray(rs.encode_blocks_parts_jit(words, GF32, 2 * k))
    np.testing.assert_array_equal(
        np.ascontiguousarray(parts).view(np.uint8), parity)


# ---------------------------------------------------------------------------
# Golden pins: canonical byte-exact outputs under the pinned conventions
# (SURVEY.md §0: with the reference mount empty, Appendix A constants + the
# Appendix B scheme define bit-exactness; these hashes freeze it).
# ---------------------------------------------------------------------------

GOLDEN = {
    "GF32": "edf67c1247ff14ab94dd84ec24f200b7b40c9b65814b764ab29e7bc4494101e2",
    "GF16": "6a407726e3d6a7ee6501f145b3dcf4be91ecb2871357991b466357ee0f472fae",
}


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
def test_golden_codeword_hash(field):
    k, lanes = 64, 4
    # deterministic data: d[i, l] = (i * 1_000_003 + l * 7919 + 1) mod p
    i = np.arange(k, dtype=np.uint64)[:, None]
    l = np.arange(lanes, dtype=np.uint64)[None, :]
    data = ((i * 1000003 + l * 7919 + 1) % field.p).astype(np.uint32)
    cw = np.asarray(rs.encode_jit(jnp.asarray(data), field, 2 * k))
    digest = hashlib.sha256(cw.tobytes()).hexdigest()
    if GOLDEN[field.name] == "PENDING":
        pytest.skip(f"golden for {field.name}: {digest}")
    assert digest == GOLDEN[field.name]


def test_lane_chunks_bit_identical():
    """Sequential lane chunking must not change a single bit."""
    data = rand_field(GF32, (64, 16))
    full = np.asarray(rs.encode_parity_jit(jnp.asarray(data), GF32))
    chunked = np.asarray(
        rs.encode_parity_jit(jnp.asarray(data), GF32, lane_chunks=4))
    np.testing.assert_array_equal(chunked, full)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
def test_stream_encode_bit_identical(field):
    """Out-of-core lane streaming must equal the one-shot encode."""
    k, lanes = 1 << 6, 48
    data = rand_field(field, (k, lanes))
    want = np.asarray(rs.encode_parity_jit(jnp.asarray(data), field))
    got = rs.encode_parity_stream(data, field, chunk_lanes=16)
    np.testing.assert_array_equal(got, want)
    # chunk wider than L: single chunk path
    got1 = rs.encode_parity_stream(data, field, chunk_lanes=1024)
    np.testing.assert_array_equal(got1, want)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
@pytest.mark.parametrize("n,k", [(32, 16), (64, 16)])
def test_update_parity_matches_reencode(field, n, k):
    """Rank-1 incremental parity update == full re-encode (linearity)."""
    lanes = 5
    data = rand_field(field, (k, lanes))
    parity = rs.encode_parity_jit(jnp.asarray(data), field, n)
    for i in (0, 3, k - 1):
        new_row = rand_field(field, (lanes,))
        upd = np.asarray(rs.update_parity(
            parity, i, data[i], new_row, field, n))
        data2 = data.copy()
        data2[i] = new_row
        want = np.asarray(rs.encode_parity_jit(jnp.asarray(data2), field, n))
        np.testing.assert_array_equal(upd, want)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
def test_verify_codeword(field):
    k, lanes = 64, 4
    data = rand_field(field, (k, lanes))
    cw = rs.encode_jit(jnp.asarray(data), field, 2 * k)
    assert bool(rs.verify_codeword(cw, field, k))
    bad = np.asarray(cw).copy()
    bad[7, 2] ^= 1
    assert not bool(rs.verify_codeword(jnp.asarray(bad), field, k))


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
def test_batch_encode_matches_per_stripe(field):
    s, k, lanes = 3, 32, 5
    data = rand_field(field, (s, k, lanes))
    got = np.asarray(rs.encode_parity_batch_jit(jnp.asarray(data), field))
    for i in range(s):
        want = np.asarray(rs.encode_parity_jit(jnp.asarray(data[i]), field))
        np.testing.assert_array_equal(got[i], want)


def test_update_parity_multi_empty_is_noop():
    """An empty index tuple must return the parity unchanged (public
    API edge; regressed once when the loop became np.stack)."""
    import jax.numpy as jnp

    from fastecc_tpu import rs
    from fastecc_tpu.fields import GF32

    data = jnp.asarray(RNG.integers(0, GF32.p, size=(8, 4),
                                    dtype=np.uint64).astype(np.uint32))
    parity = rs.encode_parity(data, GF32, 16)
    out = rs.update_parity_multi(parity, (), data[0:0], data[0:0], GF32, 16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(parity))
