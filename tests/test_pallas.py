"""Pallas MFA kernel vs. Stockham, in interpreter mode (CPU-runnable).

The fused two-pass kernel must be bit-exact against ntt.ntt for both
fields, both directions, and with the fused coset pre-multiply
(SURVEY.md C3/C8/C9; the real-chip run is covered by bench.py and the
verification drill).
"""

import numpy as np
import pytest

import jax
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


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
def test_pallas_fused_postvec(field):
    """post_vec must equal the NTT followed by an explicit out[k] *= v[k]."""
    n = 1 << 8
    x = jnp.asarray(rand_field(field, (n, 128)))
    v = rand_field(field, (n,))
    vp = jnp.asarray(prepare_consts(field, v))
    want = np.asarray(mul_prepared(field, ntt(x, field), vp[:, None]))
    got = np.asarray(ntt_pallas(x, field, post_vec=vp, interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
def test_pallas_fused_postvec_select(field):
    """post_vec + sel must equal NTT -> multiply -> where(mask, ., orig);
    the decode epilogue (Forney divide + erased-row merge) in one pass."""
    n = 1 << 8
    x = jnp.asarray(rand_field(field, (n, 128)))
    orig = jnp.asarray(rand_field(field, (n, 128)))
    v = rand_field(field, (n,))
    vp = jnp.asarray(prepare_consts(field, v))
    mask = jnp.asarray((RNG.integers(0, 2, size=n)).astype(np.uint32))
    prod = mul_prepared(field, ntt(x, field), vp[:, None])
    want = np.asarray(jnp.where((mask != 0)[:, None], prod, orig))
    got = np.asarray(ntt_pallas(x, field, post_vec=vp, sel_mask=mask,
                                sel_orig=orig, interpret=True))
    np.testing.assert_array_equal(got, want)
    # and combined with a pre_vec on the input side (the full decode shape)
    want2 = np.asarray(jnp.where(
        (mask != 0)[:, None],
        mul_prepared(field, ntt(mul_prepared(field, x, vp[:, None]), field),
                     vp[:, None]), orig))
    got2 = np.asarray(ntt_pallas(x, field, pre_vec=vp, post_vec=vp,
                                 sel_mask=mask, sel_orig=orig,
                                 interpret=True))
    np.testing.assert_array_equal(got2, want2)


def test_measure_peaks_key_contract():
    """measure_peaks() advertises that its dict can replace
    profiling.MEASURED_PEAKS_V5E wholesale, so its emitted key set must
    cover EVERY key of that table under the exact same names (the
    roofline keys and the diagnostic rows alike)."""
    from fastecc_tpu.kernels import microbench as mb
    from fastecc_tpu.utils import profiling

    emitted = {mb.peak_key(v) for v in mb._VARIANTS}
    emitted.add("hbm_stream_gbps")
    emitted |= set(mb._FUSED_CONFIGS)
    missing = set(profiling.MEASURED_PEAKS_V5E) - emitted
    assert not missing, f"measure_peaks never emits: {sorted(missing)}"


def test_microbench_chain_kernels_interpret():
    """Every microbench chain variant must equal its jnp reference (the
    peaks table is only as honest as the kernels are correct)."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fastecc_tpu.kernels import microbench as mb

    rows = mb._TS
    x = (jnp.arange(rows * mb._TL, dtype=jnp.uint32)
         & jnp.uint32(0xFFFF)).reshape(rows, mb._TL)
    z = ((jnp.arange(rows * mb._TL, dtype=jnp.uint32)
          * jnp.uint32(2654435761)) & jnp.uint32(0xFFFF)
         ).reshape(rows, mb._TL) | jnp.uint32(1)
    spec = pl.BlockSpec((mb._TS, mb._TL), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    for variant, step in mb._VARIANTS.items():
        out = pl.pallas_call(
            functools.partial(mb._chain_kernel, variant=variant, depth=3),
            grid=(1,),
            in_specs=[spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((rows, mb._TL), jnp.uint32),
            interpret=True)(x, z)
        zz = z[:, :1] if variant in mb._BCAST else z
        y = x
        for _ in range(3):
            y = step(y, zz)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(y),
                                      err_msg=variant)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
@pytest.mark.parametrize("c_dim", [None, 32, 64, 128])
def test_pallas_split_choices_bit_exact(field, c_dim):
    """Every legal C x R split (incl. the tuned default) must be
    bit-exact vs the staged transform."""
    n = 1 << 10
    x = jnp.asarray(rand_field(field, (n, 128)))
    want = np.asarray(ntt(x, field))
    got = np.asarray(ntt_pallas(x, field, interpret=True, c_dim=c_dim))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
@pytest.mark.parametrize("n", [1 << 7, 1 << 8, 1 << 10])
def test_seam_fused_coset_pair(field, n):
    """The 3-pass seam-fused encode pair (iNTT -> coset NTT with
    transform-1 pass B and transform-2 pass A fused over the
    swapped-split seam) must be bit-exact vs the two staged transforms
    — the RS encode fast path at rate 1/2 (rs.encode_parity)."""
    from fastecc_tpu.kernels.ntt_mfa import ntt_coset_pair_pallas

    x = jnp.asarray(rand_field(field, (n, 128)))
    g = field.root_of_order(2 * n)
    coeffs = ntt(x, field, inverse=True)
    pre = jnp.asarray(
        prepare_consts(field, powers_host(field, g, n))).reshape(n, 1)
    want = np.asarray(ntt(mul_prepared(field, coeffs, pre), field))
    # explicit tile pins the 3-pass seam path (the default dispatch
    # routes these small orders to the one-pass lanes form, tested
    # separately below)
    got = np.asarray(ntt_coset_pair_pallas(x, field, g, interpret=True,
                                           tile=(8, 128)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
@pytest.mark.parametrize("n", [1 << 7, 1 << 9])
def test_lanes_pair_matches_staged(field, n, monkeypatch):
    """The ONE-pass whole-column-resident encode pair (round-5
    directive 3 exploration — opt-in after the on-chip negative result,
    tools/onchip_r5_lanes.log) must be bit-exact vs the staged
    transforms, and the opt-in dispatch must route small shapes
    through it."""
    from fastecc_tpu.kernels import ntt_mfa

    x = jnp.asarray(rand_field(field, (n, 256)))
    g = field.root_of_order(2 * n)
    coeffs = ntt(x, field, inverse=True)
    pre = jnp.asarray(
        prepare_consts(field, powers_host(field, g, n))).reshape(n, 1)
    want = np.asarray(ntt(mul_prepared(field, coeffs, pre), field))
    got = np.asarray(ntt_mfa.ntt_pair_lanes_pallas(x, field, g,
                                                   interpret=True))
    np.testing.assert_array_equal(got, want)
    assert not ntt_mfa._pair_lanes_supported(n, 256)  # off by default
    monkeypatch.setattr(ntt_mfa, "LANES_PAIR_ENABLED", True)
    assert ntt_mfa._pair_lanes_supported(n, 256)
    got2 = np.asarray(ntt_mfa.ntt_coset_pair_pallas(x, field, g,
                                                    interpret=True))
    np.testing.assert_array_equal(got2, want)


def test_lanes_wire16_pair_matches_generic():
    """One-pass wire pair (lanes-resident) vs the generic pipeline,
    with real 0x10000 escapes in the parity."""
    from fastecc_tpu.kernels.ntt_mfa import ntt_pair_lanes_wire16_pallas
    k, block_bytes = 1 << 8, 4096
    raw = np.random.default_rng(0).integers(0, 256, (k, block_bytes),
                                            dtype=np.uint8)
    pairs = np.ascontiguousarray(raw).view(np.uint32)
    stored, bm = ntt_pair_lanes_wire16_pallas(
        jnp.asarray(pairs), GF16, GF16.root_of_order(2 * k),
        interpret=True)
    wire, st_ref, bm_ref, par = _wire16_reference(raw, k)
    assert (par == 0x10000).sum() > 0, "test shape no longer hits escapes"
    assert np.array_equal(np.asarray(stored).view(np.uint8), st_ref)
    assert np.array_equal(np.asarray(bm).astype(np.uint16).view(np.uint8),
                          bm_ref)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
@pytest.mark.parametrize("merge", [True, False], ids=["merge", "raw"])
def test_seam_fused_decode_pair(field, merge):
    """The decode specialization of the seam-fused pair (pre_vec1 =
    locator evaluations into pass A1, pre_vec2 = x*d/dx over the seam,
    post_vec = Forney inverse derivative + erased-row merge in pass B2)
    must be bit-exact vs the two staged ntt_auto transforms
    (decode.decode_prepared's generic path) AND actually recover the
    erased rows."""
    from fastecc_tpu import rs
    from fastecc_tpu.decode import (_xderiv_consts, decode_prepared,
                                    prepare_decode_tables)
    from fastecc_tpu.kernels.ntt_mfa import ntt_pair_pallas

    n, k, lanes = 1 << 9, 1 << 8, 128
    data = jnp.asarray(rand_field(field, (k, lanes)))
    cw = rs.encode_jit(data, field, n)
    erased = np.sort(RNG.choice(n, size=n - k, replace=False)).astype(
        np.uint32)
    corrupted = cw.at[jnp.asarray(erased)].set(0)
    mask, l_eval, lp_inv = prepare_decode_tables(erased, n, field,
                                                 locator="host")
    want = np.asarray(decode_prepared(corrupted, mask, l_eval, lp_inv,
                                      field, merge=merge))
    dx = jnp.asarray(_xderiv_consts(field.name, n))
    got = np.asarray(ntt_pair_pallas(
        corrupted, field, pre_vec1=l_eval, pre_vec2=dx, post_vec=lp_inv,
        sel_mask=mask if merge else None,
        sel_orig=corrupted if merge else None, interpret=True))
    np.testing.assert_array_equal(got, want)
    if merge:
        np.testing.assert_array_equal(got, np.asarray(cw))
    else:
        np.testing.assert_array_equal(got[erased], np.asarray(cw)[erased])


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
@pytest.mark.parametrize("c_dim", [32, 128])
def test_seam_fused_pair_split_choices(field, c_dim):
    """Non-default pair splits stay bit-exact (c2 = n/c1 by
    construction; both orders of deep/shallow passes covered)."""
    from fastecc_tpu.kernels.ntt_mfa import ntt_coset_pair_pallas

    n = 1 << 10
    x = jnp.asarray(rand_field(field, (n, 128)))
    g = field.root_of_order(2 * n)
    coeffs = ntt(x, field, inverse=True)
    pre = jnp.asarray(
        prepare_consts(field, powers_host(field, g, n))).reshape(n, 1)
    want = np.asarray(ntt(mul_prepared(field, coeffs, pre), field))
    got = np.asarray(
        ntt_coset_pair_pallas(x, field, g, interpret=True, c_dim=c_dim))
    np.testing.assert_array_equal(got, want)


def test_tile_for_policy():
    """The auto-tile policy widens the lane tile exactly one doubling for
    small-order shapes (the measured GF16 win, tools/onchip_r4.log) and
    leaves every shape whose per-step block would exceed the budget — or
    whose lane count can't split into 256-wide tiles — on the native
    (8, 128) tile."""
    from fastecc_tpu.kernels.ntt_mfa import _TL, _TR, _tile_for

    # GF16 encode pair shape (c1=128, r1=64, L=2^15): widens
    assert _tile_for(128, 64, 1 << 15) == (_TR, 256)
    # GF32 headline pair shape (c1=512, r1=1024, L=1024): 8 MB per-step
    # block at TL=256 exceeds the budget -> native tile
    assert _tile_for(512, 1024, 1024) == (_TR, _TL)
    # decode transform shape (c=2048, r=512, L=512): native tile
    assert _tile_for(2048, 512, 512) == (_TR, _TL)
    # lanes that can't halve into 256-wide tiles: native tile
    assert _tile_for(128, 64, 128) == (_TR, _TL)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
@pytest.mark.parametrize("tile", [None, (8, 256), (16, 128), (16, 256)])
def test_pallas_tile_choices_bit_exact(field, tile):
    """Every legal (TR, TL) tile — wider lane tiles, taller sublane
    tiles, and the auto policy (None, which widens at 512 lanes) — must
    be bit-exact vs the staged transform, in both directions."""
    n = 1 << 10      # default split (64, 16): R >= 16 admits TR=16 tiles
    x = jnp.asarray(rand_field(field, (n, 512)))
    for inverse in (False, True):
        want = np.asarray(ntt(x, field, inverse=inverse))
        got = np.asarray(ntt_pallas(x, field, inverse=inverse,
                                    interpret=True, tile=tile))
        np.testing.assert_array_equal(got, want, err_msg=f"tile={tile}")


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
@pytest.mark.parametrize("tile", [None, (8, 256), (16, 256)])
def test_seam_pair_tile_choices_bit_exact(field, tile):
    """The seam-fused coset pair at non-default tiles (and the auto
    policy at 512 lanes) must be bit-exact vs the staged transforms —
    this is the exact production path of the GF16 tile widening."""
    from fastecc_tpu.kernels.ntt_mfa import ntt_coset_pair_pallas

    n = 1 << 9
    x = jnp.asarray(rand_field(field, (n, 512)))
    g = field.root_of_order(2 * n)
    coeffs = ntt(x, field, inverse=True)
    pre = jnp.asarray(
        prepare_consts(field, powers_host(field, g, n))).reshape(n, 1)
    want = np.asarray(ntt(mul_prepared(field, coeffs, pre), field))
    got = np.asarray(ntt_coset_pair_pallas(x, field, g, interpret=True,
                                           tile=tile))
    np.testing.assert_array_equal(got, want, err_msg=f"tile={tile}")


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
def test_decode_pair_widened_tile_bit_exact(field):
    """The decode specialization (pre_vec1/pre_vec2/post_vec/sel_mask)
    reshapes its [N] tables by TR — the widened tile must keep those
    fusions bit-exact too."""
    from fastecc_tpu import rs
    from fastecc_tpu.decode import (_xderiv_consts, decode_prepared,
                                    prepare_decode_tables)
    from fastecc_tpu.kernels.ntt_mfa import ntt_pair_pallas

    n, k, lanes = 1 << 9, 1 << 8, 512
    data = jnp.asarray(rand_field(field, (k, lanes)))
    cw = rs.encode_jit(data, field, n)
    erased = np.sort(RNG.choice(n, size=n - k, replace=False)).astype(
        np.uint32)
    corrupted = cw.at[jnp.asarray(erased)].set(0)
    mask, l_eval, lp_inv = prepare_decode_tables(erased, n, field,
                                                 locator="host")
    want = np.asarray(decode_prepared(corrupted, mask, l_eval, lp_inv,
                                      field))
    dx = jnp.asarray(_xderiv_consts(field.name, n))
    got = np.asarray(ntt_pair_pallas(
        corrupted, field, pre_vec1=l_eval, pre_vec2=dx, post_vec=lp_inv,
        sel_mask=mask, sel_orig=corrupted, interpret=True, tile=(8, 256)))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, np.asarray(cw))


# ---------------------------------------------------------------------------
# GF16 wire-domain fused pair (round-4 directive 3): pack in pass A1's
# prologue, serialization in pass B2's epilogue. Bit-exactness contract:
# identical bytes to serialize_parity(encode_parity(pack_data(raw))),
# split at the stored/bitmap boundary of packing.py's pinned format.
# ---------------------------------------------------------------------------

def _wire16_reference(raw, k):
    from fastecc_tpu import packing, rs
    fields_in = packing.pack_data(jnp.asarray(raw), GF16)
    par = rs.encode_parity(fields_in, GF16, 2 * k)
    wire = np.asarray(packing.serialize_parity(par, GF16))
    w = raw.shape[1] // 2
    return wire, wire[:, :2 * w], wire[:, 2 * w:], np.asarray(par)


@pytest.mark.parametrize("k,block_bytes", [(1 << 8, 1024), (1 << 7, 4096)])
def test_wire16_pair_matches_generic(k, block_bytes):
    from fastecc_tpu.kernels.ntt_mfa import ntt_coset_pair_wire16_pallas
    from fastecc_tpu import rs
    raw = RNG.integers(0, 256, (k, block_bytes), dtype=np.uint8)
    pairs = np.ascontiguousarray(raw).view(np.uint32)
    stored, bm = ntt_coset_pair_wire16_pallas(
        jnp.asarray(pairs), GF16, GF16.root_of_order(2 * k),
        interpret=True, tile=(8, 128))
    wire, st_ref, bm_ref, _ = _wire16_reference(raw, k)
    assert np.array_equal(np.asarray(stored).view(np.uint8), st_ref)
    assert np.array_equal(np.asarray(bm).astype(np.uint16).view(np.uint8),
                          bm_ref)
    # and the host assembler reproduces the full wire bytes
    assert np.array_equal(rs.wire_gf16_from_parts(stored, bm), wire)


def test_wire16_pair_escape_bitmap_exercised():
    """A case whose parity CONTAINS 0x10000 values (seed searched: k=2^8,
    B=4096 under default_rng(0) yields 10 escapes) — proves the fused
    truncation + bitmap epilogue handles the escape, not just zeros."""
    from fastecc_tpu.kernels.ntt_mfa import ntt_coset_pair_wire16_pallas
    k, block_bytes = 1 << 8, 4096
    raw = np.random.default_rng(0).integers(0, 256, (k, block_bytes),
                                            dtype=np.uint8)
    wire, st_ref, bm_ref, par = _wire16_reference(raw, k)
    assert (par == 0x10000).sum() > 0, "test shape no longer hits escapes"
    pairs = np.ascontiguousarray(raw).view(np.uint32)
    stored, bm = ntt_coset_pair_wire16_pallas(
        jnp.asarray(pairs), GF16, GF16.root_of_order(2 * k),
        interpret=True, tile=(8, 128))
    assert np.array_equal(np.asarray(stored).view(np.uint8), st_ref)
    assert np.array_equal(np.asarray(bm).astype(np.uint16).view(np.uint8),
                          bm_ref)
    assert np.asarray(bm).any(), "escape bits must be set in the bitmap"


def test_wire16_parts_roundtrip_through_decode():
    """Wire parity from the fused pair must DECODE: drop data blocks,
    recover them from the pair's serialized parity via the product
    decode path (proves end-to-end wire-format compatibility, not just
    byte equality of the serializer)."""
    from fastecc_tpu.kernels.ntt_mfa import ntt_coset_pair_wire16_pallas
    from fastecc_tpu import decode as dec
    from fastecc_tpu import rs
    k, block_bytes = 1 << 7, 1024
    raw = RNG.integers(0, 256, (k, block_bytes), dtype=np.uint8)
    pairs = np.ascontiguousarray(raw).view(np.uint32)
    stored, bm = ntt_coset_pair_wire16_pallas(
        jnp.asarray(pairs), GF16, GF16.root_of_order(2 * k),
        interpret=True, tile=(8, 128))
    wire = rs.wire_gf16_from_parts(stored, bm)
    # survivors: all parity (odd codeword positions), no data
    survivors = {2 * i + 1: wire[i] for i in range(k)}
    got = dec.decode_blocks(survivors, 2 * k, k, GF16,
                            block_bytes=block_bytes)
    assert np.array_equal(got, raw)


def test_wire16_supported_predicate():
    from fastecc_tpu.kernels.ntt_mfa import _wire16_supported
    assert _wire16_supported(1 << 13, 1 << 14)      # the bench shape
    assert not _wire16_supported(1 << 13, 100)      # Wu not tile-aligned


@pytest.mark.parametrize("k,block_bytes", [(1 << 8, 1024), (1 << 8, 4096)])
def test_encode_blocks_gf16_fused_branch_body(k, block_bytes):
    """The encode_blocks TPU branch body (rs._encode_blocks_gf16_fused)
    is gated on jax.default_backend() == "tpu", so CPU CI could never
    reach it (round-4 verdict missing #4); the factored body runs here
    in interpret mode and must be byte-identical to the generic
    pack -> encode_parity -> serialize pipeline. The 4096-byte shape
    produces real 0x10000 escapes (same seed as the bitmap test)."""
    from fastecc_tpu import rs
    raw = np.random.default_rng(0).integers(0, 256, (k, block_bytes),
                                            dtype=np.uint8)
    got = np.asarray(rs._encode_blocks_gf16_fused(jnp.asarray(raw), 2 * k,
                                                  interpret=True))
    want, _, _, par = _wire16_reference(raw, k)
    if block_bytes == 4096:
        assert (par == 0x10000).sum() > 0, "shape no longer hits escapes"
    assert np.array_equal(got, want)


def _dense_escape_b2_case(r2, c2, wu, seed=7):
    """Inputs for wire16_pass_b2 whose transform OUTPUT is ~90% 0x10000
    values per half — bitmap groups then carry many simultaneous bits
    incl. saturated 0xFFFF words (0.9^16 of groups), the case the MXU
    compaction's bf16-exactness argument must survive and which is
    astronomically rare through the full pipeline on random data.
    Returns (lo2, hi2, stored_want [k, wu], bm_want [k, wu/8])."""
    from fastecc_tpu.ntt import ntt_host
    rng = np.random.default_rng(seed)
    k = r2 * c2

    def half():
        vals = rng.integers(0, 0x10000, (r2, c2, wu)).astype(np.uint32)
        want = np.where(rng.random((r2, c2, wu)) < 0.9,
                        np.uint32(0x10000), vals)
        pre = ntt_host(want.reshape(r2, c2 * wu), GF16,
                       inverse=True).reshape(r2, c2, wu)
        return want.reshape(k, wu), pre

    want_lo, lo2 = half()
    want_hi, hi2 = half()
    st = (want_lo & 0xFFFF) | ((want_hi & 0xFFFF) << np.uint32(16))
    el = (want_lo >> 16).reshape(k, wu // 8, 8)
    eh = (want_hi >> 16).reshape(k, wu // 8, 8)
    sh = (2 * np.arange(8)).astype(np.uint32)
    bm = ((el << sh) | (eh << (sh + 1))).sum(axis=-1).astype(np.uint32)
    assert (bm == 0xFFFF).any(), "case no longer hits saturated groups"
    return lo2, hi2, st, bm


def test_wire16_pass_b2_dense_escapes():
    from fastecc_tpu.kernels.ntt_mfa import wire16_pass_b2
    lo2, hi2, st_want, bm_want = _dense_escape_b2_case(16, 16, 256)
    stored, bm = wire16_pass_b2(jnp.asarray(lo2), jnp.asarray(hi2), GF16,
                                interpret=True, tile=(8, 128))
    np.testing.assert_array_equal(np.asarray(stored), st_want)
    np.testing.assert_array_equal(np.asarray(bm), bm_want)


def test_wire_from_parts_noncontiguous_inputs():
    """wire_gf16_from_parts must accept NON-C-CONTIGUOUS parts: on the
    TPU/axon backend np.asarray of the device bitmap comes back with
    transposed strides, and astype's default order='K' preserved them
    into an illegal .view(np.uint8) — the round-4 production crash
    (rs.py:wire_gf16_from_parts). Fortran-ordered numpy inputs reproduce
    that stride class on any backend."""
    from fastecc_tpu import rs
    rng = np.random.default_rng(3)
    stored = rng.integers(0, 1 << 16, (64, 32), dtype=np.uint32)
    bm = rng.integers(0, 1 << 16, (64, 4), dtype=np.uint32)
    want = rs.wire_gf16_from_parts(stored, bm)
    got = rs.wire_gf16_from_parts(np.asfortranarray(stored),
                                  np.asfortranarray(bm))
    assert np.array_equal(got, want)


def test_encode_blocks_roofline_prices_wire_passes():
    """Honest wire pricing (round-4 verdict weak #2 flipped): the
    unfused path prices MORE traffic than the field-domain row; the
    fused GF16 pair prices LESS traffic (wire IO is 2 bytes/word vs 4;
    20.75 B/word incl. the bitmap transpose) but MORE compute (the
    split/re-pack/escape epilogues are ~6 VPU ops/word, priced, so at
    compute-bound shapes the fused SoL sits at-or-above the field SoL —
    'moves less HBM' is a traffic claim, not a free lunch); GF32 wire
    stays compute-bound (the priced passes fit in the compute slack)."""
    from fastecc_tpu.utils import profiling as P
    fused = P.encode_blocks_roofline(1 << 14, 1 << 16, "GF16", fused=True)
    unfused = P.encode_blocks_roofline(1 << 14, 1 << 16, "GF16",
                                       fused=False)
    field = P.encode_roofline(1 << 14, 1 << 15, field_name="GF16")
    assert unfused["t_memory_bound_s"] > field["t_memory_bound_s"]
    assert fused["t_memory_bound_s"] < field["t_memory_bound_s"]
    assert fused["t_compute_bound_s"] > field["t_compute_bound_s"]
    assert fused["hbm_bytes"] == (1 << 13) * (1 << 15) * 20.75
    assert fused["speed_of_light_s"] <= unfused["speed_of_light_s"]
    g32 = P.encode_blocks_roofline(1 << 20, 4096, "GF32", fused=False)
    assert g32["bound"] == "compute"
    with pytest.raises(AssertionError):
        P.encode_blocks_roofline(1 << 20, 4096, "GF32", fused=True)
