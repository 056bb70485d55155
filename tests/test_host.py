"""Native C++ host data plane vs. the jnp reference (bit-exact contract).

Builds build/libfastecc_host.so with the in-image toolchain if missing;
skips (loudly) only if no compiler is available.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fastecc_tpu import host, packing
from fastecc_tpu.fields import GF16, GF32

pytestmark = pytest.mark.skipif(
    not (host.available() or host.build()),
    reason="native toolchain unavailable")

RNG = np.random.default_rng(0x407)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
def test_native_pack_matches_jnp(field):
    raw = RNG.integers(0, 256, (64, 4096), dtype=np.uint16).astype(np.uint8)
    raw[0, :] = 0xFF                       # escape-path stress
    nat = host.pack_data(raw, field)
    ref = np.asarray(packing.pack_data(jnp.asarray(raw), field))
    np.testing.assert_array_equal(nat, ref)
    np.testing.assert_array_equal(host.unpack_data(nat, field), raw)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
def test_native_parity_serialization_matches_jnp(field):
    lanes = packing.field_lanes(field)
    vals = RNG.integers(0, field.p, (16, lanes), dtype=np.uint64).astype(
        np.uint32)
    if not field.use_mont:
        vals[0, :7] = 0x10000
    nat = host.serialize_parity(vals, field)
    ref = np.asarray(packing.serialize_parity(jnp.asarray(vals), field))
    np.testing.assert_array_equal(nat, ref)
    np.testing.assert_array_equal(host.deserialize_parity(nat, field), vals)


def test_crc32c_known_answer():
    # RFC 3720 test vector: crc32c("123456789") = 0xE3069283
    assert host.crc32c(b"123456789") == 0xE3069283
    blocks = np.frombuffer(b"123456789" * 512, np.uint8)[:4096][None]
    assert host.crc32c_blocks(np.ascontiguousarray(blocks))[0] == \
        host.crc32c(blocks[0].tobytes())


def test_decode_blocks_uses_native(monkeypatch):
    """decode_blocks must give identical results with and without the
    native batch path."""
    import jax.numpy as jnp2
    from fastecc_tpu import decode as dec, rs
    field, k, n = GF32, 8, 16
    raw = RNG.integers(0, 256, (k, 4096), dtype=np.uint16).astype(np.uint8)
    parity = np.asarray(rs.encode_blocks_jit(jnp2.asarray(raw), field))
    ppos = rs.parity_positions(n, k)
    surv = {int(ppos[i]): parity[i].tobytes() for i in range(k)}
    with_native = dec.decode_blocks(surv, n, k, field)
    monkeypatch.setattr(host, "available", lambda: False)
    without = dec.decode_blocks(surv, n, k, field)
    np.testing.assert_array_equal(with_native, without)
    np.testing.assert_array_equal(with_native, raw)


@pytest.mark.parametrize("field", [GF32, GF16], ids=lambda f: f.name)
@pytest.mark.parametrize("shape", [(64, 3), (256,), (1024, 2)])
@pytest.mark.parametrize("inverse", [False, True])
def test_native_ntt_matches_numpy(field, shape, inverse):
    """native ntt_mod (Barrett u64) == ntt.ntt_host == device convention."""
    from fastecc_tpu.ntt import ntt_host
    x = RNG.integers(0, field.p, shape, dtype=np.uint64).astype(np.uint32)
    got = host.ntt(x, field, inverse=inverse)
    np.testing.assert_array_equal(got, ntt_host(x, field, inverse=inverse))


def test_native_mulmod_matches_numpy():
    a = RNG.integers(0, GF32.p, 4096, dtype=np.uint64).astype(np.uint32)
    b = RNG.integers(0, GF32.p, 4096, dtype=np.uint64).astype(np.uint32)
    want = (a.astype(np.uint64) * b % np.uint64(GF32.p)).astype(np.uint32)
    np.testing.assert_array_equal(host.mulmod(a, b, GF32), want)


def test_native_ntt_multithreaded_chunking():
    """The per-thread incremental-twiddle chunking must be bit-exact for
    thread counts that do not divide the butterfly rows. OMP_NUM_THREADS
    must be set before the OpenMP runtime spins up, so run in a
    subprocess."""
    import os
    import subprocess
    import sys
    import textwrap
    code = textwrap.dedent("""
        import numpy as np
        from fastecc_tpu import host
        from fastecc_tpu.fields import GF32, GF16
        from fastecc_tpu.ntt import ntt_host
        rng = np.random.default_rng(6)
        for field in (GF32, GF16):
            for shape in ((512, 3), (2048,), (64, 5)):
                x = rng.integers(0, field.p, shape,
                                 dtype=np.uint64).astype(np.uint32)
                for inv in (False, True):
                    a = host.ntt(x, field, inverse=inv)
                    b = ntt_host(x, field, inverse=inv)
                    assert (a == b).all()
        print("OK")
    """)
    env = dict(os.environ, OMP_NUM_THREADS="7",
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__))
               + os.pathsep + os.environ.get("PYTHONPATH", ""))
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0 and "OK" in out.stdout, out.stdout + out.stderr


def test_crc32c_numpy_fallback_matches_native():
    """The pure-numpy CRC32C must be bit-identical to the native one (it
    is the integrity path when the toolchain is absent)."""
    assert host.crc32c_np(b"123456789") == 0xE3069283
    rng = np.random.default_rng(11)
    blocks = rng.integers(0, 256, (5, 4096), dtype=np.uint16).astype(
        np.uint8)
    np.testing.assert_array_equal(host.crc32c_blocks_np(blocks),
                                  host.crc32c_blocks(blocks))
    for row in blocks:
        assert host.crc32c_np(row.tobytes()) == host.crc32c(row.tobytes())


def test_native_wrappers_reject_nondefault_widths():
    """The C++ kernels hardcode the 4 KB wire format; any other width
    must refuse loudly instead of reading out of bounds or silently
    truncating (found in review)."""
    import pytest

    from fastecc_tpu import host
    from fastecc_tpu.fields import GF16, GF32

    if not host.available() and not host.build():
        pytest.skip("native toolchain unavailable")
    for field in (GF32, GF16):
        with pytest.raises(AssertionError, match="wire format"):
            host.pack_data(np.zeros((2, 2048), np.uint8), field)
        with pytest.raises(AssertionError, match="wire format"):
            host.unpack_data(np.zeros((2, 64), np.uint32), field)
        with pytest.raises(AssertionError, match="wire format"):
            host.serialize_parity(np.zeros((2, 64), np.uint32), field)
        with pytest.raises(AssertionError, match="wire format"):
            host.deserialize_parity(np.zeros((2, 64), np.uint8), field)


def test_fence_handles_empty_leaves():
    """time_fn/fence over a pytree containing a zero-size array must not
    crash (found in review)."""
    import jax.numpy as jnp

    from fastecc_tpu.utils.timer import fence

    out = fence((jnp.zeros((0, 4), jnp.uint32), jnp.ones((2,), jnp.uint32)))
    assert out[0].shape == (0, 4)
