"""Real-chip regression tier (SURVEY.md §4 tier-3 analog): the COMPILED
(non-interpret) Pallas kernels vs the staged jnp path, on actual TPU
hardware.

The CPU suite runs every Pallas kernel in interpret mode; a Mosaic
lowering regression (sublane alignment, select lowering, VMEM layout)
would pass CPU CI and silently corrupt on-chip results. This tier was a
manual drill through round 2 (bench runs + the verify recipe); here it
becomes regression coverage: `pytest --tpu tests/test_tpu.py` (or
FASTECC_TPU_TESTS=1) on a machine with the chip.

Mechanics: the pytest process itself is pinned to the CPU backend
(conftest.py), so the chip work runs in ONE subprocess (fresh process =
default axon backend) covering, bit-exactly vs the staged jnp path on
the same chip and the numpy host twin:

  * compiled ntt_pallas forward + inverse, GF32 and GF16, radix-4;
  * the fused RS encode (pre_seed coset fusion inside pass A);
  * the fused decode epilogue (pre_vec/post_vec/sel merge in pass B)
    recovering a garbled codeword exactly;
  * the seam-fused 3-pass encode pair vs the two staged transforms;
  * a shard_map-wrapped local transform (ntt_sharded on a 1-device TPU
    mesh — the Pallas-inside-shard_map lowering).

Budget: ~6 distinct programs x ~25-60 s remote compile each (nothing
persists across processes on the axon tunnel) — minutes, which is why
the tier is opt-in.
"""

import os
import pathlib
import subprocess
import sys

import pytest

pytestmark = pytest.mark.tpu

REPO = pathlib.Path(__file__).resolve().parent.parent

_SCRIPT = r"""
import numpy as np
import jax
import jax.numpy as jnp

if jax.default_backend() != "tpu":
    print("NO-TPU:", jax.default_backend())
    raise SystemExit(42)

from fastecc_tpu import decode as dec
from fastecc_tpu import gf, rs
from fastecc_tpu.fields import GF16, GF32
from fastecc_tpu.kernels.ntt_mfa import ntt_pallas
from fastecc_tpu.ntt import ntt, ntt_host

rng = np.random.default_rng(0x7B0)
n, lanes = 4096, 256

for field in (GF32, GF16):
    x = rng.integers(0, field.p, size=(n, lanes),
                     dtype=np.uint64).astype(np.uint32)
    xj = jnp.asarray(x)
    # one jitted program computes both lowerings; equality checked on host
    fwd = jax.jit(lambda v, f=field: (ntt_pallas(v, f), ntt(v, f)))
    a, b = fwd(xj)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(a), ntt_host(x, field))
    inv = jax.jit(lambda v, f=field: (
        ntt_pallas(v, f, inverse=True), ntt(v, f, inverse=True)))
    ai, bi = inv(xj)
    np.testing.assert_array_equal(np.asarray(ai), np.asarray(bi))
    np.testing.assert_array_equal(np.asarray(ai),
                                  ntt_host(x, field, inverse=True))
    print(f"PALLAS-VS-JNP-{field.name}: OK")

# fused RS encode (pre_seed coset multiply rides pass A) + fused decode
# (pre_vec locator multiply, post_vec Forney divide, sel merge ride the
# transform prologue/epilogues) — recovery must be exact
k = n // 2
data = jnp.asarray(rng.integers(0, GF32.p, size=(k, lanes),
                                dtype=np.uint64).astype(np.uint32))
cw = np.asarray(rs.encode_jit(data, GF32, n))
erased = np.sort(rng.choice(n, size=k, replace=False))
garbled = cw.copy()
garbled[erased] = rng.integers(0, GF32.p, size=(k, lanes),
                               dtype=np.uint64).astype(np.uint32)
out = np.asarray(dec.decode_host_prepared(jnp.asarray(garbled), erased,
                                          GF32, k=k))
np.testing.assert_array_equal(out, cw)
print("FUSED-ENCODE-DECODE: OK")

# seam-fused 3-pass encode pair vs the two staged transforms, compiled
# in ONE program (rs.encode_parity's rate-1/2 fast path)
from fastecc_tpu.kernels.ntt_mfa import ntt_coset_pair_pallas
g32 = GF32.root_of_order(2 * n)
pair = jax.jit(lambda v: (
    ntt_coset_pair_pallas(v, GF32, g32),
    ntt_pallas(ntt_pallas(v, GF32, inverse=True), GF32, pre_seed=g32)))
pa, pb = pair(jnp.asarray(cw))
np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
print("SEAM-PAIR: OK")

# product wire path on the chip (round-5 directive 1): encode_blocks'
# GF16-on-TPU fused branch (the rs.py backend gate takes it in THIS
# process) and the GF32 generic pipeline, byte-compared against the
# field-domain pipeline + serializer; plus the host assembler
# (wire_gf16_from_parts) on REAL device arrays — the round-4 production
# crash was np.asarray returning transposed strides here, which no CPU
# run can reproduce.
from fastecc_tpu import packing
kb, bb = 1 << 9, 4096
raw = rng.integers(0, 256, size=(kb, bb), dtype=np.uint16).astype(np.uint8)
rawj = jnp.asarray(raw)
for field in (GF16, GF32):
    got = np.asarray(rs.encode_blocks_jit(rawj, field, 2 * kb))
    want = np.asarray(packing.serialize_parity(
        rs.encode_parity_jit(packing.pack_data(rawj, field), field,
                             2 * kb), field))
    np.testing.assert_array_equal(got, want)
    print(f"ENCODE-BLOCKS-{field.name}: OK")
stored, bm = rs.encode_blocks_gf16_parts_jit(
    packing._bytes_to_u32(rawj, 4), 2 * kb)
np.testing.assert_array_equal(
    rs.wire_gf16_from_parts(stored, bm),
    np.asarray(rs.encode_blocks_jit(rawj, GF16, 2 * kb)))
print("WIRE-FROM-PARTS: OK")

# adversarial escape density through the COMPILED bitmap compaction
# (the MXU matmul path — its bf16-exactness argument needs saturated
# 0xFFFF groups, unreachable via random full-pipeline data)
import sys as _sys
_sys.path.insert(0, "tests")
from test_pallas import _dense_escape_b2_case
from fastecc_tpu.kernels.ntt_mfa import wire16_pass_b2
lo2, hi2, st_want, bm_want = _dense_escape_b2_case(16, 16, 256)
std, bmd = jax.jit(lambda a, b: wire16_pass_b2(a, b, GF16))(
    jnp.asarray(lo2), jnp.asarray(hi2))
np.testing.assert_array_equal(np.asarray(std), st_want)
np.testing.assert_array_equal(np.asarray(bmd), bm_want)
print("WIRE-B2-DENSE-ESCAPES: OK")

# the MXU _pack_bits path (TPU-only branch — CPU CI runs the VPU form)
# vs pure-numpy truth, incl. saturated 0xFFFF groups (the bf16-exactness
# argument's worst case)
bits = rng.integers(0, 2, (256, 1024)).astype(np.uint32)
bits[0] = 1
got_pb = np.asarray(jax.jit(
    lambda b: packing._pack_bits(b, 16))(jnp.asarray(bits)))
want_pb = (bits.reshape(256, 64, 16)
           << np.arange(16, dtype=np.uint32)).sum(-1, dtype=np.uint32)
np.testing.assert_array_equal(got_pb, want_pb)
assert (want_pb == 0xFFFF).any()
print("MXU-PACK-BITS: OK")

# shard_map-wrapped local transform on a real-chip mesh
from fastecc_tpu.parallel import make_mesh
from fastecc_tpu.parallel.ntt_dist import ntt_sharded_jit

mesh = make_mesh(1, 1, devices=jax.devices()[:1])
xs = jnp.asarray(cw)
s1 = np.asarray(ntt_sharded_jit(xs, GF32, mesh))
s2 = np.asarray(jax.jit(lambda v: ntt(v, GF32))(xs))
np.testing.assert_array_equal(s1, s2)
print("SHARD-MAP-ON-CHIP: OK")
print("TPU-TIER-PASS")
"""


def test_compiled_kernels_on_chip():
    env = os.environ.copy()
    env["PYTHONPATH"] = (str(REPO) + os.pathsep
                         + env.get("PYTHONPATH", "")).rstrip(os.pathsep)
    # the persistent compile cache HANGS the axon backend — make sure the
    # subprocess never inherits one
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    proc = subprocess.run([sys.executable, "-c", _SCRIPT],
                          capture_output=True, text=True, timeout=1500,
                          env=env, cwd=str(REPO))
    if proc.returncode == 42:
        pytest.skip(f"no TPU answers: {proc.stdout.strip()}")
    assert proc.returncode == 0, proc.stdout + "\n" + proc.stderr
    assert "TPU-TIER-PASS" in proc.stdout, proc.stdout


_STORAGE_SCRIPT = r"""
import numpy as np
import jax

if jax.default_backend() != "tpu":
    print("NO-TPU:", jax.default_backend())
    raise SystemExit(42)

import pathlib
import sys
import tempfile

from fastecc_tpu import storage
from fastecc_tpu.fields import GF32

tmp = pathlib.Path(tempfile.mkdtemp(prefix="fastecc_tpu_smoke_"))
rng = np.random.default_rng(0x5709)
payload = bytearray(rng.integers(0, 256, 6 * 4096 + 123,
                                 dtype=np.uint16).astype(np.uint8))
src = tmp / "payload.bin"
src.write_bytes(bytes(payload))
out = tmp / "coded"

# encode -> partial write -> degrade -> ranged read -> recover, every
# codec call dispatching to the REAL chip (this process's default
# backend), byte-compared against the host-side truth at each step
storage.encode_file(src, out, GF32)
print("STORAGE-ENCODE: OK")

edit = bytes(rng.integers(0, 256, 2000, dtype=np.uint16).astype(np.uint8))
off = 2 * 4096 - 50
payload[off: off + len(edit)] = edit
assert storage.update_file(out, off, edit) >= 1
print("STORAGE-UPDATE: OK")

# degrade: drop a data block covering the read window and some parity
# (codeword positions interleave: even = data, odd = parity)
(out / "block_000000.dat").unlink()
(out / "block_000005.par").unlink()
got = storage.read_file(out, 100, 5000)
assert got == bytes(payload[100:5100]), "degraded ranged read mismatch"
rd = storage.Reader(out)
assert rd.read(0, 4096) == bytes(payload[:4096]), "Reader mismatch"
print("STORAGE-DEGRADED-READ: OK")

dst = tmp / "recovered.bin"
storage.recover_file(out, dst)
assert dst.read_bytes() == bytes(payload), "recover mismatch"
print("STORAGE-RECOVER: OK")
print("TPU-STORAGE-PASS")
"""


def test_storage_lifecycle_on_chip():
    """Round-3's flagship serving layer had zero on-chip coverage
    (round-4 verdict directive 5): one encode -> update_file ->
    degraded read_file/Reader -> recover_file lifecycle where every
    codec dispatch hits the real chip, byte-compared against host
    truth. Opt-in like the kernel tier (a handful of remote compiles,
    ~2-4 min)."""
    env = os.environ.copy()
    env["PYTHONPATH"] = (str(REPO) + os.pathsep
                         + env.get("PYTHONPATH", "")).rstrip(os.pathsep)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    proc = subprocess.run([sys.executable, "-c", _STORAGE_SCRIPT],
                          capture_output=True, text=True, timeout=1500,
                          env=env, cwd=str(REPO))
    if proc.returncode == 42:
        pytest.skip(f"no TPU answers: {proc.stdout.strip()}")
    assert proc.returncode == 0, proc.stdout + "\n" + proc.stderr
    assert "TPU-STORAGE-PASS" in proc.stdout, proc.stdout
