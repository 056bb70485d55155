"""ctypes bindings for the native host data plane (native/fastecc_host.cpp).

The device pipeline (JAX/Pallas) owns the field math; this module owns the
host-bound wire-format work — batch packing/unpacking of block files and
CRC32C integrity tags — as OpenMP-parallel C++ (SURVEY.md C13/C15: the
reference's host-side packing and allocator layer, rebuilt for the split
host/device architecture).

Every function has a pure-numpy/jnp fallback (packing.py), and the
equivalence is test-enforced; ``available()`` reports whether the native
library is loaded. ``build()`` compiles it on demand with the in-image
toolchain (g++, no external deps).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

from . import packing
from .fields import FieldSpec

_REPO = pathlib.Path(__file__).resolve().parent.parent
_SO = _REPO / "build" / "libfastecc_host.so"
_lib = None


def build(quiet: bool = True) -> bool:
    """Compile the native library in-tree. Returns True on success."""
    global _lib
    try:
        # -B: a stale .so can postdate the sources (e.g. copied in) yet
        # miss newer symbols; unconditional rebuild is cheap and safe
        subprocess.run(["make", "-B", "-C", str(_REPO / "native")],
                       check=True, capture_output=quiet)
        # drop the cached handle so the rebuilt library is actually
        # loaded (make writes a new inode, so a fresh CDLL maps the new
        # code; returning the old handle would defeat the rebuild)
        _lib = None
        return _load()
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> bool:
    global _lib
    if _lib is not None:
        return True
    if not _SO.exists():
        return False
    try:
        lib = _bind(ctypes.CDLL(str(_SO)))
    except (OSError, AttributeError):
        # stale pre-upgrade .so missing newer symbols (or unloadable):
        # report unavailable so callers fall back to build()/jnp paths
        return False
    _lib = lib
    return True


def _bind(lib):
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i64 = ctypes.c_int64
    u64 = ctypes.c_uint64
    for name, args in [
        ("pack_gf32", (u8p, i64, u32p)),
        ("unpack_gf32", (u32p, i64, u8p)),
        ("serialize_parity_gf32", (u32p, i64, u8p)),
        ("deserialize_parity_gf32", (u8p, i64, u32p)),
        ("pack_gf16", (u8p, i64, u32p)),
        ("unpack_gf16", (u32p, i64, u8p)),
        ("serialize_parity_gf16", (u32p, i64, u8p)),
        ("deserialize_parity_gf16", (u8p, i64, u32p)),
        ("crc32c_blocks", (u8p, i64, i64, u32p)),
        ("ntt_mod", (u32p, u32p, i64, i64, u64, u64, u64)),
        ("mulmod_vec", (u32p, u32p, i64, u64, u32p)),
    ]:
        fn = getattr(lib, name)
        fn.argtypes = list(args)
        fn.restype = None
    lib.crc32c.argtypes = [u8p, i64]
    lib.crc32c.restype = ctypes.c_uint32
    return lib


def available() -> bool:
    return _load()


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _u32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def _suffix(field: FieldSpec) -> str:
    return "gf32" if field.use_mont else "gf16"


def _check_width(a: np.ndarray, want: int, what: str):
    # The C++ kernels hardcode the default 4 KB wire format; any other
    # width would read out of bounds or silently truncate blocks.
    # Callers with non-default block sizes must use the jnp paths
    # (packing.py), as the storage/CLI dispatchers already do.
    assert a.ndim == 2 and a.shape[1] == want, (
        f"native {what} is specialized to the default wire format "
        f"(width {want}); got {a.shape} — use the packing.py path for "
        f"other block sizes")


def pack_data(raw: np.ndarray, field: FieldSpec) -> np.ndarray:
    """[k, 4096] uint8 -> [k, lanes] uint32 (native batch pack)."""
    assert _load(), "native library not built (fastecc_tpu.host.build())"
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    _check_width(raw, packing.BLOCK_BYTES, "pack_data")
    k = raw.shape[0]
    out = np.empty((k, packing.field_lanes(field)), dtype=np.uint32)
    getattr(_lib, f"pack_{_suffix(field)}")(_u8p(raw), k, _u32p(out))
    return out


def unpack_data(fields: np.ndarray, field: FieldSpec) -> np.ndarray:
    assert _load()
    fields = np.ascontiguousarray(fields, dtype=np.uint32)
    _check_width(fields, packing.field_lanes(field), "unpack_data")
    k = fields.shape[0]
    out = np.empty((k, packing.BLOCK_BYTES), dtype=np.uint8)
    getattr(_lib, f"unpack_{_suffix(field)}")(_u32p(fields), k, _u8p(out))
    return out


def serialize_parity(fields: np.ndarray, field: FieldSpec) -> np.ndarray:
    assert _load()
    fields = np.ascontiguousarray(fields, dtype=np.uint32)
    _check_width(fields, packing.field_lanes(field), "serialize_parity")
    m = fields.shape[0]
    out = np.empty((m, packing.parity_bytes(field)), dtype=np.uint8)
    getattr(_lib, f"serialize_parity_{_suffix(field)}")(
        _u32p(fields), m, _u8p(out))
    return out


def deserialize_parity(raw: np.ndarray, field: FieldSpec) -> np.ndarray:
    assert _load()
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    _check_width(raw, packing.parity_bytes(field), "deserialize_parity")
    m = raw.shape[0]
    out = np.empty((m, packing.field_lanes(field)), dtype=np.uint32)
    getattr(_lib, f"deserialize_parity_{_suffix(field)}")(
        _u8p(raw), m, _u32p(out))
    return out


def ntt(x: np.ndarray, field: FieldSpec, inverse: bool = False,
        scale: bool = True) -> np.ndarray:
    """NTT along axis 0 of [n, m] (or [n]) u32, native OpenMP path.

    Bit-exact equal to ntt.ntt_host / the device ntt (test-enforced).
    """
    assert _load()
    x = np.ascontiguousarray(x, dtype=np.uint32)
    shape = x.shape
    n = shape[0]
    m = int(np.prod(shape[1:], dtype=np.int64)) if len(shape) > 1 else 1
    out = x.copy()
    scratch = np.empty_like(out)
    w = field.root_of_order(n)
    if inverse:
        w = field.inv_host(w)
    s = field.inv_host(n) if (inverse and scale and n > 1) else 1
    if n > 1:
        _lib.ntt_mod(_u32p(out), _u32p(scratch), n, m,
                     ctypes.c_uint64(field.p), ctypes.c_uint64(w),
                     ctypes.c_uint64(s))
    return out


def mulmod(a: np.ndarray, b: np.ndarray, field: FieldSpec) -> np.ndarray:
    """Elementwise (a * b) mod p, native path."""
    assert _load()
    a = np.ascontiguousarray(a, dtype=np.uint32)
    b = np.ascontiguousarray(b, dtype=np.uint32)
    assert a.shape == b.shape
    out = np.empty_like(a)
    _lib.mulmod_vec(_u32p(a), _u32p(b), a.size, ctypes.c_uint64(field.p),
                    _u32p(out))
    return out


_crc_table_np = None


def _crc32c_table():
    """Reflected-Castagnoli byte table (identical to the native one)."""
    global _crc_table_np
    if _crc_table_np is None:
        tab = np.empty(256, dtype=np.uint32)
        for i in range(256):
            c = i
            for _ in range(8):
                c = (0x82F63B78 ^ (c >> 1)) if (c & 1) else (c >> 1)
            tab[i] = c
        _crc_table_np = tab
    return _crc_table_np


def crc32c_np(data: bytes | np.ndarray) -> int:
    """Pure-numpy CRC32C; bit-identical to the native crc32c (fallback so
    integrity checking never silently disappears when the toolchain is
    absent)."""
    a = np.frombuffer(bytes(data), dtype=np.uint8)
    return int(crc32c_blocks_np(a.reshape(1, -1))[0])


def crc32c_blocks_np(blocks: np.ndarray) -> np.ndarray:
    """Per-row CRC32C in numpy: one vectorized table step per byte COLUMN
    (4096 steps for the wire format, each over all rows at once)."""
    tab = _crc32c_table()
    blocks = np.ascontiguousarray(blocks, dtype=np.uint8)
    crc = np.full(blocks.shape[0], 0xFFFFFFFF, dtype=np.uint32)
    for j in range(blocks.shape[1]):
        crc = tab[(crc ^ blocks[:, j]) & 0xFF] ^ (crc >> np.uint32(8))
    return crc ^ np.uint32(0xFFFFFFFF)


def crc32c(data: bytes | np.ndarray) -> int:
    """CRC32C of a byte string: native when loaded, numpy otherwise."""
    if not _load():
        return crc32c_np(data)
    a = np.frombuffer(bytes(data), dtype=np.uint8)
    return int(_lib.crc32c(_u8p(a), a.size))


def crc32c_blocks(blocks: np.ndarray) -> np.ndarray:
    """Per-row CRC32C tags for a [k, block_bytes] uint8 array (native
    OpenMP when loaded, vectorized numpy otherwise)."""
    if not _load():
        return crc32c_blocks_np(blocks)
    blocks = np.ascontiguousarray(blocks, dtype=np.uint8)
    tags = np.empty(blocks.shape[0], dtype=np.uint32)
    _lib.crc32c_blocks(_u8p(blocks), blocks.shape[0], blocks.shape[1],
                       _u32p(tags))
    return tags
