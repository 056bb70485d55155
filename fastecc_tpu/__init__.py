"""FastECC-TPU: a TPU-native O(N log N) Reed-Solomon erasure-coding framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
C++/SIMD/OpenMP project ``Bulat-Ziganshin/FastECC`` (see SURVEY.md for the
layer map and component inventory; the reference mount was empty at build
time, so SURVEY.md Appendix A/B pin the canonical constants and codec spec).

Public API:
  fields.GF32 / fields.GF16      — the two supported prime fields
  ntt.ntt / ntt.intt             — single-chip Stockham NTT (axis 0)
  rs.encode / rs.decode          — Reed-Solomon erasure codec over 4KB blocks
  decode.correct_errors          — unknown-position errors-and-erasures
  storage                        — out-of-core streaming file codec, plus
                                   the serving layer: degraded ranged
                                   reads (read_file / Reader) and
                                   incremental partial writes (update_file)
  parallel.mesh / parallel.ntt_dist — multi-chip sharded four-step NTT
"""

from fastecc_tpu.fields import FIELDS, GF16, GF32, FieldSpec

_SUBMODULES = ("gf", "ntt", "rs", "decode", "packing", "host", "testing",
               "parallel", "utils", "cli", "storage")

__all__ = ["FIELDS", "GF16", "GF32", "FieldSpec", *_SUBMODULES]

__version__ = "0.2.0"


def __getattr__(name):
    """Lazy submodule access: ``fastecc_tpu.rs`` etc. without importing
    jax at package-import time (fields is pure Python)."""
    if name in _SUBMODULES:
        import importlib
        return importlib.import_module(f"fastecc_tpu.{name}")
    raise AttributeError(f"module 'fastecc_tpu' has no attribute {name!r}")
