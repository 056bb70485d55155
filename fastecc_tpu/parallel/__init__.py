"""Multi-chip parallelism: mesh construction and the sharded four-step NTT.

The reference's only parallelism is OpenMP fork-join + SIMD on one node
(SURVEY.md C19); it has no distributed backend (C20). Per [BASELINE]:5 the
rebuild scales over a TPU mesh with two axes:

  * ``coeff`` — shards the NTT/block-count axis; butterfly stages exchange
    data via all-to-all/transpose collectives (ride ICI).
  * ``block`` — shards the 1024 independent word-lanes within a 4KB block;
    embarrassingly parallel (the "data parallel" axis, fine over DCN).
"""

from .mesh import make_mesh  # noqa: F401

_NTT_DIST = ("ntt_sharded", "ntt_sharded_jit", "ntt_sharded_overlap",
             "ntt_sharded_overlap_jit", "encode_parity_sharded",
             "encode_parity_sharded_jit", "decode_sharded",
             "decode_prepared_sharded")
_MESH = ("codeword_sharding", "replicated")

__all__ = ["make_mesh", *_MESH, *_NTT_DIST]


def __getattr__(name):
    """Lazy re-exports so ``fastecc_tpu.parallel.ntt_sharded`` etc. work
    without importing the transform stack at package-import time."""
    if name in _NTT_DIST:
        from . import ntt_dist
        return getattr(ntt_dist, name)
    if name in _MESH:
        from . import mesh
        return getattr(mesh, name)
    raise AttributeError(
        f"module 'fastecc_tpu.parallel' has no attribute {name!r}")
