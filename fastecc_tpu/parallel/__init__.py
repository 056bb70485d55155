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
