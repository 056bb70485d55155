"""Pallas TPU kernels: the codec's hot path (SURVEY.md C3/C8/C9).

The reference's SIMD+OpenMP butterfly loops become two fused-kernel HBM
passes per transform (kernels/ntt_mfa.py); the Montgomery mulmod primitive
is shared with the portable gf.py (same jnp code, compiled inside kernels).
"""

from .ntt_mfa import ntt_pallas  # noqa: F401
