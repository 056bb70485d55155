"""Device-mesh construction for the codec (SURVEY.md C20).

Axis convention (see package docstring): ``('coeff', 'block')``. The heavy
all-to-all traffic of the distributed four-step NTT rides the ``coeff``
axis, so that axis should map to ICI-adjacent devices; ``block`` carries no
codec traffic and can span DCN.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _pow2_floor(n: int) -> int:
    return 1 << (n.bit_length() - 1)


def make_mesh(n_coeff: int | None = None, n_block: int | None = None,
              devices=None) -> Mesh:
    """Build a ('coeff', 'block') mesh.

    Defaults: use the largest power-of-two device count, all of it on the
    ``coeff`` axis (transform sharding) unless ``n_block`` is given.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_coeff is None and n_block is None:
        n_coeff, n_block = _pow2_floor(n), 1
    elif n_coeff is None:
        n_coeff = _pow2_floor(n) // n_block
    elif n_block is None:
        n_block = _pow2_floor(n) // n_coeff
    used = n_coeff * n_block
    assert used <= n, f"mesh {n_coeff}x{n_block} needs {used} > {n} devices"
    dev = np.asarray(devices[:used]).reshape(n_coeff, n_block)
    return Mesh(dev, ("coeff", "block"))


def codeword_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [N, L] codec arrays: transform axis on 'coeff',
    word-lane axis on 'block'."""
    return NamedSharding(mesh, P("coeff", "block"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
