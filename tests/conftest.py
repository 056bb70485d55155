"""Test configuration: force CPU backend with 8 virtual devices.

Must run before any backend initialization so the distributed four-step NTT
tests (SURVEY.md §4 item 3) can exercise real ``shard_map``/``all_to_all``
paths without TPU hardware. Note: the axon TPU plugin in this environment
ignores the ``JAX_PLATFORMS`` env var, so we use ``jax.config`` instead.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles many distinct NTT shapes;
# cache them across runs (first run pays ~1-2 min, later runs are seconds).
# Safe here because the backend above is CPU — the same knob HANGS the
# axon TPU backend (see utils.timer.enable_persistent_cache).
from fastecc_tpu.utils.timer import enable_persistent_cache  # noqa: E402

enable_persistent_cache(os.path.join(os.path.dirname(__file__),
                                     ".jax_cache"))
