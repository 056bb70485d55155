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
