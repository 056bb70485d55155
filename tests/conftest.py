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

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--tpu", action="store_true", default=False,
        help="run the @pytest.mark.tpu tier (real-chip compiled-kernel "
             "regression; needs the axon TPU and several minutes of "
             "remote compiles)")


def pytest_collection_modifyitems(config, items):
    """The tpu tier is opt-in: this pytest process is pinned to the CPU
    backend (above), so tpu tests run the chip via SUBPROCESSES — each
    costs minutes of remote compile. Skip unless --tpu or
    FASTECC_TPU_TESTS=1 (the tests additionally self-skip when no chip
    answers)."""
    if config.getoption("--tpu") or os.environ.get("FASTECC_TPU_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="tpu tier is opt-in: pass --tpu (or FASTECC_TPU_TESTS=1)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)
