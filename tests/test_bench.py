"""bench.py harness behavior: backend probe retry + pair-split pins.

The probe guards the driver's end-of-round measurement: the tunneled TPU
backend hangs in C++ when its remote peer is down, and observed outages
are transient (a probe that failed retried clean minutes later). These
tests pin the retry contract without touching any backend.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


class _FakeProc:
    def __init__(self, rc):
        self.returncode = rc


def test_probe_retries_then_fails(monkeypatch):
    import subprocess
    import time

    calls = []
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: (calls.append(1), _FakeProc(1))[1])
    sleeps = []
    monkeypatch.setattr(time, "sleep", lambda s: sleeps.append(s))

    assert bench._probe_backend(timeout_s=1, attempts=3,
                                retry_delay_s=7) is False
    assert len(calls) == 3
    assert sleeps == [7, 7]          # no sleep before the first attempt


def test_probe_transient_outage_recovers(monkeypatch):
    import subprocess
    import time

    rcs = iter([1, 0])               # first attempt fails, second succeeds
    calls = []
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: (calls.append(1),
                                         _FakeProc(next(rcs)))[1])
    monkeypatch.setattr(time, "sleep", lambda s: None)

    assert bench._probe_backend(timeout_s=1, attempts=3,
                                retry_delay_s=0) is True
    assert len(calls) == 2           # stopped as soon as one succeeded


def test_probe_single_shot_via_env(monkeypatch):
    import subprocess
    import time

    calls = []
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: (calls.append(1), _FakeProc(1))[1])
    monkeypatch.setattr(time, "sleep",
                        lambda s: pytest.fail("single-shot must not sleep"))
    monkeypatch.setenv("FASTECC_PROBE_ATTEMPTS", "1")

    assert bench._probe_backend(timeout_s=1) is False
    assert len(calls) == 1


def test_median_helper():
    from fastecc_tpu.utils.timer import median

    assert median([3.0, 1.0, 2.0]) == 2.0
    assert median([4.0, 1.0, 2.0, 3.0]) == 2.5


def test_marginal_from_samples(monkeypatch):
    """The marginal is the difference of MEDIANS with a conservative
    min/max spread envelope; indistinguishable chains gate to None
    (round-3 verdict: headline numbers must be medians-with-spread)."""
    monkeypatch.setattr(bench, "_DISPATCH_SECS", 0.04)
    s1 = [0.10, 0.11, 0.12]
    m, spread = bench._marginal_from_samples([0.20, 0.21, 0.22], s1)
    assert m == pytest.approx(0.10)
    assert spread == (pytest.approx(0.08), pytest.approx(0.12))
    # chain statistically indistinguishable from the single call: gated
    assert bench._marginal_from_samples([0.111, 0.112, 0.113], s1) == \
        (None, None)
    assert bench._marginal_from_samples(None, s1) == (None, None)


def test_stats_reports_median_spread_and_samples():
    s = bench._stats([0.3, 0.1, 0.2])
    assert s == {"median": 0.2, "min": 0.1, "max": 0.3, "n": 3,
                 "samples": [0.3, 0.1, 0.2]}


def test_pair_default_c_split_pins():
    """Pin the measured-best seam-pair split (tools/onchip_r3.log):
    balanced up to 2^16, shallow-c1/deep-r1 above (c1=512 beat the
    balanced 1024 by 17% at the headline n=2^19 pair)."""
    from fastecc_tpu.kernels.ntt_mfa import _TR, _pair_default_c

    for t in range(6, 21):
        n = 1 << t
        c1 = _pair_default_c(n)
        assert n % c1 == 0 and c1 >= _TR and n // c1 >= _TR

    assert _pair_default_c(1 << 14) == 1 << 7    # balanced
    assert _pair_default_c(1 << 16) == 1 << 8    # balanced (boundary)
    assert _pair_default_c(1 << 17) == 1 << 8    # shallow c1 from here up
    assert _pair_default_c(1 << 19) == 1 << 9    # the measured winner
    assert _pair_default_c(1 << 20) == 1 << 9


def test_is_oom_classifier():
    """The OOM fallback must shrink shapes ONLY on resource exhaustion —
    any other error propagates to the metric's loud error record
    (round-4 weak #4: a catch-all here is how a metric vanished)."""
    import bench

    assert bench._is_oom(RuntimeError(
        "RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted)."))
    assert bench._is_oom(MemoryError("out of memory"))
    assert not bench._is_oom(ValueError("shape mismatch"))
    assert not bench._is_oom(RuntimeError("Mosaic lowering failed"))


def test_metric_runner_registry_matches_json_keys():
    """Every secondary metric the parent assembles has an --only runner
    (the subprocess isolation depends on the names lining up)."""
    import bench

    assert set(bench._METRIC_RUNNERS) == {
        "ntt", "decode", "gf16_encode", "gf16_wiredomain",
        "gf32_wiredomain", "decode_wiredomain_gf16",
        "decode_wiredomain_gf32"}
