"""Failure-detection utilities (SURVEY.md section 5.3 analog)."""

import pytest

from flashattention_kernel_project_tpu.utils import health


@pytest.mark.smoke
def test_healthcheck_ok():
    r = health.device_healthcheck()
    assert r["ok"], r
    assert r["latency_s"] < 30


def test_transient_classification():
    assert health.is_transient_error(
        RuntimeError("UNAVAILABLE: TPU worker process crashed or restarted")
    )
    assert not health.is_transient_error(ValueError("shape mismatch"))


@pytest.mark.smoke
def test_with_retries_recovers_transient():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("UNAVAILABLE: socket closed")
        return 42

    assert health.with_retries(flaky, max_retries=3, cooldown_s=0.0) == 42
    assert len(calls) == 3


def test_with_retries_fails_fast_on_fatal():
    def fatal():
        raise ValueError("kernel bug")

    with pytest.raises(ValueError):
        health.with_retries(fatal, max_retries=5, cooldown_s=0.0)
