"""Failure detection/retry tests (SURVEY.md §5)."""

import pytest

from voxtracer.utils.retry import is_retryable, with_retries


def test_retry_succeeds_after_transient():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("UNAVAILABLE: TPU worker process crashed")
        return 42

    assert with_retries(flaky, attempts=3, backoff_s=0.0, log=lambda *a: None) == 42
    assert calls["n"] == 3


def test_non_retryable_raises_immediately():
    calls = {"n": 0}

    def bad():
        calls["n"] += 1
        raise ValueError("shape mismatch")

    with pytest.raises(ValueError):
        with_retries(bad, attempts=3, backoff_s=0.0, log=lambda *a: None)
    assert calls["n"] == 1


def test_exhausted_retries_reraise():
    def always():
        raise RuntimeError("UNAVAILABLE forever")

    with pytest.raises(RuntimeError):
        with_retries(always, attempts=2, backoff_s=0.0, log=lambda *a: None)


def test_classifier():
    assert is_retryable(RuntimeError("UNAVAILABLE: worker"))
    assert not is_retryable(TypeError("bad type"))
