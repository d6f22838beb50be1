"""Failure detection + retry — SURVEY.md §5 (the reference has none: a
FATALERROR dialog and silent returns).

The practical failure mode on shared TPU runtimes is a worker crash/restart
surfacing as `JaxRuntimeError: UNAVAILABLE`; long benches and training
loops should survive it.  `with_retries` re-runs the step after a backoff
(the runtime re-initializes lazily on next use)."""

from __future__ import annotations

import sys
import time


RETRYABLE_MARKERS = ("UNAVAILABLE", "worker process crashed",
                     "DEADLINE_EXCEEDED", "connection reset")


def is_retryable(exc: BaseException) -> bool:
    text = f"{type(exc).__name__}: {exc}"
    return any(m.lower() in text.lower() for m in RETRYABLE_MARKERS)


def with_retries(fn, attempts: int = 3, backoff_s: float = 60.0,
                 log=lambda *a: print(*a, file=sys.stderr)):
    """Run fn() with retry-on-runtime-failure; re-raises non-retryable or
    exhausted errors."""
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — classified below
            if attempt + 1 >= attempts or not is_retryable(exc):
                raise
            log(f"[retry] attempt {attempt + 1} failed with retryable error: "
                f"{type(exc).__name__}; sleeping {backoff_s:.0f}s")
            time.sleep(backoff_s)
    raise RuntimeError("unreachable")
