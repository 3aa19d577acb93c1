"""Error classification + flow control (reference E2/E3:
processor_errors.go:27-98 fatal-vs-temporary; run.go:157-187 run options —
50 errors per 1-minute window, 0 retries, pull errors fatal).

In Spark the "executor" is the StreamingQuery: a fatal error propagates out
of foreachBatch and stops the query (the reference's FatalError stop); a
temporary error is counted against a sliding-window budget and the batch is
dead-lettered wholesale; budget exhaustion stops the query.
"""

from __future__ import annotations

import time
from collections import deque
from dataclasses import dataclass


class FatalIngestError(RuntimeError):
    """Non-retryable (the reference treats schema/config errors as fatal —
    write_to_avro.go:50,63)."""


class TemporaryIngestError(RuntimeError):
    """Retryable per the reference's Temporary() contract."""


# error classes considered fatal when raised by a sink/transform
_FATAL_MARKERS = (
    "AnalysisException",  # schema/plan errors never self-heal
    "ParseException",
)


def classify(exc: Exception) -> str:
    """'fatal' or 'temporary' (processor_errors.go: everything is temporary
    unless marked; schema errors are fatal).

    Errors raised inside foreachBatch surface as StreamingQueryException with
    the original Python traceback embedded in the message, so both the type
    name AND the message are scanned for fatal markers."""
    if isinstance(exc, FatalIngestError):
        return "fatal"
    if isinstance(exc, TemporaryIngestError):
        return "temporary"
    haystack = type(exc).__name__ + " " + str(exc)
    if any(m in haystack for m in _FATAL_MARKERS + ("FatalIngestError",)):
        return "fatal"
    return "temporary"


@dataclass
class ErrorBudget:
    """Sliding-window error budget (run.go:159-162: 50 errors / 1 min)."""

    max_errors: int = 50
    window_s: float = 60.0

    def __post_init__(self):
        self._events: deque[float] = deque()

    def record(self, now: float | None = None) -> bool:
        """Record one error; returns True while within budget."""
        now = time.monotonic() if now is None else now
        self._events.append(now)
        cutoff = now - self.window_s
        while self._events and self._events[0] < cutoff:
            self._events.popleft()
        return len(self._events) <= self.max_errors

    @property
    def current(self) -> int:
        return len(self._events)


class BudgetExhausted(RuntimeError):
    pass


def guard_batch(budget: ErrorBudget, fn, *args, **kwargs):
    """Run one micro-batch handler under the flow-control policy:
    fatal -> re-raise (query stops); temporary -> swallow while within
    budget (batch is skipped/dead-lettered by the caller), raise
    BudgetExhausted once the window overflows."""
    try:
        return fn(*args, **kwargs)
    except Exception as exc:  # noqa: BLE001 — classification IS the point
        kind = classify(exc)
        if kind == "fatal":
            raise
        if not budget.record():
            raise BudgetExhausted(
                f"error budget exhausted: {budget.current} errors in {budget.window_s}s"
            ) from exc
        return None
