"""Streaming metrics listener (reference E4: metrics.go:57-169 — Prometheus
counters for processed/failed msgs and bytes plus latency summaries).

Spark's StreamingQueryListener delivers per-batch progress events; this
listener folds them into the same counter set the reference exposes at
:2112/metrics.  Export to Prometheus is a textfile/pushgateway one-liner on
top of `snapshot()` — kept out of the engine (no HTTP server dependencies),
exactly like the reference keeps metrics.go separate from the pipeline.
"""

from __future__ import annotations

import threading
from collections import deque
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener

# Rolling window for the duration quantiles: a 30s-trigger query appends
# one entry per batch FOREVER otherwise (~1M/year), and every scrape
# re-sorts the whole history.  2048 recent batches ≈ 17h at 30s triggers —
# plenty for q50/q90/q99 of current behavior, constant memory and scrape
# cost (the reference's summary objectives are windowed too).
DURATION_WINDOW = 2048


@dataclass
class Counters:
    batches: int = 0
    input_rows: int = 0
    processed_rows_per_sec_last: float = 0.0
    batch_duration_ms: deque = field(
        default_factory=lambda: deque(maxlen=DURATION_WINDOW)
    )

    def snapshot(self) -> dict:
        durs = sorted(self.batch_duration_ms)

        def q(p: float) -> float:
            if not durs:
                return 0.0
            return durs[min(int(p * len(durs)), len(durs) - 1)]

        # q50/q90/q99 — the reference's summary objectives (metrics.go:58-81)
        return {
            "batches": self.batches,
            "input_rows": self.input_rows,
            "rows_per_sec": self.processed_rows_per_sec_last,
            "duration_ms_q50": q(0.50),
            "duration_ms_q90": q(0.90),
            "duration_ms_q99": q(0.99),
        }


class MetricsListener(StreamingQueryListener):
    def __init__(self):
        self.counters = Counters()
        self._lock = threading.Lock()

    def snapshot(self) -> dict:
        """Locked snapshot — a scrape concurrent with onQueryProgress must
        not see torn multi-field state (batches bumped, rows not yet) or
        iterate the duration window mid-append."""
        with self._lock:
            return self.counters.snapshot()

    def onQueryStarted(self, event):  # noqa: N802 — Spark API names
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        with self._lock:
            self.counters.batches += 1
            self.counters.input_rows += int(p.numInputRows)
            self.counters.processed_rows_per_sec_last = float(p.processedRowsPerSecond or 0.0)
            dur = p.durationMs or {}
            total = dur.get("triggerExecution") if hasattr(dur, "get") else None
            if total is not None:
                self.counters.batch_duration_ms.append(int(total))

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def onQueryTerminated(self, event):  # noqa: N802
        pass


def to_prometheus_text(counters: Counters, prefix: str = "persistor") -> str:
    """Render the counter snapshot in Prometheus text exposition format —
    the same metric family shape the reference serves at :2112/metrics
    (metrics.go:148-169); write to a textfile-collector path or push
    gateway."""
    snap = counters.snapshot()
    lines = [
        f"# TYPE {prefix}_processed_batches_total counter",
        f"{prefix}_processed_batches_total {snap['batches']}",
        f"# TYPE {prefix}_processed_messages_total counter",
        f"{prefix}_processed_messages_total {snap['input_rows']}",
        f"# TYPE {prefix}_processing_rate_rows_per_second gauge",
        f"{prefix}_processing_rate_rows_per_second {snap['rows_per_sec']}",
        f"# TYPE {prefix}_processing_times_milliseconds summary",
        f'{prefix}_processing_times_milliseconds{{quantile="0.5"}} {snap["duration_ms_q50"]}',
        f'{prefix}_processing_times_milliseconds{{quantile="0.9"}} {snap["duration_ms_q90"]}',
        f'{prefix}_processing_times_milliseconds{{quantile="0.99"}} {snap["duration_ms_q99"]}',
    ]
    return "\n".join(lines) + "\n"


def attach(spark) -> MetricsListener:
    listener = MetricsListener()
    spark.streams.addListener(listener)
    return listener


def detach(spark, listener: MetricsListener) -> None:
    spark.streams.removeListener(listener)
