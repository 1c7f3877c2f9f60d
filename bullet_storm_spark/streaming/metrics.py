"""Pluggable engine metrics — the BulletMetrics analogue.

The reference publishes per-topology counters through pluggable metrics
consumers created reflectively from config (/root/reference src/main/java/
com/yahoo/bullet/storm/ReflectionUtils.java:52-99) with two shapes:
absolute counts and keyed map counts (BulletMetrics; AbsoluteCountMetric /
MapCountMetric). This module provides the same two shapes push-style:

* ``EngineMetrics`` — counter store owned by the engine; every increment
  is also fanned out to registered consumers (a consumer is any callable
  ``(name: str, key: str | None, value: int|float) -> None``).
* ``SparkListenerBridge`` — a ``StreamingQueryListener`` forwarding
  Spark's own streaming progress (started/progress/terminated, input
  rows, batch duration) into the same consumer fan-out, so engine-level
  and Spark-level telemetry land in one pluggable pipe.

Counter names mirror the reference's concepts: queries created /
improper / duplicated / killed / completed / failed / rate-exceeded,
batches processed, records consumed.

Scale note: metrics are driver-side O(1) counters — no Spark jobs, no
per-record work; the listener bridge consumes events Spark already
emits.
"""

from __future__ import annotations

from typing import Any, Callable, Protocol

MetricsConsumer = Callable[[str, "str | None", "int | float"], None]

# counter names (BulletMetrics concept parity)
QUERIES_CREATED = "queries_created"
QUERIES_IMPROPER = "queries_improper"
QUERIES_DUPLICATED = "queries_duplicated"
QUERIES_KILLED = "queries_killed"
QUERIES_COMPLETED = "queries_completed"
QUERIES_FAILED = "queries_failed"
QUERIES_RATE_EXCEEDED = "queries_rate_exceeded"
BATCHES_PROCESSED = "batches_processed"
RECORDS_CONSUMED = "records_consumed"

STREAM_STARTED = "stream_queries_started"
STREAM_TERMINATED = "stream_queries_terminated"
STREAM_INPUT_ROWS = "stream_input_rows"
STREAM_BATCH_DURATION_MS = "stream_batch_duration_ms"


class EngineMetrics:
    """Absolute + keyed counters with push fan-out to consumers."""

    def __init__(self) -> None:
        self.counts: dict[str, int | float] = {}
        self.map_counts: dict[str, dict[str, int | float]] = {}
        self._consumers: list[MetricsConsumer] = []

    def add_consumer(self, consumer: MetricsConsumer) -> None:
        self._consumers.append(consumer)

    def increment(
        self, name: str, value: int | float = 1, key: str | None = None
    ) -> None:
        if key is None:
            self.counts[name] = self.counts.get(name, 0) + value
        else:
            m = self.map_counts.setdefault(name, {})
            m[key] = m.get(key, 0) + value
        for consumer in self._consumers:
            try:
                consumer(name, key, value)
            except Exception:  # noqa: BLE001 — a broken consumer never
                pass           # takes down the data plane

    def snapshot(self) -> dict[str, Any]:
        out: dict[str, Any] = dict(self.counts)
        for name, m in self.map_counts.items():
            out[name] = dict(m)
        return out


def make_listener_bridge(metrics: EngineMetrics):
    """StreamingQueryListener forwarding Spark streaming progress into the
    metrics fan-out. Register with ``spark.streams.addListener`` (the
    engine's attach() does this when metrics are enabled)."""
    from pyspark.sql.streaming import StreamingQueryListener

    class SparkListenerBridge(StreamingQueryListener):
        def onQueryStarted(self, event) -> None:
            metrics.increment(STREAM_STARTED, 1, key=str(event.id))

        def onQueryProgress(self, event) -> None:
            p = event.progress
            metrics.increment(STREAM_INPUT_ROWS, p.numInputRows)
            duration = (p.durationMs or {}).get("triggerExecution")
            if duration is not None:
                metrics.increment(STREAM_BATCH_DURATION_MS, duration)

        def onQueryTerminated(self, event) -> None:
            metrics.increment(STREAM_TERMINATED, 1, key=str(event.id))

        def onQueryIdle(self, event) -> None:  # pragma: no cover - timing
            pass

    return SparkListenerBridge()
