"""Kafka-class control-plane transport (log/offset semantics).

The reference's PubSub is a network transport: QuerySpout polls a
subscriber for PubSubMessages and acks what the topology consumed
(/root/reference src/main/java/com/yahoo/bullet/storm/QuerySpout.java:
91,113-148,166-180 — emit on poll, ack/fail back to the PubSub). The
file spool (channels.py) covers shared-filesystem deployments; this
module is the same ``drain()`` contract over a partitioned, offset-
committed LOG, i.e. the Kafka shape:

* ``KafkaControlChannel(consumer)`` — engine side. Each drain polls the
  consumer, decodes every record's JSON value into a PubSubMessage, and
  commits offsets AFTER the poll is handed to the engine — at-least-once,
  matching the reference's ack-after-consume posture. A consumer that
  dies before commit re-reads the uncommitted suffix on restart; the
  registry's duplicate-query suppression (registry.py) makes the replay
  harmless, exactly as Bullet tolerates re-emitted PubSub messages.
* ``KafkaControlClient(producer, topic)`` — any process publishes
  submissions/signals as JSON bytes. Messages for one query id share a
  key so a keyed partitioner keeps submit-then-kill ordered.

Both sides take DUCK-TYPED Kafka objects (the subset of the public
kafka-python surface they touch): consumer ``poll(timeout_ms=...) ->
{partition: [records with .value]}`` + ``commit()``; producer
``send(topic, value=bytes, key=bytes)``. A real ``KafkaConsumer`` /
``KafkaProducer`` plugs in unchanged where the library and a broker
exist; this container has neither, so ``InMemoryKafka`` below provides
the same contract over an in-process partitioned log with committed
offsets — the transport the tests and demos drive, and an honest
statement of what is verified here: the channel protocol and its
crash/replay semantics, not broker networking.

Wire format: identical to channels.py (one JSON object per record):

    {"id": "q1", "bql": "SELECT COUNT(*) AS c FROM events ..."}
    {"id": "q1", "query": {...plans/serde dict...}}
    {"id": "q1", "signal": "KILL"}
"""

from __future__ import annotations

import json
import threading
from typing import Any

from bullet_storm_spark.plans.query import Query
from bullet_storm_spark.streaming.channels import _decode, _encode
from bullet_storm_spark.streaming.registry import PubSubMessage, Signal

DEFAULT_TOPIC = "bullet.queries"


class KafkaControlChannel:
    """Engine-side channel over a Kafka-protocol consumer.

    Same drain()/submit()/signal() contract as ControlChannel /
    FileControlChannel, so ``StreamingEngine(channel=...)`` takes it
    directly. ``producer``+``topic`` are optional: when given, engine-
    local submit()/signal() publish through the same log every external
    client uses (one ordered bus); when omitted the channel is
    consume-only and local submissions raise."""

    def __init__(
        self, consumer: Any, producer: Any = None, topic: str = DEFAULT_TOPIC
    ) -> None:
        self.consumer = consumer
        self.producer = producer
        self.topic = topic

    # -- client-side surface (engine-local submissions ride the log) ----
    def submit(self, query_id: str, query: Query, **metadata: Any) -> None:
        if self.producer is None:
            raise RuntimeError("consume-only channel: no producer configured")
        msg = _encode(query_id, query, None)
        if metadata:
            msg["meta"] = metadata
        _send(self.producer, self.topic, query_id, msg)

    def signal(self, query_id: str, signal: Signal) -> None:
        if self.producer is None:
            raise RuntimeError("consume-only channel: no producer configured")
        _send(self.producer, self.topic, query_id, {"id": query_id, "signal": signal.value})

    # -- engine-side surface -------------------------------------------
    def drain(self) -> list[PubSubMessage]:
        batches = self.consumer.poll(timeout_ms=0)
        out: list[PubSubMessage] = []
        polled = False
        for records in batches.values():
            for rec in records:
                polled = True
                try:
                    out.append(_decode(json.loads(rec.value)))
                except Exception:  # noqa: BLE001 — poison pill: skip, don't wedge
                    continue
        if polled:
            # commit only after the records are in hand: a crash between
            # poll and commit replays them to the next consumer
            # (at-least-once; duplicate suppression absorbs the replay).
            # Committed even when every record was poison — a bad message
            # must not redeliver forever.
            self.consumer.commit()
        return out


class KafkaControlClient:
    """Submit/kill queries in a running engine from ANY process that can
    reach the broker (the FileControlClient analogue over the log)."""

    def __init__(self, producer: Any, topic: str = DEFAULT_TOPIC) -> None:
        self.producer = producer
        self.topic = topic

    def submit(self, query_id: str, query: Query | str) -> None:
        if isinstance(query, str):
            _send(self.producer, self.topic, query_id, {"id": query_id, "bql": query})
        else:
            _send(self.producer, self.topic, query_id, _encode(query_id, query, None))

    def signal(self, query_id: str, signal: Signal) -> None:
        _send(self.producer, self.topic, query_id, {"id": query_id, "signal": signal.value})

    def kill(self, query_id: str) -> None:
        self.signal(query_id, Signal.KILL)


def _send(producer: Any, topic: str, key: str, msg: dict) -> None:
    producer.send(topic, value=json.dumps(msg).encode("utf-8"), key=key.encode("utf-8"))


# ---------------------------------------------------------------------------
# In-memory broker: the kafka-python protocol subset over a partitioned,
# offset-committed in-process log (no network, no external dependency)
# ---------------------------------------------------------------------------


class _Record:
    __slots__ = ("value", "key", "offset")

    def __init__(self, value: bytes, key: bytes | None, offset: int) -> None:
        self.value = value
        self.key = key
        self.offset = offset


class InMemoryKafka:
    """A partitioned append-only log with per-group committed offsets —
    the broker-side state a control topic needs, in-process. Keyed
    messages hash onto a stable partition (per-key FIFO, the Kafka
    ordering contract); consumers in one group share committed offsets,
    so a replacement consumer resumes exactly at the last commit."""

    def __init__(self, n_partitions: int = 4) -> None:
        self.n_partitions = n_partitions
        self._logs: dict[tuple[str, int], list[_Record]] = {}
        self._committed: dict[tuple[str, str, int], int] = {}  # (group, topic, part)
        self._lock = threading.Lock()

    def _partition(self, key: bytes | None) -> int:
        if key is None:
            return 0
        return hash(key) % self.n_partitions

    def producer(self) -> "InMemoryProducer":
        return InMemoryProducer(self)

    def consumer(self, topic: str, group: str = "engine") -> "InMemoryConsumer":
        return InMemoryConsumer(self, topic, group)

    # broker internals -------------------------------------------------
    def _append(self, topic: str, key: bytes | None, value: bytes) -> None:
        part = self._partition(key)
        with self._lock:
            log = self._logs.setdefault((topic, part), [])
            log.append(_Record(value, key, len(log)))

    def _fetch(
        self, group: str, topic: str, positions: dict[int, int]
    ) -> dict[int, list[_Record]]:
        """Records from each partition's session position (falling back to
        the group's committed offset — how a fresh consumer resumes)."""
        out: dict[int, list[_Record]] = {}
        with self._lock:
            for part in range(self.n_partitions):
                log = self._logs.get((topic, part), [])
                start = positions.get(
                    part, self._committed.get((group, topic, part), 0)
                )
                if start < len(log):
                    out[part] = log[start:]
        return out

    def _commit(self, group: str, topic: str, positions: dict[int, int]) -> None:
        with self._lock:
            for part, offset in positions.items():
                key = (group, topic, part)
                self._committed[key] = max(self._committed.get(key, 0), offset)


class InMemoryProducer:
    def __init__(self, broker: InMemoryKafka) -> None:
        self._broker = broker

    def send(self, topic: str, value: bytes, key: bytes | None = None) -> None:
        self._broker._append(topic, key, value)

    def flush(self) -> None:  # append is synchronous; parity with the real API
        pass


class InMemoryConsumer:
    """poll()/commit() with Kafka's position semantics: poll advances the
    in-session position (repeat polls never re-deliver to the SAME
    consumer), commit persists it to the group. Positions are not shared
    across instances, so a new consumer in the same group resumes from
    the last COMMIT — precisely the crash-replay behavior the channel's
    at-least-once contract depends on (and the test pins)."""

    def __init__(self, broker: InMemoryKafka, topic: str, group: str) -> None:
        self._broker = broker
        self.topic = topic
        self.group = group
        self._pos: dict[int, int] = {}  # partition -> session position

    def poll(self, timeout_ms: int = 0, max_records: int | None = None) -> dict:
        batches = self._broker._fetch(self.group, self.topic, self._pos)
        out = {}
        for part, records in batches.items():
            if max_records is not None:
                records = records[:max_records]
            if records:
                out[part] = records
                self._pos[part] = records[-1].offset + 1
        return out

    def commit(self) -> None:
        if self._pos:
            self._broker._commit(self.group, self.topic, dict(self._pos))

    def close(self) -> None:
        self._pos = {}
