"""Out-of-process control plane — the pluggable PubSub analogue.

The reference's queries arrive from OUTSIDE the running topology: a
QuerySpout polls a pluggable PubSub (/root/reference src/main/java/com/
yahoo/bullet/storm/QuerySpout.java:91,113-148) and emits query/signal
tuples into the stream. The in-process ``ControlChannel`` (registry.py)
covers embedded use; this module adds the out-of-process flavor a
service deployment needs, without requiring Kafka in the container:

* ``FileControlChannel`` — engine side: drains a spool DIRECTORY of
  JSON message files once per micro-batch. Any process that can write a
  file can submit or kill a query while the stream runs.
* ``FileControlClient`` — client side: atomically drops submission /
  signal files into the spool from another process (or another host via
  a shared filesystem). Accepts either a BQL string or a Query object
  (serialized with the language-neutral plans/serde JSON codec).

Wire format (one JSON object per file):

    {"id": "q1", "bql": "SELECT COUNT(*) AS c FROM events ..."}
    {"id": "q1", "query": {...plans/serde dict...}}
    {"id": "q1", "signal": "KILL"}

Atomicity: writers create ``<name>.tmp`` and ``os.replace`` it into the
spool — the engine never observes partial files (rename is atomic on a
POSIX filesystem). Ordering: file names embed a nanosecond timestamp +
per-process sequence, and the engine drains in sorted order, so
submit-then-kill from one client replays in order. Unparseable files
are quarantined as ``<name>.bad`` instead of wedging the control loop.

Scale posture: control traffic is metadata (bytes per query, not data
plane); a directory on shared storage comfortably carries thousands of
messages per tick. The same drain loop runs over a Kafka topic consumer
via ``streaming/kafka_channel.py`` (``KafkaControlChannel`` — same wire
format, offset-committed at-least-once) — the engine only ever sees
PubSubMessage.
"""

from __future__ import annotations

import itertools
import json
import os
import time
from typing import Any

from bullet_storm_spark.plans.query import Query
from bullet_storm_spark.streaming.registry import PubSubMessage, Signal


def _encode(query_id: str, query: Query | None, signal: Signal | None) -> dict:
    from bullet_storm_spark.plans.serde import query_to_dict

    msg: dict[str, Any] = {"id": query_id}
    if query is not None:
        msg["query"] = query_to_dict(query)
    if signal is not None:
        msg["signal"] = signal.value
    return msg


def _decode(payload: dict) -> PubSubMessage:
    content = None
    if "query" in payload:
        from bullet_storm_spark.plans.serde import query_from_dict

        content = query_from_dict(payload["query"])
    elif "bql" in payload:
        from bullet_storm_spark.bql import parse

        content = parse(payload["bql"])
    signal = Signal(payload["signal"]) if payload.get("signal") else None
    return PubSubMessage(payload["id"], content, signal, payload.get("meta", {}))


class _SpoolWriter:
    """Atomic, ordered message file writer shared by client and channel."""

    def __init__(self, spool_dir: str) -> None:
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self._seq = itertools.count()

    def write(self, msg: dict) -> str:
        name = f"{time.time_ns():020d}-{next(self._seq):06d}-{os.getpid()}.json"
        tmp = os.path.join(self.spool_dir, name + ".tmp")
        with open(tmp, "w") as f:
            json.dump(msg, f)
        final = os.path.join(self.spool_dir, name)
        os.replace(tmp, final)
        return final


class FileControlClient:
    """Submit/kill queries in a running engine from ANY process."""

    def __init__(self, spool_dir: str) -> None:
        self._writer = _SpoolWriter(spool_dir)

    def submit(self, query_id: str, query: Query | str) -> None:
        if isinstance(query, str):
            self._writer.write({"id": query_id, "bql": query})
        else:
            self._writer.write(_encode(query_id, query, None))

    def signal(self, query_id: str, signal: Signal) -> None:
        self._writer.write({"id": query_id, "signal": signal.value})

    def kill(self, query_id: str) -> None:
        self.signal(query_id, Signal.KILL)


class FileControlChannel:
    """Engine-side channel: same drain() contract as ControlChannel, fed
    by the spool directory. Engine-local submit()/signal() write through
    the same spool so embedded and external submissions share one ordered
    bus."""

    def __init__(self, spool_dir: str) -> None:
        self.spool_dir = spool_dir
        self._writer = _SpoolWriter(spool_dir)

    def submit(self, query_id: str, query: Query, **metadata: Any) -> None:
        msg = _encode(query_id, query, None)
        if metadata:
            msg["meta"] = metadata
        self._writer.write(msg)

    def signal(self, query_id: str, signal: Signal) -> None:
        self._writer.write({"id": query_id, "signal": signal.value})

    def drain(self) -> list[PubSubMessage]:
        try:
            names = sorted(
                n for n in os.listdir(self.spool_dir) if n.endswith(".json")
            )
        except FileNotFoundError:
            return []
        out: list[PubSubMessage] = []
        for name in names:
            path = os.path.join(self.spool_dir, name)
            try:
                with open(path) as f:
                    payload = json.load(f)
                out.append(_decode(payload))
            except Exception:  # noqa: BLE001 — quarantine, don't wedge
                try:
                    os.replace(path, path + ".bad")
                except OSError:
                    pass
                continue
            try:
                os.remove(path)
            except OSError:
                pass
        return out
