"""Result sinks — ResultBolt/PublisherBolt analogues.

The reference publishes (id, resultJSON, metadata) PubSubMessages
(/root/reference src/main/java/com/yahoo/bullet/storm/ResultBolt.java:38-43,
PublisherBolt.java:60-74). Here a sink is a result-handler attached to
StreamingEngine.on_result; Clips are already the JSON envelope.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import SparkSession

from bullet_storm_spark.clip import Clip


class MemoryResultSink:
    """Collects (query_id, Clip) — the MockPubSub of our test harness."""

    def __init__(self) -> None:
        self.messages: list[tuple[str, Clip]] = []

    def __call__(self, query_id: str, clip: Clip) -> None:
        self.messages.append((query_id, clip))

    def for_query(self, query_id: str) -> list[Clip]:
        return [c for i, c in self.messages if i == query_id]


class ConsoleResultSink:
    def __call__(self, query_id: str, clip: Clip) -> None:
        print(f"[{query_id}] {clip.to_json()}")


class JsonlResultSink:
    """Append results to a JSONL file: one {query_id, ts_ms, clip} per line.
    Durable, replayable, and trivially loadable back into Spark."""

    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def __call__(self, query_id: str, clip: Clip) -> None:
        rec = {
            "query_id": query_id,
            "ts_ms": int(time.time() * 1000),
            "clip": json.loads(clip.to_json()),
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(rec, default=str) + "\n")


class KafkaResultSink:
    """Publish result JSON to a Kafka topic via Spark's kafka sink (batch
    write per result). Config-complete; requires a reachable broker."""

    def __init__(self, spark: SparkSession, bootstrap_servers: str, topic: str) -> None:
        self.spark = spark
        self.servers = bootstrap_servers
        self.topic = topic

    def __call__(self, query_id: str, clip: Clip) -> None:
        df = self.spark.createDataFrame(
            [(query_id, clip.to_json())], "key string, value string"
        )
        (
            df.write.format("kafka")
            .option("kafka.bootstrap.servers", self.servers)
            .option("topic", self.topic)
            .save()
        )


class ProducerResultSink:
    """Publish each result to a Kafka-protocol producer (the duck-typed
    ``send(topic, value=bytes, key=bytes)`` surface of
    streaming/kafka_channel.py) — the ResultBolt->PubSub leg over the
    same log transport the control channel uses, so the whole
    submit->execute->result loop rides one broker. Works unchanged with
    a real KafkaProducer or the in-process InMemoryKafka."""

    def __init__(self, producer, topic: str = "bullet.results") -> None:
        self.producer = producer
        self.topic = topic

    def __call__(self, query_id: str, clip: Clip) -> None:
        self.producer.send(
            self.topic,
            value=clip.to_json().encode("utf-8"),
            key=query_id.encode("utf-8"),
        )
