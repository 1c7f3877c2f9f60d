"""Kafka-class control transport (streaming/kafka_channel.py): the
PubSubMessage drain loop over a partitioned, offset-committed log —
QuerySpout's poll/ack contract (reference QuerySpout.java:113-148,166-180)
— driven through the in-memory broker that implements the kafka-python
protocol subset the channel touches."""

import json

from pyspark.sql import functions as F

from bullet_storm_spark.clip import SIGNAL_KEY
from bullet_storm_spark.plans.query import Query, Raw
from bullet_storm_spark.streaming import Signal, StreamingEngine
from bullet_storm_spark.streaming.kafka_channel import (
    InMemoryKafka,
    KafkaControlChannel,
    KafkaControlClient,
)

TOPIC = "bullet.queries"


def _channel(broker, group="engine"):
    return KafkaControlChannel(
        broker.consumer(TOPIC, group), broker.producer(), TOPIC
    )


def test_roundtrip_kinds_and_per_key_order():
    broker = InMemoryKafka()
    client = KafkaControlClient(broker.producer(), TOPIC)
    channel = _channel(broker)
    client.submit("q1", Query(aggregation=Raw(size=3)))  # serde dict
    client.submit("q2", "SELECT COUNT(*) AS cnt FROM STREAM(60000, TIME)")  # BQL
    client.kill("q1")
    msgs = channel.drain()
    assert {m.id for m in msgs} == {"q1", "q2"}
    assert isinstance(msgs[0].content, Query) or isinstance(msgs[1].content, Query)
    # per-key ordering: q1's submit precedes q1's kill (same partition)
    q1 = [m for m in msgs if m.id == "q1"]
    assert isinstance(q1[0].content, Query) and q1[1].signal == Signal.KILL
    assert channel.drain() == []  # committed: not redelivered


def test_crash_before_commit_replays_to_next_consumer():
    """At-least-once: a consumer that polls but dies before commit leaves
    the records uncommitted; its replacement (same group) re-reads them."""
    broker = InMemoryKafka()
    KafkaControlClient(broker.producer(), TOPIC).submit(
        "qx", Query(aggregation=Raw(size=1))
    )
    doomed = broker.consumer(TOPIC, "engine")
    polled = doomed.poll()
    assert sum(len(v) for v in polled.values()) == 1
    # no commit — the consumer "crashes" here
    replacement = _channel(broker, group="engine")
    msgs = replacement.drain()
    assert [m.id for m in msgs] == ["qx"]
    # this drain DID commit: a further replacement sees nothing
    assert _channel(broker, group="engine").drain() == []


def test_committed_offsets_survive_consumer_restart():
    broker = InMemoryKafka()
    client = KafkaControlClient(broker.producer(), TOPIC)
    client.submit("a", Query(aggregation=Raw(size=1)))
    ch = _channel(broker)
    assert [m.id for m in ch.drain()] == ["a"]
    client.submit("b", Query(aggregation=Raw(size=1)))
    fresh = _channel(broker)  # new consumer, same group
    assert [m.id for m in fresh.drain()] == ["b"]  # resumes AFTER the commit


def test_poison_pill_skipped_and_not_redelivered():
    broker = InMemoryKafka()
    producer = broker.producer()
    producer.send(TOPIC, value=b"{not json", key=b"junk")
    KafkaControlClient(producer, TOPIC).submit("ok", Query(aggregation=Raw(size=1)))
    channel = _channel(broker)
    assert [m.id for m in channel.drain()] == ["ok"]
    assert channel.drain() == []  # the poison record was committed past


def test_engine_submit_and_kill_through_kafka_channel(spark):
    """Engine wired to the Kafka channel: an external client submits a
    standing query through the log, the engine picks it up on the next
    batch, serves results, then honors a kill from the same log. Replayed
    (duplicate) submissions are absorbed by the registry."""
    broker = InMemoryKafka()
    engine = StreamingEngine(spark, channel=_channel(broker))
    client = KafkaControlClient(broker.producer(), TOPIC)

    batch = spark.range(50).select(
        F.col("id").cast("double").alias("value"),
        (F.col("id") % 5).cast("string").alias("event_type"),
    )
    client.submit(
        "k1", "SELECT COUNT(*) AS cnt FROM STREAM(600000, TIME) WHERE value >= 0"
    )
    client.submit(  # replay of the same id: duplicate suppression territory
        "k1", "SELECT COUNT(*) AS cnt FROM STREAM(600000, TIME) WHERE value >= 0"
    )
    engine.process_batch(batch)
    assert len(engine.registry.active()) == 1
    assert engine.registry.duplicates_ignored == 1

    client.kill("k1")
    engine.process_batch(batch)
    assert engine.registry.active() == []
    killed = [c for qid, c in engine.results if qid == "k1"][-1]
    assert json.loads(killed.to_json())["meta"][SIGNAL_KEY] == "KILL"


def test_kafka_submit_and_kill_while_attached(spark, tmp_path):
    """Live-stream shape: engine runs attach() with the Kafka channel;
    a client publishes a submit onto the log, sees windowed results
    emitted, then kills through the same log (the QuerySpout loop over
    the offset-committed transport, end-to-end)."""
    import os
    import time

    from pyspark.sql import functions as F

    broker = InMemoryKafka()
    engine = StreamingEngine(spark, channel=_channel(broker))
    client = KafkaControlClient(broker.producer(), TOPIC)
    src = str(tmp_path / "stream-src")
    os.makedirs(src)
    base = spark.range(100).select(
        F.col("id").cast("double").alias("value"),
        (F.col("id") % 5).cast("string").alias("event_type"),
    )
    base.write.mode("append").parquet(src)
    stream = spark.readStream.schema(base.schema).parquet(src)
    query = engine.attach(stream, trigger_ms=100)
    try:
        client.submit(
            "live1",
            "SELECT COUNT(*) AS cnt FROM STREAM(600000, TIME) "
            "WINDOWING EVERY(500, TIME)",
        )
        deadline = time.time() + 30
        while "live1" not in engine.registry.queries:
            assert time.time() < deadline, "kafka submission never arrived"
            base.limit(0).write.mode("append").parquet(src)
            time.sleep(0.2)
        while not any(i == "live1" and c.records for i, c in engine.results):
            assert time.time() < deadline, "no windowed result emitted"
            base.write.mode("append").parquet(src)
            time.sleep(0.2)
        client.kill("live1")
        while "live1" in engine.registry.queries:
            assert time.time() < deadline, "kafka kill never applied"
            base.limit(0).write.mode("append").parquet(src)
            time.sleep(0.2)
    finally:
        query.stop()
    signals = [c.meta.get(SIGNAL_KEY) for i, c in engine.results if i == "live1"]
    assert signals[-1] == "KILL"
    counted = [c for i, c in engine.results if i == "live1" and c.records]
    assert counted and counted[0].records[0]["cnt"] > 0


def test_full_loop_results_ride_the_log(spark):
    """Submit arrives on the control topic, results leave on the results
    topic: the complete PubSub loop (QuerySpout in, ResultBolt out) over
    one broker."""
    from bullet_storm_spark.streaming.sinks import ProducerResultSink

    broker = InMemoryKafka()
    engine = StreamingEngine(spark, channel=_channel(broker))
    engine.result_handlers.append(ProducerResultSink(broker.producer(), "bullet.results"))
    client = KafkaControlClient(broker.producer(), TOPIC)

    batch = spark.range(20).select(
        F.col("id").cast("double").alias("value"),
        (F.col("id") % 5).cast("string").alias("event_type"),
    )
    client.submit("loop1", "SELECT COUNT(*) AS cnt FROM STREAM(600000, TIME)")
    engine.process_batch(batch)
    client.kill("loop1")
    engine.process_batch(batch)

    results_consumer = broker.consumer("bullet.results", "client")
    records = [r for recs in results_consumer.poll().values() for r in recs]
    assert records, "no results published to the log"
    payloads = [json.loads(r.value) for r in records]
    # killed queries emit an empty-records KILL clip (reference KILL
    # semantics); the signal + key routing are the loop's contract
    assert any(p["meta"].get(SIGNAL_KEY) == "KILL" for p in payloads)
    assert all(r.key == b"loop1" for r in records)
