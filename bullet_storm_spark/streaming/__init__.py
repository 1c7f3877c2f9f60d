"""Streaming execution: the Spark translation of the reference topology
(SURVEY.md §3): QuerySpout+QueryManager -> QueryRegistry + ControlChannel;
FilterBolt partial aggregation -> per-micro-batch compiled plans;
JoinBolt combine/window/lifecycle -> mergeable QueryState + the engine's
per-batch tick; ResultBolt -> result sink callbacks emitting Clips."""

from bullet_storm_spark.streaming.state import make_state, QueryState
from bullet_storm_spark.streaming.registry import (
    ControlChannel,
    QueryRegistry,
    RunningQuery,
    Signal,
)
from bullet_storm_spark.streaming.channels import (
    FileControlChannel,
    FileControlClient,
)
from bullet_storm_spark.streaming.kafka_channel import (
    InMemoryKafka,
    KafkaControlChannel,
    KafkaControlClient,
)
from bullet_storm_spark.streaming.engine import StreamingEngine

__all__ = [
    "make_state",
    "QueryState",
    "ControlChannel",
    "FileControlChannel",
    "FileControlClient",
    "InMemoryKafka",
    "KafkaControlChannel",
    "KafkaControlClient",
    "QueryRegistry",
    "RunningQuery",
    "Signal",
    "StreamingEngine",
]
