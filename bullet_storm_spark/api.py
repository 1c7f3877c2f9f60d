"""Synchronous query API — the DRPC-path analogue.

The reference's DRPC pubsub serves exactly one final response per query and
therefore requires windowing disabled (SURVEY.md §3.3; /root/reference
src/main/java/com/yahoo/bullet/storm/drpc/DRPCConfig.java:96-98,139-147;
bullet_storm_defaults.yaml:191-195). ``execute`` enforces the same
constraint: one Query in, one Clip out, over a bounded DataFrame.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession

from bullet_storm_spark.clip import (
    Clip,
    QUERY_FINISH_TIME_KEY,
    QUERY_ID_KEY,
    QUERY_RECEIVE_TIME_KEY,
)
from bullet_storm_spark.plans.compiler import compile_query
from bullet_storm_spark.plans.query import Query


def execute(
    query: Query,
    df: DataFrame | None = None,
    spark: SparkSession | None = None,
    query_id: str = "drpc-query",
) -> Clip:
    """Run a query synchronously and return its Clip.

    ``df`` defaults to the temp view named by query.source (register tables
    with sources.tables.load_tables first).
    """
    if query.window is not None:
        raise ValueError(
            "synchronous (DRPC-style) execution supports exactly one final "
            "response; windowed queries must run on the StreamingEngine "
            "(reference: DRPCConfig windowing disabled)"
        )
    receive_ms = int(time.time() * 1000)
    if df is None:
        if spark is None:
            raise ValueError("provide df or spark")
        df = spark.table(query.source)
    out = compile_query(query)(df)
    records = [r.asDict(recursive=True) for r in out.collect()]
    return Clip.of(
        records,
        **{
            QUERY_ID_KEY: query_id,
            QUERY_RECEIVE_TIME_KEY: receive_ms,
            QUERY_FINISH_TIME_KEY: int(time.time() * 1000),
        },
    )
