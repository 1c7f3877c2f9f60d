"""Bucketed-table helpers — shuffle-free co-located joins for repeated
workloads.

At 100 TB the dominant cost of a fact-fact join is the shuffle. Writing
both sides bucketed on the join key (`bucketBy`) makes the partitioning a
property of the TABLE, so every subsequent join/aggregation on that key
skips its exchange entirely (verified by plan assertion in tests). This is
the standing-pipeline complement to AQE: AQE optimizes one query's
shuffles, bucketing removes them across queries and days.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist df as a bucketed (and optionally sorted) managed table.
    Sorting within buckets additionally removes the sort of a sort-merge
    join on the same key."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> bool:
    """True when joining the two bucketed tables on ``on`` plans no
    exchange on either side — the co-location check."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    import re

    plan = (
        left.join(right, on)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    return re.search(r"\bExchange\b", plan) is None
