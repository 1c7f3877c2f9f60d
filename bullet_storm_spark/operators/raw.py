"""RAW aggregation — collect at most N matching (projected) records.

Reference: RAW queries cap output at ``size`` and truncate any excess
(/root/reference src/test/java/com/yahoo/bullet/storm/JoinBoltTest.java:
340-351,644-660); in streaming mode a RAW query completes when full
(FilterBolt early-termination, FilterBoltTest.java:712-738 — handled by the
streaming registry, not here).

Spark lowering is just ``limit(n)``: Catalyst plans a CollectLimit that stops
scanning once n rows are found per partition and short-circuits globally —
at 100 TB this reads a handful of row groups and no shuffle. An OrderBy
post-aggregation turns it into a TakeOrderedAndProject (top-n per partition,
merge on driver) — still no full sort at scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from bullet_storm_spark.operators.common import apply_post, post_sql
from bullet_storm_spark.plans.query import PostAggregation, Raw


def apply(df: DataFrame, agg: Raw, post: Sequence[PostAggregation]) -> DataFrame:
    return apply_post(df, post, agg.size)


def sql(agg: Raw, base_sql: str, post: Sequence[PostAggregation]) -> str:
    return post_sql(f"SELECT * FROM ({base_sql})", post, agg.size)
