"""TOP K aggregation — most frequent value-combinations.

Reference: frequent-items sketch over >=1 fields with aliasing, optional
min-count threshold, count alias, NO_FALSE_NEGATIVES error model, values
stringified with missing rendered "null"
(/root/reference src/test/java/com/yahoo/bullet/storm/FilterBoltTest.java:
788-832; threshold JoinBoltTest.java:846-893; "null" rendering
FilterBoltTest.java:827-828).

Spark lowering: groupBy(stringified keys).count -> threshold filter ->
ORDER BY count DESC (tie-broken by the group values ascending, which the
reference's sketch leaves unspecified — we pin it for determinism) ->
LIMIT k. Catalyst plans partial counts before the exchange and
TakeOrderedAndProject for the sort+limit, so the full group list is never
materialized on one node. Exact counts; at genuinely unbounded key
cardinality the GROUP BY state is the scale limit, in which case a
space-saving sketch over mapInPandas is the drop-in (see
streaming.state for the mergeable-partial variant).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from bullet_storm_spark.operators.common import apply_post, post_sql
from bullet_storm_spark.plans.query import PostAggregation, TopK

NULL_RENDERING = "null"


def apply(df: DataFrame, agg: TopK, post: Sequence[PostAggregation]) -> DataFrame:
    keys = [
        F.coalesce(F.col(f).cast("string"), F.lit(NULL_RENDERING)).alias(
            agg.alias_of(f)
        )
        for f in agg.fields
    ]
    out = df.groupBy(*keys).agg(F.count(F.lit(1)).alias(agg.name))
    if agg.threshold is not None:
        out = out.where(F.col(agg.name) >= F.lit(agg.threshold))
    aliases = [agg.alias_of(f) for f in agg.fields]
    out = out.orderBy(
        F.col(agg.name).desc(), *[F.col(a).asc() for a in aliases]
    ).limit(agg.size)
    return apply_post(out, post, None)


def sql(agg: TopK, base_sql: str, post: Sequence[PostAggregation]) -> str:
    aliases = [agg.alias_of(f) for f in agg.fields]
    key_exprs = ", ".join(
        f"COALESCE(CAST({f} AS VARCHAR), '{NULL_RENDERING}') AS {agg.alias_of(f)}"
        for f in agg.fields
    )
    group = ", ".join(aliases)
    inner = (
        f"SELECT {key_exprs}, COUNT(*) AS {agg.name} FROM ({base_sql}) "
        f"GROUP BY {group}"
    )
    if agg.threshold is not None:
        inner += f" HAVING COUNT(*) >= {agg.threshold}"
    order = ", ".join([f"{agg.name} DESC"] + [f"{a} ASC" for a in aliases])
    inner = f"SELECT * FROM ({inner}) ORDER BY {order} LIMIT {agg.size}"
    return post_sql(inner, post, None)
