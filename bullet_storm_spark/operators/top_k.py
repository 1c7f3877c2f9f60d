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

# Reference parity: TOP K stringifies every field and renders missing
# values as the literal string "null" (T/TopKTest fixtures).  CONTRACT:
# a genuine string value "null" therefore merges with NULLs into one
# counter — a deliberate collision inherited from the reference, shared
# by streaming/native.stream_topk so batch and stream stay replay-equal.
NULL_RENDERING = "null"


def apply(df: DataFrame, agg: TopK, post: Sequence[PostAggregation]) -> DataFrame:
    if agg.sketch_capacity is not None:
        # bounded-state SpaceSaving path: per-partition sketches merged on
        # the driver (the reference's frequent-items-sketch contract);
        # exact — with a zero error column — whenever the true key
        # cardinality fits the capacity, like the reference's own
        # 256-distinct exactness tests (FilterBoltTest.java:704-709)
        from bullet_storm_spark.operators.sketches import top_k_sketch

        out = top_k_sketch(
            df,
            agg.fields,
            agg.size,
            agg.name,
            capacity=agg.sketch_capacity,
            threshold=agg.threshold,
        )
        return apply_post(out, post, None)
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
    counts = f"COUNT(*) AS {agg.name}"
    if agg.sketch_capacity is not None:
        # sketch twin: valid as an EXACT oracle only while the true key
        # cardinality fits the sketch capacity (estimates are then exact
        # and every error bound is 0) — the caller owns that contract
        counts += f", CAST(0 AS BIGINT) AS {agg.name}_error"
    inner = (
        f"SELECT {key_exprs}, {counts} FROM ({base_sql}) "
        f"GROUP BY {group}"
    )
    if agg.threshold is not None:
        inner += f" HAVING COUNT(*) >= {agg.threshold}"
    order = ", ".join([f"{agg.name} DESC"] + [f"{a} ASC" for a in aliases])
    inner = f"SELECT * FROM ({inner}) ORDER BY {order} LIMIT {agg.size}"
    return post_sql(inner, post, None)
