"""COUNT DISTINCT aggregation.

Reference: approximate distinct count of a field tuple with a named output,
backed by a Theta sketch (/root/reference src/test/java/com/yahoo/bullet/
storm/FilterBoltTest.java:680-710 — 256 distinct -> exactly 256L; two-sketch
merge JoinBoltTest.java:696-735). The reference's own tests assert exactness
at small cardinality.

Spark lowering:
* exact=True  -> COUNT(DISTINCT ...). Catalyst rewrites this into a
  two-stage plan (partial distinct on the scan side, exchange on the value
  hash, final count) — the same partial/merge shape as the reference's
  sketch pipeline but exact.
* exact=False -> approx_count_distinct (HyperLogLog++, fixed-size state per
  partition, merged on a single exchange). At 100 TB this is the right
  default: state is O(1) per partition regardless of cardinality — the same
  bounded-memory contract as Bullet's Theta sketch, with rsd controlling the
  error the way Bullet's sketch-entries config does.

Multi-field tuples are canonicalized with a concat_ws('\\x1f', ...) key in
BOTH programs so null-handling (concat_ws skips nulls in Spark and DuckDB
alike) and tuple encoding agree.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from bullet_storm_spark.operators.common import apply_post, post_sql
from bullet_storm_spark.plans.query import CountDistinct, PostAggregation

_SEP = "\x1f"


def apply(df: DataFrame, agg: CountDistinct, post: Sequence[PostAggregation]) -> DataFrame:
    if len(agg.fields) == 1:
        key = F.col(agg.fields[0])
    else:
        key = F.concat_ws(_SEP, *[F.col(f).cast("string") for f in agg.fields])
    fn = F.count_distinct if agg.exact else (
        lambda c: F.approx_count_distinct(c, rsd=agg.rsd)
    )
    out = df.agg(fn(key).alias(agg.name))
    return apply_post(out, post, None)


def sql(agg: CountDistinct, base_sql: str, post: Sequence[PostAggregation]) -> str:
    if not agg.exact:
        raise ValueError(
            "approximate COUNT DISTINCT has no exact SQL oracle; "
            "the driver records a rows-only check for it"
        )
    if len(agg.fields) == 1:
        key = agg.fields[0]
    else:
        cols = ", ".join(f"CAST({f} AS VARCHAR)" for f in agg.fields)
        key = f"concat_ws(chr(31), {cols})"
    inner = f"SELECT COUNT(DISTINCT {key}) AS {agg.name} FROM ({base_sql})"
    return post_sql(inner, post, None)
