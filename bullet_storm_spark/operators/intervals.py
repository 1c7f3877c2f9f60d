"""Bucketed interval-overlap join — the scale-safe non-equi join,
dual-compiled.

"Which activity intervals overlap which incident windows" is a range
predicate (``l_start <= r_end AND r_start <= l_end``); expressed
directly, Spark plans it as a broadcast-nested-loop join — |L|·|R| work,
the classic 100 TB killer. The standard fix (DB literature's grid/bucket
partitioning for spatial joins; same trick as the LSH band join) is to
discretize time into fixed-width buckets, explode each interval into the
buckets it touches, equi-join on the bucket id, then verify the exact
overlap predicate on bucket-collocated candidates and dedupe pairs that
share several buckets. Work becomes |candidate pairs| ~ genuinely
overlapping pairs when ``bucket_us`` is on the order of the interval
length.

Fan-out control: each interval explodes into ``span/bucket_us + 1``
rows; ``max_buckets`` guards against a degenerate interval silently
exploding the build side (an ``assert_true`` folded INTO the bucket
expression so column pruning cannot drop it — fail loud, never OOM
quiet).

Engine parity: bucket ids, bounds and overlap spans are exact integer
µs arithmetic; the DuckDB twin runs the textbook inequality join (its
IEJoin handles oracle scale fine) — same pairs by construction, which is
precisely what the oracle is for: the FAST plan is checked against the
OBVIOUS plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_US_PER_HOUR = 3_600_000_000


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_id: list[str],
    l_start: str,
    l_end: str,
    r_id: list[str],
    r_start: str,
    r_end: str,
    bucket_us: int = _US_PER_HOUR,
    max_buckets: int = 1000,
) -> DataFrame:
    """Distinct overlapping pairs of closed intervals:
    ``(*l_id, *r_id, overlap_start, overlap_end, overlap_us)`` —
    one row per (left, right) pair with ``l_start <= r_end AND
    r_start <= l_end``. Inputs need integer-µs bound columns; id column
    name sets must be disjoint between the two sides."""
    if bucket_us < 1:
        raise ValueError(f"need bucket_us >= 1, got {bucket_us}")
    if max_buckets < 1:
        raise ValueError(f"need max_buckets >= 1, got {max_buckets}")
    overlap = set(l_id) & set(r_id)
    if overlap:
        raise ValueError(f"id columns must be disjoint, both have {overlap}")

    def bucketed(df, ids, s_col, e_col, prefix):
        # integer `div`: epoch-µs exceeds 2^53, a double division here
        # can mis-bucket a boundary-adjacent interval (survival.py note)
        b0 = F.expr(f"cast({s_col} as bigint) div {int(bucket_us)}")
        b1 = F.expr(f"cast({e_col} as bigint) div {int(bucket_us)}")
        # assert_true is FOLDED into the bucket value so Catalyst's
        # column pruning cannot drop the guard
        b1g = F.when(
            F.assert_true(
                b1 - b0 < F.lit(int(max_buckets)),
                F.lit(
                    f"interval spans >= {max_buckets} buckets; raise "
                    "bucket_us or split the interval"
                ),
            ).isNull(),
            b1,
        )
        return df.select(
            *[F.col(c) for c in ids],
            F.col(s_col).cast("long").alias(f"__{prefix}s"),
            F.col(e_col).cast("long").alias(f"__{prefix}e"),
            F.explode(F.sequence(b0, b1g)).alias("__b"),
        )

    lb = bucketed(left, l_id, l_start, l_end, "l")
    rb = bucketed(right, r_id, r_start, r_end, "r")
    return (
        lb.join(rb, "__b")
        .where(
            (F.col("__ls") <= F.col("__re")) & (F.col("__rs") <= F.col("__le"))
        )
        .select(
            *l_id,
            *r_id,
            F.greatest(F.col("__ls"), F.col("__rs")).alias("overlap_start"),
            F.least(F.col("__le"), F.col("__re")).alias("overlap_end"),
            (
                F.least(F.col("__le"), F.col("__re"))
                - F.greatest(F.col("__ls"), F.col("__rs"))
            ).alias("overlap_us"),
        )
        .distinct()
    )


def user_day_incident_overlap(
    df: DataFrame, top_hours: int = 3
) -> DataFrame:
    """The interval join driven end-to-end on the events table: per
    event type, its ``top_hours`` busiest hours become closed incident
    windows; per (user, day), the activity interval [first event, last
    event]; the bucketed overlap join then counts which user-days were
    live during each incident. Output ``(event_type, hour, n_userdays,
    total_overlap_us)`` ordered by (event_type, hour) — incident blast
    radius, sized in affected user-days and exposure time."""
    if top_hours < 1:
        raise ValueError(f"need top_hours >= 1, got {top_hours}")
    us = F.expr(f"(ts_ns div 1000)")
    day = F.expr(f"(ts_ns div 1000) div {86_400_000_000}")
    userdays = df.groupBy(
        F.col("user_id").alias("user_id"), day.alias("day")
    ).agg(
        F.min(us).cast("long").alias("a_start"),
        F.max(us).cast("long").alias("a_end"),
    )
    hour = F.expr(f"(ts_ns div 1000) div {_US_PER_HOUR}")
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(
        F.desc("cnt"), F.asc("hour")
    )
    incidents = (
        df.groupBy(F.col("event_type").alias("event_type"), hour.alias("hour"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= top_hours)
        .select(
            "event_type",
            "hour",
            (F.col("hour") * F.lit(_US_PER_HOUR)).cast("long").alias("i_start"),
            (F.col("hour") * F.lit(_US_PER_HOUR) + F.lit(_US_PER_HOUR - 1))
            .cast("long")
            .alias("i_end"),
        )
    )
    pairs = interval_overlap_join(
        userdays,
        incidents,
        ["user_id", "day"],
        "a_start",
        "a_end",
        ["event_type", "hour"],
        "i_start",
        "i_end",
        bucket_us=_US_PER_HOUR,
        max_buckets=30,
    )
    return (
        pairs.groupBy("event_type", "hour")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_userdays"),
            F.sum("overlap_us").cast("long").alias("total_overlap_us"),
        )
        .orderBy("event_type", "hour")
    )


def user_day_incident_overlap_sql(table: str, top_hours: int = 3) -> str:
    if top_hours < 1:
        raise ValueError(f"need top_hours >= 1, got {top_hours}")
    return f"""
WITH __ud AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         MIN(epoch_us(ts))::BIGINT AS a_start,
         MAX(epoch_us(ts))::BIGINT AS a_end
  FROM {table} GROUP BY 1, 2
),
__hr AS (
  SELECT event_type, epoch_us(ts) // {_US_PER_HOUR} AS hour,
         COUNT(*)::BIGINT AS cnt
  FROM {table} GROUP BY 1, 2
),
__inc AS (
  SELECT event_type, hour,
         (hour * {_US_PER_HOUR})::BIGINT AS i_start,
         (hour * {_US_PER_HOUR} + {_US_PER_HOUR - 1})::BIGINT AS i_end
  FROM (
    SELECT event_type, hour, cnt,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY cnt DESC, hour ASC) AS rn
    FROM __hr
  ) WHERE rn <= {int(top_hours)}
),
__pairs AS (
  SELECT u.user_id, u.day, i.event_type, i.hour,
         LEAST(u.a_end, i.i_end) - GREATEST(u.a_start, i.i_start)
           AS overlap_us
  FROM __ud u JOIN __inc i
    ON u.a_start <= i.i_end AND i.i_start <= u.a_end
)
SELECT event_type, hour, COUNT(*)::BIGINT AS n_userdays,
       SUM(overlap_us)::BIGINT AS total_overlap_us
FROM __pairs
GROUP BY event_type, hour
ORDER BY event_type, hour
"""
