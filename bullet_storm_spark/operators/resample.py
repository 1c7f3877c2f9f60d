"""Time-spine resampling with gap-fill (hypertable-style rollup + LOCF).

The batch analogue of the streaming tumbling-window rollup
(``streaming/native.py``): bucket an event stream into a fixed time grid per
key, then densify — emit a row for EVERY grid slot between each key's first
and last observation, zero-filling counts and carrying the last observed
value forward (LOCF) across gaps. This is the standard time-series
preparation step (TimescaleDB ``time_bucket_gapfill`` + ``locf``, Flink
window fill) that plain GROUP BY cannot express because missing buckets
produce no row at all.

Spark-first shape (100 TB posture):

* the rollup is one hash aggregation on (key, bucket) — partial map-side
  combine, uniform keys (bucket spreads each key over the time axis).
* the spine is generated FROM the aggregate, not the raw data: one tiny
  per-key (min, max) row exploded with ``sequence()`` — O(keys * slots)
  rows that never touch the events scan again.
* gap-fill is a left join on (key, bucket) — hash join, same shuffle key as
  the rollup, so AQE can reuse the exchange.
* LOCF is a per-key ordered window (``last(..., ignorenulls=True)``,
  growing frame). Per-key sequential evaluation is the semantic cost of
  carry-forward; keys are the parallelism unit, and spine length is bounded
  by range/step, not by event count. A single key spanning decades at 1 s
  granularity is a spine problem regardless of engine — choose ``unit``
  accordingly.
* value sums accumulate in DECIMAL(38,6) and cast back to double (the
  ``exact_decimal`` posture of operators/group.py) so a 1000-executor run
  and the single-threaded DuckDB oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_DECIMAL = "decimal(38,6)"
_UNITS = ("minute", "hour", "day", "week")


def resample_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    unit: str = "hour",
) -> DataFrame:
    """(key, bucket, n, v_sum, v_locf, filled): dense per-key time grid at
    ``unit`` granularity. ``n``/``v_sum`` are 0/NULL on gap rows,
    ``v_locf`` carries the last non-gap ``v_sum`` forward, ``filled``
    marks synthesized rows. Ordered by (key, bucket)."""
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {_UNITS}")
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    rollup = (
        df.select(F.col(key_col).alias("key"), bucket, F.col(value_col).alias("v"))
        .groupBy("key", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast(_DECIMAL)).cast("double").alias("v_sum"),
        )
    )
    spine = (
        rollup.groupBy("key")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "key",
            F.explode(
                F.sequence("lo", "hi", F.expr(f"interval 1 {unit}"))
            ).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(rollup, ["key", "bucket"], "left")
        .select(
            "key",
            "bucket",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            "v_sum",
            F.last("v_sum", ignorenulls=True).over(w).alias("v_locf"),
            F.col("n").isNull().alias("filled"),
        )
        .orderBy("key", "bucket")
    )


def resample_locf_sql(
    table: str, key_col: str, ts_col: str, value_col: str, unit: str = "hour"
) -> str:
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {_UNITS}")
    return f"""
WITH rollup AS (
  SELECT {key_col} AS key, date_trunc('{unit}', {ts_col}) AS bucket,
         COUNT(*) AS n,
         CAST(SUM(CAST({value_col} AS DECIMAL(38,6))) AS DOUBLE) AS v_sum
  FROM {table}
  GROUP BY 1, 2
),
spine AS (
  SELECT key, UNNEST(generate_series(lo, hi, INTERVAL 1 {unit})) AS bucket
  FROM (SELECT key, MIN(bucket) AS lo, MAX(bucket) AS hi FROM rollup GROUP BY key)
)
SELECT s.key, s.bucket,
       COALESCE(r.n, 0) AS n,
       r.v_sum,
       last_value(r.v_sum IGNORE NULLS) OVER (
         PARTITION BY s.key ORDER BY s.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS v_locf,
       (r.n IS NULL) AS filled
FROM spine s LEFT JOIN rollup r ON s.key = r.key AND s.bucket = r.bucket
ORDER BY s.key, s.bucket
"""


def gap_report(
    df: DataFrame, key_col: str, ts_col: str, value_col: str, unit: str = "hour"
) -> DataFrame:
    """Per-key densification accounting: (key, slots, observed, gaps,
    longest_gap) — the operational view for choosing ``unit``."""
    dense = resample_locf(df, key_col, ts_col, value_col, unit)
    # run-length the gaps: group consecutive filled rows by (row_number
    # difference) — the standard gaps-and-islands trick, window-only
    w = Window.partitionBy("key").orderBy("bucket")
    wf = Window.partitionBy("key", "filled").orderBy("bucket")
    runs = dense.select(
        "key",
        "filled",
        (F.row_number().over(w) - F.row_number().over(wf)).alias("island"),
    )
    gap_runs = (
        runs.where(F.col("filled"))
        .groupBy("key", "island")
        .agg(F.count(F.lit(1)).alias("run"))
        .groupBy("key")
        .agg(F.max("run").alias("longest_gap"))
    )
    return (
        dense.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("slots"),
            F.sum((~F.col("filled")).cast("long")).alias("observed"),
            F.sum(F.col("filled").cast("long")).alias("gaps"),
        )
        .join(gap_runs, "key", "left")
        .select(
            "key",
            "slots",
            "observed",
            "gaps",
            F.coalesce("longest_gap", F.lit(0)).alias("longest_gap"),
        )
        .orderBy("key")
    )


def gap_report_sql(
    table: str, key_col: str, ts_col: str, value_col: str, unit: str = "hour"
) -> str:
    dense = resample_locf_sql(table, key_col, ts_col, value_col, unit)
    return f"""
WITH dense AS ({dense}),
runs AS (
  SELECT key, filled,
         row_number() OVER (PARTITION BY key ORDER BY bucket)
       - row_number() OVER (PARTITION BY key, filled ORDER BY bucket) AS island
  FROM dense
),
gap_runs AS (
  SELECT key, MAX(run) AS longest_gap
  FROM (SELECT key, island, COUNT(*) AS run FROM runs WHERE filled GROUP BY 1, 2)
  GROUP BY key
)
SELECT d.key,
       COUNT(*) AS slots,
       CAST(SUM(CASE WHEN d.filled THEN 0 ELSE 1 END) AS BIGINT) AS observed,
       CAST(SUM(CASE WHEN d.filled THEN 1 ELSE 0 END) AS BIGINT) AS gaps,
       CAST(COALESCE(ANY_VALUE(g.longest_gap), 0) AS BIGINT) AS longest_gap
FROM dense d LEFT JOIN gap_runs g ON d.key = g.key
GROUP BY d.key
ORDER BY d.key
"""
