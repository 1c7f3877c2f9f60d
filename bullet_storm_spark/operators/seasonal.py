"""Hour-of-week seasonality: traffic profile + seasonally-adjusted robust
outliers, dual-compiled.

Event streams breathe on a weekly cycle; a raw global threshold either
fires every Monday 09:00 or misses a quiet-hour incident entirely. These
operators give the two standard views:

* ``seasonality_profile`` — per event type, the 168-cell hour-of-week
  histogram collapsed to its shape summary: peak / trough cells and the
  peak-to-mean ratio (the "how seasonal is this key" scalar).
* ``seasonal_outliers`` — per (type, week, hour-of-week) cell, the
  modified-Z flag of that week's count against the median/MAD baseline of
  the SAME hour-of-week across all observed weeks (Iglewicz & Hoaglin
  1993, the robust_outliers convention) — Monday 09:00 is judged against
  Monday 09:00s only. Weeks with zero events in a cell are densified in
  (the CUSUM zero-fill rule: a silent hour is data, not absence of data).

Time is pure integer epoch-microsecond arithmetic (the behavior.py
convention — no calendar functions, whose week/day numbering differs
across engines): ``hour = us div 3600e6``, ``week = (hour + 72) div 168``
and ``how = (hour + 72) mod 168`` with the +72 aligning hour-of-week 0 to
Monday 00:00 UTC (the epoch began Thursday). Counts are integers;
median/MAD follow the exact-percentile + 9-dp-round convention of
operators/anomaly.robust_outliers; ratios are single IEEE divisions of
engine-identical values.

Scale posture (100 TB): the first aggregation collapses raw events to
(type, week, how) cells, so everything downstream is
calendar-bounded (168·weeks rows per type), and the densify explode is
over that bounded grid — one shuffle on the type key, broadcast baseline
join, no pair generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from bullet_storm_spark.operators.stats_tests import _div

_US_PER_HOUR = 3_600_000_000
# epoch hour 0 = Thursday 1970-01-01 00:00 UTC; +72 h rebases the weekly
# phase so cell 0 = Monday 00:00
_EPOCH_SHIFT_H = 72


def _hour() -> F.Column:
    return F.expr(f"(ts_ns div 1000) div {_US_PER_HOUR}") + F.lit(
        _EPOCH_SHIFT_H
    )


_HOUR_SQL = f"(epoch_us(ts) // {_US_PER_HOUR}) + {_EPOCH_SHIFT_H}"


def seasonality_profile(df: DataFrame, type_col: str = "event_type") -> DataFrame:
    """Per-type weekly-shape summary: ``(event_type, n_events, n_hours,
    peak_how, peak_share, trough_how, trough_share, peak_to_mean)``
    ordered by type. ``peak_how``/``trough_how`` are hour-of-week cells
    0..167 (0 = Monday 00:00 UTC; ties take the earliest cell);
    ``*_share`` are that cell's fraction of the type's events;
    ``peak_to_mean`` is peak count over the all-168-cell mean — the
    seasonality-strength scalar (1 = flat, 168 = everything in one
    hour). Unobserved cells count as zero in mean and trough."""
    cells = (
        df.select(
            F.col(type_col).alias("event_type"),
            (_hour() % F.lit(168)).cast("int").alias("how"),
        )
        .groupBy("event_type", "how")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        # the ONE corpus pass; the result is calendar-bounded
        # (types x 168), and it feeds two consumers (grid + densify
        # join) - checkpoint so neither re-runs the raw aggregation
        .localCheckpoint()
    )
    grid = (
        cells.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(167))).alias("how"),
        )
    )
    dense = grid.join(cells, ["event_type", "how"], "left").select(
        "event_type",
        "how",
        F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("cnt"),
    )
    w_peak = Window.partitionBy("event_type").orderBy(
        F.desc("cnt"), F.asc("how")
    )
    w_trough = Window.partitionBy("event_type").orderBy(
        F.asc("cnt"), F.asc("how")
    )
    ranked = dense.select(
        "event_type",
        "how",
        "cnt",
        F.row_number().over(w_peak).alias("__rp"),
        F.row_number().over(w_trough).alias("__rt"),
    )
    agg = ranked.groupBy("event_type").agg(
        F.sum("cnt").cast("long").alias("n_events"),
        F.sum(F.when(F.col("cnt") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_hours"),
        F.min(F.when(F.col("__rp") == 1, F.col("how"))).alias("peak_how"),
        F.min(F.when(F.col("__rp") == 1, F.col("cnt"))).alias("__peak_cnt"),
        F.min(F.when(F.col("__rt") == 1, F.col("how"))).alias("trough_how"),
        F.min(F.when(F.col("__rt") == 1, F.col("cnt"))).alias("__trough_cnt"),
    )
    n_d = F.col("n_events").cast("double")
    return agg.select(
        "event_type",
        "n_events",
        "n_hours",
        "peak_how",
        _div(F.col("__peak_cnt").cast("double"), n_d).alias("peak_share"),
        "trough_how",
        _div(F.col("__trough_cnt").cast("double"), n_d).alias("trough_share"),
        _div(
            F.col("__peak_cnt").cast("double"), n_d / F.lit(168.0)
        ).alias("peak_to_mean"),
    ).orderBy("event_type")


def seasonality_profile_sql(table: str, type_col: str = "event_type") -> str:
    return f"""
WITH __c AS (
  SELECT {type_col} AS event_type,
         CAST(({_HOUR_SQL}) % 168 AS INT) AS how,
         COUNT(*)::BIGINT AS cnt
  FROM {table} GROUP BY 1, 2
),
__grid AS (
  SELECT t.event_type, g.how::INT AS how
  FROM (SELECT DISTINCT event_type FROM __c) t,
       (SELECT unnest(generate_series(0, 167)) AS how) g
),
__d AS (
  SELECT g.event_type, g.how, COALESCE(c.cnt, 0::BIGINT) AS cnt
  FROM __grid g LEFT JOIN __c c ON g.event_type = c.event_type AND g.how = c.how
),
__r AS (
  SELECT event_type, how, cnt,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cnt DESC, how ASC)
           AS rp,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cnt ASC, how ASC)
           AS rt
  FROM __d
),
__a AS (
  SELECT event_type,
         SUM(cnt)::BIGINT AS n_events,
         SUM(CASE WHEN cnt > 0 THEN 1 ELSE 0 END)::BIGINT AS n_hours,
         MIN(CASE WHEN rp = 1 THEN how END) AS peak_how,
         MIN(CASE WHEN rp = 1 THEN cnt END) AS peak_cnt,
         MIN(CASE WHEN rt = 1 THEN how END) AS trough_how,
         MIN(CASE WHEN rt = 1 THEN cnt END) AS trough_cnt
  FROM __r GROUP BY event_type
)
SELECT event_type, n_events, n_hours, peak_how,
       CAST(peak_cnt AS DOUBLE) / CAST(n_events AS DOUBLE) AS peak_share,
       trough_how,
       CAST(trough_cnt AS DOUBLE) / CAST(n_events AS DOUBLE) AS trough_share,
       CAST(peak_cnt AS DOUBLE) / (CAST(n_events AS DOUBLE) / 168.0)
         AS peak_to_mean
FROM __a
ORDER BY event_type
"""


def seasonal_outliers(
    df: DataFrame,
    type_col: str = "event_type",
    k: float = 3.5,
    round_to: int = 6,
) -> DataFrame:
    """Seasonally-adjusted outlier cells: ``(event_type, week, how, cnt,
    med, mad, high)`` — every (type, week, hour-of-week) cell whose
    count is a modified-Z outlier against the same-hour-of-week
    median/MAD baseline (``0.6745·|cnt−med| > k·MAD``; when MAD is 0 —
    a cell quiet in most weeks — ANY deviation from the median flags,
    the same degenerate-MAD behavior as robust_outliers, so sparse
    types flag every active cell; raise the aggregation granularity or
    pre-filter low-volume types if that is noise for you). ``high`` marks
    above-baseline cells (a spike) vs below (an outage). Weeks inside
    the type's observed [min_week, max_week] span with zero events are
    densified in. Ordered by (type, week, how)."""
    cells = (
        df.select(
            F.col(type_col).alias("event_type"),
            (_hour() / F.lit(168)).cast("long").alias("week"),
            (_hour() % F.lit(168)).cast("int").alias("how"),
        )
        .groupBy("event_type", "week", "how")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        # the ONE corpus pass; downstream (span, grid, densify, median,
        # MAD, flag join) is calendar-bounded (types x weeks x 168) and
        # consumes this frame 3x - without the checkpoint the executed
        # plan re-ran the raw aggregation 16 scans deep (PLANS.md audit)
        .localCheckpoint()
    )
    span = cells.groupBy("event_type").agg(
        F.min("week").alias("__w0"), F.max("week").alias("__w1")
    )
    grid = span.select(
        "event_type",
        F.explode(F.sequence(F.col("__w0"), F.col("__w1"))).alias("week"),
    ).select(
        "event_type",
        "week",
        F.explode(F.sequence(F.lit(0), F.lit(167))).alias("how"),
    )
    dense = grid.join(cells, ["event_type", "week", "how"], "left").select(
        "event_type",
        "week",
        "how",
        F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("cnt"),
    )
    base = dense.groupBy("event_type", "how").agg(
        F.round(F.percentile(F.col("cnt").cast("double"), F.lit(0.5)), 9).alias(
            "__med"
        )
    )
    with_med = dense.join(F.broadcast(base), ["event_type", "how"])
    mad = (
        with_med.select(
            "event_type",
            "how",
            F.abs(F.col("cnt").cast("double") - F.col("__med")).alias("__dev"),
        )
        .groupBy("event_type", "how")
        .agg(
            F.round(F.percentile(F.col("__dev"), F.lit(0.5)), 9).alias("__mad")
        )
    )
    return (
        with_med.join(F.broadcast(mad), ["event_type", "how"])
        .where(
            F.lit(0.6745) * F.abs(F.col("cnt").cast("double") - F.col("__med"))
            > F.lit(float(k)) * F.col("__mad")
        )
        .select(
            "event_type",
            "week",
            "how",
            "cnt",
            F.round(F.col("__med"), round_to).alias("med"),
            F.round(F.col("__mad"), round_to).alias("mad"),
            (F.col("cnt").cast("double") > F.col("__med")).alias("high"),
        )
        .orderBy("event_type", "week", "how")
    )


def seasonal_outliers_sql(
    table: str,
    type_col: str = "event_type",
    k: float = 3.5,
    round_to: int = 6,
) -> str:
    return f"""
WITH __c AS (
  SELECT {type_col} AS event_type,
         CAST(({_HOUR_SQL}) // 168 AS BIGINT) AS week,
         CAST(({_HOUR_SQL}) % 168 AS INT) AS how,
         COUNT(*)::BIGINT AS cnt
  FROM {table} GROUP BY 1, 2, 3
),
__span AS (
  SELECT event_type, MIN(week) AS w0, MAX(week) AS w1 FROM __c
  GROUP BY event_type
),
__grid AS (
  SELECT s.event_type, w.week, h.how::INT AS how
  FROM __span s,
       LATERAL (SELECT unnest(generate_series(s.w0, s.w1)) AS week) w,
       (SELECT unnest(generate_series(0, 167)) AS how) h
),
__d AS (
  SELECT g.event_type, g.week, g.how, COALESCE(c.cnt, 0::BIGINT) AS cnt
  FROM __grid g LEFT JOIN __c c
    ON g.event_type = c.event_type AND g.week = c.week AND g.how = c.how
),
__med AS (
  SELECT event_type, how, CASE WHEN ABS(quantile_cont(CAST(cnt AS DOUBLE), 0.5)) >= 1e16 THEN CAST((quantile_cont(CAST(cnt AS DOUBLE), 0.5)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((quantile_cont(CAST(cnt AS DOUBLE), 0.5)) * CAST(ABS(quantile_cont(CAST(cnt AS DOUBLE), 0.5)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END
           AS med
  FROM __d GROUP BY event_type, how
),
__mad AS (
  SELECT d.event_type, d.how,
         CASE WHEN ABS(quantile_cont(abs(CAST(d.cnt AS DOUBLE) - m.med), 0.5)) >= 1e16 THEN CAST((quantile_cont(abs(CAST(d.cnt AS DOUBLE) - m.med), 0.5)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((quantile_cont(abs(CAST(d.cnt AS DOUBLE) - m.med), 0.5)) * CAST(ABS(quantile_cont(abs(CAST(d.cnt AS DOUBLE) - m.med), 0.5)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END
           AS mad
  FROM __d d JOIN __med m ON d.event_type = m.event_type AND d.how = m.how
  GROUP BY d.event_type, d.how
)
SELECT d.event_type, d.week, d.how, d.cnt,
       CASE WHEN ABS(m.med) >= 1e16 THEN CAST((m.med) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((m.med) * CAST(ABS(m.med) >= POWER(10.0, -({int(round_to)}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{int(round_to)})) AS VARCHAR) AS DOUBLE) END AS med,
       CASE WHEN ABS(a.mad) >= 1e16 THEN CAST((a.mad) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((a.mad) * CAST(ABS(a.mad) >= POWER(10.0, -({int(round_to)}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{int(round_to)})) AS VARCHAR) AS DOUBLE) END AS mad,
       CAST(d.cnt AS DOUBLE) > m.med AS high
FROM __d d
JOIN __med m ON d.event_type = m.event_type AND d.how = m.how
JOIN __mad a ON d.event_type = a.event_type AND d.how = a.how
WHERE 0.6745 * abs(CAST(d.cnt AS DOUBLE) - m.med) > {float(k)} * a.mad
ORDER BY d.event_type, d.week, d.how
"""
