"""Kaplan-Meier survival estimation over user lifetimes, dual-compiled.

The retention curve done right: "how long does a user stay active" with
CENSORING handled — users still active at the end of the observation
window contribute risk time without being counted as churned (Kaplan &
Meier, JASA 1958). The naive "average days active" silently treats every
still-active user as churned today and biases retention low; KM is the
standard correction, and per-cohort KM curves are the honest version of
the retention tables product analytics ships.

Lifetimes are ``unit_us``-granular (default hours): per user,
``t = last_unit - first_unit`` (integer epoch units, the behavior.py µs
convention). A user is CHURNED (event observed) when their last activity
is at least ``censor_gap_units`` before the corpus' last observed unit —
they had the chance to return and did not; later users are
right-censored at their observed lifetime. Pick the unit so the gap is
several times the typical inter-event gap (too coarse and nobody churns
inside the window; the hour default suits month-scale event corpora).

Engine parity: risk counts and event counts are exact integers;
``factor = (n_risk - d) / n_risk`` is one IEEE division; the survival
curve is the RUNNING PRODUCT of factors in time order — a windowed
product aggregate would let either engine reassociate the multiplies
(DuckDB's segment trees, Spark's partial aggregation), so BOTH sides
compute it strictly sequentially: the Spark side in one bounded
applyInPandas pass (an explicit left-to-right loop), the DuckDB twin via
a recursive CTE stepping rn -> rn+1. Same order, same doubles, hash-
identical (probed).

Scale posture (100 TB): the only full-data pass is the per-user min/max
aggregation (one shuffle on the user key). Everything after lives on the
day-level KM table — bounded by the observation span in units, NOT by
users — so the single-group applyInPandas finalizer handles a frame of
at most a few thousand rows regardless of corpus size (the bounded-
driver-artifact contract, same class as the KLL/codebook finalizers).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window, functions as F

_US_PER_HOUR = 3_600_000_000

_KM_SCHEMA = (
    "t long, n_risk long, n_events long, n_censored long, "
    "factor double, survival double"
)


def km_survival(
    df: DataFrame,
    group_col: str = "user_id",
    unit_us: int = _US_PER_HOUR,
    censor_gap_units: int = 12,
) -> DataFrame:
    """Kaplan-Meier table over per-group activity lifetimes:
    ``(t, n_risk, n_events, n_censored, factor, survival)`` — one row
    per distinct lifetime unit with at least one observed churn event,
    ordered by t. ``n_risk`` counts groups with lifetime >= t,
    ``n_censored`` the censored lifetimes AT t (informational),
    ``survival`` the running product of factors up to and including t."""
    if censor_gap_units < 0:
        raise ValueError(f"need censor_gap_units >= 0, got {censor_gap_units}")
    if unit_us < 1:
        raise ValueError(f"need unit_us >= 1, got {unit_us}")
    # integer `div` end to end: epoch-µs (~1.7e18) exceeds 2^53, so a
    # double division here could mis-floor an event sitting within ~1e2
    # µs of a unit boundary (behavior.py's _ts_us rationale, one step
    # further)
    unit = F.expr(f"(ts_ns div 1000) div {int(unit_us)}")
    per = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.min(unit).cast("long").alias("__d0"),
        F.max(unit).cast("long").alias("__d1"),
    )
    maxd = per.agg(F.max("__d1").alias("__dmax"))
    lt = per.crossJoin(F.broadcast(maxd)).select(
        (F.col("__d1") - F.col("__d0")).alias("t"),
        (F.col("__d1") <= F.col("__dmax") - F.lit(int(censor_gap_units)))
        .cast("int")
        .alias("__churn"),
    )
    byt = lt.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("__n_at"),
        F.sum("__churn").cast("long").alias("n_events"),
        (F.count(F.lit(1)) - F.sum("__churn")).cast("long").alias("n_censored"),
    )
    # n_risk(t) = all groups minus those whose lifetime ended before t;
    # the global window runs on the DAY-LEVEL frame (bounded), not on
    # users
    w_all = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    km = (
        byt.withColumn(
            "n_risk",
            (
                F.sum("__n_at").over(w_all)
                - F.coalesce(F.sum("__n_at").over(w_prev), F.lit(0))
            ).cast("long"),
        )
        .where(F.col("n_events") > 0)
        .select(
            "t",
            "n_risk",
            "n_events",
            "n_censored",
            (
                (F.col("n_risk") - F.col("n_events")).cast("double")
                / F.col("n_risk").cast("double")
            ).alias("factor"),
        )
    )

    def fin(pdfs: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in pdfs:
            pdf = pdf.sort_values("t", kind="mergesort").reset_index(drop=True)
            surv, out = 1.0, []
            for f in pdf["factor"]:
                # explicit left-to-right product: associativity is NOT
                # free for floats, and this order is the recursive-CTE
                # twin's order
                surv = surv * float(f)
                out.append(surv)
            pdf["survival"] = out
            yield pdf

    # single-partition mapInPandas over the bounded KM table: coalesce(1)
    # pins the sequential product to one pass in time order
    return (
        km.coalesce(1)
        .sortWithinPartitions("t")
        .mapInPandas(fin, _KM_SCHEMA)
        .orderBy("t")
    )


def km_survival_sql(
    table: str,
    group_col: str = "user_id",
    unit_us: int = _US_PER_HOUR,
    censor_gap_units: int = 12,
) -> str:
    if censor_gap_units < 0:
        raise ValueError(f"need censor_gap_units >= 0, got {censor_gap_units}")
    if unit_us < 1:
        raise ValueError(f"need unit_us >= 1, got {unit_us}")
    return f"""
WITH RECURSIVE __per AS (
  SELECT {group_col} AS g,
         MIN(epoch_us(ts)) // {int(unit_us)} AS d0,
         MAX(epoch_us(ts)) // {int(unit_us)} AS d1
  FROM {table} GROUP BY {group_col}
),
__lt AS (
  SELECT (d1 - d0)::BIGINT AS t,
         CASE WHEN d1 <= (SELECT MAX(d1) FROM __per) - {int(censor_gap_units)}
              THEN 1 ELSE 0 END AS churn
  FROM __per
),
__byt AS (
  SELECT t, COUNT(*)::BIGINT AS n_at, SUM(churn)::BIGINT AS n_events,
         (COUNT(*) - SUM(churn))::BIGINT AS n_censored
  FROM __lt GROUP BY t
),
__km AS (
  SELECT t, n_events, n_censored,
         (SUM(n_at) OVER ()
          - COALESCE(SUM(n_at) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT
           AS n_risk
  FROM __byt
),
__nb AS (
  SELECT t, n_risk, n_events, n_censored,
         CAST(n_risk - n_events AS DOUBLE) / CAST(n_risk AS DOUBLE) AS factor,
         ROW_NUMBER() OVER (ORDER BY t) AS rn
  FROM __km WHERE n_events > 0
),
__rec AS (
  SELECT rn, t, n_risk, n_events, n_censored, factor, factor AS survival
  FROM __nb WHERE rn = 1
  UNION ALL
  SELECT b.rn, b.t, b.n_risk, b.n_events, b.n_censored, b.factor,
         r.survival * b.factor
  FROM __nb b JOIN __rec r ON b.rn = r.rn + 1
)
SELECT t, n_risk, n_events, n_censored, factor, survival
FROM __rec ORDER BY t
"""
