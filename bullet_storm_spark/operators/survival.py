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


def nelson_aalen(
    df: DataFrame,
    group_col: str = "user_id",
    unit_us: int = _US_PER_HOUR,
    censor_gap_units: int = 12,
    round_to: int = 9,
) -> DataFrame:
    """Nelson-Aalen cumulative hazard over the same censored lifetimes as
    :func:`km_survival`: ``(t, n_risk, n_events, hazard_term,
    cum_hazard, cum_var)`` at each event time, where
    ``H(t) = Σ_{tᵢ<=t} dᵢ/nᵢ`` (Nelson 1972, Aalen 1978) and ``cum_var``
    is the standard Σ dᵢ/nᵢ² variance estimate. The hazard-scale twin of
    the KM curve: additive, so cohort comparisons and log-rank-style
    reasoning work term-wise, and no sequential product is needed.

    Engine parity: unlike KM's running PRODUCT (which forces both
    engines into an explicit sequential pass), a running SUM is exact
    and order-free once each term is quantized to the decimal grid —
    terms quantize at (18,9) via the text hop and accumulate in
    DECIMAL(38,9), so the cumulative columns are bit-identical without
    any recursion. Scale posture: identical to km_survival — one
    user-keyed shuffle, then a span-bounded event-time frame."""
    if censor_gap_units < 0:
        raise ValueError(f"need censor_gap_units >= 0, got {censor_gap_units}")
    if unit_us < 1:
        raise ValueError(f"need unit_us >= 1, got {unit_us}")
    from bullet_storm_spark.operators.stats_tests import _d2d, _div

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
    )
    w_all = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    _q9 = lambda c: c.cast("double").cast("string").cast("decimal(18,9)")  # noqa: E731
    base = (
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
            _q9(
                _div(
                    F.col("n_events").cast("double"),
                    F.col("n_risk").cast("double"),
                )
            ).alias("__h9"),
            _q9(
                _div(
                    F.col("n_events").cast("double"),
                    (F.col("n_risk") * F.col("n_risk")).cast("double"),
                )
            ).alias("__v9"),
        )
    )
    return base.select(
        "t",
        "n_risk",
        "n_events",
        _d2d(F.col("__h9")).alias("hazard_term"),
        _d2d(
            F.sum(F.col("__h9").cast("decimal(38,9)")).over(w_cum)
        ).alias("cum_hazard"),
        _d2d(
            F.sum(F.col("__v9").cast("decimal(38,9)")).over(w_cum)
        ).alias("cum_var"),
    ).orderBy("t")


def nelson_aalen_sql(
    table: str,
    group_col: str = "user_id",
    unit_us: int = _US_PER_HOUR,
    censor_gap_units: int = 12,
    round_to: int = 9,
) -> str:
    if censor_gap_units < 0:
        raise ValueError(f"need censor_gap_units >= 0, got {censor_gap_units}")
    if unit_us < 1:
        raise ValueError(f"need unit_us >= 1, got {unit_us}")

    def q9(e: str) -> str:
        # the guarded hop convention (SCALING.md hazards #5/#8)
        return (
            f"CAST(CAST(({e}) * CAST(ABS({e}) >= POWER(10.0, -10) AS INT)"
            f" AS VARCHAR) AS DECIMAL(18,9))"
        )

    d2d = "CAST(CAST({x} AS VARCHAR) AS DOUBLE)"
    return f"""
WITH __per AS (
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
  SELECT t, COUNT(*)::BIGINT AS n_at, SUM(churn)::BIGINT AS n_events
  FROM __lt GROUP BY t
),
__na AS (
  SELECT t, n_events,
         (SUM(n_at) OVER ()
          - COALESCE(SUM(n_at) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT
           AS n_risk
  FROM __byt
),
__terms AS (
  SELECT t, n_risk, n_events,
         {q9("CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE)")} AS h9,
         {q9("CAST(n_events AS DOUBLE) / CAST(n_risk * n_risk AS DOUBLE)")} AS v9
  FROM __na WHERE n_events > 0
)
SELECT t, n_risk, n_events,
       {d2d.format(x="h9")} AS hazard_term,
       {d2d.format(x="CAST(SUM(CAST(h9 AS DECIMAL(38,9))) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,9))")} AS cum_hazard,
       {d2d.format(x="CAST(SUM(CAST(v9 AS DECIMAL(38,9))) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,9))")} AS cum_var
FROM __terms ORDER BY t
"""


def logrank_test(
    df: DataFrame,
    arm_pred,
    group_col: str = "user_id",
    unit_us: int = _US_PER_HOUR,
    censor_gap_units: int = 12,
    round_to: int = 9,
) -> DataFrame:
    """Two-arm log-rank test (Mantel 1966) over the censored lifetimes:
    one row ``(n_event_times, obs_a, obs_b, exp_a, var_sum, chi2)`` —
    "do arm A and arm B churn at the same rate", the standard survival
    companion to the KM/NA curves and the honest replacement for
    comparing raw churn percentages (which censoring biases).

    ``arm_pred`` is a per-GROUP boolean column evaluated on the raw
    events (e.g. a hash_fraction arm draw on the group key); a group is
    in arm A when true. At each event time: hypergeometric expectation
    ``E_a = d·n_a/n`` and variance ``d·(n_a/n)·(n_b/n)·(n−d)/(n−1)``;
    ``chi2 = (Σ(d_a − E_a))² / ΣV`` is ~χ²(1) under H0.

    Parity/scale: integer risk/event tables on the span-bounded
    event-time frame (the km_survival posture), each IEEE term quantized
    at (18,9) and summed in DECIMAL(38,9) — order-free, engine-identical;
    one user-keyed shuffle is the only full-data pass."""
    if censor_gap_units < 0:
        raise ValueError(f"need censor_gap_units >= 0, got {censor_gap_units}")
    if unit_us < 1:
        raise ValueError(f"need unit_us >= 1, got {unit_us}")
    from bullet_storm_spark.operators.stats_tests import _d2d, _div, _qround_sql  # noqa: F401

    unit = F.expr(f"(ts_ns div 1000) div {int(unit_us)}")
    per = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.min(unit).cast("long").alias("__d0"),
        F.max(unit).cast("long").alias("__d1"),
        F.max(arm_pred.cast("int")).cast("int").alias("__a"),
    )
    maxd = per.agg(F.max("__d1").alias("__dmax"))
    lt = per.crossJoin(F.broadcast(maxd)).select(
        (F.col("__d1") - F.col("__d0")).alias("t"),
        "__a",
        (F.col("__d1") <= F.col("__dmax") - F.lit(int(censor_gap_units)))
        .cast("int")
        .alias("__churn"),
    )
    byt = lt.groupBy("t").agg(
        F.sum(F.when(F.col("__a") == 1, 1).otherwise(0)).cast("long").alias("__na_at"),
        F.sum(F.when(F.col("__a") == 0, 1).otherwise(0)).cast("long").alias("__nb_at"),
        F.sum(F.col("__churn") * F.col("__a")).cast("long").alias("d_a"),
        F.sum(F.col("__churn") * (1 - F.col("__a"))).cast("long").alias("d_b"),
    )
    w_all = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = byt.select(
        "t",
        "d_a",
        "d_b",
        (
            F.sum("__na_at").over(w_all)
            - F.coalesce(F.sum("__na_at").over(w_prev), F.lit(0))
        ).cast("long").alias("n_a"),
        (
            F.sum("__nb_at").over(w_all)
            - F.coalesce(F.sum("__nb_at").over(w_prev), F.lit(0))
        ).cast("long").alias("n_b"),
    ).where((F.col("d_a") + F.col("d_b")) > 0)
    _q9 = lambda c: c.cast("double").cast("string").cast("decimal(18,9)")  # noqa: E731
    n_t = (F.col("n_a") + F.col("n_b")).cast("double")
    d_t = (F.col("d_a") + F.col("d_b")).cast("double")
    e_a = d_t * _div(F.col("n_a").cast("double"), n_t)
    v_t = (
        d_t
        * _div(F.col("n_a").cast("double"), n_t)
        * _div(F.col("n_b").cast("double"), n_t)
        * _div(n_t - d_t, n_t - F.lit(1.0))
    )
    terms = risk.select(
        "d_a",
        "d_b",
        _q9(e_a).alias("__e9"),
        _q9(v_t).alias("__v9"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_event_times"),
        F.sum("d_a").cast("long").alias("obs_a"),
        F.sum("d_b").cast("long").alias("obs_b"),
        F.sum(F.col("__e9").cast("decimal(38,9)")).cast("decimal(38,9)").alias("__se"),
        F.sum(F.col("__v9").cast("decimal(38,9)")).cast("decimal(38,9)").alias("__sv"),
    )
    diff = F.col("obs_a").cast("double") - _d2d(F.col("__se"))
    return agg.select(
        "n_event_times",
        "obs_a",
        "obs_b",
        F.round(_d2d(F.col("__se")), round_to).alias("exp_a"),
        F.round(_d2d(F.col("__sv")), round_to).alias("var_sum"),
        F.round(_div(diff * diff, _d2d(F.col("__sv"))), round_to).alias("chi2"),
    )


def logrank_test_sql(
    table: str,
    arm_pred_sql: str,
    group_col: str = "user_id",
    unit_us: int = _US_PER_HOUR,
    censor_gap_units: int = 12,
    round_to: int = 9,
) -> str:
    if censor_gap_units < 0:
        raise ValueError(f"need censor_gap_units >= 0, got {censor_gap_units}")
    if unit_us < 1:
        raise ValueError(f"need unit_us >= 1, got {unit_us}")

    def q9(e: str) -> str:
        return (
            f"CAST(CAST(({e}) * CAST(ABS({e}) >= POWER(10.0, -10) AS INT)"
            f" AS VARCHAR) AS DECIMAL(18,9))"
        )

    def qround(e: str) -> str:
        return (
            f"CAST(CAST(CAST(CAST(({e}) * CAST(ABS({e}) >= POWER(10.0, "
            f"-({round_to}+1)) AS INT) AS VARCHAR) AS "
            f"DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE)"
        )

    d2d = "CAST(CAST({x} AS VARCHAR) AS DOUBLE)"
    return f"""
WITH __per AS (
  SELECT {group_col} AS g,
         MIN(epoch_us(ts)) // {int(unit_us)} AS d0,
         MAX(epoch_us(ts)) // {int(unit_us)} AS d1,
         MAX(CASE WHEN ({arm_pred_sql}) THEN 1 ELSE 0 END)::INTEGER AS a
  FROM {table} GROUP BY {group_col}
),
__lt AS (
  SELECT (d1 - d0)::BIGINT AS t, a,
         CASE WHEN d1 <= (SELECT MAX(d1) FROM __per) - {int(censor_gap_units)}
              THEN 1 ELSE 0 END AS churn
  FROM __per
),
__byt AS (
  SELECT t,
         SUM(CASE WHEN a = 1 THEN 1 ELSE 0 END)::BIGINT AS na_at,
         SUM(CASE WHEN a = 0 THEN 1 ELSE 0 END)::BIGINT AS nb_at,
         SUM(churn * a)::BIGINT AS d_a,
         SUM(churn * (1 - a))::BIGINT AS d_b
  FROM __lt GROUP BY t
),
__risk AS (
  SELECT t, d_a, d_b,
         (SUM(na_at) OVER ()
          - COALESCE(SUM(na_at) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT
           AS n_a,
         (SUM(nb_at) OVER ()
          - COALESCE(SUM(nb_at) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT
           AS n_b
  FROM __byt
),
__terms AS (
  SELECT d_a, d_b,
         {q9("CAST(d_a + d_b AS DOUBLE) * (CAST(n_a AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))")} AS e9,
         {q9("CAST(d_a + d_b AS DOUBLE) * (CAST(n_a AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) * (CAST(n_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) * (CAST(n_a + n_b AS DOUBLE) - CAST(d_a + d_b AS DOUBLE)) / NULLIF(CAST(n_a + n_b AS DOUBLE) - 1.0, 0.0)")} AS v9
  FROM __risk WHERE d_a + d_b > 0
),
__agg AS (
  SELECT COUNT(*)::BIGINT AS n_event_times,
         SUM(d_a)::BIGINT AS obs_a,
         SUM(d_b)::BIGINT AS obs_b,
         CAST(SUM(CAST(e9 AS DECIMAL(38,9))) AS DECIMAL(38,9)) AS se,
         CAST(SUM(CAST(v9 AS DECIMAL(38,9))) AS DECIMAL(38,9)) AS sv
  FROM __terms
)
SELECT n_event_times, obs_a, obs_b,
       {qround(d2d.format(x="se"))} AS exp_a,
       {qround(d2d.format(x="sv"))} AS var_sum,
       {qround(
           "(CAST(obs_a AS DOUBLE) - " + d2d.format(x="se") + ") "
           "* (CAST(obs_a AS DOUBLE) - " + d2d.format(x="se") + ") "
           "/ NULLIF(" + d2d.format(x="sv") + ", 0.0)"
       )} AS chi2
FROM __agg
"""
