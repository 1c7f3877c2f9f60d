"""Forecast-baseline evaluation: seasonal-naive backtest per key,
dual-compiled.

Before anyone ships a traffic forecaster, the question is "does it beat
the seasonal-naive baseline" (Hyndman & Koehler IJF 2006 — MASE is
defined against exactly this baseline). This operator runs that
backtest natively: per event type, forecast every hour's count with the
count one season earlier (``t − period``), score it against the
realized count, and scale it by the one-step naive (``t − 1``) error —
the denominator of MASE. A type whose MASE ≥ 1 has no weekly structure
worth modeling; a type with MASE « 1 is strongly seasonal (and its
seasonal profile from ``seasonal.seasonality_profile`` is trustworthy).

Metrics per type over the common evaluation window (hours where both
lags exist, i.e. everything after the first season):

* ``mae_seasonal`` / ``rmse_seasonal`` — absolute-count error of the
  season-ago forecast.
* ``mae_naive`` — absolute-count error of the last-hour forecast.
* ``mase`` — ``mae_seasonal / mae_naive`` (NULL when the naive error is
  0: a constant series is perfectly predicted by both).
* ``smape`` — symmetric MAPE in [0, 2]; both-zero hours contribute 0
  (the standard convention — a correctly-predicted silent hour is a
  hit, not a skip).

Engine parity: hourly counts are integers on a densified (zero-filled)
spine — the CUSUM rule that a silent hour is data. Absolute and squared
errors are therefore integer-exact and accumulate in DECIMAL(38,0);
sMAPE terms are per-row IEEE divisions of identical integers, quantized
to 6 dp via the ``_q6`` text hop before the decimal sum so the
accumulation is partition-order independent. Final MAE/RMSE/sMAPE are
single IEEE ops on ``_d2d`` text-hopped decimals — bit-identical across
engines. Time is integer epoch-µs arithmetic (no calendar functions).

Scale posture (100 TB): the first aggregation collapses raw events to
(type, hour) cells, so everything downstream — spine explode, two LAGs,
the scoring aggregation — is span-bounded (hours per type), partitioned
on the type key with one shuffle. No joins against the fact table, no
pair generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from bullet_storm_spark.operators.common import hourly_cells_sql
from bullet_storm_spark.operators.stats_tests import (
    _MOMENT,
    _d2d,
    _d2d_sql,
    _div,
    _q6,
    _q6_sql,
)

_US_PER_HOUR = 3_600_000_000
_EXACT = "decimal(38,0)"

_HOUR_SQL = f"epoch_us(ts) // {_US_PER_HOUR}"


def seasonal_naive_eval(
    df: DataFrame, type_col: str = "event_type", period: int = 168
) -> DataFrame:
    """Per-type seasonal-naive backtest: ``(event_type, n_eval,
    mae_seasonal, rmse_seasonal, mae_naive, mase, smape)`` ordered by
    type. ``period`` is the season length in hours (168 = weekly)."""
    cells = (
        df.select(
            F.col(type_col).alias("event_type"),
            F.expr(f"(ts_ns div 1000) div {_US_PER_HOUR}").alias("hr"),
        )
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        # the ONE corpus pass; span + densify both consume it
        .localCheckpoint()
    )
    span = cells.groupBy("event_type").agg(
        F.min("hr").alias("__h0"), F.max("hr").alias("__h1")
    )
    grid = span.select(
        "event_type",
        F.explode(F.sequence(F.col("__h0"), F.col("__h1"))).alias("hr"),
    )
    dense = grid.join(cells, ["event_type", "hr"], "left").select(
        "event_type",
        "hr",
        F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("cnt"),
    )
    w = Window.partitionBy("event_type").orderBy("hr")
    scored = dense.select(
        "event_type",
        F.col("cnt").alias("__a"),
        F.lag("cnt", period).over(w).alias("__fs"),
        F.lag("cnt", 1).over(w).alias("__f1"),
    ).where(F.col("__fs").isNotNull())
    err_s = F.abs(F.col("__a") - F.col("__fs")).cast(_EXACT)
    err_1 = F.abs(F.col("__a") - F.col("__f1")).cast(_EXACT)
    # per-term IEEE division of exact integers is engine-identical;
    # quantize before summing so accumulation order cannot matter
    smape_term = F.when(
        (F.col("__a") + F.col("__fs")) > 0,
        _q6(
            F.lit(2.0)
            * F.abs(F.col("__a") - F.col("__fs")).cast("double")
            / (F.col("__a") + F.col("__fs")).cast("double")
        ),
    ).otherwise(F.lit(0.0).cast("double").cast("string").cast("decimal(18,6)"))
    agg = scored.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.sum(err_s).cast(_EXACT).alias("__sae"),
        F.sum((err_s * err_s).cast(_EXACT)).cast(_EXACT).alias("__sse"),
        F.sum(err_1).cast(_EXACT).alias("__sa1"),
        F.sum(smape_term.cast(_MOMENT)).cast(_MOMENT).alias("__ssm"),
    )
    n_d = F.col("n_eval").cast("double")
    mae_s = _div(_d2d(F.col("__sae")), n_d)
    mae_1 = _div(_d2d(F.col("__sa1")), n_d)
    return agg.select(
        "event_type",
        "n_eval",
        mae_s.alias("mae_seasonal"),
        F.sqrt(_div(_d2d(F.col("__sse")), n_d)).alias("rmse_seasonal"),
        mae_1.alias("mae_naive"),
        _div(mae_s, mae_1).alias("mase"),
        _div(_d2d(F.col("__ssm")), n_d).alias("smape"),
    ).orderBy("event_type")


def seasonal_naive_eval_sql(
    table: str, type_col: str = "event_type", period: int = 168
) -> str:
    smape_q = _q6_sql("2.0 * CAST(abs(a - fs) AS DOUBLE) / CAST(a + fs AS DOUBLE)")
    zero_q = "CAST(CAST((CAST(0.0 AS DOUBLE)) * CAST(ABS(CAST(0.0 AS DOUBLE)) >= POWER(10.0, -(6+1)) AS INT) AS VARCHAR) AS DECIMAL(18,6))"
    mae_s = f"{_d2d_sql('sae')} / CAST(n_eval AS DOUBLE)"
    mae_1 = f"{_d2d_sql('sa1')} / CAST(n_eval AS DOUBLE)"
    return f"""
WITH __c AS (
  SELECT {type_col} AS event_type,
         CAST({_HOUR_SQL} AS BIGINT) AS hr,
         COUNT(*)::BIGINT AS cnt
  FROM {table} GROUP BY 1, 2
),
__span AS (
  SELECT event_type, MIN(hr) AS h0, MAX(hr) AS h1 FROM __c
  GROUP BY event_type
),
__grid AS (
  SELECT s.event_type, g.hr
  FROM __span s,
       LATERAL (SELECT unnest(generate_series(s.h0, s.h1)) AS hr) g
),
__d AS (
  SELECT g.event_type, g.hr, COALESCE(c.cnt, 0::BIGINT) AS cnt
  FROM __grid g LEFT JOIN __c c ON g.event_type = c.event_type AND g.hr = c.hr
),
__l AS (
  SELECT event_type, cnt AS a,
         LAG(cnt, {int(period)}) OVER (PARTITION BY event_type ORDER BY hr)
           AS fs,
         LAG(cnt, 1) OVER (PARTITION BY event_type ORDER BY hr) AS f1
  FROM __d
),
__a AS (
  SELECT event_type,
         COUNT(*)::BIGINT AS n_eval,
         CAST(SUM(CAST(abs(a - fs) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sae,
         CAST(SUM(CAST(abs(a - fs) AS DECIMAL(38,0))
                  * CAST(abs(a - fs) AS DECIMAL(38,0))) AS DECIMAL(38,0))
           AS sse,
         CAST(SUM(CAST(abs(a - f1) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sa1,
         CAST(SUM(CAST(CASE WHEN a + fs > 0 THEN {smape_q}
                            ELSE {zero_q} END AS DECIMAL(38,12)))
              AS DECIMAL(38,12)) AS ssm
  FROM __l WHERE fs IS NOT NULL GROUP BY event_type
)
SELECT event_type, n_eval,
       {mae_s} AS mae_seasonal,
       sqrt({_d2d_sql('sse')} / CAST(n_eval AS DOUBLE)) AS rmse_seasonal,
       {mae_1} AS mae_naive,
       CASE WHEN ({mae_1}) <> 0.0 THEN ({mae_s}) / ({mae_1}) END AS mase,
       {_d2d_sql('ssm')} / CAST(n_eval AS DOUBLE) AS smape
FROM __a
ORDER BY event_type
"""


def holt_linear(
    df: DataFrame,
    key_col: str = "event_type",
    alpha_num: int = 1,
    alpha_den: int = 5,
    beta_num: int = 1,
    beta_den: int = 10,
) -> DataFrame:
    """(key, hour, cnt, level, trend, forecast, abs_err): Holt's linear
    (double-exponential) smoothing per key over the densified hourly
    series (Holt 1957 / Hyndman-Athanasopoulos fpp3 §8.2) — the
    level+trend upgrade of the EWMA chart, and the model the
    seasonal-naive backtest graduates to when a series actually drifts:

        l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
        forecast_t (one-step, made at t−1) = l_{t−1} + b_{t−1}

    Engine parity — the ewma_monitor integer fixed-point contract: l
    and b carry nano-counts; each step is exact floor-division rational
    rounding in pure int64 ((2·(αnum·x + (αden−αnum)(l+b)) + αden) div
    2αden, same for β), seeded l_1 = x_1, b_1 = 0 (documented; the
    trend warms up through β steps).  Both engines walk the SAME
    integers — a bounded applyInPandas loop here, a recursive CTE in
    the twin; the Python loop divides with an explicit TRUNCATING
    helper because DuckDB's // truncates toward zero while Python's //
    floors (they differ on negatives — hazard class 9).  Final doubles
    are text-hops of exact integers.

    Scale posture: identical to ewma_monitor — one collapse to
    calendar-bounded (key, hour) cells, per-key sequential pass over
    the span, one shuffle on the key.
    """
    for num, den, nm in (
        (alpha_num, alpha_den, "alpha"),
        (beta_num, beta_den, "beta"),
    ):
        if den < 1 or num < 1 or num >= den:
            raise ValueError(f"need 0 < {nm}_num < {nm}_den, got {num}/{den}")
    scale = 10**9
    from bullet_storm_spark.operators.common import hourly_cells

    hours = hourly_cells(df, key_col).select("__key", "hour", "cnt")
    an, ad = int(alpha_num), int(alpha_den)
    bn, bd = int(beta_num), int(beta_den)

    def tdiv(a, b):
        # TRUNCATING integer division — DuckDB's // truncates toward
        # zero while Python's // floors; the trend term goes negative on
        # declining series, so the twins must share ONE semantics
        # (fuzz-caught: -7//2 = -4 in Python, -3 in DuckDB)
        q = abs(a) // b
        return q if a >= 0 else -q

    def rec(pdf):
        pdf = pdf.sort_values("hour", kind="mergesort").reset_index(drop=True)
        lvl = trd = None
        ls, bs, fs = [], [], []
        for x in pdf["cnt"]:
            xi = int(x) * scale
            if lvl is None:
                lvl, trd, fc = xi, 0, None
            else:
                fc = lvl + trd
                prev = lvl
                lvl = tdiv(2 * (an * xi + (ad - an) * (lvl + trd)) + ad, 2 * ad)
                trd = tdiv(2 * (bn * (lvl - prev) + (bd - bn) * trd) + bd, 2 * bd)
            ls.append(lvl)
            bs.append(trd)
            fs.append(fc)
        pdf["__l"] = ls
        pdf["__b"] = bs
        pdf["__f"] = fs
        return pdf

    walked = hours.groupBy("__key").applyInPandas(
        rec, "__key string, hour long, cnt long, __l long, __b long, __f long"
    )
    d = lambda c: F.col(c).cast("string").cast("double") / F.lit(float(scale))
    return walked.select(
        F.col("__key").alias(key_col),
        "hour",
        "cnt",
        d("__l").alias("level"),
        d("__b").alias("trend"),
        d("__f").alias("forecast"),
        F.round(
            F.abs(F.col("cnt").cast("double") - d("__f")), 9
        ).alias("abs_err"),
    ).orderBy(key_col, "hour")


def holt_linear_sql(
    table: str,
    key_col: str = "event_type",
    alpha_num: int = 1,
    alpha_den: int = 5,
    beta_num: int = 1,
    beta_den: int = 10,
) -> str:
    an, ad = int(alpha_num), int(alpha_den)
    bn, bd = int(beta_num), int(beta_den)
    S = 10**9
    return f"""
WITH RECURSIVE {hourly_cells_sql(table, key_col)},
__nb AS (
  SELECT key, hour, cnt,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY hour) AS rn
  FROM __cells
),
__rec AS (
  SELECT key, hour, cnt, rn,
         cnt * {S} AS l, CAST(0 AS BIGINT) AS b,
         CAST(NULL AS BIGINT) AS f
  FROM __nb WHERE rn = 1
  UNION ALL
  SELECT x.key, x.hour, x.cnt, x.rn,
         (2 * ({an} * x.cnt * {S} + {ad - an} * (r.l + r.b)) + {ad})
           // (2 * {ad}),
         (2 * ({bn} * ((2 * ({an} * x.cnt * {S} + {ad - an} * (r.l + r.b))
                        + {ad}) // (2 * {ad}) - r.l)
               + {bd - bn} * r.b) + {bd}) // (2 * {bd}),
         r.l + r.b
  FROM __nb x JOIN __rec r ON x.key = r.key AND x.rn = r.rn + 1
)
SELECT key AS {key_col}, hour, cnt,
       CAST(CAST(l AS VARCHAR) AS DOUBLE) / {float(S)!r} AS level,
       CAST(CAST(b AS VARCHAR) AS DOUBLE) / {float(S)!r} AS trend,
       CAST(CAST(f AS VARCHAR) AS DOUBLE) / {float(S)!r} AS forecast,
       CAST(CAST(CAST(CAST((abs(CAST(cnt AS DOUBLE)
                 - CAST(CAST(f AS VARCHAR) AS DOUBLE) / {float(S)!r})) * CAST(ABS(abs(CAST(cnt AS DOUBLE)
                 - CAST(CAST(f AS VARCHAR) AS DOUBLE) / {float(S)!r})) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE)
         AS abs_err
FROM __rec ORDER BY {key_col}, hour
"""
