"""Series diagnostics over the densified hourly spine, dual-compiled:
autocorrelation (+ running Ljung-Box), the Wald-Wolfowitz runs test,
Grubbs' max-outlier statistic, and the Pettitt rank changepoint.

These are the "is this series even well-behaved" pre-flights that sit in
front of the trend/forecast family (trend.py, forecast.py): ACF says how
much memory the hourly counts carry (and Ljung-Box whether the memory is
jointly significant — the residual-whiteness check every forecast
backtest should run); the runs test detects non-randomness the ACF's
linear view misses (long one-sided excursions around the median); Grubbs
names the single worst hour with a studentized magnitude; Pettitt finds
a single change-point WITHOUT assuming normality (the rank-based
complement to anomaly.py's variance-based binary segmentation).

Engine parity follows the module conventions (stats_tests.py): every
cross-row accumulation is an EXACT integer/decimal sum (counts, count
products, rank counts), converted via the ``_d2d`` text hop, with one
fixed-association IEEE finish per output value; running sums that must
cross rows in float (Ljung-Box terms, Pettitt's U) run inside an
ORDER BY window, which both engines evaluate left-to-right in frame
order, so association is identical. No p-values on purpose: Φ needs
erf/exp, which engines evaluate differently — callers compare the
statistic against literal critical values (the mann_kendall convention,
trend.py:393).

Scale posture (100 TB): everything starts from common.hourly_cells —
one corpus collapse to calendar-bounded (key, hour) cells. ACF joins
the cells to themselves on an equi-key (key, hour+lag) — n·max_lag
rows, not n². Runs/Grubbs/Pettitt are rank windows + one aggregation
per key over span-bounded cells. No pair explosion anywhere.

Reference scope: the reference engine (bullet-core/bullet-storm) has no
series diagnostics at all — this module is part of the mandated
large-scale pipeline extension surface, same as trend.py/forecast.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from bullet_storm_spark.operators.common import hourly_cells, hourly_cells_sql
from bullet_storm_spark.operators.stats_tests import _d2d, _d2d_sql, _div

# decimal(38,0): exact integer arithmetic past int64 (the concentration.py
# convention) — n²·Σ(y_t·y_{t+k}) overflows BIGINT once hourly counts
# reach ~1e9 at calendar spans, which a 100 TB year-scale corpus does.
_EXACT = "decimal(38,0)"


def _cells(df: DataFrame, key_col: str) -> DataFrame:
    return hourly_cells(df, key_col).select(
        "__key", "hour", F.col("cnt").alias("y")
    )


# --------------------------------------------------------------------------
# ACF + Ljung-Box
# --------------------------------------------------------------------------

def acf(df: DataFrame, key_col: str = "event_type", max_lag: int = 6) -> DataFrame:
    """Per-key autocorrelation of the densified hourly counts at lags
    1..max_lag, plus the RUNNING Ljung-Box statistic: ``(key, lag,
    n_hours, r, q_lb)`` ordered by (key, lag).

    With S = Σy, Syy = Σy², and per-lag sums over the n−k aligned pairs
    (Sxy = Σ y_t·y_{t+k}, Hs = Σ y_t, Ts = Σ y_{t+k}), the mean-centered
    sample ACF multiplies through by n² to stay integer-exact:

        r_k = (n²·Sxy − n·S·(Hs+Ts) + (n−k)·S²) / (n²·Syy − n·S²)

    Q at lag k is Ljung-Box's n(n+2)·Σ_{j≤k} r_j²/(n−j) (Biometrika
    1978), accumulated by an ORDER BY lag running window so both
    engines add the (already 9dp-rounded) terms in the same order.
    Compare Q against a literal χ²_k quantile (no p-value — the
    mann_kendall convention). Keys with zero variance are excluded;
    lags with no aligned pairs (k ≥ n) produce no row."""
    cells = _cells(df, key_col)
    per = cells.groupBy("__key").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.col("y").cast(_EXACT)).cast(_EXACT).alias("__s"),
        F.sum(F.col("y").cast(_EXACT) * F.col("y").cast(_EXACT))
        .cast(_EXACT)
        .alias("__syy"),
    )
    head = cells.select(
        "__key",
        F.col("y").alias("__y1"),
        F.explode(F.sequence(F.lit(1), F.lit(max_lag))).alias("lag"),
        F.col("hour"),
    ).withColumn("__h2", F.col("hour") + F.col("lag"))
    tail = cells.select(
        "__key", F.col("hour").alias("__h2"), F.col("y").alias("__y2")
    )
    pairs = (
        head.join(tail, ["__key", "__h2"])
        .groupBy("__key", "lag")
        .agg(
            F.sum(F.col("__y1").cast(_EXACT) * F.col("__y2").cast(_EXACT))
            .cast(_EXACT)
            .alias("__sxy"),
            F.sum(F.col("__y1").cast(_EXACT)).cast(_EXACT).alias("__hs"),
            F.sum(F.col("__y2").cast(_EXACT)).cast(_EXACT).alias("__ts"),
        )
    )
    j = pairs.join(per, "__key")
    n_d = F.col("__n").cast(_EXACT)
    k_d = F.col("lag").cast(_EXACT)
    num = (
        n_d * n_d * F.col("__sxy")
        - n_d * F.col("__s") * (F.col("__hs") + F.col("__ts"))
        + (n_d - k_d) * F.col("__s") * F.col("__s")
    )
    den = n_d * n_d * F.col("__syy") - n_d * F.col("__s") * F.col("__s")
    r = F.round(_div(_d2d(num), _d2d(den)), 9)
    w = (
        Window.partitionBy("key")
        .orderBy("lag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    q_term = (F.col("r") * F.col("r")) / (
        F.col("n_hours") - F.col("lag")
    ).cast("double")
    out = (
        j.where(den > 0)
        .select(
            F.col("__key").alias("key"),
            "lag",
            F.col("__n").alias("n_hours"),
            r.alias("r"),
        )
        .withColumn(
            "q_lb",
            F.round(
                (F.col("n_hours") * (F.col("n_hours") + 2)).cast("double")
                * F.sum(q_term).over(w),
                9,
            ),
        )
    )
    return out.orderBy("key", "lag")


def acf_sql(table: str, key_col: str = "event_type", max_lag: int = 6) -> str:
    d = "DECIMAL(38,0)"
    return f"""
WITH {hourly_cells_sql(table, key_col)},
__y AS (SELECT key, hour, cnt AS y FROM __cells),
__per AS (
  SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(y AS {d})) AS {d}) AS s,
         CAST(SUM(CAST(y AS {d}) * CAST(y AS {d})) AS {d}) AS syy
  FROM __y GROUP BY key
),
__pairs AS (
  SELECT a.key, l.lag,
         CAST(SUM(CAST(a.y AS {d}) * CAST(b.y AS {d})) AS {d}) AS sxy,
         CAST(SUM(CAST(a.y AS {d})) AS {d}) AS hs,
         CAST(SUM(CAST(b.y AS {d})) AS {d}) AS ts
  FROM __y a
  CROSS JOIN (SELECT UNNEST(range(1, {max_lag} + 1)) AS lag) l
  JOIN __y b ON b.key = a.key AND b.hour = a.hour + l.lag
  GROUP BY a.key, l.lag
),
__r AS (
  SELECT p.key, p.lag, q.n AS n_hours,
         CAST(CAST(CAST(CAST(({_d2d_sql(f'''CAST(q.n AS {d}) * CAST(q.n AS {d}) * p.sxy
                - CAST(q.n AS {d}) * q.s * (p.hs + p.ts)
                + (CAST(q.n AS {d}) - CAST(p.lag AS {d})) * q.s * q.s''')}
               / {_d2d_sql(f'CAST(q.n AS {d}) * CAST(q.n AS {d}) * q.syy - CAST(q.n AS {d}) * q.s * q.s')}) * CAST(ABS({_d2d_sql(f'''CAST(q.n AS {d}) * CAST(q.n AS {d}) * p.sxy
                - CAST(q.n AS {d}) * q.s * (p.hs + p.ts)
                + (CAST(q.n AS {d}) - CAST(p.lag AS {d})) * q.s * q.s''')}
               / {_d2d_sql(f'CAST(q.n AS {d}) * CAST(q.n AS {d}) * q.syy - CAST(q.n AS {d}) * q.s * q.s')}) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) AS r
  FROM __pairs p JOIN __per q ON p.key = q.key
  WHERE CAST(q.n AS {d}) * CAST(q.n AS {d}) * q.syy
        - CAST(q.n AS {d}) * q.s * q.s > 0
)
SELECT key, lag, n_hours, r,
       CAST(CAST(CAST(CAST((CAST(n_hours * (n_hours + 2) AS DOUBLE)
             * SUM((r * r) / CAST(n_hours - lag AS DOUBLE))
               OVER (PARTITION BY key ORDER BY lag
                     ROWS UNBOUNDED PRECEDING)) * CAST(ABS(CAST(n_hours * (n_hours + 2) AS DOUBLE)
             * SUM((r * r) / CAST(n_hours - lag AS DOUBLE))
               OVER (PARTITION BY key ORDER BY lag
                     ROWS UNBOUNDED PRECEDING)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) AS q_lb
FROM __r ORDER BY key, lag
"""


# --------------------------------------------------------------------------
# Wald-Wolfowitz runs test
# --------------------------------------------------------------------------

def runs_test(df: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Per-key runs test of randomness around the median: ``(key,
    n_pos, n_neg, runs, z)`` ordered by key (Wald & Wolfowitz, Ann.
    Math. Stat. 1940).

    The hourly counts are dichotomized against the key's EXACT median
    (2·median = low+high middle order statistics, so the comparison
    2y vs med2 is pure integer — no float median crosses an engine);
    cells equal to the median are dropped (the classical convention).
    R = number of sign runs in hour order; with n₁ positives, n₂
    negatives, N = n₁+n₂:

        µ = 2n₁n₂/N + 1
        σ² = 2n₁n₂(2n₁n₂ − N) / (N²(N−1))
        z = (R − µ)/σ

    All products accumulate in decimal(38,0) (2n₁n₂ squares overflow
    int64 past ~10⁵ cells), one IEEE finish. z is NULL when either
    side is empty or N < 2 (σ = 0)."""
    cells = _cells(df, key_col)
    wr = Window.partitionBy("__key").orderBy(F.asc("y"), F.asc("hour"))
    ranked = cells.withColumn("__rn", F.row_number().over(wr)).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy("__key"))
    )
    # integer div, not `/`: Spark's `/` is double division, so for even
    # n the (n+1)/2 comparison would be x.5 == rn (never true) while the
    # DuckDB twin's `//` matches — the common.hourly_cells lesson
    med = ranked.groupBy("__key").agg(
        (
            F.sum(
                F.when(
                    F.col("__rn") == F.expr("(__n + 1) div 2"),
                    F.col("y"),
                ).otherwise(F.lit(0))
            )
            + F.sum(
                F.when(
                    F.col("__rn") == F.expr("__n div 2 + 1"), F.col("y")
                ).otherwise(F.lit(0))
            )
        )
        .cast("long")
        .alias("__med2")
    )
    signed = (
        cells.join(med, "__key")
        .withColumn(
            "__sgn",
            F.signum((2 * F.col("y") - F.col("__med2")).cast("double")).cast(
                "int"
            ),
        )
        .where(F.col("__sgn") != 0)
    )
    wh = Window.partitionBy("__key").orderBy("hour")
    flips = signed.withColumn(
        "__flip",
        F.when(
            F.lag("__sgn").over(wh).isNull()
            | (F.col("__sgn") != F.lag("__sgn").over(wh)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    agg = flips.groupBy("__key").agg(
        F.sum(F.when(F.col("__sgn") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
        F.sum(F.when(F.col("__sgn") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_neg"),
        F.sum("__flip").cast("long").alias("runs"),
    )
    p = F.col("n_pos").cast(_EXACT)
    q = F.col("n_neg").cast(_EXACT)
    nn = p + q
    two_pq = F.lit(2).cast(_EXACT) * p * q
    mu = _d2d(two_pq) / _d2d(nn) + F.lit(1.0)
    var = _div(
        _d2d(two_pq * (two_pq - nn)),
        _d2d(nn * nn * (nn - F.lit(1).cast(_EXACT))),
    )
    ok = (F.col("n_pos") > 0) & (F.col("n_neg") > 0) & (var > 0)
    return agg.select(
        F.col("__key").alias("key"),
        "n_pos",
        "n_neg",
        "runs",
        F.when(
            ok,
            F.round((F.col("runs").cast("double") - mu) / F.sqrt(var), 9),
        ).alias("z"),
    ).orderBy("key")


def runs_test_sql(table: str, key_col: str = "event_type") -> str:
    d = "DECIMAL(38,0)"
    return f"""
WITH {hourly_cells_sql(table, key_col)},
__y AS (SELECT key, hour, cnt AS y FROM __cells),
__ranked AS (
  SELECT key, hour, y,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY y, hour) AS rn,
         COUNT(*) OVER (PARTITION BY key) AS n
  FROM __y
),
__med AS (
  SELECT key,
         CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN y ELSE 0 END)
              + SUM(CASE WHEN rn = n // 2 + 1 THEN y ELSE 0 END)
              AS BIGINT) AS med2
  FROM __ranked GROUP BY key
),
__signed AS (
  SELECT c.key, c.hour,
         CASE WHEN 2 * c.y > m.med2 THEN 1 ELSE -1 END AS sgn
  FROM __y c JOIN __med m ON c.key = m.key
  WHERE 2 * c.y <> m.med2
),
__flips AS (
  SELECT key, sgn,
         CASE WHEN LAG(sgn) OVER (PARTITION BY key ORDER BY hour) IS NULL
                OR sgn <> LAG(sgn) OVER (PARTITION BY key ORDER BY hour)
              THEN 1 ELSE 0 END AS flip
  FROM __signed
),
__agg AS (
  SELECT key,
         CAST(SUM(CASE WHEN sgn > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(SUM(CASE WHEN sgn < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
         CAST(SUM(flip) AS BIGINT) AS runs
  FROM __flips GROUP BY key
)
SELECT key, n_pos, n_neg, runs,
       CASE WHEN n_pos > 0 AND n_neg > 0
                 AND CAST(2 AS {d}) * n_pos * n_neg
                     * (CAST(2 AS {d}) * n_pos * n_neg - (n_pos + n_neg)) > 0
            THEN CAST(CAST(CAST(CAST(((CAST(runs AS DOUBLE)
               - ({_d2d_sql(f'CAST(2 AS {d}) * n_pos * n_neg')}
                  / {_d2d_sql('CAST(n_pos + n_neg AS ' + d + ')')} + 1.0))
              / sqrt({_d2d_sql(f'''CAST(2 AS {d}) * n_pos * n_neg
                       * (CAST(2 AS {d}) * n_pos * n_neg - (n_pos + n_neg))''')}
                     / {_d2d_sql(f'''CAST(n_pos + n_neg AS {d})
                          * CAST(n_pos + n_neg AS {d})
                          * (CAST(n_pos + n_neg AS {d}) - 1)''')})) * CAST(ABS((CAST(runs AS DOUBLE)
               - ({_d2d_sql(f'CAST(2 AS {d}) * n_pos * n_neg')}
                  / {_d2d_sql('CAST(n_pos + n_neg AS ' + d + ')')} + 1.0))
              / sqrt({_d2d_sql(f'''CAST(2 AS {d}) * n_pos * n_neg
                       * (CAST(2 AS {d}) * n_pos * n_neg - (n_pos + n_neg))''')}
                     / {_d2d_sql(f'''CAST(n_pos + n_neg AS {d})
                          * CAST(n_pos + n_neg AS {d})
                          * (CAST(n_pos + n_neg AS {d}) - 1)''')})) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE)
       END AS z
FROM __agg ORDER BY key
"""


# --------------------------------------------------------------------------
# Grubbs' max-outlier statistic
# --------------------------------------------------------------------------

def grubbs(df: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Per-key Grubbs statistic naming the single worst hour: ``(key,
    n_hours, peak_hour, peak_cnt, g_stat)`` ordered by key (Grubbs,
    Technometrics 1969).

        G = max|y − ȳ| / s
          = max|n·y − S| · sqrt((n−1) / (n·(n·Σy² − S²)))

    The deviation |n·y − S| is an exact integer per cell, so the argmax
    (ties broken by earliest hour) is engine-deterministic; the sqrt is
    the single IEEE finish. Compare G against the literal t-based
    critical value for (n, α) — no p-value (erf), the module
    convention. Keys with n < 3 or zero variance are excluded."""
    cells = _cells(df, key_col)
    per = cells.groupBy("__key").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.col("y").cast(_EXACT)).cast(_EXACT).alias("__s"),
        F.sum(F.col("y").cast(_EXACT) * F.col("y").cast(_EXACT))
        .cast(_EXACT)
        .alias("__syy"),
    )
    dev = cells.join(per, "__key").withColumn(
        "__dev",
        F.abs(
            F.col("__n").cast(_EXACT) * F.col("y").cast(_EXACT) - F.col("__s")
        ),
    )
    wp = Window.partitionBy("__key").orderBy(
        F.desc("__dev"), F.asc("hour")
    )
    peak = dev.withColumn("__pk", F.row_number().over(wp)).where(
        F.col("__pk") == 1
    )
    n_d = F.col("__n").cast(_EXACT)
    den0 = n_d * F.col("__syy") - F.col("__s") * F.col("__s")
    g = F.round(
        _d2d(F.col("__dev"))
        * F.sqrt(
            _div(
                (F.col("__n") - 1).cast("double"),
                F.col("__n").cast("double") * _d2d(den0),
            )
        ),
        9,
    )
    return (
        peak.where((F.col("__n") >= 3) & (den0 > 0))
        .select(
            F.col("__key").alias("key"),
            F.col("__n").alias("n_hours"),
            F.col("hour").alias("peak_hour"),
            F.col("y").alias("peak_cnt"),
            g.alias("g_stat"),
        )
        .orderBy("key")
    )


def grubbs_sql(table: str, key_col: str = "event_type") -> str:
    d = "DECIMAL(38,0)"
    return f"""
WITH {hourly_cells_sql(table, key_col)},
__y AS (SELECT key, hour, cnt AS y FROM __cells),
__per AS (
  SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(y AS {d})) AS {d}) AS s,
         CAST(SUM(CAST(y AS {d}) * CAST(y AS {d})) AS {d}) AS syy
  FROM __y GROUP BY key
),
__dev AS (
  SELECT c.key, c.hour, c.y, p.n, p.s, p.syy,
         abs(CAST(p.n AS {d}) * CAST(c.y AS {d}) - p.s) AS dev,
         ROW_NUMBER() OVER (
           PARTITION BY c.key
           ORDER BY abs(CAST(p.n AS {d}) * CAST(c.y AS {d}) - p.s) DESC,
                    c.hour ASC) AS pk
  FROM __y c JOIN __per p ON c.key = p.key
)
SELECT key, n AS n_hours, hour AS peak_hour, y AS peak_cnt,
       CAST(CAST(CAST(CAST(({_d2d_sql('dev')}
             * sqrt(CAST(n - 1 AS DOUBLE)
                    / (CAST(n AS DOUBLE)
                       * {_d2d_sql(f'CAST(n AS {d}) * syy - s * s')}))) * CAST(ABS({_d2d_sql('dev')}
             * sqrt(CAST(n - 1 AS DOUBLE)
                    / (CAST(n AS DOUBLE)
                       * {_d2d_sql(f'CAST(n AS {d}) * syy - s * s')}))) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) AS g_stat
FROM __dev
WHERE pk = 1 AND n >= 3 AND CAST(n AS {d}) * syy - s * s > 0
ORDER BY key
"""


# --------------------------------------------------------------------------
# Pettitt changepoint
# --------------------------------------------------------------------------

def pettitt(df: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Per-key Pettitt rank changepoint: ``(key, n_hours, u_abs_max,
    t_hat, stat)`` ordered by key (Pettitt, JRSS-C 1979).

    U_t = Σ_{i≤t, j>t} sign(y_i − y_j); the change-point estimate is
    the t maximizing |U_t| (earliest hour on ties). Computed WITHOUT
    pair explosion via the telescoping identity

        U_t − U_{t−1} = Σ_j sign(y_t − y_j) = (#below y_t) − (#above y_t)

    so each cell's increment comes from a value-rank window (exact
    integers), and U is an ORDER BY hour running sum — identical
    left-to-right association in both engines. ``stat`` is the exact
    rational 6·K²/(n³+n²); the approximate significance is
    p ≈ 2·exp(−stat), left to the caller because exp() is not
    bit-portable across engines (the no-erf convention). Keys need
    n ≥ 2; t ranges over 1..n−1 (U_n ≡ 0 is excluded)."""
    # the hourly cell table feeds TWO consumers (the value-rank frame
    # and the join probe); materialize once — keys × hours, tiny — so
    # the event collapse runs once, not twice (guide §3.3)
    cells = _cells(df, key_col).localCheckpoint()
    vg = cells.groupBy("__key", "y").agg(
        F.count(F.lit(1)).cast("long").alias("__cnt")
    )
    wv = (
        Window.partitionBy("__key")
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    vg = vg.withColumn(
        "__less", F.coalesce(F.sum("__cnt").over(wv), F.lit(0)).cast("long")
    ).withColumn(
        "__n",
        F.sum("__cnt").over(Window.partitionBy("__key")).cast("long"),
    )
    ranked = cells.join(vg, ["__key", "y"]).withColumn(
        "__v",
        F.col("__less") - (F.col("__n") - F.col("__less") - F.col("__cnt")),
    )
    wh = (
        Window.partitionBy("__key")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("__key").orderBy("hour")
    u = (
        ranked.withColumn("__u", F.sum("__v").over(wh).cast("long"))
        .withColumn("__t", F.row_number().over(wt))
        .where(F.col("__t") < F.col("__n"))
    )
    wk = Window.partitionBy("__key").orderBy(
        F.desc(F.abs(F.col("__u"))), F.asc("hour")
    )
    peak = u.withColumn("__pk", F.row_number().over(wk)).where(
        F.col("__pk") == 1
    )
    k2 = F.abs(F.col("__u")).cast(_EXACT) * F.abs(F.col("__u")).cast(_EXACT)
    n_d = F.col("__n").cast(_EXACT)
    stat = F.round(
        _div(
            _d2d(F.lit(6).cast(_EXACT) * k2),
            _d2d(n_d * n_d * n_d + n_d * n_d),
        ),
        9,
    )
    return (
        peak.where(F.col("__n") >= 2)
        .select(
            F.col("__key").alias("key"),
            F.col("__n").alias("n_hours"),
            F.abs(F.col("__u")).alias("u_abs_max"),
            F.col("hour").alias("t_hat"),
            stat.alias("stat"),
        )
        .orderBy("key")
    )


def pettitt_sql(table: str, key_col: str = "event_type") -> str:
    d = "DECIMAL(38,0)"
    return f"""
WITH {hourly_cells_sql(table, key_col)},
__y AS (SELECT key, hour, cnt AS y FROM __cells),
__vg AS (
  SELECT key, y, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM __y GROUP BY key, y
),
__vr AS (
  SELECT key, y, cnt,
         CAST(COALESCE(SUM(cnt) OVER (
           PARTITION BY key ORDER BY y
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS less,
         CAST(SUM(cnt) OVER (PARTITION BY key) AS BIGINT) AS n
  FROM __vg
),
__u AS (
  SELECT c.key, c.hour, v.n,
         CAST(SUM(v.less - (v.n - v.less - v.cnt)) OVER (
           PARTITION BY c.key ORDER BY c.hour
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS u,
         ROW_NUMBER() OVER (PARTITION BY c.key ORDER BY c.hour) AS t
  FROM __y c JOIN __vr v ON c.key = v.key AND c.y = v.y
),
__peak AS (
  SELECT key, hour, n, u,
         ROW_NUMBER() OVER (
           PARTITION BY key ORDER BY abs(u) DESC, hour ASC) AS pk
  FROM __u WHERE t < n
)
SELECT key, n AS n_hours, abs(u) AS u_abs_max, hour AS t_hat,
       CAST(CAST(CAST(CAST(({_d2d_sql(f'CAST(6 AS {d}) * CAST(abs(u) AS {d}) * CAST(abs(u) AS {d})')}
             / {_d2d_sql(f'''CAST(n AS {d}) * CAST(n AS {d}) * CAST(n AS {d})
                  + CAST(n AS {d}) * CAST(n AS {d})''')}) * CAST(ABS({_d2d_sql(f'CAST(6 AS {d}) * CAST(abs(u) AS {d}) * CAST(abs(u) AS {d})')}
             / {_d2d_sql(f'''CAST(n AS {d}) * CAST(n AS {d}) * CAST(n AS {d})
                  + CAST(n AS {d}) * CAST(n AS {d})''')}) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) AS stat
FROM __peak WHERE pk = 1 AND n >= 2
ORDER BY key
"""


# --------------------------------------------------------------------------
# Gap / outage report
# --------------------------------------------------------------------------

def gap_report(df: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Per-key zero-hour outage report over the densified spine:
    ``(key, n_hours, zero_hours, n_gaps, longest_gap)`` ordered by key —
    the pipeline-health complement to the spike detectors: CUSUM/EWMA
    ask "did the rate surge", this asks "did the feed go DARK, how
    often, and for how long at a stretch".

    Gaps group by the classic run-length identity (hour − rank is
    constant within a consecutive zero run — exact integers, no
    session window needed); all outputs are integer counts. Keys with
    no zero hours report (0, 0, 0)."""
    cells = _cells(df, key_col)
    zeros = cells.where(F.col("y") == 0)
    wr = Window.partitionBy("__key").orderBy("hour")
    runs = (
        zeros.withColumn(
            "__grp", F.col("hour") - F.row_number().over(wr).cast("long")
        )
        .groupBy("__key", "__grp")
        .agg(F.count(F.lit(1)).cast("long").alias("__len"))
        .groupBy("__key")
        .agg(
            F.sum("__len").cast("long").alias("zero_hours"),
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.max("__len").cast("long").alias("longest_gap"),
        )
    )
    n = cells.groupBy("__key").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours")
    )
    return (
        n.join(runs, "__key", "left")
        .select(
            F.col("__key").alias("key"),
            "n_hours",
            F.coalesce("zero_hours", F.lit(0)).cast("long").alias("zero_hours"),
            F.coalesce("n_gaps", F.lit(0)).cast("long").alias("n_gaps"),
            F.coalesce("longest_gap", F.lit(0)).cast("long").alias("longest_gap"),
        )
        .orderBy("key")
    )


def gap_report_sql(table: str, key_col: str = "event_type") -> str:
    return f"""
WITH {hourly_cells_sql(table, key_col)},
__z AS (
  SELECT key, hour,
         hour - ROW_NUMBER() OVER (PARTITION BY key ORDER BY hour) AS grp
  FROM __cells WHERE cnt = 0
),
__runs AS (
  SELECT key,
         CAST(SUM(len) AS BIGINT) AS zero_hours,
         CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(MAX(len) AS BIGINT) AS longest_gap
  FROM (SELECT key, grp, CAST(COUNT(*) AS BIGINT) AS len
        FROM __z GROUP BY key, grp)
  GROUP BY key
),
__n AS (
  SELECT key, CAST(COUNT(*) AS BIGINT) AS n_hours FROM __cells GROUP BY key
)
SELECT n.key, n.n_hours,
       CAST(COALESCE(r.zero_hours, 0) AS BIGINT) AS zero_hours,
       CAST(COALESCE(r.n_gaps, 0) AS BIGINT) AS n_gaps,
       CAST(COALESCE(r.longest_gap, 0) AS BIGINT) AS longest_gap
FROM __n n LEFT JOIN __runs r ON n.key = r.key
ORDER BY n.key
"""


def fano_report(
    df: DataFrame, key_col: str = "event_type", round_to: int = 9
) -> DataFrame:
    """Per-key Fano factor (index of dispersion) of the densified hourly
    counts: ``(key, n_hours, total, mean_rate, fano)`` ordered by key,
    with ``fano = Var(y)/E[y]`` over the key's min..max hour spine
    (population variance). The one-scalar burstiness alarm for an event
    feed: a Poisson-ish feed sits at 1, batch-loading and incident
    spikes push it far above, an artificially smoothed/rate-limited
    feed below — worth tracking per release next to the ACF/seasonality
    diagnostics (the same Fano statistic term_burstiness applies to
    token counts, here on the time axis).

    Engine parity: with S = Σy and Syy = Σy² (exact DECIMAL(38,0)
    moments on the zero-densified spine), fano multiplies through by n
    to stay integer-exact until ONE final IEEE division:
    ``fano = (n·Syy − S²) / (n·S)`` and ``mean_rate = S/n``. Zero-total
    keys report NULL fano (0/0). Scale: the shared hourly_cells
    collapse, then a key-sized reduction — no windows, no joins."""
    cells = _cells(df, key_col)
    agg = cells.groupBy("__key").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum(F.col("y").cast(_EXACT)).cast(_EXACT).alias("__s"),
        F.sum((F.col("y").cast(_EXACT) * F.col("y").cast(_EXACT)).cast(_EXACT))
        .cast(_EXACT)
        .alias("__syy"),
    )
    n_e = F.col("n_hours").cast(_EXACT)
    num = (n_e * F.col("__syy") - F.col("__s") * F.col("__s")).cast(_EXACT)
    den = (n_e * F.col("__s")).cast(_EXACT)
    return agg.select(
        F.col("__key").alias("key"),
        "n_hours",
        F.col("__s").cast("long").alias("total"),
        F.round(
            _div(_d2d(F.col("__s")), F.col("n_hours").cast("double")), round_to
        ).alias("mean_rate"),
        F.round(_div(_d2d(num), _d2d(den)), round_to).alias("fano"),
    ).orderBy("key")


def fano_report_sql(
    table: str, key_col: str = "event_type", round_to: int = 9
) -> str:
    from bullet_storm_spark.operators.stats_tests import _qround_sql

    d = "DECIMAL(38,0)"
    num = _d2d_sql(
        f"CAST(CAST(n_hours AS {d}) * syy - s * s AS {d})"
    )
    den = _d2d_sql(f"CAST(CAST(n_hours AS {d}) * s AS {d})")
    return f"""
WITH {hourly_cells_sql(table, key_col)},
__a AS (
  SELECT key, COUNT(*)::BIGINT AS n_hours,
         CAST(SUM(CAST(cnt AS {d})) AS {d}) AS s,
         CAST(SUM(CAST(CAST(cnt AS {d}) * CAST(cnt AS {d}) AS {d})) AS {d})
           AS syy
  FROM __cells GROUP BY key
)
SELECT key, n_hours, CAST(s AS BIGINT) AS total,
       {_qround_sql(_d2d_sql('s') + ' / CAST(n_hours AS DOUBLE)', round_to)}
         AS mean_rate,
       {_qround_sql(f"({num}) / NULLIF({den}, 0.0)", round_to)} AS fano
FROM __a ORDER BY key
"""
