"""Temporal trend analytics: per-group OLS and time-decayed ranking.

Two questions every metrics pipeline asks of an event stream:

- ``groupwise_ols`` — "is this metric trending, per key?" Ordinary
  least squares y ~ x within each group, from the five moment sums
  (n, Σx, Σy, Σxy, Σx², Σy²) — the textbook closed form, one hash
  aggregation per key, no iteration.
- ``decayed_top_items`` — "what is trending NOW?" Items ranked by
  exponentially time-decayed frequency (half-life decay), the classic
  trending-items scorer.

Engine-parity design (the stats_tests conventions):

* OLS moments quantize x and y to DECIMAL(18,6) so products are (37,12)
  — exact in both engines (a (19,6)² would trip Spark's silent scale
  reduction, SCALING.md "Determinism under distribution"). x is
  CENTERED at its global min by default: slope and r² are
  shift-invariant, and centering keeps moment magnitudes small enough
  that the decimal→double casts stay comfortably inside 2^53 where both
  engines convert identically.
* Decay weights avoid pow() entirely: the age in half-lives is clamped
  to 12 buckets and 2^-k for k ≤ 12 is a FINITE 12-digit decimal
  (5^k/10^k) — a 13-entry CASE of exact DECIMAL literals precomputed in
  Python. Contributions older than 12 half-lives round to 0 by
  construction (2^-12 < 2.5e-4 of one fresh event) — a documented,
  deterministic horizon, not a float underflow.

Scale: OLS is one shuffle on the group key. The decayed ranking is one
hash aggregation on the item key + a vocabulary-sized top-k window; the
reference time (max ts) rides a 1-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from bullet_storm_spark.operators.common import hourly_cells, hourly_cells_sql
from bullet_storm_spark.operators.stats_tests import (
    _MOMENT,
    _VAL_DEC,
    _d2d,
    _div,
    _q6,
    _q6_sql,
)

# 2^-k as exact 12dp decimal strings, k = 0..12
_DYADIC = [
    "1.000000000000" if k == 0 else f"0.{5 ** k * 10 ** (12 - k) // 1:012d}"
    for k in range(13)
]


def _decay_weight(k_col: F.Column) -> F.Column:
    out = F.lit(_DYADIC[12]).cast(_MOMENT)
    for k in range(11, -1, -1):
        out = F.when(k_col == k, F.lit(_DYADIC[k]).cast(_MOMENT)).otherwise(out)
    return out


def _decay_weight_sql(k_sql: str) -> str:
    whens = " ".join(
        f"WHEN {k} THEN CAST({_DYADIC[k]} AS DECIMAL(38,12))"
        for k in range(12)
    )
    return f"(CASE {k_sql} {whens} ELSE CAST({_DYADIC[12]} AS DECIMAL(38,12)) END)"


def groupwise_ols(
    df: DataFrame,
    key_cols: list[str],
    x_col: str,
    y_col: str,
    center_x: bool = True,
) -> DataFrame:
    """Per-key OLS of ``y_col`` on ``x_col``. Output
    ``(<keys...>, n, slope, intercept, r2)`` ordered by keys. With
    ``center_x`` (default) the intercept is the fitted value at the
    GLOBAL min of x (slope/r² are shift-invariant; centering keeps the
    exact-decimal moments small — see module docstring). slope/intercept
    are NULL when a group has n < 2 or zero x-variance; r² additionally
    NULL at zero y-variance. Rows with NULL x or y are excluded."""
    if not key_cols:
        raise ValueError("groupwise_ols needs >= 1 key column")
    xd = F.col(x_col).cast("double")
    yd = F.col(y_col).cast("double")
    base = df.where(xd.isNotNull() & yd.isNotNull())
    if center_x:
        xmin = base.agg(F.min(xd).alias("__xmin"))
        base = base.crossJoin(F.broadcast(xmin))
        x = _q6(xd - F.col("__xmin"))
    else:
        x = _q6(xd)
    y = _q6(yd)
    g = base.groupBy(*[F.col(k) for k in key_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x.cast(_MOMENT)).cast(_MOMENT).alias("__sx"),
        F.sum(y.cast(_MOMENT)).cast(_MOMENT).alias("__sy"),
        F.sum((x * y).cast(_MOMENT)).cast(_MOMENT).alias("__sxy"),
        F.sum((x * x).cast(_MOMENT)).cast(_MOMENT).alias("__sxx"),
        F.sum((y * y).cast(_MOMENT)).cast(_MOMENT).alias("__syy"),
    )
    n = F.col("n").cast("double")
    sx = _d2d(F.col("__sx"))
    sy = _d2d(F.col("__sy"))
    sxy = n * _d2d(F.col("__sxy")) - sx * sy
    sxx = n * _d2d(F.col("__sxx")) - sx * sx
    syy = n * _d2d(F.col("__syy")) - sy * sy
    ok = (F.col("n") >= 2) & (sxx > 0)
    slope = F.when(ok, _div(sxy, sxx))
    return g.select(
        *key_cols,
        "n",
        slope.alias("slope"),
        F.when(ok, _div(sy - _div(sxy, sxx) * sx, n)).alias("intercept"),
        F.when(ok & (syy > 0), _div(sxy * sxy, sxx * syy)).alias("r2"),
    ).orderBy(*key_cols)


def groupwise_ols_sql(
    table: str,
    key_cols: list[str],
    x_sql: str,
    y_sql: str,
    center_x: bool = True,
) -> str:
    if not key_cols:
        raise ValueError("groupwise_ols needs >= 1 key column")
    keys = ", ".join(key_cols)
    xd = f"CAST({x_sql} AS DOUBLE)"
    yd = f"CAST({y_sql} AS DOUBLE)"
    if center_x:
        x = _q6_sql(f"{xd} - __c.__xmin")
        center = (
            f" CROSS JOIN (SELECT MIN({xd}) AS __xmin FROM {table}"
            f" WHERE ({xd}) IS NOT NULL AND ({yd}) IS NOT NULL) __c"
        )
    else:
        x = _q6_sql(xd)
        center = ""
    y = _q6_sql(yd)
    return f"""
WITH __g AS (
  SELECT {keys}, COUNT(*)::BIGINT AS n,
         CAST(SUM(CAST({x} AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sx,
         CAST(SUM(CAST({y} AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sy,
         CAST(SUM(CAST({x} AS DECIMAL(19,6)) * CAST({y} AS DECIMAL(19,6)))
           AS DECIMAL(38,12)) AS sxy,
         CAST(SUM(CAST({x} AS DECIMAL(19,6)) * CAST({x} AS DECIMAL(19,6)))
           AS DECIMAL(38,12)) AS sxx,
         CAST(SUM(CAST({y} AS DECIMAL(19,6)) * CAST({y} AS DECIMAL(19,6)))
           AS DECIMAL(38,12)) AS syy
  FROM {table}{center}
  WHERE ({xd}) IS NOT NULL AND ({yd}) IS NOT NULL
  GROUP BY {keys}
),
__d AS (
  SELECT {keys}, n,
         CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
           - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS vxy,
         CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
           - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS vxx,
         CAST(n AS DOUBLE) * CAST(CAST(syy AS VARCHAR) AS DOUBLE)
           - CAST(CAST(sy AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS vyy,
         CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd, CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd
  FROM __g
)
SELECT {keys}, n,
       CASE WHEN n >= 2 AND vxx > 0 THEN vxy / vxx END AS slope,
       CASE WHEN n >= 2 AND vxx > 0
         THEN (syd - (vxy / vxx) * sxd) / CAST(n AS DOUBLE) END AS intercept,
       CASE WHEN n >= 2 AND vxx > 0 AND vyy > 0
         THEN (vxy * vxy) / (vxx * vyy) END AS r2
FROM __d ORDER BY {keys}
"""


def decayed_top_items(
    df: DataFrame,
    item_col: str,
    ts_us_col: str,
    halflife_us: int,
    k: int = 10,
) -> DataFrame:
    """Top-``k`` items by exponentially decayed count: each event
    contributes ``2^-(age_in_halflives)`` where age is measured back
    from the corpus max timestamp (a 1-row broadcast) and clamped to 12
    half-lives (older events contribute exactly 0.000244140625 — the
    deterministic horizon; see module docstring). Output
    ``(rank, item, decayed_count, n_events)`` — decayed_count is an
    exact decimal sum cast to double, ties broken by item ASC."""
    if halflife_us < 1:
        raise ValueError(f"need halflife_us >= 1, got {halflife_us}")
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    base = df.where(
        F.col(item_col).isNotNull() & F.col(ts_us_col).isNotNull()
    )
    tmax = base.agg(F.max(F.col(ts_us_col)).cast("long").alias("__tmax"))
    # integer `div`, not `/`: Spark's `/` is double division, and a
    # float age-in-halflives could land on the other side of a bucket
    # boundary than DuckDB's integer `//`
    age_k = F.least(
        F.expr(
            f"(__tmax - cast({ts_us_col} as bigint)) div {int(halflife_us)}"
        ),
        F.lit(12).cast("long"),
    )
    scored = (
        base.crossJoin(F.broadcast(tmax))
        .select(
            F.col(item_col).alias("item"),
            _decay_weight(age_k).alias("__w"),
        )
        .groupBy("item")
        .agg(
            F.sum("__w").cast(_MOMENT).alias("__dw"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )
    w = Window.orderBy(F.desc("__dw"), F.asc("item"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "rank",
            "item",
            _d2d(F.col("__dw")).alias("decayed_count"),
            "n_events",
        )
        .orderBy("rank")
    )


def decayed_top_items_sql(
    table: str,
    item_sql: str,
    ts_us_sql: str,
    halflife_us: int,
    k: int = 10,
) -> str:
    if halflife_us < 1:
        raise ValueError(f"need halflife_us >= 1, got {halflife_us}")
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    age_k = (
        f"LEAST(CAST((__t.__tmax - CAST({ts_us_sql} AS BIGINT))"
        f" // {halflife_us} AS BIGINT), 12)"
    )
    w = _decay_weight_sql(age_k)
    return f"""
WITH __scored AS (
  SELECT {item_sql} AS item,
         CAST(SUM({w}) AS DECIMAL(38,12)) AS dw,
         COUNT(*)::BIGINT AS n_events
  FROM {table}
  CROSS JOIN (SELECT MAX(CAST({ts_us_sql} AS BIGINT)) AS __tmax
              FROM {table}
              WHERE ({item_sql}) IS NOT NULL
                AND ({ts_us_sql}) IS NOT NULL) __t
  WHERE ({item_sql}) IS NOT NULL AND ({ts_us_sql}) IS NOT NULL
  GROUP BY item
),
__ranked AS (
  SELECT item, dw, n_events,
         row_number() OVER (ORDER BY dw DESC, item ASC) AS rank
  FROM __scored
)
SELECT CAST(rank AS BIGINT) AS rank, item,
       CAST(CAST(dw AS VARCHAR) AS DOUBLE) AS decayed_count, n_events
FROM __ranked WHERE rank <= {k} ORDER BY rank
"""


_US_PER_HOUR = 3_600_000_000


def theil_sen_trend(df: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Per-key Theil-Sen robust trend over the densified hourly count
    series: ``(key, n_hours, n_pairs, slope, intercept)``.

    The median of all pairwise slopes (Theil 1950, Sen JASA 1968) — the
    robust counterpart of ``groupwise_ols``: a 29% contamination
    breakdown point, so a bursty outlier hour that drags an OLS fit
    barely moves this one.  intercept is the Theil-Sen companion
    median(y − slope·x) with x RELATIVE to the key's first hour (slope
    is shift-invariant; the relative axis keeps magnitudes small and
    makes the intercept "the robust level at the series start").

    Parity: pairwise slopes are BIGINT-difference / BIGINT-difference →
    one IEEE division, identical across engines; medians use the exact
    interpolated percentile (quantile_cont convention) rounded to 9 dp
    before the intercept pass consumes the slope, so both engines
    subtract the SAME rounded slope (the robust_outliers boundary
    discipline).

    Scale posture (100 TB): one corpus collapse to (key, hour) cells is
    the only fact shuffle; the pair join is span²-bounded per key
    (calendar-bounded, not data-bounded — same contract as the binseg
    changepoint scan) and the intercept pass joins a key-sized broadcast
    back onto span-bounded cells.
    """
    hours = hourly_cells(df, key_col).select(
        "__key",
        (F.col("hour") - F.col("__h0")).cast("long").alias("x"),
        F.col("cnt").alias("y"),
    )
    a = hours.select("__key", F.col("x").alias("x1"), F.col("y").alias("y1"))
    b = hours.select("__key", F.col("x").alias("x2"), F.col("y").alias("y2"))
    pairs = a.join(b, "__key").where(F.col("x2") > F.col("x1"))
    slopes = pairs.select(
        "__key",
        (
            (F.col("y2") - F.col("y1")).cast("double")
            / (F.col("x2") - F.col("x1")).cast("double")
        ).alias("__sl"),
    )
    per_key = slopes.groupBy("__key").agg(
        F.round(F.percentile(F.col("__sl"), F.lit(0.5)), 9).alias("slope"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    resid = (
        hours.join(F.broadcast(per_key), "__key")
        .select(
            "__key",
            "n_pairs",
            "slope",
            (
                F.col("y").cast("double")
                - F.col("slope") * F.col("x").cast("double")
            ).alias("__r"),
        )
        .groupBy("__key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.first("n_pairs").alias("n_pairs"),
            F.first("slope").alias("slope"),
            F.round(F.percentile(F.col("__r"), F.lit(0.5)), 9).alias(
                "intercept"
            ),
        )
    )
    return resid.select(
        F.col("__key").alias("key"),
        "n_hours",
        "n_pairs",
        "slope",
        "intercept",
    ).orderBy("key")


def theil_sen_trend_sql(table: str, key_col: str = "event_type") -> str:
    return f"""
WITH {hourly_cells_sql(table, key_col)},
__rel AS (
  SELECT key, CAST(hour - h0 AS BIGINT) AS x, cnt AS y FROM __cells
),
__slopes AS (
  SELECT a.key,
         CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS sl
  FROM __rel a JOIN __rel b ON a.key = b.key AND b.x > a.x
),
__sl AS (
  SELECT key, CASE WHEN ABS(quantile_cont(sl, 0.5)) >= 1e16 THEN CAST((quantile_cont(sl, 0.5)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((quantile_cont(sl, 0.5)) * CAST(ABS(quantile_cont(sl, 0.5)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS slope,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM __slopes GROUP BY key
),
__res AS (
  SELECT c.key, CAST(COUNT(*) AS BIGINT) AS n_hours,
         ANY_VALUE(s.n_pairs) AS n_pairs,
         ANY_VALUE(s.slope) AS slope,
         CASE WHEN ABS(quantile_cont(CAST(c.y AS DOUBLE) - s.slope * c.x, 0.5)) >= 1e16 THEN CAST((quantile_cont(CAST(c.y AS DOUBLE) - s.slope * c.x, 0.5)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((quantile_cont(CAST(c.y AS DOUBLE) - s.slope * c.x, 0.5)) * CAST(ABS(quantile_cont(CAST(c.y AS DOUBLE) - s.slope * c.x, 0.5)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END
           AS intercept
  FROM __rel c JOIN __sl s ON c.key = s.key
  GROUP BY c.key
)
SELECT key, n_hours, n_pairs, slope, intercept FROM __res ORDER BY key
"""


def mann_kendall(df: DataFrame, key_col: str = "event_type") -> DataFrame:
    """(key, n_hours, s_stat, var_s, z): the Mann-Kendall trend test per
    key over the densified hourly series — the nonparametric "is there
    a monotone trend at all" companion to ``theil_sen_trend`` (Mann
    Econometrica 1945; Kendall 1975):

        S = Σ_{i<j} sign(y_j − y_i)
        Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18   (tie-corrected)
        z = (S − sign(S)) / sqrt(Var(S))   (continuity correction)

    S and the tie term are EXACT integers (pair signs and tie-group
    counts), Var(S) one rational /18, z one IEEE finish — no p-value on
    purpose: Φ needs erf, which engines evaluate differently; the
    caller compares |z| against a literal quantile (1.959964 for 5%),
    same convention as mde_planning's z constants.

    Scale: shares theil_sen's shape — one collapse to calendar-bounded
    (key, hour) cells, span²-bounded sign pairs, a tie histogram over
    the cell values, all per key."""
    cells = hourly_cells(df, key_col).select(
        "__key", "hour", F.col("cnt").alias("y")
    )
    a = cells.select("__key", F.col("hour").alias("h1"), F.col("y").alias("y1"))
    b = cells.select("__key", F.col("hour").alias("h2"), F.col("y").alias("y2"))
    s = (
        a.join(b, "__key")
        .where(F.col("h2") > F.col("h1"))
        .groupBy("__key")
        .agg(
            F.sum(F.signum(F.col("y2") - F.col("y1")).cast("long"))
            .cast("long")
            .alias("s_stat")
        )
    )
    nt = cells.groupBy("__key").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        cells.groupBy("__key", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("__t"))
        .groupBy("__key")
        .agg(
            F.sum(
                F.expr("__t * (__t - 1) * (2 * __t + 5)")
            ).cast("long").alias("__tie")
        )
    )
    j = nt.join(s, "__key").join(ties, "__key")
    var_s = (
        F.expr("n * (n - 1) * (2 * n + 5)").cast("double")
        - F.col("__tie").cast("double")
    ) / F.lit(18.0)
    cc = F.col("s_stat").cast("double") - F.signum(
        F.col("s_stat").cast("double")
    )
    return (
        j.where(F.col("n") >= 2)
        .select(
            F.col("__key").alias("key"),
            F.col("n").alias("n_hours"),
            "s_stat",
            F.round(var_s, 9).alias("var_s"),
            F.round(
                F.when(var_s > 0, cc / F.sqrt(var_s)).otherwise(F.lit(0.0)),
                9,
            ).alias("z"),
        )
        .orderBy("key")
    )


def mann_kendall_sql(table: str, key_col: str = "event_type") -> str:
    return f"""
WITH {hourly_cells_sql(table, key_col)},
__ycells AS (
  SELECT key, hour, cnt AS y FROM __cells
),
__s AS (
  SELECT a.key,
         CAST(SUM(CASE WHEN b.y > a.y THEN 1
                       WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
           AS s_stat
  FROM __ycells a JOIN __ycells b ON a.key = b.key AND b.hour > a.hour
  GROUP BY a.key
),
__n AS (
  SELECT key, CAST(COUNT(*) AS BIGINT) AS n FROM __ycells GROUP BY key
),
__tie AS (
  SELECT key,
         CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie
  FROM (SELECT key, y, CAST(COUNT(*) AS BIGINT) AS t
        FROM __ycells GROUP BY key, y)
  GROUP BY key
),
__j AS (
  SELECT n.key, n.n, s.s_stat, t.tie,
         (CAST(n.n * (n.n - 1) * (2 * n.n + 5) AS DOUBLE)
          - CAST(t.tie AS DOUBLE)) / 18.0 AS var_s
  FROM __n n JOIN __s s ON n.key = s.key JOIN __tie t ON n.key = t.key
  WHERE n.n >= 2
)
SELECT key, n AS n_hours, s_stat,
       CASE WHEN ABS(var_s) >= 1e16 THEN CAST((var_s) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((var_s) * CAST(ABS(var_s) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS var_s,
       CAST(CAST(CAST(CAST((CASE WHEN var_s > 0
                  THEN (CAST(s_stat AS DOUBLE) - sign(CAST(s_stat AS DOUBLE)))
                       / sqrt(var_s)
                  ELSE 0.0 END) * CAST(ABS(CASE WHEN var_s > 0
                  THEN (CAST(s_stat AS DOUBLE) - sign(CAST(s_stat AS DOUBLE)))
                       / sqrt(var_s)
                  ELSE 0.0 END) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) AS z
FROM __j ORDER BY key
"""


def top_movers(
    df: DataFrame,
    group_col: str = "user_id",
    top_k: int = 20,
) -> DataFrame:
    """Heavy-change detection: the ``top_k`` actors whose event count
    moved most between the corpus's first and second calendar half:
    ``(key, cnt_a, cnt_b, delta)`` ordered by |delta| desc, key asc
    (Cormode-Muthukrishnan's "what's new" question, exact form).

    The split point is the midpoint hour (h0+h1) div 2 of the corpus
    span — integer arithmetic on the same epoch-µs hour lattice as the
    series family, broadcast as a 1-row bound. delta = cnt_b − cnt_a;
    an actor absent from a half counts 0 there, so arrivals and
    departures rank alongside accelerations. Exact integer ties make
    the LIMIT boundary deterministic.

    Scale posture: one scan to the (key, half) collapse (map-side
    combined), a 1-row span broadcast, TakeOrdered top-k."""
    hours = df.select(
        F.col(group_col).alias("__k"),
        F.expr("(ts_ns div 1000) div 3600000000").alias("__h"),
    )
    span = hours.agg(
        F.expr("(min(__h) + max(__h)) div 2").cast("long").alias("__mid")
    )
    per = (
        hours.crossJoin(F.broadcast(span))
        .groupBy("__k")
        .agg(
            F.sum(F.when(F.col("__h") <= F.col("__mid"), 1).otherwise(0))
            .cast("long")
            .alias("cnt_a"),
            F.sum(F.when(F.col("__h") > F.col("__mid"), 1).otherwise(0))
            .cast("long")
            .alias("cnt_b"),
        )
    )
    return (
        per.select(
            F.col("__k").alias("key"),
            "cnt_a",
            "cnt_b",
            (F.col("cnt_b") - F.col("cnt_a")).alias("delta"),
        )
        .orderBy(F.abs(F.col("delta")).desc(), F.asc("key"))
        .limit(top_k)
    )


def top_movers_sql(
    table: str, group_col: str = "user_id", top_k: int = 20
) -> str:
    return f"""
WITH __h AS (
  SELECT {group_col} AS k, epoch_us(ts) // 3600000000 AS h FROM {table}
),
__mid AS (SELECT (MIN(h) + MAX(h)) // 2 AS mid FROM __h),
__per AS (
  SELECT k,
         CAST(SUM(CASE WHEN h <= mid THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
         CAST(SUM(CASE WHEN h > mid THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
  FROM __h, __mid GROUP BY k
)
SELECT k AS key, cnt_a, cnt_b, cnt_b - cnt_a AS delta
FROM __per
ORDER BY abs(cnt_b - cnt_a) DESC, key ASC
LIMIT {top_k}
"""
