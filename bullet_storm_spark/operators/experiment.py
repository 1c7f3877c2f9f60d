"""Experiment design & robust estimation: difference-in-differences,
trimmed/winsorized means, and MDE planning — dual-compiled.

The three pieces around the tests stats_tests.py already ships (Welch t,
two-proportion z, CUPED, readouts):

* ``did`` — difference-in-differences (Card & Krueger AER 1994 lineage):
  the 2×2 (treated × post) cell means and the interaction estimate
  ``(m11 − m10) − (m01 − m00)``, with a pooled per-cell-variance normal
  SE. The workhorse for launches WITHOUT randomization — parallel-trends
  is the caller's assumption, the arithmetic is ours.
* ``trimmed_means`` — per-key α-trimmed and winsorized means: the robust
  location estimates for heavy-tailed value columns (revenue, latency),
  where one whale user moves a raw mean by more than the treatment
  effect. Bounds are exact percentiles (quantile_cont convention).
* ``mde_planning`` — minimum detectable effect at given α/power from the
  observed control variance: ``MDE = (z_{1−α/2} + z_power)·σ·√(2/n)``
  for an equal-split two-arm test. The z constants are PYTHON literals
  (default 1.959963984540054, 0.8416212335729143 — Φ⁻¹ is a
  transcendental neither engine should evaluate), so both plans consume
  identical doubles.

Engine parity: all three follow the module conventions of
stats_tests.py — values quantize to DECIMAL(18,6) on entry (``_q6``),
moments accumulate in DECIMAL(38,12) with the (19,6) operand widening in
the DuckDB twins, decimal→double via the ``_d2d`` text hop, try_divide
for data-dependent denominators, ROUND(…, round_to) only on final
outputs (the family's certified pattern).

Scale posture (100 TB): ``did`` and ``mde_planning`` are single-scan
conditional aggregations (no shuffle beyond the 1-row agg);
``trimmed_means`` is the robust_outliers shape — percentile pass +
broadcast bounds + one keyed aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from bullet_storm_spark.operators.sampling import hash_fraction, hash_fraction_sql

from bullet_storm_spark.operators.stats_tests import (
    _MOMENT,
    _arm_moments,
    _d2d,
    _d2d_sql,
    _div,
    _q6,
    _q6_sql,
    _qround_sql,
)

# Φ⁻¹(0.975) and Φ⁻¹(0.80): the standard 5%-two-sided / 80%-power pair
Z_ALPHA_975 = 1.959963984540054
Z_POWER_80 = 0.8416212335729143


def _arm_sql(value_sql: str, pred: str, tag: str) -> str:
    """The welch_t_sql arm builder: n / Σx / Σx² with the (19,6)
    widening so DuckDB's decimal multiply takes the exact int128 path."""
    x = _q6_sql(f"CASE WHEN {pred} THEN CAST({value_sql} AS DOUBLE) END")
    xw = f"CAST({x} AS DECIMAL(19,6))"
    return (
        f"COUNT({x})::BIGINT AS n_{tag},\n"
        f"         CAST(SUM(CAST({x} AS DECIMAL(38,12)))"
        f" AS DECIMAL(38,12)) AS s_{tag},\n"
        f"         CAST(SUM({xw} * {xw})"
        f" AS DECIMAL(38,12)) AS q_{tag}"
    )


def did(
    df: DataFrame,
    value_col: str,
    treat_pred: Column,
    post_pred: Column,
    round_to: int = 9,
) -> DataFrame:
    """One-row difference-in-differences readout over the 2×2 design:
    ``(n00, n01, n10, n11, m00, m01, m10, m11, did, se_did, z)`` where
    cell ``gp`` is (treated=g, post=p), ``did = (m11−m10)−(m01−m00)``
    and ``se_did = sqrt(Σ s²_gp/n_gp)`` (independent-cell normal
    approximation). did/se/z are NULL unless every cell has n >= 2."""
    v = F.col(value_col).cast("double")
    base = df.where(F.col(value_col).isNotNull())
    arms = {}
    for g, gp in ((0, ~treat_pred), (1, treat_pred)):
        for p, pp in ((0, ~post_pred), (1, post_pred)):
            arms[f"{g}{p}"] = _arm_moments(v, gp & pp)
    agg = base.agg(
        *[
            c.alias(f"{name}_{tag}")
            for tag, cols in arms.items()
            for name, c in zip(("n", "s", "q"), cols)
        ]
    )
    m, var, ok = {}, {}, F.lit(True)
    for tag in arms:
        n_d = F.col(f"n_{tag}").cast("double")
        s_d = _d2d(F.col(f"s_{tag}"))
        q_d = _d2d(F.col(f"q_{tag}"))
        m[tag] = _div(s_d, n_d)
        var[tag] = _div(q_d - _div(s_d * s_d, n_d), n_d - F.lit(1.0))
        ok = ok & (F.col(f"n_{tag}") >= 2)
    est = (m["11"] - m["10"]) - (m["01"] - m["00"])
    se2 = sum(
        (_div(var[tag], F.col(f"n_{tag}").cast("double")) for tag in arms),
        F.lit(0.0),
    )
    se = F.sqrt(se2)
    return agg.select(
        *[F.col(f"n_{t}") for t in ("00", "01", "10", "11")],
        *[
            F.round(F.when(F.col(f"n_{t}") > 0, m[t]), round_to).alias(f"m_{t}")
            for t in ("00", "01", "10", "11")
        ],
        F.round(F.when(ok, est), round_to).alias("did"),
        F.round(F.when(ok & (se2 > 0), se), round_to).alias("se_did"),
        F.round(F.when(ok & (se2 > 0), _div(est, se)), round_to).alias("z"),
    )


def did_sql(
    table: str,
    value_sql: str,
    treat_sql: str,
    post_sql: str,
    round_to: int = 9,
) -> str:
    arms = ",\n         ".join(
        _arm_sql(
            value_sql,
            f"({'' if g else 'NOT '}({treat_sql})) AND "
            f"({'' if p else 'NOT '}({post_sql}))",
            f"{g}{p}",
        )
        for g in (0, 1)
        for p in (0, 1)
    )
    mdef = "\n         ".join(
        f"{_d2d_sql(f's_{t}')} / CAST(n_{t} AS DOUBLE) AS m_{t},"
        f" ({_d2d_sql(f'q_{t}')} - {_d2d_sql(f's_{t}')} * {_d2d_sql(f's_{t}')}"
        f" / CAST(n_{t} AS DOUBLE)) / (CAST(n_{t} AS DOUBLE) - 1.0) AS v_{t},"
        for t in ("00", "01", "10", "11")
    ).rstrip(",")
    ok = " AND ".join(f"n_{t} >= 2" for t in ("00", "01", "10", "11"))
    se2 = " + ".join(f"v_{t} / CAST(n_{t} AS DOUBLE)" for t in ("00", "01", "10", "11"))
    return f"""
WITH __m AS (
  SELECT {arms}
  FROM {table} WHERE ({value_sql}) IS NOT NULL
),
__d AS (
  SELECT n_00, n_01, n_10, n_11,
         {mdef}
  FROM __m
),
__e AS (
  SELECT *, (m_11 - m_10) - (m_01 - m_00) AS est,
         {se2} AS se2
  FROM __d
)
SELECT n_00, n_01, n_10, n_11,
       CASE WHEN ABS(CASE WHEN n_00 > 0 THEN m_00 END) >= 1e16 THEN CAST((CASE WHEN n_00 > 0 THEN m_00 END) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CASE WHEN n_00 > 0 THEN m_00 END) * CAST(ABS(CASE WHEN n_00 > 0 THEN m_00 END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS m_00,
       CASE WHEN ABS(CASE WHEN n_01 > 0 THEN m_01 END) >= 1e16 THEN CAST((CASE WHEN n_01 > 0 THEN m_01 END) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CASE WHEN n_01 > 0 THEN m_01 END) * CAST(ABS(CASE WHEN n_01 > 0 THEN m_01 END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS m_01,
       CASE WHEN ABS(CASE WHEN n_10 > 0 THEN m_10 END) >= 1e16 THEN CAST((CASE WHEN n_10 > 0 THEN m_10 END) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CASE WHEN n_10 > 0 THEN m_10 END) * CAST(ABS(CASE WHEN n_10 > 0 THEN m_10 END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS m_10,
       CASE WHEN ABS(CASE WHEN n_11 > 0 THEN m_11 END) >= 1e16 THEN CAST((CASE WHEN n_11 > 0 THEN m_11 END) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CASE WHEN n_11 > 0 THEN m_11 END) * CAST(ABS(CASE WHEN n_11 > 0 THEN m_11 END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS m_11,
       CASE WHEN ABS(CASE WHEN {ok} THEN est END) >= 1e16 THEN CAST((CASE WHEN {ok} THEN est END) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CASE WHEN {ok} THEN est END) * CAST(ABS(CASE WHEN {ok} THEN est END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS did,
       CASE WHEN ABS(CASE WHEN ({ok}) AND se2 > 0 THEN sqrt(se2) END) >= 1e16 THEN CAST((CASE WHEN ({ok}) AND se2 > 0 THEN sqrt(se2) END) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CASE WHEN ({ok}) AND se2 > 0 THEN sqrt(se2) END) * CAST(ABS(CASE WHEN ({ok}) AND se2 > 0 THEN sqrt(se2) END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END
         AS se_did,
       CASE WHEN ABS(CASE WHEN ({ok}) AND se2 > 0 THEN est / sqrt(se2) END) >= 1e16 THEN CAST((CASE WHEN ({ok}) AND se2 > 0 THEN est / sqrt(se2) END) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CASE WHEN ({ok}) AND se2 > 0 THEN est / sqrt(se2) END) * CAST(ABS(CASE WHEN ({ok}) AND se2 > 0 THEN est / sqrt(se2) END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS z
FROM __e
"""


def trimmed_means(
    df: DataFrame,
    key_col: str,
    value_col: str,
    alpha: float = 0.05,
    round_to: int = 6,
) -> DataFrame:
    """Per-key robust location: ``(key, n, n_trimmed, lo, hi,
    trimmed_mean, winsorized_mean)`` ordered by key. ``lo``/``hi`` are
    the exact α and 1−α percentiles (9dp-rounded, the robust_outliers
    boundary convention); the trimmed mean averages values inside
    [lo, hi], the winsorized mean clamps outsiders to the bounds.
    ``n_trimmed`` counts dropped values."""
    if not 0.0 <= alpha < 0.5:
        raise ValueError(f"need 0 <= alpha < 0.5, got {alpha}")
    v6 = _d2d(_q6(F.col(value_col).cast("double")))
    base = df.where(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("key"), v6.alias("__v")
    )
    bounds = base.groupBy("key").agg(
        F.round(F.percentile(F.col("__v"), F.lit(float(alpha))), 9).alias("__lo"),
        F.round(
            F.percentile(F.col("__v"), F.lit(1.0 - float(alpha))), 9
        ).alias("__hi"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    joined = base.join(F.broadcast(bounds), "key")
    inb = (F.col("__v") >= F.col("__lo")) & (F.col("__v") <= F.col("__hi"))
    clamped = F.least(F.greatest(F.col("__v"), F.col("__lo")), F.col("__hi"))
    t6 = _q6(F.when(inb, F.col("__v")))
    w6 = _q6(clamped)
    agg = joined.groupBy("key").agg(
        F.first("n").alias("n"),
        F.first("__lo").alias("lo"),
        F.first("__hi").alias("hi"),
        F.count(t6).cast("long").alias("__nt"),
        F.sum(t6.cast(_MOMENT)).cast(_MOMENT).alias("__st"),
        F.sum(w6.cast(_MOMENT)).cast(_MOMENT).alias("__sw"),
    )
    return agg.select(
        "key",
        "n",
        (F.col("n") - F.col("__nt")).cast("long").alias("n_trimmed"),
        "lo",
        "hi",
        F.round(
            _div(_d2d(F.col("__st")), F.col("__nt").cast("double")), round_to
        ).alias("trimmed_mean"),
        F.round(
            _div(_d2d(F.col("__sw")), F.col("n").cast("double")), round_to
        ).alias("winsorized_mean"),
    ).orderBy("key")


def trimmed_means_sql(
    table: str,
    key_col: str,
    value_col: str,
    alpha: float = 0.05,
    round_to: int = 6,
) -> str:
    if not 0.0 <= alpha < 0.5:
        raise ValueError(f"need 0 <= alpha < 0.5, got {alpha}")
    v6 = _d2d_sql(_q6_sql(f"CAST({value_col} AS DOUBLE)"))
    t6 = _q6_sql("CASE WHEN v >= lo AND v <= hi THEN v END")
    w6 = _q6_sql("LEAST(GREATEST(v, lo), hi)")
    return f"""
WITH __b AS (
  SELECT {key_col} AS key, {v6} AS v FROM {table}
  WHERE ({value_col}) IS NOT NULL
),
__bd AS (
  SELECT key, CASE WHEN ABS(quantile_cont(v, {float(alpha)!r})) >= 1e16 THEN CAST((quantile_cont(v, {float(alpha)!r})) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((quantile_cont(v, {float(alpha)!r})) * CAST(ABS(quantile_cont(v, {float(alpha)!r})) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS lo,
         CASE WHEN ABS(quantile_cont(v, {1.0 - float(alpha)!r})) >= 1e16 THEN CAST((quantile_cont(v, {1.0 - float(alpha)!r})) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((quantile_cont(v, {1.0 - float(alpha)!r})) * CAST(ABS(quantile_cont(v, {1.0 - float(alpha)!r})) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS hi,
         COUNT(*)::BIGINT AS n
  FROM __b GROUP BY key
),
__j AS (
  SELECT b.key, b.v, d.lo, d.hi, d.n FROM __b b JOIN __bd d ON b.key = d.key
),
__a AS (
  SELECT key, MIN(n) AS n, MIN(lo) AS lo, MIN(hi) AS hi,
         COUNT({t6})::BIGINT AS nt,
         CAST(SUM(CAST({t6} AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS st,
         CAST(SUM(CAST({w6} AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sw
  FROM __j GROUP BY key
)
SELECT key, n, (n - nt)::BIGINT AS n_trimmed, lo, hi,
       CAST(CAST(CAST(CAST(({_d2d_sql('st')} / CAST(nt AS DOUBLE)) * CAST(ABS({_d2d_sql('st')} / CAST(nt AS DOUBLE)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE)
         AS trimmed_mean,
       CAST(CAST(CAST(CAST(({_d2d_sql('sw')} / CAST(n AS DOUBLE)) * CAST(ABS({_d2d_sql('sw')} / CAST(n AS DOUBLE)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE)
         AS winsorized_mean
FROM __a
ORDER BY key
"""


def mde_planning(
    df: DataFrame,
    value_col: str,
    control_pred: Column,
    z_alpha: float = Z_ALPHA_975,
    z_power: float = Z_POWER_80,
    round_to: int = 9,
) -> DataFrame:
    """One-row minimum-detectable-effect plan from the observed control
    arm: ``(n, mean, sd, mde_abs, mde_rel)`` — the smallest true lift an
    equal-split two-arm test of this size would detect at the given
    α/power: ``mde_abs = (z_α + z_power)·sd·sqrt(2/n)``;
    ``mde_rel = mde_abs / mean`` (NULL at zero mean). NULL statistics
    when n < 2 or variance is 0."""
    v = F.col(value_col).cast("double")
    base = df.where(F.col(value_col).isNotNull())
    n_c, s_c, q_c = _arm_moments(v, control_pred)
    agg = base.agg(n_c.alias("n"), s_c.alias("__s"), q_c.alias("__q"))
    n_d = F.col("n").cast("double")
    mean = _div(_d2d(F.col("__s")), n_d)
    var = _div(
        _d2d(F.col("__q")) - _div(_d2d(F.col("__s")) * _d2d(F.col("__s")), n_d),
        n_d - F.lit(1.0),
    )
    ok = (F.col("n") >= 2) & (var > 0)
    sd = F.sqrt(var)
    mde = (
        (F.lit(float(z_alpha)) + F.lit(float(z_power)))
        * sd
        * F.sqrt(_div(F.lit(2.0), n_d))
    )
    return agg.select(
        "n",
        F.round(F.when(F.col("n") > 0, mean), round_to).alias("mean"),
        F.round(F.when(ok, sd), round_to).alias("sd"),
        F.round(F.when(ok, mde), round_to).alias("mde_abs"),
        F.round(F.when(ok, _div(mde, mean)), round_to).alias("mde_rel"),
    )


def mde_planning_sql(
    table: str,
    value_sql: str,
    control_sql: str,
    z_alpha: float = Z_ALPHA_975,
    z_power: float = Z_POWER_80,
    round_to: int = 9,
) -> str:
    return f"""
WITH __m AS (
  SELECT {_arm_sql(value_sql, control_sql, 'c')}
  FROM {table} WHERE ({value_sql}) IS NOT NULL
),
__d AS (
  SELECT n_c AS n,
         {_d2d_sql('s_c')} / CAST(n_c AS DOUBLE) AS mean,
         ({_d2d_sql('q_c')} - {_d2d_sql('s_c')} * {_d2d_sql('s_c')}
            / CAST(n_c AS DOUBLE)) / (CAST(n_c AS DOUBLE) - 1.0) AS var
  FROM __m
)
SELECT n,
       CASE WHEN ABS(CASE WHEN n > 0 THEN mean END) >= 1e16 THEN CAST((CASE WHEN n > 0 THEN mean END) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CASE WHEN n > 0 THEN mean END) * CAST(ABS(CASE WHEN n > 0 THEN mean END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS mean,
       CASE WHEN ABS(CASE WHEN n >= 2 AND var > 0 THEN sqrt(var) END) >= 1e16 THEN CAST((CASE WHEN n >= 2 AND var > 0 THEN sqrt(var) END) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CASE WHEN n >= 2 AND var > 0 THEN sqrt(var) END) * CAST(ABS(CASE WHEN n >= 2 AND var > 0 THEN sqrt(var) END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END
         AS sd,
       CAST(CAST(CAST(CAST((CASE WHEN n >= 2 AND var > 0 THEN
         ({float(z_alpha)!r} + {float(z_power)!r}) * sqrt(var)
           * sqrt(2.0 / CAST(n AS DOUBLE)) END) * CAST(ABS(CASE WHEN n >= 2 AND var > 0 THEN
         ({float(z_alpha)!r} + {float(z_power)!r}) * sqrt(var)
           * sqrt(2.0 / CAST(n AS DOUBLE)) END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS mde_abs,
       CAST(CAST(CAST(CAST((CASE WHEN n >= 2 AND var > 0 AND mean <> 0 THEN
         ({float(z_alpha)!r} + {float(z_power)!r}) * sqrt(var)
           * sqrt(2.0 / CAST(n AS DOUBLE)) / mean END) * CAST(ABS(CASE WHEN n >= 2 AND var > 0 AND mean <> 0 THEN
         ({float(z_alpha)!r} + {float(z_power)!r}) * sqrt(var)
           * sqrt(2.0 / CAST(n AS DOUBLE)) / mean END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS mde_rel
FROM __d
"""


def conformal_thresholds(
    df: DataFrame,
    group_col: str,
    score: Column,
    alphas: list[float] = (0.1, 0.05, 0.01),
) -> DataFrame:
    """(group, alpha_permille, n, rank, threshold): split-conformal
    quantile of a nonconformity score per group, with the finite-sample
    correction — threshold = the ⌈(n+1)·(1−α)⌉-th smallest score
    (Vovk et al. 2005; Angelopoulos & Bates 2023 §3).  Any future draw
    from the same distribution lands ≤ threshold with probability
    ≥ 1−α, GUARANTEED at finite n — the distribution-free gate for
    "flag documents whose nonconformity exceeds the calibrated bound".

    Exactness: the rank is computed as the all-integer
    ``⌈(n+1)·(1000−a)/1000⌉`` (alphas carried in permille so no float
    ever touches the rank), and the threshold is an ORDER STATISTIC —
    the smallest support value whose cumulative count reaches the rank
    (the weighted-quantiles threshold scan) — never an interpolation.
    Ranks beyond n (tiny groups at strict alpha) clamp to n, the
    conservative convention.

    Scale: one (group, score) collapse, support-bounded cumulative
    window per group (the ks_drift contract — quantize continuous
    scores upstream), alphas fan out as a literal unpivot.
    """
    a_pm = [int(round(a * 1000)) for a in alphas]
    cells = (
        df.select(F.col(group_col).alias("grp"), score.cast("long").alias("__v"))
        .groupBy("grp", "__v")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    w = Window.partitionBy("grp").orderBy("__v")
    cum = cells.select(
        "grp",
        "__v",
        F.sum("__c").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("__cum"),
        F.sum("__c").over(Window.partitionBy("grp")).cast("long").alias("n"),
    )
    stacked = cum.select(
        "grp",
        "__v",
        "__cum",
        "n",
        F.expr(
            "explode(array({}))".format(
                ", ".join(f"{a}L" for a in a_pm)
            )
        ).alias("alpha_permille"),
    )
    # ceil(x/1000) for POSITIVE x as (x + 999) div 1000: Spark div and
    # DuckDB // both truncate toward zero (Python // floors — keep any
    # pandas twin away from negatives); operands here are positive by
    # construction
    rank = F.least(
        F.expr(
            "CAST(((n + 1) * (1000 - alpha_permille) + 999) div 1000"
            " AS BIGINT)"
        ),
        F.col("n"),
    )
    hit = stacked.where(F.col("__cum") >= rank).groupBy(
        "grp", "alpha_permille"
    ).agg(
        F.first("n").alias("n"),
        F.min("__v").alias("threshold"),
    )
    return hit.select(
        "grp",
        "alpha_permille",
        "n",
        F.least(
            F.expr(
                "CAST(((n + 1) * (1000 - alpha_permille) + 999) div 1000"
                " AS BIGINT)"
            ),
            F.col("n"),
        ).alias("rank"),
        "threshold",
    ).orderBy("grp", "alpha_permille")


def conformal_thresholds_sql(
    table: str,
    group_col: str,
    score_sql: str,
    alphas: list[float] = (0.1, 0.05, 0.01),
) -> str:
    a_pm = [int(round(a * 1000)) for a in alphas]
    alist = ", ".join(str(a) for a in a_pm)
    # ceil(x/1000) for POSITIVE x as (x+999)//1000 — both dialects
    # truncate, identical on every sign, positive here anyway
    rank = "LEAST(((n + 1) * (1000 - alpha_permille) + 999) // 1000, n)"
    return f"""
WITH __cells AS (
  SELECT {group_col} AS grp, CAST({score_sql} AS BIGINT) AS v,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM {table} WHERE ({score_sql}) IS NOT NULL GROUP BY grp, v
),
__cum AS (
  SELECT grp, v,
         CAST(SUM(c) OVER (PARTITION BY grp ORDER BY v
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(c) OVER (PARTITION BY grp) AS BIGINT) AS n
  FROM __cells
),
__st AS (
  SELECT grp, v, cum, n, UNNEST([{alist}]) AS alpha_permille
  FROM __cum
),
__hit AS (
  SELECT grp, alpha_permille, ANY_VALUE(n) AS n, MIN(v) AS threshold
  FROM __st WHERE cum >= {rank}
  GROUP BY grp, alpha_permille
)
SELECT grp, CAST(alpha_permille AS BIGINT) AS alpha_permille, n,
       CAST({rank} AS BIGINT) AS rank, threshold
FROM __hit ORDER BY grp, alpha_permille
"""


def uplift_deciles(
    df: DataFrame,
    user_col: str = "user_id",
    salt: str = "uplift-v1",
) -> DataFrame:
    """(decile, n_t, n_c, resp_t, resp_c, uplift, qini_cum): the uplift
    decile report (Radcliffe 2007) — users ranked by a targeting score,
    cut into deciles from the top, each decile's incremental response
    rate (treated minus control) plus the cumulative Qini curve value

        qini(d) = Σ resp_t − Σ resp_c · (Σ n_t / Σ n_c)

    the standard readout for "did targeting the top-scored users
    actually CAUSE more conversions, or just select likely converters".

    Determinism: the treatment arm is the md5-fraction draw (the
    sampling/group_split convention — a pure scan expression every
    engine reproduces), the outcome is "user made ≥1 purchase", the
    score is the user's integer-floored non-purchase value total.
    Decile assignment goes through the SUPPORT-sized descending
    cumulative rank map (the percentile_rank shape — the fact table
    never globally sorts): decile = least(9, (10·cum_before) div n) on
    all-integer operands, so boundaries are engine-exact.

    Plan: one user-keyed shuffle (per-user score/arm/outcome), one
    support-sized rank window, a broadcast map join back, one decile
    aggregation, one 10-row cumulative finish.
    """
    users = (
        df.groupBy(F.col(user_col).alias("u"))
        .agg(
            # exact-decimal sum before the floor: a raw double sum is
            # order-dependent and the floor boundary amplifies the last
            # ulp into a different decile (review-caught); _q6 + decimal
            # accumulation is the repo's moment convention
            F.floor(
                F.sum(
                    _q6(
                        F.when(
                            F.col("event_type") != "purchase", F.col("value")
                        ).otherwise(F.lit(0.0))
                    ).cast(_MOMENT)
                ).cast(_MOMENT)
            )
            .cast("long")
            .alias("score"),
            F.max(
                (F.col("event_type") == "purchase").cast("long")
            ).alias("y"),
        )
        .select(
            "u",
            "score",
            "y",
            (hash_fraction("u", salt) < F.lit(0.5))
            .cast("long")
            .alias("t"),
        )
    )
    support = users.groupBy("score").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    wd = Window.orderBy(F.desc("score"))
    rank_map = support.select(
        "score",
        (
            F.sum("__c").over(wd.rowsBetween(Window.unboundedPreceding, 0))
            - F.col("__c")
        ).cast("long").alias("__before"),
        F.sum("__c").over(
            wd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).cast("long").alias("__n"),
    )
    with_dec = users.join(F.broadcast(rank_map), "score").select(
        "u",
        "y",
        "t",
        F.least(
            F.lit(9),
            F.expr("CAST((10 * __before) div __n AS BIGINT)"),
        ).cast("long").alias("decile"),
    )
    per_dec = with_dec.groupBy("decile").agg(
        F.sum("t").cast("long").alias("n_t"),
        F.sum(F.lit(1) - F.col("t")).cast("long").alias("n_c"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("resp_t"),
        F.sum((F.lit(1) - F.col("t")) * F.col("y")).cast("long").alias("resp_c"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return per_dec.select(
        "decile",
        "n_t",
        "n_c",
        "resp_t",
        "resp_c",
        F.round(
            _div(F.col("resp_t").cast("double"), F.col("n_t").cast("double"))
            - _div(F.col("resp_c").cast("double"), F.col("n_c").cast("double")),
            9,
        ).alias("uplift"),
        F.round(
            F.sum("resp_t").over(wc).cast("double")
            - F.sum("resp_c").over(wc).cast("double")
            * _div(
                F.sum("n_t").over(wc).cast("double"),
                F.sum("n_c").over(wc).cast("double"),
            ),
            9,
        ).alias("qini_cum"),
    ).orderBy("decile")


def uplift_deciles_sql(
    table: str,
    user_col: str = "user_id",
    salt: str = "uplift-v1",
) -> str:
    frac = hash_fraction_sql("u", salt)
    return f"""
WITH __users AS (
  SELECT {user_col} AS u,
         CAST(FLOOR(CAST(SUM(CAST({_q6_sql("CASE WHEN event_type <> 'purchase' THEN value ELSE 0.0 END")}
               AS DECIMAL(38,12))) AS DECIMAL(38,12))) AS BIGINT) AS score,
         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM {table} GROUP BY u
),
__arm AS (
  SELECT u, score, y,
         CAST(CASE WHEN {frac} < 0.5 THEN 1 ELSE 0 END AS BIGINT) AS t
  FROM __users
),
__sup AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS c FROM __arm GROUP BY score
),
__rm AS (
  SELECT score,
         CAST(SUM(c) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING)
              - c AS BIGINT) AS bef,
         CAST(SUM(c) OVER () AS BIGINT) AS n
  FROM __sup
),
__dec AS (
  SELECT a.u, a.y, a.t,
         LEAST(9, (10 * r.bef) // r.n) AS decile
  FROM __arm a JOIN __rm r ON a.score = r.score
),
__pd AS (
  SELECT decile,
         CAST(SUM(t) AS BIGINT) AS n_t,
         CAST(SUM(1 - t) AS BIGINT) AS n_c,
         CAST(SUM(t * y) AS BIGINT) AS resp_t,
         CAST(SUM((1 - t) * y) AS BIGINT) AS resp_c
  FROM __dec GROUP BY decile
)
SELECT CAST(decile AS BIGINT) AS decile, n_t, n_c, resp_t, resp_c,
       {_qround_sql("CAST(resp_t AS DOUBLE) / n_t - CAST(resp_c AS DOUBLE) / n_c", 9)} AS uplift,
       {_qround_sql(
           "CAST(SUM(resp_t) OVER __w AS DOUBLE) "
           "- CAST(SUM(resp_c) OVER __w AS DOUBLE) "
           "* (CAST(SUM(n_t) OVER __w AS DOUBLE) "
           "/ CAST(SUM(n_c) OVER __w AS DOUBLE))", 9)} AS qini_cum
FROM __pd
WINDOW __w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)
ORDER BY decile
"""


def covariate_balance(
    df: DataFrame,
    treat_pred: Column,
    covariates: dict[str, Column],
    round_to: int = 9,
) -> DataFrame:
    """(covariate, n_t, n_c, mean_t, mean_c, smd, flag): standardized
    mean differences between arms per covariate — the balance table
    every observational/experiment readout prints BEFORE the effect
    estimate (Austin, Stat Med 2009): |SMD| > 0.1 (the conventional
    flag) says the arms differ on that covariate and the estimate needs
    adjustment (CUPED/DiD/stratification), randomization notwithstanding.

        SMD = (x̄_t − x̄_c) / sqrt((s²_t + s²_c) / 2)

    Engine parity: the welch_t arm-moment conventions verbatim —
    DECIMAL(18,6) entry quantize, (38,12) exact sums, _d2d text-hop
    conversions, try_divide, one ROUND on outputs.  All covariates
    compute in ONE scan (conditional aggregates; adding a covariate
    adds three columns to the same aggregation, not a pass), finished
    by a literal-stack unpivot of the 1-row moment frame.
    """
    aggs = []
    names = list(covariates)
    for name in names:
        v = covariates[name].cast("double")
        for tag, pred in (("t", treat_pred), ("c", ~treat_pred)):
            cols = _arm_moments(v, pred)
            for mname, c in zip(("n", "s", "q"), cols):
                aggs.append(c.alias(f"__{mname}_{tag}_{name}"))
    agg = df.agg(*aggs)
    rows = []
    for name in names:
        nt = F.col(f"__n_t_{name}").cast("double")
        nc = F.col(f"__n_c_{name}").cast("double")
        st = _d2d(F.col(f"__s_t_{name}"))
        sc = _d2d(F.col(f"__s_c_{name}"))
        qt = _d2d(F.col(f"__q_t_{name}"))
        qc = _d2d(F.col(f"__q_c_{name}"))
        mt = _div(st, nt)
        mc = _div(sc, nc)
        vt = _div(qt - _div(st * st, nt), nt - F.lit(1.0))
        vc = _div(qc - _div(sc * sc, nc), nc - F.lit(1.0))
        # clamp before the sqrt: exact-decimal variances can dip a hair
        # below zero on constant covariates (the chi2 sqrt(-eps) class;
        # DuckDB CRASHES on sqrt of a negative)
        pooled = F.sqrt(F.greatest((vt + vc) / F.lit(2.0), F.lit(0.0)))
        smd = F.round(_div(mt - mc, pooled), round_to)
        rows.append(
            F.struct(
                F.lit(name).alias("covariate"),
                F.col(f"__n_t_{name}").alias("n_t"),
                F.col(f"__n_c_{name}").alias("n_c"),
                F.round(mt, round_to).alias("mean_t"),
                F.round(mc, round_to).alias("mean_c"),
                smd.alias("smd"),
                (F.abs(smd) > F.lit(0.1)).cast("long").alias("flag"),
            )
        )
    return (
        agg.select(F.explode(F.array(*rows)).alias("__r"))
        .select("__r.*")
        .orderBy("covariate")
    )


def covariate_balance_sql(
    table: str,
    treat_sql: str,
    covariates: dict[str, str],
    round_to: int = 9,
) -> str:
    arm_blocks = []
    for name, vsql in covariates.items():
        for tag, pred in (("t", treat_sql), ("c", f"NOT ({treat_sql})")):
            x = _q6_sql(f"CASE WHEN {pred} THEN CAST({vsql} AS DOUBLE) END")
            xw = f"CAST({x} AS DECIMAL(19,6))"
            arm_blocks.append(
                f"COUNT({x})::BIGINT AS n_{tag}_{name},\n"
                f"         CAST(SUM(CAST({x} AS DECIMAL(38,12)))"
                f" AS DECIMAL(38,12)) AS s_{tag}_{name},\n"
                f"         CAST(SUM({xw} * {xw})"
                f" AS DECIMAL(38,12)) AS q_{tag}_{name}"
            )
    arms = ",\n         ".join(arm_blocks)
    selects = []
    for name in covariates:
        mt = f"{_d2d_sql(f's_t_{name}')} / CAST(n_t_{name} AS DOUBLE)"
        mc = f"{_d2d_sql(f's_c_{name}')} / CAST(n_c_{name} AS DOUBLE)"
        vt = (
            f"({_d2d_sql(f'q_t_{name}')} - {_d2d_sql(f's_t_{name}')}"
            f" * {_d2d_sql(f's_t_{name}')} / CAST(n_t_{name} AS DOUBLE))"
            f" / (CAST(n_t_{name} AS DOUBLE) - 1.0)"
        )
        vc = (
            f"({_d2d_sql(f'q_c_{name}')} - {_d2d_sql(f's_c_{name}')}"
            f" * {_d2d_sql(f's_c_{name}')} / CAST(n_c_{name} AS DOUBLE))"
            f" / (CAST(n_c_{name} AS DOUBLE) - 1.0)"
        )
        smd = (
            f"CAST(CAST(CAST(CAST((({mt} - {mc})"
            f" / NULLIF(sqrt(GREATEST(({vt} + {vc}) / 2.0, 0.0)), 0.0)) * CAST(ABS(({mt} - {mc})"
            f" / NULLIF(sqrt(GREATEST(({vt} + {vc}) / 2.0, 0.0)), 0.0)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE)"
        )
        selects.append(
            f"SELECT '{name}' AS covariate, n_t_{name} AS n_t,"
            f" n_c_{name} AS n_c,"
            f" CASE WHEN ABS({mt}) >= 1e16 THEN CAST(({mt}) AS DOUBLE) ELSE CAST(CAST(CAST(CAST(({mt}) * CAST(ABS({mt}) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS mean_t,"
            f" CASE WHEN ABS({mc}) >= 1e16 THEN CAST(({mc}) AS DOUBLE) ELSE CAST(CAST(CAST(CAST(({mc}) * CAST(ABS({mc}) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS mean_c,"
            f" {smd} AS smd,"
            f" CAST(CASE WHEN abs({smd}) > 0.1 THEN 1 ELSE 0 END AS BIGINT)"
            f" AS flag FROM __m"
        )
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH __m AS (
  SELECT {arms}
  FROM {table}
)
{union}
ORDER BY covariate
"""


def fdr_bh(
    tests: DataFrame,
    test_col: str,
    num_col: str,
    den_col: str,
    alpha_permille: int = 50,
    round_to: int = 9,
) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over EXACT-RATIONAL
    p-values (Benjamini & Hochberg, JRSS-B 1995): given one row per test
    with p = num/den (an empirical/permutation p-value is exactly such a
    rational), find k* = max{i : p_(i) ≤ i·α/m} and reject tests ranked
    ≤ k*. The multiplicity gate for many-slice monitoring — at m = 120
    slices, α = .05 per-slice alarms fire ~6 false positives per run;
    BH caps the expected FALSE-DISCOVERY share of alarms at α instead.
    Output per test: ``(test, p_num, p_den, p_value, m, rank, rejected,
    bh_threshold)``, ordered by rank.

    Exact arithmetic: the step-up comparison is cross-multiplied to
    integers — num·1000·m ≤ rank·α‰·den via (19,0)-operand products in
    DECIMAL(38,0) — so no engine ever compares IEEE fractions at the
    boundary. The display p_value and bh_threshold = k*·α/m are each one
    correctly-rounded IEEE division from identical integers. Rank order
    is (p double, test id) — deterministic and engine-identical; exact
    rational ties share a double and break on the id.

    Scale: the tests frame is slice-count-sized (the caller collapses
    the corpus first), so the global rank window and 1-row k* broadcast
    are domain-bounded, never data-bounded."""
    alpha = int(alpha_permille)
    base = (
        tests.select(
            F.col(test_col).alias("test"),
            F.col(num_col).cast("long").alias("p_num"),
            F.col(den_col).cast("long").alias("p_den"),
        )
        # a test without a valid rational p carries no evidence and is
        # dropped BEFORE ranking: a NULL p_value would rank nulls-FIRST
        # in Spark but nulls-LAST in DuckDB's ROW_NUMBER, shifting every
        # other test's rank and flipping boundary rejections cross-engine
        .where(
            F.col("p_num").isNotNull()
            & F.col("p_den").isNotNull()
            & (F.col("p_den") > 0)
        )
        .withColumn(
            "p_value",
            _div(F.col("p_num").cast("double"), F.col("p_den").cast("double")),
        )
    )
    w = Window.orderBy("p_value", "test")
    ranked = base.select(
        "test",
        "p_num",
        "p_den",
        "p_value",
        F.row_number().over(w).cast("long").alias("rank"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias("m"),
    )
    cond = (
        (F.col("p_num") * F.lit(1000)).cast("decimal(19,0)")
        * F.col("m").cast("decimal(19,0)")
    ) <= (
        (F.col("rank") * F.lit(alpha)).cast("decimal(19,0)")
        * F.col("p_den").cast("decimal(19,0)")
    )
    kstar = ranked.agg(
        F.max(F.when(cond, F.col("rank"))).cast("long").alias("__kstar")
    )
    return (
        ranked.crossJoin(F.broadcast(kstar))
        .select(
            "test",
            "p_num",
            "p_den",
            F.round("p_value", round_to).alias("p_value"),
            "m",
            "rank",
            F.coalesce(
                F.col("rank") <= F.col("__kstar"), F.lit(False)
            ).alias("rejected"),
            F.round(
                F.col("__kstar").cast("double")
                * F.lit(float(alpha))
                / F.lit(1000.0)
                / F.col("m").cast("double"),
                round_to,
            ).alias("bh_threshold"),
        )
        .orderBy("rank")
    )


def fdr_bh_sql(
    tests_sql: str,
    test_col: str,
    num_col: str,
    den_col: str,
    alpha_permille: int = 50,
    round_to: int = 9,
) -> str:
    """DuckDB twin of fdr_bh; ``tests_sql`` is a subquery/CTE-able
    SELECT producing the tests frame."""
    alpha = int(alpha_permille)
    return f"""
WITH __t AS (
  SELECT {test_col} AS test, CAST({num_col} AS BIGINT) AS p_num,
         CAST({den_col} AS BIGINT) AS p_den,
         CAST({num_col} AS DOUBLE) / CAST({den_col} AS DOUBLE) AS p_value
  FROM ({tests_sql})
  WHERE ({num_col}) IS NOT NULL AND ({den_col}) IS NOT NULL
    AND ({den_col}) > 0
),
__r AS (
  SELECT test, p_num, p_den, p_value,
         CAST(ROW_NUMBER() OVER (ORDER BY p_value, test) AS BIGINT) AS rank,
         CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM __t
),
__k AS (
  SELECT MAX(CASE WHEN CAST(p_num * 1000 AS DECIMAL(19,0))
                       * CAST(m AS DECIMAL(19,0))
                    <= CAST(rank * {alpha} AS DECIMAL(19,0))
                       * CAST(p_den AS DECIMAL(19,0))
             THEN rank END)::BIGINT AS kstar
  FROM __r
)
SELECT test, p_num, p_den, CASE WHEN ABS(p_value) >= 1e16 THEN CAST((p_value) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((p_value) * CAST(ABS(p_value) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS p_value, m, rank,
       COALESCE(rank <= kstar, FALSE) AS rejected,
       CAST(CAST(CAST(CAST((CAST(kstar AS DOUBLE) * {float(alpha)!r} / 1000.0
             / CAST(m AS DOUBLE)) * CAST(ABS(CAST(kstar AS DOUBLE) * {float(alpha)!r} / 1000.0
             / CAST(m AS DOUBLE)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS bh_threshold
FROM __r CROSS JOIN __k ORDER BY rank
"""


_US_PER_HOUR = 3_600_000_000
_US_PER_DAY = 86_400_000_000


def empirical_hourly_pvalues(
    df: DataFrame, key_col: str = "event_type"
) -> DataFrame:
    """(test, key, hour_of_day, obs_cnt, ge_days, null_days, p_num,
    p_den): per (key, hour-of-day) cell, the EMPIRICAL (permutation-
    style) upper-tail p-value of the LATEST day's count against that
    same cell's counts on every prior day:

        p = (1 + #{prior days with count ≥ obs}) / (1 + n_prior_days)

    — exact rationals by construction (Davison & Hinkley 1997 §4.2's
    add-one form, which keeps p > 0 and the BH cross-multiplication
    integral). Zero-days count: the (key, day, hour) frame densifies
    onto the full key × day-span × 24 spine before comparison (the
    CUSUM zero-fill rule), so a silent cell on a prior day correctly
    weakens today's evidence of "unusually high".

    Feed the output to fdr_bh for a multiplicity-controlled volume
    surge readout. Scale: ONE corpus collapse to (key, day, hour)
    counts; everything downstream is calendar-bounded (keys × days ×
    24)."""
    counts = (
        # NULL keys drop: a NULL monitoring slice is meaningless, and the
        # test-id concat would diverge cross-engine (concat_ws skips
        # NULLs, || propagates them)
        df.where(F.col(key_col).isNotNull())
        .select(
            F.col(key_col).alias("__k"),
            F.expr(f"(ts_ns div 1000) div {_US_PER_DAY}").alias("__day"),
            F.expr(
                f"((ts_ns div 1000) div {_US_PER_HOUR}) % 24"
            ).alias("__hod"),
        )
        .groupBy("__k", "__day", "__hod")
        .agg(F.count(F.lit(1)).cast("long").alias("__cnt"))
    )
    bounds = counts.agg(
        F.min("__day").alias("__d0"), F.max("__day").alias("__d1")
    )
    keys = counts.select("__k").distinct()
    spine = (
        keys.crossJoin(F.broadcast(bounds))
        .select(
            "__k", F.explode(F.expr("sequence(__d0, __d1)")).alias("__day")
        )
        .select(
            "__k",
            "__day",
            F.explode(F.expr("sequence(0, 23)")).alias("__hod"),
        )
    )
    cells = spine.join(counts, ["__k", "__day", "__hod"], "left").select(
        "__k",
        "__day",
        "__hod",
        F.coalesce("__cnt", F.lit(0)).cast("long").alias("__cnt"),
    )
    cells = cells.crossJoin(F.broadcast(bounds))
    obs = cells.where(F.col("__day") == F.col("__d1")).select(
        "__k", "__hod", F.col("__cnt").alias("__obs")
    )
    nulls = cells.where(F.col("__day") < F.col("__d1"))
    agg = (
        nulls.join(obs, ["__k", "__hod"])
        .groupBy("__k", "__hod", "__obs")
        .agg(
            F.sum(
                F.when(F.col("__cnt") >= F.col("__obs"), 1).otherwise(0)
            )
            .cast("long")
            .alias("__ge"),
            F.count(F.lit(1)).cast("long").alias("__nd"),
        )
    )
    return agg.select(
        F.concat_ws("@", F.col("__k"), F.col("__hod").cast("string")).alias(
            "test"
        ),
        F.col("__k").alias("key"),
        F.col("__hod").alias("hour_of_day"),
        F.col("__obs").alias("obs_cnt"),
        F.col("__ge").alias("ge_days"),
        F.col("__nd").alias("null_days"),
        (F.col("__ge") + F.lit(1)).cast("long").alias("p_num"),
        (F.col("__nd") + F.lit(1)).cast("long").alias("p_den"),
    )


def empirical_hourly_pvalues_sql(table: str, key_sql: str) -> str:
    return f"""
SELECT test, key, hour_of_day, obs_cnt, ge_days, null_days, p_num, p_den
FROM (
  WITH __c AS (
    SELECT {key_sql} AS k, epoch_us(ts) // {_US_PER_DAY} AS day,
           (epoch_us(ts) // {_US_PER_HOUR}) % 24 AS hod,
           COUNT(*)::BIGINT AS cnt
    FROM {table} WHERE ({key_sql}) IS NOT NULL GROUP BY k, day, hod
  ),
  __bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM __c),
  __spine AS (
    SELECT k, d.day, h.hod
    FROM (SELECT DISTINCT k FROM __c)
    CROSS JOIN (SELECT UNNEST(range(d0, d1 + 1)) AS day FROM __bounds) d
    CROSS JOIN (SELECT UNNEST(range(0, 24)) AS hod) h
  ),
  __cells AS (
    SELECT s.k, s.day, s.hod, COALESCE(c.cnt, 0)::BIGINT AS cnt
    FROM __spine s LEFT JOIN __c c
      ON s.k = c.k AND s.day = c.day AND s.hod = c.hod
  ),
  __obs AS (
    SELECT k, hod, cnt AS obs FROM __cells, __bounds WHERE day = d1
  ),
  __agg AS (
    SELECT n.k, n.hod, o.obs,
           SUM(CASE WHEN n.cnt >= o.obs THEN 1 ELSE 0 END)::BIGINT AS ge,
           COUNT(*)::BIGINT AS nd
    FROM __cells n
    JOIN __obs o ON n.k = o.k AND n.hod = o.hod
    CROSS JOIN __bounds
    WHERE n.day < d1
    GROUP BY n.k, n.hod, o.obs
  )
  SELECT k || '@' || CAST(hod AS VARCHAR) AS test, k AS key,
         hod AS hour_of_day, obs AS obs_cnt, ge AS ge_days,
         nd AS null_days, (ge + 1)::BIGINT AS p_num,
         (nd + 1)::BIGINT AS p_den
  FROM __agg
)
"""


def policy_replay(
    df: DataFrame,
    slice_col: str,
    arm_col: str,
    reward_col: str,
    train_permille: int = 500,
    round_to: int = 9,
) -> DataFrame:
    """(slice, policy_arm, n_train, n_test, n_matched, replay_mean,
    logging_mean): offline policy evaluation by REPLAY (Li, Chu,
    Langford & Wang, WSDM 2011): fit a greedy per-slice policy on the
    TRAIN period (the arm with the highest train mean reward), then
    estimate its value on the TEST period as the mean reward over
    logged rounds where the logged arm HAPPENS to equal the policy's
    choice — unbiased when the logging policy is stationary within the
    slice, and the honest offline answer to "should slice s get arm a?"
    before any live experiment. ``logging_mean`` (the test-period mean
    over ALL arms) is the do-nothing baseline the replay estimate must
    beat.

    Time split mirrors sampling.time_split: boundary = lo + ((hi−lo)·
    permille) div 1000 in pure int64 µs; train = us < boundary. Reward
    sums quantize to DECIMAL(18,6) (_q6 text hop) so per-arm means are
    ONE correctly-rounded IEEE division from exact decimals — the
    argmax orders on that bit-identical double with the arm id as the
    deterministic tiebreak. Slices/arms absent from the train period
    have no policy and drop from the readout (a live system would fall
    back to the logging policy there).

    Scale: 1-row broadcast bounds; ONE (slice, arm) shuffle per period;
    the argmax window runs on the slice×arm frame (domain-bounded).
    Nothing row-sized crosses the driver."""
    as_col = lambda c: c if isinstance(c, Column) else F.col(c)  # noqa: E731
    s_c, a_c, r_c = as_col(slice_col), as_col(arm_col), as_col(reward_col)
    base = df.where(
        s_c.isNotNull() & a_c.isNotNull() & r_c.isNotNull()
    ).select(
        s_c.alias("__s"),
        a_c.alias("__a"),
        _q6(r_c).alias("__r"),
        F.expr("ts_ns div 1000").cast("long").alias("__us"),
    )
    bounds = base.agg(
        F.min("__us").alias("__lo"), F.max("__us").alias("__hi")
    )
    tagged = base.crossJoin(F.broadcast(bounds)).select(
        "__s",
        "__a",
        "__r",
        (
            F.col("__us")
            < F.expr(
                f"CAST(__lo + ((__hi - __lo) * {int(train_permille)}) "
                "div 1000 AS BIGINT)"
            )
        ).alias("__train"),
    )
    train = tagged.where(F.col("__train")).groupBy("__s", "__a").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__r").cast("decimal(38,6)").alias("__sum"),
    )
    w = Window.partitionBy("__s").orderBy(
        _div(_d2d(F.col("__sum")), F.col("__n")).desc(), F.col("__a").asc()
    )
    policy = (
        train.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select("__s", F.col("__a").alias("policy_arm"))
    )
    # n_train derives from the (slice, arm) aggregate — re-aggregating
    # the corpus-sized tagged frame would be a second full scan
    n_train = train.groupBy("__s").agg(
        F.sum("__n").cast("long").alias("n_train")
    )
    test = tagged.where(~F.col("__train"))
    per_slice = (
        test.join(F.broadcast(policy), "__s")
        .groupBy("__s", "policy_arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(F.col("__a") == F.col("policy_arm"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_matched"),
            F.sum(
                F.when(F.col("__a") == F.col("policy_arm"), F.col("__r"))
            )
            .cast("decimal(38,6)")
            .alias("__msum"),
            F.sum("__r").cast("decimal(38,6)").alias("__tsum"),
        )
    )
    return (
        per_slice.join(F.broadcast(n_train), "__s")
        .select(
            F.col("__s").alias("slice"),
            "policy_arm",
            "n_train",
            "n_test",
            "n_matched",
            F.round(
                _div(_d2d(F.col("__msum")), F.col("n_matched")), round_to
            ).alias("replay_mean"),
            F.round(
                _div(_d2d(F.col("__tsum")), F.col("n_test")), round_to
            ).alias("logging_mean"),
        )
        .orderBy("slice")
    )


def policy_replay_sql(
    table: str,
    slice_sql: str,
    arm_sql: str,
    reward_sql: str,
    train_permille: int = 500,
    round_to: int = 9,
) -> str:
    q6r = _q6_sql(reward_sql)
    return f"""
WITH __b AS (
  SELECT {slice_sql} AS s, {arm_sql} AS a, {q6r} AS r, epoch_us(ts) AS us
  FROM {table}
  WHERE ({slice_sql}) IS NOT NULL AND ({arm_sql}) IS NOT NULL
    AND ({reward_sql}) IS NOT NULL
),
__bounds AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM __b),
__tag AS (
  SELECT s, a, r,
         us < CAST(lo + ((hi - lo) * {int(train_permille)}) // 1000
                   AS BIGINT) AS train
  FROM __b CROSS JOIN __bounds
),
__train AS (
  SELECT s, a, COUNT(*)::BIGINT AS n,
         CAST(SUM(r) AS DECIMAL(38,6)) AS rsum
  FROM __tag WHERE train GROUP BY s, a
),
__policy AS (
  SELECT s, a AS policy_arm
  FROM (
    SELECT s, a,
           ROW_NUMBER() OVER (
             PARTITION BY s
             ORDER BY {_d2d_sql("rsum")} / n DESC, a ASC
           ) AS rk
    FROM __train
  ) WHERE rk = 1
),
__ntr AS (
  SELECT s, SUM(n)::BIGINT AS n_train FROM __train GROUP BY s
),
__ps AS (
  SELECT t.s, p.policy_arm, COUNT(*)::BIGINT AS n_test,
         SUM(CASE WHEN t.a = p.policy_arm THEN 1 ELSE 0 END)::BIGINT
           AS n_matched,
         CAST(SUM(CASE WHEN t.a = p.policy_arm THEN t.r END)
              AS DECIMAL(38,6)) AS msum,
         CAST(SUM(t.r) AS DECIMAL(38,6)) AS tsum
  FROM __tag t JOIN __policy p ON t.s = p.s
  WHERE NOT t.train
  GROUP BY t.s, p.policy_arm
)
SELECT ps.s AS slice, ps.policy_arm, n.n_train, ps.n_test, ps.n_matched,
       CAST(CAST(CAST(CAST(({_d2d_sql("ps.msum")} / NULLIF(ps.n_matched, 0)) * CAST(ABS({_d2d_sql("ps.msum")} / NULLIF(ps.n_matched, 0)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE)
         AS replay_mean,
       CAST(CAST(CAST(CAST(({_d2d_sql("ps.tsum")} / NULLIF(ps.n_test, 0)) * CAST(ABS({_d2d_sql("ps.tsum")} / NULLIF(ps.n_test, 0)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE)
         AS logging_mean
FROM __ps ps JOIN __ntr n ON ps.s = n.s
ORDER BY slice
"""


def sequential_ab(
    df: DataFrame,
    treat_pred: Column,
    success_pred: Column,
    boundaries: list[float],
    round_to: int = 9,
) -> DataFrame:
    """Group-sequential A/B monitoring (Pocock Biometrika'77 /
    O'Brien-Fleming Biometrics'79): split the experiment's TIME range
    into K = len(boundaries) equal interim looks, compute the pooled
    two-proportion z on the CUMULATIVE data at each look, and compare
    |z_k| against the caller's boundary_k — the peeking-safe way to
    monitor a running test (a fixed 1.96 at every look inflates false
    positives ~5x at K = 5). Boundary values are PYTHON literals (the
    mde_planning convention — Φ⁻¹ is a transcendental neither engine
    should evaluate); pass e.g. the K = 5 O'Brien-Fleming row [4.562,
    3.226, 2.634, 2.281, 2.040]. Output one row per look: ``(look, n_t,
    s_t, n_c, s_c, z, boundary, crossed, decided)`` where ``decided``
    marks the first crossing look onward — the live decision state.

    Determinism: look assignment is pure int64 µs arithmetic
    (idx = (us−lo)·K div (hi−lo+1), the time_split boundary class);
    per-look conditional counts are integers; cumulative sums run over
    the K-row look frame; the z finish mirrors two_proportion_z's
    association exactly. Scale: ONE conditional-aggregation scan to K
    rows; everything after is K-sized."""
    k = len(boundaries)
    if k < 1:
        raise ValueError("need at least one look boundary")
    one_if = lambda p: F.when(p, F.lit(1)).otherwise(F.lit(0))  # noqa: E731
    base = df.select(
        treat_pred.alias("__t"),
        success_pred.alias("__y"),
        F.expr("ts_ns div 1000").cast("long").alias("__us"),
    )
    bounds = base.agg(
        F.min("__us").alias("__lo"), F.max("__us").alias("__hi")
    )
    tagged = base.crossJoin(F.broadcast(bounds)).select(
        "__t",
        "__y",
        (
            F.expr(f"((__us - __lo) * {k}) div (__hi - __lo + 1)") + F.lit(1)
        ).cast("long").alias("look"),
    )
    per_look = tagged.groupBy("look").agg(
        F.sum(one_if(F.col("__t"))).cast("long").alias("__nt"),
        F.sum(one_if(F.col("__t") & F.col("__y"))).cast("long").alias("__st"),
        F.sum(one_if(~F.col("__t"))).cast("long").alias("__nc"),
        F.sum(one_if((~F.col("__t")) & F.col("__y")))
        .cast("long")
        .alias("__sc"),
    )
    # densify: a silent interim period is still a look (zero increment)
    spine = df.sparkSession.range(1, k + 1).select(
        F.col("id").cast("long").alias("look")
    )
    cells = spine.join(per_look, "look", "left").select(
        "look",
        *[
            F.coalesce(c, F.lit(0)).cast("long").alias(c)
            for c in ("__nt", "__st", "__nc", "__sc")
        ],
    )
    w = Window.orderBy("look").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select(
        "look",
        F.sum("__nt").over(w).cast("long").alias("n_t"),
        F.sum("__st").over(w).cast("long").alias("s_t"),
        F.sum("__nc").over(w).cast("long").alias("n_c"),
        F.sum("__sc").over(w).cast("long").alias("s_c"),
    )
    boundary = F.lit(None).cast("double")
    for i, b in reversed(list(enumerate(boundaries, start=1))):
        boundary = F.when(F.col("look") == i, F.lit(float(b))).otherwise(
            boundary
        )
    n_a, s_a = F.col("n_t").cast("double"), F.col("s_t").cast("double")
    n_b, s_b = F.col("n_c").cast("double"), F.col("s_c").cast("double")
    pa, pb = _div(s_a, n_a), _div(s_b, n_b)
    pp = _div(s_a + s_b, n_a + n_b)
    se2 = pp * (F.lit(1.0) - pp) * (
        _div(F.lit(1.0), n_a) + _div(F.lit(1.0), n_b)
    )
    ok = (F.col("n_t") > 0) & (F.col("n_c") > 0)
    scored = cum.select(
        "look",
        "n_t",
        "s_t",
        "n_c",
        "s_c",
        F.round(
            F.when(ok & (se2 > 0), _div(pa - pb, F.sqrt(se2))), round_to
        ).alias("z"),
        boundary.alias("boundary"),
    ).withColumn(
        "crossed",
        F.coalesce(F.abs(F.col("z")) >= F.col("boundary"), F.lit(False)),
    )
    wdec = Window.orderBy("look").rowsBetween(Window.unboundedPreceding, 0)
    return scored.withColumn(
        "decided",
        F.max(F.col("crossed").cast("int")).over(wdec) == 1,
    ).orderBy("look")


def sequential_ab_sql(
    table: str,
    treat_sql: str,
    success_sql: str,
    boundaries: list[float],
    round_to: int = 9,
) -> str:
    k = len(boundaries)
    if k < 1:
        raise ValueError("need at least one look boundary")
    bcase = " ".join(
        f"WHEN look = {i} THEN {float(b)!r}"
        for i, b in enumerate(boundaries, start=1)
    )
    return f"""
WITH __b AS (
  SELECT ({treat_sql}) AS t, ({success_sql}) AS y, epoch_us(ts) AS us
  FROM {table}
),
__bounds AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM __b),
__tag AS (
  SELECT t, y, ((us - lo) * {k}) // (hi - lo + 1) + 1 AS look
  FROM __b CROSS JOIN __bounds
),
__pl AS (
  SELECT look,
         SUM(CASE WHEN t THEN 1 ELSE 0 END)::BIGINT AS nt,
         SUM(CASE WHEN t AND y THEN 1 ELSE 0 END)::BIGINT AS st,
         SUM(CASE WHEN NOT t THEN 1 ELSE 0 END)::BIGINT AS nc,
         SUM(CASE WHEN (NOT t) AND y THEN 1 ELSE 0 END)::BIGINT AS sc
  FROM __tag GROUP BY look
),
__spine AS (SELECT UNNEST(range(1, {k + 1})) AS look),
__cells AS (
  SELECT s.look, COALESCE(p.nt, 0)::BIGINT AS nt,
         COALESCE(p.st, 0)::BIGINT AS st, COALESCE(p.nc, 0)::BIGINT AS nc,
         COALESCE(p.sc, 0)::BIGINT AS sc
  FROM __spine s LEFT JOIN __pl p ON s.look = p.look
),
__cum AS (
  SELECT look,
         CAST(SUM(nt) OVER (ORDER BY look ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS n_t,
         CAST(SUM(st) OVER (ORDER BY look ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS s_t,
         CAST(SUM(nc) OVER (ORDER BY look ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS n_c,
         CAST(SUM(sc) OVER (ORDER BY look ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS s_c
  FROM __cells
),
__z AS (
  SELECT look, n_t, s_t, n_c, s_c,
         CAST(CAST(CAST(CAST((CASE WHEN n_t > 0 AND n_c > 0
                     AND (CAST(s_t + s_c AS DOUBLE) / CAST(n_t + n_c AS DOUBLE))
                         * (1.0 - CAST(s_t + s_c AS DOUBLE)
                                  / CAST(n_t + n_c AS DOUBLE))
                         * (1.0 / CAST(n_t AS DOUBLE)
                            + 1.0 / CAST(n_c AS DOUBLE)) > 0
           THEN (CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                 - CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE))
                / sqrt((CAST(s_t + s_c AS DOUBLE) / CAST(n_t + n_c AS DOUBLE))
                       * (1.0 - CAST(s_t + s_c AS DOUBLE)
                                / CAST(n_t + n_c AS DOUBLE))
                       * (1.0 / CAST(n_t AS DOUBLE)
                          + 1.0 / CAST(n_c AS DOUBLE))) END) * CAST(ABS(CASE WHEN n_t > 0 AND n_c > 0
                     AND (CAST(s_t + s_c AS DOUBLE) / CAST(n_t + n_c AS DOUBLE))
                         * (1.0 - CAST(s_t + s_c AS DOUBLE)
                                  / CAST(n_t + n_c AS DOUBLE))
                         * (1.0 / CAST(n_t AS DOUBLE)
                            + 1.0 / CAST(n_c AS DOUBLE)) > 0
           THEN (CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                 - CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE))
                / sqrt((CAST(s_t + s_c AS DOUBLE) / CAST(n_t + n_c AS DOUBLE))
                       * (1.0 - CAST(s_t + s_c AS DOUBLE)
                                / CAST(n_t + n_c AS DOUBLE))
                       * (1.0 / CAST(n_t AS DOUBLE)
                          + 1.0 / CAST(n_c AS DOUBLE))) END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS z,
         CAST(CASE {bcase} END AS DOUBLE) AS boundary
  FROM __cum
),
__c AS (
  SELECT *, COALESCE(abs(z) >= boundary, FALSE) AS crossed FROM __z
)
SELECT look, n_t, s_t, n_c, s_c, z, boundary, crossed,
       MAX(CASE WHEN crossed THEN 1 ELSE 0 END)
         OVER (ORDER BY look ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) = 1 AS decided
FROM __c ORDER BY look
"""


def poststrat_ate(
    df: DataFrame,
    strata_col: Column,
    treat_pred: Column,
    value_col: str,
    round_to: int = 9,
) -> DataFrame:
    """One-row post-stratified average treatment effect: ``(n, n_strata,
    ate, se, z)`` — the stratified estimator every experiment readout
    should prefer when assignment is imbalanced across a covariate
    (Imbens & Rubin 2015 ch. 9 lineage; the estimator itself is the
    classical survey post-stratification):

        ATE = Σ_s w_s · (ȳ_ts − ȳ_cs),   w_s = n_s / Σ_kept n_s
        SE² = Σ_s w_s² · (s²_ts/n_ts + s²_cs/n_cs)

    Strata with fewer than 2 rows in EITHER arm are excluded and the
    weights renormalize over the kept strata (the standard
    collapse-or-drop small-cell rule, drop flavor — documented, not
    silent: n counts only kept-strata rows and n_strata the kept
    strata). Rows with NULL value or NULL stratum are excluded.

    Engine parity: per-stratum moments are the _arm_moments exact
    decimals; the cross-STRATA combination of the per-stratum IEEE
    terms runs as an ORDER BY stratum running window, so both engines
    add the doubles left-to-right in the same order (the fdr_bh
    cumulative convention; a bare SUM over strata would be
    partition-order dependent). One final row via last-row selection.

    Scale posture (100 TB): one scan with map-side-combined conditional
    moments per stratum, then strata-count-sized window work (strata
    are a handful of cohorts by construction — the single-partition
    WindowExec is over #strata rows, not data)."""
    v = F.col(value_col).cast("double")
    base = df.where(
        F.col(value_col).isNotNull() & strata_col.isNotNull()
    ).select(strata_col.alias("__s"), treat_pred.alias("__t"), v.alias("__v"))
    nt, st, qt = _arm_moments(F.col("__v"), F.col("__t"))
    nc, sc, qc = _arm_moments(F.col("__v"), ~F.col("__t"))
    strata = base.groupBy("__s").agg(
        nt.alias("__nt"), st.alias("__st"), qt.alias("__qt"),
        nc.alias("__nc"), sc.alias("__sc"), qc.alias("__qc"),
    ).where((F.col("__nt") >= 2) & (F.col("__nc") >= 2))
    wall = Window.partitionBy()
    kept = strata.withColumn(
        "__nk", F.sum(F.col("__nt") + F.col("__nc")).over(wall).cast("long")
    ).withColumn(
        "__ns", F.count(F.lit(1)).over(wall).cast("long")
    )
    nt_d = F.col("__nt").cast("double")
    nc_d = F.col("__nc").cast("double")
    mt = _div(_d2d(F.col("__st")), nt_d)
    mc = _div(_d2d(F.col("__sc")), nc_d)
    vt = _div(
        _d2d(F.col("__qt")) - _div(_d2d(F.col("__st")) * _d2d(F.col("__st")), nt_d),
        nt_d - F.lit(1.0),
    )
    vc = _div(
        _d2d(F.col("__qc")) - _div(_d2d(F.col("__sc")) * _d2d(F.col("__sc")), nc_d),
        nc_d - F.lit(1.0),
    )
    w_s = (F.col("__nt") + F.col("__nc")).cast("double") / F.col("__nk").cast(
        "double"
    )
    terms = kept.select(
        "__s", "__nk", "__ns",
        (w_s * (mt - mc)).alias("__term"),
        (w_s * w_s * (_div(vt, nt_d) + _div(vc, nc_d))).alias("__se2t"),
    )
    wrun = (
        Window.partitionBy()
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        terms.withColumn("__ate", F.sum("__term").over(wrun))
        .withColumn("__se2", F.sum("__se2t").over(wrun))
        .withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy().orderBy(F.desc("__s"))),
        )
        .where(F.col("__rn") == 1)
    )
    se = F.sqrt(F.col("__se2"))
    return cum.select(
        F.col("__nk").alias("n"),
        F.col("__ns").alias("n_strata"),
        F.round(F.col("__ate"), round_to).alias("ate"),
        F.round(F.when(F.col("__se2") > 0, se), round_to).alias("se"),
        F.round(
            F.when(F.col("__se2") > 0, _div(F.col("__ate"), se)), round_to
        ).alias("z"),
    )


def poststrat_ate_sql(
    table: str,
    strata_sql: str,
    treat_sql: str,
    value_sql: str,
    round_to: int = 9,
) -> str:
    arm_t = _arm_sql(value_sql, f"({treat_sql})", "t")
    arm_c = _arm_sql(value_sql, f"NOT ({treat_sql})", "c")
    return f"""
WITH __m AS (
  SELECT ({strata_sql}) AS s,
         {arm_t},
         {arm_c}
  FROM {table}
  WHERE ({value_sql}) IS NOT NULL AND ({strata_sql}) IS NOT NULL
  GROUP BY s
),
__kept AS (
  SELECT *,
         CAST(SUM(n_t + n_c) OVER () AS BIGINT) AS nk,
         CAST(COUNT(*) OVER () AS BIGINT) AS ns
  FROM __m WHERE n_t >= 2 AND n_c >= 2
),
__terms AS (
  SELECT s, nk, ns,
         (CAST(n_t + n_c AS DOUBLE) / CAST(nk AS DOUBLE))
           * ({_d2d_sql('s_t')} / CAST(n_t AS DOUBLE)
              - {_d2d_sql('s_c')} / CAST(n_c AS DOUBLE)) AS term,
         (CAST(n_t + n_c AS DOUBLE) / CAST(nk AS DOUBLE))
           * (CAST(n_t + n_c AS DOUBLE) / CAST(nk AS DOUBLE))
           * ((({_d2d_sql('q_t')} - {_d2d_sql('s_t')} * {_d2d_sql('s_t')}
                / CAST(n_t AS DOUBLE)) / (CAST(n_t AS DOUBLE) - 1.0))
                / CAST(n_t AS DOUBLE)
              + (({_d2d_sql('q_c')} - {_d2d_sql('s_c')} * {_d2d_sql('s_c')}
                  / CAST(n_c AS DOUBLE)) / (CAST(n_c AS DOUBLE) - 1.0))
                / CAST(n_c AS DOUBLE)) AS se2t
  FROM __kept
),
__cum AS (
  SELECT nk, ns,
         SUM(term) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS ate,
         SUM(se2t) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS se2,
         ROW_NUMBER() OVER (ORDER BY s DESC) AS rn
  FROM __terms
)
SELECT nk AS n, ns AS n_strata,
       CASE WHEN ABS(ate) >= 1e16 THEN CAST((ate) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((ate) * CAST(ABS(ate) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS ate,
       CASE WHEN ABS(CASE WHEN se2 > 0 THEN sqrt(se2) END) >= 1e16 THEN CAST((CASE WHEN se2 > 0 THEN sqrt(se2) END) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CASE WHEN se2 > 0 THEN sqrt(se2) END) * CAST(ABS(CASE WHEN se2 > 0 THEN sqrt(se2) END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS se,
       CASE WHEN ABS(CASE WHEN se2 > 0 THEN ate / sqrt(se2) END) >= 1e16 THEN CAST((CASE WHEN se2 > 0 THEN ate / sqrt(se2) END) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CASE WHEN se2 > 0 THEN ate / sqrt(se2) END) * CAST(ABS(CASE WHEN se2 > 0 THEN ate / sqrt(se2) END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS z
FROM __cum WHERE rn = 1
"""


_HASH_SCALE = float(1 << 32)


def permutation_test(
    df: DataFrame,
    id_col: str,
    treat_pred: Column,
    value_col: str,
    n_perm: int = 200,
    salt: str = "perm",
    round_to: int = 9,
) -> DataFrame:
    """One-row randomization test of the difference in means, permuting
    treatment at the UNIT level (Fisher 1935; the modern A/A-replay
    form): ``(n_units, n_events, n_perm, d_obs, n_ge, p_num, p_den, p)``
    where p = (1 + #{|d_k| ≥ |d_obs|}) / (n_perm + 1) — the add-one form
    that never returns p = 0 (Phipson & Smyth SAGMB 2010).

    The distribution-free companion to welch_t: no normality, no
    variance formula — the null is built by deterministically
    re-assigning each unit via md5(unit:salt:k) < 0.5 (the
    sampling.hash_fraction construction with a per-replicate salt), so
    both engines generate THE SAME permutations and the whole test is
    hash-checkable. Assignment permutes at the id level — the
    cluster-randomized unit treatment actually varies on — while d is
    the event-level mean difference.

    Engine parity: one collapse to per-unit (Σ_q6 value, count) exact
    decimals; every d_k and d_obs is the identical two-division IEEE
    expression over exact sums, so the |d_k| ≥ |d_obs| comparison is
    bit-deterministic. A replicate with an empty arm yields NULL d_k
    and counts as not-exceeding (documented). Scale posture: one
    unit-keyed shuffle, then a units×n_perm frame (bounded by the
    unit-dimension size, not the corpus) into one n_perm-sized
    aggregation."""
    units = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(id_col).alias("__u"))
        .agg(
            F.sum(_q6(F.col(value_col).cast("double")).cast(_MOMENT))
            .cast(_MOMENT)
            .alias("__sv"),
            F.count(F.lit(1)).cast("long").alias("__c"),
            F.max(treat_pred.cast("int")).alias("__t"),
        )
    )
    d_expr = lambda st, nt, sc, nc: _div(_d2d(st), nt.cast("double")) - _div(  # noqa: E731
        _d2d(sc), nc.cast("double")
    )
    obs = units.agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("__c").cast("long").alias("n_events"),
        d_expr(
            F.sum(F.when(F.col("__t") == 1, F.col("__sv")).cast(_MOMENT)),
            F.sum(F.when(F.col("__t") == 1, F.col("__c")).otherwise(0)),
            F.sum(F.when(F.col("__t") == 0, F.col("__sv")).cast(_MOMENT)),
            F.sum(F.when(F.col("__t") == 0, F.col("__c")).otherwise(0)),
        ).alias("__dobs"),
    )
    reps = units.withColumn(
        "k", F.explode(F.sequence(F.lit(1), F.lit(n_perm)))
    ).withColumn(
        "__a",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("__u").cast("string"),
                            F.lit(f":{salt}:"),
                            F.col("k").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            / F.lit(_HASH_SCALE)
            < 0.5
        ).cast("int"),
    )
    per_k = reps.groupBy("k").agg(
        d_expr(
            F.sum(F.when(F.col("__a") == 1, F.col("__sv")).cast(_MOMENT)),
            F.sum(F.when(F.col("__a") == 1, F.col("__c")).otherwise(0)),
            F.sum(F.when(F.col("__a") == 0, F.col("__sv")).cast(_MOMENT)),
            F.sum(F.when(F.col("__a") == 0, F.col("__c")).otherwise(0)),
        ).alias("__dk")
    )
    tail = per_k.crossJoin(F.broadcast(obs)).agg(
        F.max("n_units").alias("n_units"),
        F.max("n_events").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_perm"),
        F.max("__dobs").alias("__dobs"),
        F.sum(
            F.when(F.abs(F.col("__dk")) >= F.abs(F.col("__dobs")), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_ge"),
    )
    return tail.select(
        "n_units",
        "n_events",
        "n_perm",
        F.round(F.col("__dobs"), round_to).alias("d_obs"),
        "n_ge",
        (F.lit(1) + F.col("n_ge")).cast("long").alias("p_num"),
        (F.col("n_perm") + 1).cast("long").alias("p_den"),
        F.round(
            (F.lit(1) + F.col("n_ge")).cast("double")
            / (F.col("n_perm") + 1).cast("double"),
            round_to,
        ).alias("p"),
    )


def permutation_test_sql(
    table: str,
    id_col: str,
    treat_sql: str,
    value_sql: str,
    n_perm: int = 200,
    salt: str = "perm",
    round_to: int = 9,
) -> str:
    v6 = _q6_sql(f"CAST({value_sql} AS DOUBLE)")
    assign = (
        f"(('0x' || substr(md5(CAST(u AS VARCHAR) || ':{salt}:' ||"
        f" CAST(k AS VARCHAR)), 1, 8))::BIGINT / {_HASH_SCALE!r} < 0.5)::INTEGER"
    )
    d = (
        "({st} / CAST(NULLIF({nt}, 0) AS DOUBLE)"
        " - {sc} / CAST(NULLIF({nc}, 0) AS DOUBLE))"
    )
    d_obs = d.format(
        st=_d2d_sql("SUM(CASE WHEN t = 1 THEN sv END)"),
        nt="SUM(CASE WHEN t = 1 THEN c ELSE 0 END)",
        sc=_d2d_sql("SUM(CASE WHEN t = 0 THEN sv END)"),
        nc="SUM(CASE WHEN t = 0 THEN c ELSE 0 END)",
    )
    d_k = d.format(
        st=_d2d_sql("SUM(CASE WHEN a = 1 THEN sv END)"),
        nt="SUM(CASE WHEN a = 1 THEN c ELSE 0 END)",
        sc=_d2d_sql("SUM(CASE WHEN a = 0 THEN sv END)"),
        nc="SUM(CASE WHEN a = 0 THEN c ELSE 0 END)",
    )
    return f"""
WITH __units AS (
  SELECT {id_col} AS u,
         CAST(SUM(CAST({v6} AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sv,
         CAST(COUNT(*) AS BIGINT) AS c,
         MAX(({treat_sql})::INTEGER) AS t
  FROM {table} WHERE ({value_sql}) IS NOT NULL
  GROUP BY u
),
__obs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
         CAST(SUM(c) AS BIGINT) AS n_events,
         {d_obs} AS dobs
  FROM __units
),
__reps AS (
  SELECT u, sv, c, k, {assign} AS a
  FROM __units, (SELECT UNNEST(range(1, {n_perm} + 1)) AS k)
),
__perk AS (
  SELECT k, {d_k} AS dk FROM __reps GROUP BY k
),
__tail AS (
  SELECT MAX(o.n_units) AS n_units, MAX(o.n_events) AS n_events,
         CAST(COUNT(*) AS BIGINT) AS n_perm,
         MAX(o.dobs) AS dobs,
         CAST(SUM(CASE WHEN abs(p.dk) >= abs(o.dobs) THEN 1 ELSE 0 END)
              AS BIGINT) AS n_ge
  FROM __perk p, __obs o
)
SELECT n_units, n_events, n_perm,
       CASE WHEN ABS(dobs) >= 1e16 THEN CAST((dobs) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((dobs) * CAST(ABS(dobs) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS d_obs,
       n_ge,
       CAST(1 + n_ge AS BIGINT) AS p_num,
       CAST(n_perm + 1 AS BIGINT) AS p_den,
       CASE WHEN ABS(CAST(1 + n_ge AS DOUBLE) / CAST(n_perm + 1 AS DOUBLE)) >= 1e16 THEN CAST((CAST(1 + n_ge AS DOUBLE) / CAST(n_perm + 1 AS DOUBLE)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(1 + n_ge AS DOUBLE) / CAST(n_perm + 1 AS DOUBLE)) * CAST(ABS(CAST(1 + n_ge AS DOUBLE) / CAST(n_perm + 1 AS DOUBLE)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS p
FROM __tail
"""


def eb_shrunk_rates(
    df: DataFrame,
    item_col: Column,
    success_pred: Column,
    round_to: int = 9,
) -> DataFrame:
    """Per-item empirical-Bayes beta-binomial shrinkage of success
    rates: ``(item, n_trials, n_success, rate, alpha, beta,
    shrunk_rate)`` ordered by item (Robbins 1956 lineage; the
    method-of-moments prior fit per Morris JASA'83 practice).

    The small-cell fix for every per-item rate table (CTR by slice,
    conversion by cohort): an item with 3/4 successes should NOT rank
    above one with 700/1000. The Beta(α, β) prior is fitted by moments
    on the observed item rates — with m/v the mean/variance of p_i,
    α+β = m(1−m)/v − 1, α = m·(α+β) — and each item's posterior mean is
    (s_i + α)/(n_i + α + β). α/β/shrunk are NULL when the moment fit
    degenerates (v = 0, or fitted α+β ≤ 0 when between-item variance
    exceeds the binomial bound); the raw rates remain.

    Engine parity: item rates quantize to (18,6) via the text hop and
    the rate moments accumulate in DECIMAL (the stats_tests
    convention) — the prior fit and every posterior mean are then fixed
    IEEE expressions over exact sums. Rows with NULL item or NULL
    predicate are excluded. One item-keyed aggregation + a 1-row prior
    broadcast."""
    base = df.where(item_col.isNotNull() & success_pred.isNotNull()).select(
        item_col.alias("item"),
        success_pred.cast("int").alias("__y"),
    )
    items = base.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("n_trials"),
        F.sum("__y").cast("long").alias("n_success"),
    )
    p6 = _q6(
        F.col("n_success").cast("double") / F.col("n_trials").cast("double")
    )
    # square the (18,6) directly: (18,6)x(18,6) is (37,12) exact; a
    # (19,6) operand squares to (39,12), which Spark silently rescales
    # to scale 11 (the _VAL_DEC comment's Brier-score hazard) — the
    # (19,6) widening belongs only in the DuckDB twin
    mom = items.agg(
        F.count(F.lit(1)).cast("long").alias("__k"),
        F.sum(p6.cast(_MOMENT)).cast(_MOMENT).alias("__sp"),
        F.sum((p6 * p6).cast(_MOMENT)).cast(_MOMENT).alias("__spp"),
    )
    k_d = F.col("__k").cast("double")
    m = _d2d(F.col("__sp")) / k_d
    v = _div(
        _d2d(F.col("__spp")) - (_d2d(F.col("__sp")) * _d2d(F.col("__sp"))) / k_d,
        k_d - F.lit(1.0),
    )
    # _div, not a when()-guarded `/`: the v > 0 guard can be HOISTED by
    # codegen subexpression elimination (the CUPED incident) and v = 0
    # is a REAL input (identical item rates)
    ab = _div(m * (F.lit(1.0) - m), v) - F.lit(1.0)
    prior = mom.select(
        F.when((v > 0) & (ab > 0), ab).alias("__ab"),
        F.when((v > 0) & (ab > 0), m * ab).alias("__alpha"),
    )
    j = items.crossJoin(F.broadcast(prior))
    shrunk = (F.col("n_success").cast("double") + F.col("__alpha")) / (
        F.col("n_trials").cast("double") + F.col("__ab")
    )
    return j.select(
        "item",
        "n_trials",
        "n_success",
        F.round(
            F.col("n_success").cast("double") / F.col("n_trials").cast("double"),
            round_to,
        ).alias("rate"),
        F.round(F.col("__alpha"), round_to).alias("alpha"),
        F.round(F.col("__ab") - F.col("__alpha"), round_to).alias("beta"),
        F.round(shrunk, round_to).alias("shrunk_rate"),
    ).orderBy("item")


def eb_shrunk_rates_sql(
    table: str,
    item_sql: str,
    success_sql: str,
    round_to: int = 9,
) -> str:
    p6 = _q6_sql(
        "CAST(n_success AS DOUBLE) / CAST(n_trials AS DOUBLE)"
    )
    return f"""
WITH __items AS (
  SELECT ({item_sql}) AS item,
         CAST(COUNT(*) AS BIGINT) AS n_trials,
         CAST(SUM(({success_sql})::INTEGER) AS BIGINT) AS n_success
  FROM {table}
  WHERE ({item_sql}) IS NOT NULL AND ({success_sql}) IS NOT NULL
  GROUP BY item
),
__mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(CAST({p6} AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sp,
         CAST(SUM(CAST({p6} AS DECIMAL(19,6)) * CAST({p6} AS DECIMAL(19,6)))
              AS DECIMAL(38,12)) AS spp
  FROM __items
),
__prior AS (
  SELECT CASE WHEN v > 0 AND (m * (1.0 - m)) / v - 1.0 > 0
              THEN (m * (1.0 - m)) / v - 1.0 END AS ab,
         CASE WHEN v > 0 AND (m * (1.0 - m)) / v - 1.0 > 0
              THEN m * ((m * (1.0 - m)) / v - 1.0) END AS alpha
  FROM (
    SELECT {_d2d_sql('sp')} / CAST(k AS DOUBLE) AS m,
           ({_d2d_sql('spp')} - ({_d2d_sql('sp')} * {_d2d_sql('sp')})
              / CAST(k AS DOUBLE))
             / NULLIF(CAST(k AS DOUBLE) - 1.0, 0.0) AS v
    FROM __mom
  )
)
SELECT item, n_trials, n_success,
       CASE WHEN ABS(CAST(n_success AS DOUBLE) / CAST(n_trials AS DOUBLE)) >= 1e16 THEN CAST((CAST(n_success AS DOUBLE) / CAST(n_trials AS DOUBLE)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(n_success AS DOUBLE) / CAST(n_trials AS DOUBLE)) * CAST(ABS(CAST(n_success AS DOUBLE) / CAST(n_trials AS DOUBLE)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS rate,
       CASE WHEN ABS(alpha) >= 1e16 THEN CAST((alpha) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((alpha) * CAST(ABS(alpha) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS alpha,
       CASE WHEN ABS(ab - alpha) >= 1e16 THEN CAST((ab - alpha) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((ab - alpha) * CAST(ABS(ab - alpha) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS beta,
       CAST(CAST(CAST(CAST(((CAST(n_success AS DOUBLE) + alpha)
             / (CAST(n_trials AS DOUBLE) + ab)) * CAST(ABS((CAST(n_success AS DOUBLE) + alpha)
             / (CAST(n_trials AS DOUBLE) + ab)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS shrunk_rate
FROM __items, __prior
ORDER BY item
"""


def icc_design_effect(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 9,
) -> DataFrame:
    """One-row intraclass correlation + design effect from a one-way
    ANOVA over clusters: ``(n, k, msb, msw, icc, m_bar, deff)`` —
    the cluster-randomization planning pair (Kish 1965; Donner & Klar
    2000): ICC₁ = (MSB − MSW)/(MSB + (n₀−1)·MSW) with Kish's n₀ =
    (N − Σn_g²/N)/(k−1) correcting for unequal cluster sizes, and
    DEFF = 1 + (m̄−1)·ICC for m̄ = N/k. DEFF is the variance-inflation
    factor a user-randomized experiment pays over unit randomization —
    the companion every permutation_test / welch readout on clustered
    assignment needs to size itself honestly.

    Engine parity: grand moments (Σx, Σx²) are the exact _q6 decimals;
    the cross-cluster Σ s_g²/n_g cannot stay decimal (a division per
    cluster), so each cluster's term rounds to 9dp and sums in
    DECIMAL(38,9) — order-free across partitions AND engines (the
    lm_score rounded-term convention). ICC is clamped to ≥ 0 wherever
    MSB < MSW (the standard negative-estimate floor) and NULL when
    dof degenerates (k < 2 or N ≤ k). Rows with NULL value or group
    are excluded.

    Scale posture: one group-keyed aggregation (map-side combined),
    then a 1-row reduction over the cluster frame."""
    base = df.where(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("__g"),
        _q6(F.col(value_col).cast("double")).alias("__x"),
    )
    per = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("__ng"),
        F.sum(F.col("__x").cast(_MOMENT)).cast(_MOMENT).alias("__sg"),
        F.sum((F.col("__x") * F.col("__x")).cast(_MOMENT))
        .cast(_MOMENT)
        .alias("__qg"),
    )
    # text hop, not a direct double->decimal cast: at s_g^2/n_g
    # magnitudes (~1e10 on fuzz inputs) a bare 9-dp double round is an ulp-level
    # no-op, so the decimal conversion sees a full-precision double —
    # Spark rounds its shortest repr HALF_UP while DuckDB rounds the
    # exact binary value (the _q6 class; fuzz-caught as a 2e-7 msb
    # divergence at seed 7005)
    ratio = (
        F.round(
            (_d2d(F.col("__sg")) * _d2d(F.col("__sg")))
            / F.col("__ng").cast("double"),
            9,
        )
        .cast("string")
        .cast("decimal(38,9)")
    )
    agg = per.agg(
        F.sum("__ng").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("__sg")).cast(_MOMENT).alias("__s"),
        F.sum(F.col("__qg")).cast(_MOMENT).alias("__q"),
        F.sum(ratio).cast("decimal(38,9)").alias("__r"),
        F.sum(
            F.col("__ng").cast("decimal(38,0)") * F.col("__ng").cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("__n2"),
    )
    n_d = F.col("n").cast("double")
    k_d = F.col("k").cast("double")
    r_d = _d2d(F.col("__r"))
    ssb = r_d - (_d2d(F.col("__s")) * _d2d(F.col("__s"))) / n_d
    ssw = _d2d(F.col("__q")) - r_d
    msb = _div(ssb, k_d - F.lit(1.0))
    msw = _div(ssw, n_d - k_d)
    n0 = _div(n_d - _d2d(F.col("__n2")) / n_d, k_d - F.lit(1.0))
    icc = F.greatest(
        _div(msb - msw, msb + (n0 - F.lit(1.0)) * msw), F.lit(0.0)
    )
    m_bar = n_d / k_d
    ok = (F.col("k") >= 2) & (F.col("n") > F.col("k"))
    return agg.select(
        "n",
        "k",
        F.round(F.when(ok, msb), round_to).alias("msb"),
        F.round(F.when(ok, msw), round_to).alias("msw"),
        F.round(F.when(ok, icc), round_to).alias("icc"),
        F.round(m_bar, round_to).alias("m_bar"),
        F.round(
            F.when(ok, F.lit(1.0) + (m_bar - F.lit(1.0)) * icc), round_to
        ).alias("deff"),
    )


def icc_design_effect_sql(
    table: str,
    group_sql: str,
    value_sql: str,
    round_to: int = 9,
) -> str:
    x = _q6_sql(f"CAST({value_sql} AS DOUBLE)")
    return f"""
WITH __per AS (
  SELECT ({group_sql}) AS g,
         CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(CAST({x} AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sg,
         CAST(SUM(CAST({x} AS DECIMAL(19,6)) * CAST({x} AS DECIMAL(19,6)))
              AS DECIMAL(38,12)) AS qg
  FROM {table}
  WHERE ({value_sql}) IS NOT NULL AND ({group_sql}) IS NOT NULL
  GROUP BY g
),
__agg AS (
  SELECT CAST(SUM(ng) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(sg) AS DECIMAL(38,12)) AS s,
         CAST(SUM(qg) AS DECIMAL(38,12)) AS q,
         CAST(SUM(CAST(CAST(CAST(CAST(CAST(CAST((({_d2d_sql('sg')} * {_d2d_sql('sg')})
                                   / CAST(ng AS DOUBLE)) * CAST(ABS(({_d2d_sql('sg')} * {_d2d_sql('sg')})
                                   / CAST(ng AS DOUBLE)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) AS VARCHAR)
                       AS DECIMAL(38,9)))
              AS DECIMAL(38,9)) AS r,
         CAST(SUM(CAST(ng AS DECIMAL(38,0)) * CAST(ng AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS n2
  FROM __per
),
__f AS (
  SELECT n, k,
         ({_d2d_sql('r')} - ({_d2d_sql('s')} * {_d2d_sql('s')})
            / CAST(n AS DOUBLE)) / NULLIF(CAST(k AS DOUBLE) - 1.0, 0.0)
           AS msb,
         ({_d2d_sql('q')} - {_d2d_sql('r')})
           / NULLIF(CAST(n AS DOUBLE) - CAST(k AS DOUBLE), 0.0) AS msw,
         (CAST(n AS DOUBLE) - {_d2d_sql('n2')} / CAST(n AS DOUBLE))
           / NULLIF(CAST(k AS DOUBLE) - 1.0, 0.0) AS n0,
         CAST(n AS DOUBLE) / CAST(k AS DOUBLE) AS m_bar
  FROM __agg
),
__i AS (
  SELECT *, GREATEST((msb - msw)
                     / NULLIF(msb + (n0 - 1.0) * msw, 0.0), 0.0) AS icc
  FROM __f
)
SELECT n, k,
       CASE WHEN ABS(CASE WHEN k >= 2 AND n > k THEN msb END) >= 1e16 THEN CAST((CASE WHEN k >= 2 AND n > k THEN msb END) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CASE WHEN k >= 2 AND n > k THEN msb END) * CAST(ABS(CASE WHEN k >= 2 AND n > k THEN msb END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS msb,
       CASE WHEN ABS(CASE WHEN k >= 2 AND n > k THEN msw END) >= 1e16 THEN CAST((CASE WHEN k >= 2 AND n > k THEN msw END) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CASE WHEN k >= 2 AND n > k THEN msw END) * CAST(ABS(CASE WHEN k >= 2 AND n > k THEN msw END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS msw,
       CASE WHEN ABS(CASE WHEN k >= 2 AND n > k THEN icc END) >= 1e16 THEN CAST((CASE WHEN k >= 2 AND n > k THEN icc END) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CASE WHEN k >= 2 AND n > k THEN icc END) * CAST(ABS(CASE WHEN k >= 2 AND n > k THEN icc END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS icc,
       CASE WHEN ABS(m_bar) >= 1e16 THEN CAST((m_bar) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((m_bar) * CAST(ABS(m_bar) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS m_bar,
       CAST(CAST(CAST(CAST((CASE WHEN k >= 2 AND n > k
                  THEN 1.0 + (m_bar - 1.0) * icc END) * CAST(ABS(CASE WHEN k >= 2 AND n > k
                  THEN 1.0 + (m_bar - 1.0) * icc END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS deff
FROM __i
"""
