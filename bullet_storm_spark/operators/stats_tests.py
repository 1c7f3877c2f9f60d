"""Distributed statistical tests for pipeline calibration, dual-compiled.

Four tests a training-data pipeline runs constantly and a 100 TB engine
must therefore do in one pass, not in a driver-side sample:

- ``auc_rank_sum``  — ROC AUC of a score against a binary label via the
  midrank Mann-Whitney U (Hanley & McNeil Radiology'82): is this quality
  score / classifier actually separating the classes?
- ``welch_t``       — Welch's unequal-variance t statistic between two
  slices (Welch Biometrika'47): did the metric move between cohorts?
- ``two_proportion_z`` — pooled two-proportion z statistic: did a rate
  move between A and B arms?
- ``cohens_kappa``  — agreement between two categorical raters beyond
  chance (Cohen EPM'60): do two quality filters agree more than chance?
- ``calibration_bins`` / ``calibration_summary`` — reliability diagram,
  ECE/MCE (Naeini AAAI'15) and Brier score: is the classifier's
  probability honest, not just rank-correct?
- ``bootstrap_mean_ci`` — percentile CI for a mean via the Poisson
  bootstrap (Chamandy et al. 2012), deterministic by construction: the
  per-(row, replicate) weight inverts Poisson(1) CDF literals through
  the repo's md5-fraction draw, so the "random" resample is a pure
  function of (id, salt, replica) and bit-identical across engines.

Engine-parity design mirrors the repo's exact-core convention: every
accumulation is integer or exact-decimal (midranks via the integer
identity ``2*midrank = 2*cum_before + cnt + 1``; moment sums of
6dp-rounded values in DECIMAL, whose squares at 12dp are EXACT), so both
engines reach the final closed-form float arithmetic with bit-identical
inputs; the only non-exact ops are IEEE-correctly-rounded +-*/sqrt on
those identical doubles. No transcendentals anywhere — statistics are
reported, p-values are the caller's lookup (neither engine has a portable
incomplete-beta, and a CDF would smuggle libm divergence back in).

Scale shapes: welch/z-test/AUC-groups are single-pass conditional
aggregations (map-side partials, 1-row or support-sized results); AUC's
cumulative rank window is ordered over DISTINCT score values — the same
support-sized-window contract as ks_drift (pre-round continuous scores to
bound support at scale); kappa's chance term is an equi-join of two
vocabulary-sized margin frames.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window, functions as F

# values quantize to DECIMAL(18,6) on entry (the group.py exact-sum
# convention, narrowed by one digit): an (18,6)x(18,6) product is
# (37,12) — EXACT in both engines. (19,6) squares would be (39,12),
# which Spark silently rescales to scale 11 (rounding the 12th dp)
# while DuckDB keeps (38,12) — a 1-ulp cross-engine divergence we hit
# on the Brier score before narrowing.
_MOMENT = "decimal(38,12)"
_VAL_DEC = "decimal(18,6)"


def _d2d(c):
    """Decimal→double via the STRING hop: decimal→text is exact and
    text→double is correctly rounded in BOTH engines, whereas the
    direct decimal→double cast double-rounds (int128→double, then
    /10^scale) and diverges across engines by 1 ulp once the unscaled
    value exceeds 2^53 — fuzz-caught on CUPED moments at |x| ~ 1e5.
    Use for every aggregate-decimal → double conversion (cheap: runs on
    aggregated rows, never in the per-input hot path)."""
    return c.cast("string").cast("double")


def _d2d_sql(e: str) -> str:
    return f"CAST(CAST({e} AS VARCHAR) AS DOUBLE)"


def _q6(c):
    """Engine-identical (18,6) quantizer: double→STRING→decimal. The
    direct double→decimal cast is NOT portable at quantization ties —
    Spark rounds the shortest decimal repr HALF_UP while DuckDB rounds
    the exact binary value (probe: 12345.1976225 → .197623 vs .197622).
    Both engines emit shortest round-trip text and parse decimal text
    HALF_UP, so the text hop agrees everywhere (review-caught; the
    inverse twin of _d2d)."""
    return c.cast("double").cast("string").cast(_VAL_DEC)


def _q6_sql(e: str) -> str:
    return f"CAST(CAST((CAST({e} AS DOUBLE)) * CAST(ABS(CAST({e} AS DOUBLE)) >= POWER(10.0, -(6+1)) AS INT) AS VARCHAR) AS DECIMAL(18,6))"


def _qround_sql(e: str, digits: int) -> str:
    """Engine-identical twin of Spark's ``F.round(double, digits)`` for the
    DuckDB oracle. Spark's Round on DoubleType is EXACT: shortest-repr text
    via BigDecimal.valueOf then setScale HALF_UP. DuckDB's ROUND(double, n)
    rounds in float arithmetic (x * 10^n, round, divide), which diverges
    from exact HALF_UP by 1 ulp when x * 10^n sits within a ulp of a .5
    boundary — driver-caught r8 on events_uplift_deciles (local DuckDB
    happened to agree; the driver's build did not). The text hop
    double→VARCHAR→DECIMAL→VARCHAR→DOUBLE is exact/correctly-rounded at
    every step, so the oracle reproduces Spark's rounding bit-for-bit on
    any DuckDB build. Only for double operands (decimal ROUND is already
    exact in both engines); NULL propagates (ABS(NULL) >= 1e16 is NULL,
    so the CASE falls to the hop, which propagates NULL).

    Large-magnitude bypass (advisor r9): DuckDB's VARCHAR→DECIMAL(38,d)
    parse RAISES on overflow (|x| >= 10^(38-d)) or NaN/Inf rather than
    returning a value, so an unbounded operand (MIN/MAX profiles, sums)
    would turn an oracle comparison into a hard query error. Every
    double with |x| >= 2^52 is integer-valued, so Spark's
    BigDecimal.setScale(d >= 0, HALF_UP) is the identity there — the
    oracle can return x directly for |x| >= 1e16 (> 2^53) with
    bit-identical results and no DECIMAL hop to overflow. The same
    branch absorbs NaN/Inf (DuckDB orders NaN above all values; Spark's
    Round returns NaN/Inf unchanged)."""
    return (
        f"CASE WHEN ABS({e}) >= 1e16 THEN CAST(({e}) AS DOUBLE) ELSE "
        f"CAST(CAST(CAST(CAST(({e}) * CAST(ABS({e}) >= POWER(10.0, -({digits}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{digits})) "
        f"AS VARCHAR) AS DOUBLE) END"
    )


def _div(a, b):
    """NULL-on-zero division for data-dependent denominators.

    Matches DuckDB, whose double division yields NULL at zero — and is
    the only safe form under this repo's ANSI-mode Spark: `F.when`
    branches are lazy, but whole-stage codegen's subexpression
    elimination can HOIST a guarded division out of its branch and
    evaluate it eagerly (observed: CUPED's theta = vxy/vxx raised
    DIVIDE_BY_ZERO on a zero-variance covariate despite the vxx > 0
    guard). try_divide keeps IEEE results for nonzero divisors."""
    return F.try_divide(a, b)


def auc_rank_sum(
    df: DataFrame,
    score_col: str,
    pos_pred: Column,
    round_to: int = 9,
) -> DataFrame:
    """One-row ROC AUC via midrank Mann-Whitney. Output
    ``(n_pos, n_neg, rank_sum2, auc)`` where ``rank_sum2`` is twice the
    positive-class midrank sum (integer-exact; the doubling keeps tie
    midranks integral) and ``auc = (rank_sum2/2 - n_pos(n_pos+1)/2) /
    (n_pos * n_neg)``.

    Rows with NULL score or NULL predicate are excluded. The cumulative
    window is over distinct score values (support-sized, ks_drift's
    contract) — pre-round a continuous score to bound the support at
    scale."""
    lbl = F.when(pos_pred, F.lit(1)).otherwise(F.lit(0))
    g = (
        df.where(F.col(score_col).isNotNull() & pos_pred.isNotNull())
        .select(F.col(score_col).cast("double").alias("__s"), lbl.alias("__y"))
        .groupBy("__s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__cnt"),
            F.sum("__y").cast("long").alias("__pos"),
        )
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.withColumn("__cum", F.sum("__cnt").over(w))
    # 2*midrank of every row tied at this value = 2*(cum - cnt) + cnt + 1;
    # (19,0) x (19,0) factors -> exact (38,0) product in BOTH engines
    # (DuckDB errors on a multiply whose result precision exceeds 38)
    term = F.col("__pos").cast("decimal(19,0)") * (
        F.lit(2) * (F.col("__cum") - F.col("__cnt")) + F.col("__cnt") + F.lit(1)
    ).cast("decimal(19,0)")
    agg = cum.agg(
        F.sum("__pos").cast("long").alias("n_pos"),
        (F.sum("__cnt") - F.sum("__pos")).cast("long").alias("n_neg"),
        F.sum(term).cast("decimal(38,0)").alias("__rs2"),
    )
    auc = _div(
        _d2d(F.col("__rs2")) / F.lit(2.0)
        - F.col("n_pos").cast("double")
        * (F.col("n_pos").cast("double") + F.lit(1.0))
        / F.lit(2.0),
        F.col("n_pos").cast("double") * F.col("n_neg").cast("double"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        _d2d(F.col("__rs2")).alias("rank_sum2"),
        F.round(
            F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0), auc), round_to
        ).alias("auc"),
    )


def auc_rank_sum_sql(
    table: str, score_sql: str, pos_pred_sql: str, round_to: int = 9
) -> str:
    return f"""
WITH __g AS (
  SELECT CAST({score_sql} AS DOUBLE) AS s, COUNT(*)::BIGINT AS cnt,
         SUM(CASE WHEN {pos_pred_sql} THEN 1 ELSE 0 END)::BIGINT AS pos
  FROM {table}
  WHERE ({score_sql}) IS NOT NULL AND ({pos_pred_sql}) IS NOT NULL
  GROUP BY s
),
__cum AS (
  SELECT pos, cnt,
         CAST(SUM(cnt) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS cum
  FROM __g
),
__agg AS (
  SELECT SUM(pos)::BIGINT AS n_pos,
         (SUM(cnt) - SUM(pos))::BIGINT AS n_neg,
         CAST(SUM(CAST(pos AS DECIMAL(19,0))
                  * CAST(2 * (cum - cnt) + cnt + 1 AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS rs2
  FROM __cum
)
SELECT n_pos, n_neg, CAST(CAST(rs2 AS VARCHAR) AS DOUBLE) AS rank_sum2,
       CAST(CAST(CAST(CAST((CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         (CAST(CAST(rs2 AS VARCHAR) AS DOUBLE) / 2.0
          - CAST(n_pos AS DOUBLE) * (CAST(n_pos AS DOUBLE) + 1.0) / 2.0)
         / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
       END) * CAST(ABS(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         (CAST(CAST(rs2 AS VARCHAR) AS DOUBLE) / 2.0
          - CAST(n_pos AS DOUBLE) * (CAST(n_pos AS DOUBLE) + 1.0) / 2.0)
         / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
       END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS auc
FROM __agg
"""


def _arm_moments(value: Column, in_arm: Column) -> list[Column]:
    """n / exact-decimal Σx / Σx² for one arm, as conditional aggregates
    over a single scan (x quantizes to DECIMAL(18,6) on entry, so x² is
    exact at 12dp and both sums are order-independent)."""
    x = _q6(F.when(in_arm, value))
    return [
        F.count(x).cast("long"),
        F.sum(x.cast(_MOMENT)).cast(_MOMENT),
        F.sum((x * x).cast(_MOMENT)).cast(_MOMENT),
    ]


def welch_t(
    df: DataFrame,
    value_col: str,
    a_pred: Column,
    b_pred: Column,
    round_to: int = 9,
) -> DataFrame:
    """One-row Welch unequal-variance t test between slice A and slice B
    of ``value_col``. Output ``(n_a, n_b, mean_a, mean_b, t_stat, dof)``
    — the statistic and Welch-Satterthwaite degrees of freedom; p-value
    lookup is the caller's (no portable t CDF). NULL when either arm has
    n < 2 or both variances are zero. Values quantize to DECIMAL(18,6)
    for the moment sums (the repo's order-independence convention,
    narrowed so squares stay exact — see the module constant note)."""
    v = F.col(value_col).cast("double")
    base = df.where(F.col(value_col).isNotNull())
    na, sa, qa = _arm_moments(v, a_pred)
    nb, sb, qb = _arm_moments(v, b_pred)
    agg = base.agg(
        na.alias("n_a"), sa.alias("__sa"), qa.alias("__qa"),
        nb.alias("n_b"), sb.alias("__sb"), qb.alias("__qb"),
    )
    n_a = F.col("n_a").cast("double")
    n_b = F.col("n_b").cast("double")
    ma = _div(_d2d(F.col("__sa")), n_a)
    mb = _div(_d2d(F.col("__sb")), n_b)
    va = _div(
        _d2d(F.col("__qa"))
        - _div(_d2d(F.col("__sa")) * _d2d(F.col("__sa")), n_a),
        n_a - F.lit(1.0),
    )
    vb = _div(
        _d2d(F.col("__qb"))
        - _div(_d2d(F.col("__sb")) * _d2d(F.col("__sb")), n_b),
        n_b - F.lit(1.0),
    )
    se2 = _div(va, n_a) + _div(vb, n_b)
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2)
    t = F.when(ok & (se2 > 0), _div(ma - mb, F.sqrt(se2)))
    dof = F.when(
        ok & (se2 > 0),
        _div(
            se2 * se2,
            _div(_div(va, n_a) * _div(va, n_a), n_a - F.lit(1.0))
            + _div(_div(vb, n_b) * _div(vb, n_b), n_b - F.lit(1.0)),
        ),
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round(F.when(F.col("n_a") > 0, ma), round_to).alias("mean_a"),
        F.round(F.when(F.col("n_b") > 0, mb), round_to).alias("mean_b"),
        F.round(t, round_to).alias("t_stat"),
        F.round(dof, round_to).alias("dof"),
    )


def welch_t_sql(
    table: str,
    value_sql: str,
    a_pred_sql: str,
    b_pred_sql: str,
    round_to: int = 9,
) -> str:
    def arm(pred: str, tag: str) -> str:
        x = _q6_sql(f"CASE WHEN {pred} THEN CAST({value_sql} AS DOUBLE) END")
        xw = f"CAST({x} AS DECIMAL(19,6))"
        # widen to (19,6) BEFORE the product: DuckDB's (18,6)x(18,6)
        # takes an int64 fast path that overflows at runtime on large
        # magnitudes even when the result is representable; (19,6)
        # operands force the exact int128 DECIMAL(38,12) path. Values
        # are identical (pure widening), and the Spark side keeps
        # (18,6) operands (where (19,6)^2 would trip scale reduction).
        return (
            f"COUNT({x})::BIGINT AS n_{tag},\n"
            f"         CAST(SUM(CAST({x} AS DECIMAL(38,12)))"
            f" AS DECIMAL(38,12)) AS s_{tag},\n"
            f"         CAST(SUM({xw} * {xw})"
            f" AS DECIMAL(38,12)) AS q_{tag}"
        )

    return f"""
WITH __m AS (
  SELECT {arm(a_pred_sql, 'a')},
         {arm(b_pred_sql, 'b')}
  FROM {table} WHERE ({value_sql}) IS NOT NULL
),
__d AS (
  SELECT n_a, n_b,
         CAST(CAST(s_a AS VARCHAR) AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
         CAST(CAST(s_b AS VARCHAR) AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
         (CAST(CAST(q_a AS VARCHAR) AS DOUBLE) - CAST(CAST(s_a AS VARCHAR) AS DOUBLE) * CAST(CAST(s_a AS VARCHAR) AS DOUBLE)
            / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0) AS va,
         (CAST(CAST(q_b AS VARCHAR) AS DOUBLE) - CAST(CAST(s_b AS VARCHAR) AS DOUBLE) * CAST(CAST(s_b AS VARCHAR) AS DOUBLE)
            / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0) AS vb
  FROM __m
)
SELECT n_a, n_b,
       CASE WHEN ABS(CASE WHEN n_a > 0 THEN ma END) >= 1e16 THEN CAST((CASE WHEN n_a > 0 THEN ma END) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CASE WHEN n_a > 0 THEN ma END) * CAST(ABS(CASE WHEN n_a > 0 THEN ma END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS mean_a,
       CASE WHEN ABS(CASE WHEN n_b > 0 THEN mb END) >= 1e16 THEN CAST((CASE WHEN n_b > 0 THEN mb END) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CASE WHEN n_b > 0 THEN mb END) * CAST(ABS(CASE WHEN n_b > 0 THEN mb END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS mean_b,
       CAST(CAST(CAST(CAST((CASE WHEN n_a >= 2 AND n_b >= 2
                   AND va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE) > 0
         THEN (ma - mb) / sqrt(va / CAST(n_a AS DOUBLE)
                               + vb / CAST(n_b AS DOUBLE)) END) * CAST(ABS(CASE WHEN n_a >= 2 AND n_b >= 2
                   AND va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE) > 0
         THEN (ma - mb) / sqrt(va / CAST(n_a AS DOUBLE)
                               + vb / CAST(n_b AS DOUBLE)) END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE)
         AS t_stat,
       CAST(CAST(CAST(CAST((CASE WHEN n_a >= 2 AND n_b >= 2
                   AND va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE) > 0
         THEN ((va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE))
               * (va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE)))
              / ((va / CAST(n_a AS DOUBLE)) * (va / CAST(n_a AS DOUBLE))
                   / (CAST(n_a AS DOUBLE) - 1.0)
                 + (vb / CAST(n_b AS DOUBLE)) * (vb / CAST(n_b AS DOUBLE))
                   / (CAST(n_b AS DOUBLE) - 1.0)) END) * CAST(ABS(CASE WHEN n_a >= 2 AND n_b >= 2
                   AND va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE) > 0
         THEN ((va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE))
               * (va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE)))
              / ((va / CAST(n_a AS DOUBLE)) * (va / CAST(n_a AS DOUBLE))
                   / (CAST(n_a AS DOUBLE) - 1.0)
                 + (vb / CAST(n_b AS DOUBLE)) * (vb / CAST(n_b AS DOUBLE))
                   / (CAST(n_b AS DOUBLE) - 1.0)) END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS dof
FROM __d
"""


def two_proportion_z(
    df: DataFrame,
    success_pred: Column,
    a_pred: Column,
    b_pred: Column,
    round_to: int = 9,
) -> DataFrame:
    """One-row pooled two-proportion z test. Output
    ``(n_a, s_a, n_b, s_b, p_a, p_b, z_stat)``; z is NULL when an arm is
    empty or the pooled rate is degenerate (0 or 1). One conditional
    aggregation over the scan — integer counts, closed-form float end."""
    one_if = lambda p: F.when(p, F.lit(1)).otherwise(F.lit(0))  # noqa: E731
    agg = df.agg(
        F.sum(one_if(a_pred)).cast("long").alias("n_a"),
        F.sum(one_if(a_pred & success_pred)).cast("long").alias("s_a"),
        F.sum(one_if(b_pred)).cast("long").alias("n_b"),
        F.sum(one_if(b_pred & success_pred)).cast("long").alias("s_b"),
    )
    n_a, s_a = F.col("n_a").cast("double"), F.col("s_a").cast("double")
    n_b, s_b = F.col("n_b").cast("double"), F.col("s_b").cast("double")
    pa, pb = _div(s_a, n_a), _div(s_b, n_b)
    pp = _div(s_a + s_b, n_a + n_b)
    se2 = pp * (F.lit(1.0) - pp) * (_div(F.lit(1.0), n_a) + _div(F.lit(1.0), n_b))
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return agg.select(
        "n_a",
        "s_a",
        "n_b",
        "s_b",
        F.round(F.when(F.col("n_a") > 0, pa), round_to).alias("p_a"),
        F.round(F.when(F.col("n_b") > 0, pb), round_to).alias("p_b"),
        F.round(F.when(ok & (se2 > 0), _div(pa - pb, F.sqrt(se2))), round_to).alias(
            "z_stat"
        ),
    )


def two_proportion_z_sql(
    table: str,
    success_pred_sql: str,
    a_pred_sql: str,
    b_pred_sql: str,
    round_to: int = 9,
) -> str:
    return f"""
WITH __c AS (
  SELECT SUM(CASE WHEN {a_pred_sql} THEN 1 ELSE 0 END)::BIGINT AS n_a,
         SUM(CASE WHEN ({a_pred_sql}) AND ({success_pred_sql})
             THEN 1 ELSE 0 END)::BIGINT AS s_a,
         SUM(CASE WHEN {b_pred_sql} THEN 1 ELSE 0 END)::BIGINT AS n_b,
         SUM(CASE WHEN ({b_pred_sql}) AND ({success_pred_sql})
             THEN 1 ELSE 0 END)::BIGINT AS s_b
  FROM {table}
),
__d AS (
  SELECT n_a, s_a, n_b, s_b,
         CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
         CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
         CAST(s_a + s_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pp
  FROM __c
)
SELECT n_a, s_a, n_b, s_b,
       CASE WHEN ABS(CASE WHEN n_a > 0 THEN pa END) >= 1e16 THEN CAST((CASE WHEN n_a > 0 THEN pa END) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CASE WHEN n_a > 0 THEN pa END) * CAST(ABS(CASE WHEN n_a > 0 THEN pa END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS p_a,
       CASE WHEN ABS(CASE WHEN n_b > 0 THEN pb END) >= 1e16 THEN CAST((CASE WHEN n_b > 0 THEN pb END) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CASE WHEN n_b > 0 THEN pb END) * CAST(ABS(CASE WHEN n_b > 0 THEN pb END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS p_b,
       CAST(CAST(CAST(CAST((CASE WHEN n_a > 0 AND n_b > 0
                   AND pp * (1.0 - pp) * (1.0 / CAST(n_a AS DOUBLE)
                                          + 1.0 / CAST(n_b AS DOUBLE)) > 0
         THEN (pa - pb) / sqrt(pp * (1.0 - pp)
                               * (1.0 / CAST(n_a AS DOUBLE)
                                  + 1.0 / CAST(n_b AS DOUBLE))) END) * CAST(ABS(CASE WHEN n_a > 0 AND n_b > 0
                   AND pp * (1.0 - pp) * (1.0 / CAST(n_a AS DOUBLE)
                                          + 1.0 / CAST(n_b AS DOUBLE)) > 0
         THEN (pa - pb) / sqrt(pp * (1.0 - pp)
                               * (1.0 / CAST(n_a AS DOUBLE)
                                  + 1.0 / CAST(n_b AS DOUBLE))) END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS z_stat
FROM __d
"""


def cohens_kappa(
    df: DataFrame,
    a_col: Column,
    b_col: Column,
    round_to: int = 9,
) -> DataFrame:
    """One-row Cohen's kappa between two categorical rater columns
    (e.g. two quality-filter verdicts). Output
    ``(n, agree, po, pe, kappa)``. Rows where either rater is NULL are
    excluded. The chance term Σ row_margin(c)·col_margin(c) accumulates
    in DECIMAL(38,0) (margin products overflow BIGINT at ~3e9 rows);
    kappa is NULL when n = 0 or chance agreement is exact (pe = 1).

    Scale: two margin aggregations (vocabulary-sized results) joined on
    category + one diagonal count — no all-pairs anything."""
    labeled = (
        df.select(a_col.alias("__a"), b_col.alias("__b"))
        .where(F.col("__a").isNotNull() & F.col("__b").isNotNull())
    )
    diag = labeled.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(F.col("__a") == F.col("__b"), F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("agree"),
    )
    ra = labeled.groupBy(F.col("__a").alias("__cat")).agg(
        F.count(F.lit(1)).cast("long").alias("__r")
    )
    cb = labeled.groupBy(F.col("__b").alias("__cat")).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    pe_num = (
        ra.join(cb, "__cat")
        .agg(
            F.coalesce(
                F.sum(
                    (
                        F.col("__r").cast("decimal(19,0)")
                        * F.col("__c").cast("decimal(19,0)")
                    ).cast("decimal(38,0)")
                ),
                F.lit(0).cast("decimal(38,0)"),
            )
            .cast("decimal(38,0)")
            .alias("__pe")
        )
    )
    joined = diag.crossJoin(F.broadcast(pe_num))
    n_d = F.col("n").cast("double")
    pe = _div(_d2d(F.col("__pe")), n_d * n_d)
    po = _div(F.col("agree").cast("double"), n_d)
    return joined.select(
        "n",
        "agree",
        F.round(F.when(F.col("n") > 0, po), round_to).alias("po"),
        F.round(F.when(F.col("n") > 0, pe), round_to).alias("pe"),
        F.round(
            F.when(
                (F.col("n") > 0) & (pe < 1.0), _div(po - pe, F.lit(1.0) - pe)
            ),
            round_to,
        ).alias("kappa"),
    )


def cohens_kappa_sql(
    table: str, a_sql: str, b_sql: str, round_to: int = 9
) -> str:
    return f"""
WITH __l AS (
  SELECT {a_sql} AS a, {b_sql} AS b FROM {table}
  WHERE ({a_sql}) IS NOT NULL AND ({b_sql}) IS NOT NULL
),
__diag AS (
  SELECT COUNT(*)::BIGINT AS n,
         SUM(CASE WHEN a = b THEN 1 ELSE 0 END)::BIGINT AS agree
  FROM __l
),
__pe AS (
  SELECT COALESCE(CAST(SUM(CAST(r.rc AS DECIMAL(19,0))
                           * CAST(c.cc AS DECIMAL(19,0)))
                       AS DECIMAL(38,0)), CAST(0 AS DECIMAL(38,0))) AS pe_num
  FROM (SELECT a AS cat, COUNT(*)::BIGINT AS rc FROM __l GROUP BY a) r
  JOIN (SELECT b AS cat, COUNT(*)::BIGINT AS cc FROM __l GROUP BY b) c
    ON r.cat = c.cat
)
SELECT d.n, d.agree,
       CAST(CAST(CAST(CAST((CASE WHEN d.n > 0
         THEN CAST(d.agree AS DOUBLE) / CAST(d.n AS DOUBLE) END) * CAST(ABS(CASE WHEN d.n > 0
         THEN CAST(d.agree AS DOUBLE) / CAST(d.n AS DOUBLE) END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS po,
       CAST(CAST(CAST(CAST((CASE WHEN d.n > 0
         THEN CAST(CAST(p.pe_num AS VARCHAR) AS DOUBLE)
              / (CAST(d.n AS DOUBLE) * CAST(d.n AS DOUBLE)) END) * CAST(ABS(CASE WHEN d.n > 0
         THEN CAST(CAST(p.pe_num AS VARCHAR) AS DOUBLE)
              / (CAST(d.n AS DOUBLE) * CAST(d.n AS DOUBLE)) END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS pe,
       CAST(CAST(CAST(CAST((CASE WHEN d.n > 0 AND CAST(CAST(p.pe_num AS VARCHAR) AS DOUBLE)
                  / (CAST(d.n AS DOUBLE) * CAST(d.n AS DOUBLE)) < 1.0
         THEN (CAST(d.agree AS DOUBLE) / CAST(d.n AS DOUBLE)
               - CAST(CAST(p.pe_num AS VARCHAR) AS DOUBLE)
                 / (CAST(d.n AS DOUBLE) * CAST(d.n AS DOUBLE)))
              / (1.0 - CAST(CAST(p.pe_num AS VARCHAR) AS DOUBLE)
                 / (CAST(d.n AS DOUBLE) * CAST(d.n AS DOUBLE))) END) * CAST(ABS(CASE WHEN d.n > 0 AND CAST(CAST(p.pe_num AS VARCHAR) AS DOUBLE)
                  / (CAST(d.n AS DOUBLE) * CAST(d.n AS DOUBLE)) < 1.0
         THEN (CAST(d.agree AS DOUBLE) / CAST(d.n AS DOUBLE)
               - CAST(CAST(p.pe_num AS VARCHAR) AS DOUBLE)
                 / (CAST(d.n AS DOUBLE) * CAST(d.n AS DOUBLE)))
              / (1.0 - CAST(CAST(p.pe_num AS VARCHAR) AS DOUBLE)
                 / (CAST(d.n AS DOUBLE) * CAST(d.n AS DOUBLE))) END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS kappa
FROM __diag d CROSS JOIN __pe p
"""


# ---------------------------------------------------------------------------
# Calibration (reliability bins) and the deterministic Poisson bootstrap
# ---------------------------------------------------------------------------

# Poisson(1) CDF thresholds for k = 0..7 (resamples beyond 8 are cut:
# P(X > 8) ~ 1.1e-7, a deterministic, documented truncation). Computed
# once in Python and emitted as literals so neither engine runs exp().
_POIS1_CDF = []
_term = 1.0
_acc = 0.0
for _k in range(8):
    _acc += _term
    _POIS1_CDF.append(round(_acc * 0.36787944117144233, 12))  # e^-1
    _term /= _k + 1
_SCALE32 = float(1 << 32)


def calibration_bins(
    df: DataFrame,
    prob_col: str,
    pos_pred: Column,
    bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a predicted probability against a
    binary outcome (Naeini AAAI'15 ECE binning). Output per non-empty
    bin: ``(bin, n, conf, acc, gap)`` where conf = mean predicted
    probability (exact decimal sum of (18,6)-quantized probs), acc =
    positive rate, gap = |acc - conf|. One hash aggregation on the bin
    key — the scan-shaped calibration readout.

    Outputs are deliberately UNROUNDED: every input to the final
    divisions is exact (decimal sums / integer counts), so the doubles
    are bit-identical across engines as-is — while a final ROUND would
    reintroduce divergence, because exact-decimal pipelines frequently
    land on decimal ties where Spark's HALF_UP and DuckDB's
    binary-value rounding disagree (observed on the Brier score)."""
    if not 2 <= int(bins) <= 10_000:
        raise ValueError(f"need 2 <= bins <= 10000, got {bins}")
    bins = int(bins)
    p = F.col(prob_col).cast("double")
    y = F.when(pos_pred, F.lit(1)).otherwise(F.lit(0))
    binc = F.least(
        F.floor(p * F.lit(float(bins))).cast("long"), F.lit(bins - 1)
    )
    base = df.where(
        p.isNotNull() & (p >= 0.0) & (p <= 1.0) & pos_pred.isNotNull()
    )
    agg = (
        base.select(binc.alias("bin"), p.alias("__p"), y.alias("__y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(_q6(F.col("__p")).cast(_MOMENT))
            .cast(_MOMENT)
            .alias("__sp"),
            F.sum("__y").cast("long").alias("__pos"),
        )
    )
    conf = _div(_d2d(F.col("__sp")), F.col("n").cast("double"))
    acc = _div(F.col("__pos").cast("double"), F.col("n").cast("double"))
    return agg.select(
        "bin",
        "n",
        conf.alias("conf"),
        acc.alias("acc"),
        F.abs(acc - conf).alias("gap"),
    ).orderBy("bin")


def calibration_bins_sql(
    table: str,
    prob_sql: str,
    pos_pred_sql: str,
    bins: int = 10,
) -> str:
    if not 2 <= int(bins) <= 10_000:
        raise ValueError(f"need 2 <= bins <= 10000, got {bins}")
    bins = int(bins)
    return f"""
WITH __b AS (
  SELECT LEAST(CAST(floor(CAST({prob_sql} AS DOUBLE) * {float(bins)})
               AS BIGINT), {bins - 1}) AS bin,
         CAST(CAST(CAST({prob_sql} AS DOUBLE) AS VARCHAR)
              AS DECIMAL(18,6)) AS p,
         CASE WHEN {pos_pred_sql} THEN 1 ELSE 0 END AS y
  FROM {table}
  WHERE CAST({prob_sql} AS DOUBLE) BETWEEN 0.0 AND 1.0
    AND ({pos_pred_sql}) IS NOT NULL
),
__g AS (
  SELECT bin, COUNT(*)::BIGINT AS n,
         CAST(SUM(CAST(p AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sp,
         SUM(y)::BIGINT AS pos
  FROM __b GROUP BY bin
)
SELECT bin, n,
       CAST(CAST(sp AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS conf,
       CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS acc,
       abs(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)
           - CAST(CAST(sp AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)) AS gap
FROM __g ORDER BY bin
"""


def calibration_summary(
    df: DataFrame,
    prob_col: str,
    pos_pred: Column,
    bins: int = 10,
) -> DataFrame:
    """One-row ECE / MCE / Brier score. Uses the identity
    ``ECE = Σ_b (n_b/N)·|pos_b/n_b - sp_b/n_b| = Σ_b |pos_b - sp_b| / N``
    so the ECE numerator is an EXACT decimal sum (pos integer, sp an
    exact (18,6)-quantized sum); MCE = max per-bin gap; Brier = mean
    (p₆ - y)², also an exact decimal sum. Outputs are unrounded — see
    calibration_bins for why rounding would *hurt* parity here. Exactness
    of the double casts holds while per-bin decimal magnitudes stay under
    2^53 · 10⁻¹² (~9e3 in sum units) — far above any realistic bin."""
    if not 2 <= int(bins) <= 10_000:
        raise ValueError(f"need 2 <= bins <= 10000, got {bins}")
    bins = int(bins)
    p = F.col(prob_col).cast("double")
    y = F.when(pos_pred, F.lit(1)).otherwise(F.lit(0))
    binc = F.least(
        F.floor(p * F.lit(float(bins))).cast("long"), F.lit(bins - 1)
    )
    base = df.where(
        p.isNotNull() & (p >= 0.0) & (p <= 1.0) & pos_pred.isNotNull()
    )
    p6 = _q6(p)
    # re-cast the difference to (18,6) before squaring: add/sub widens
    # precision to 19, and a (19,6) square would re-trigger Spark's
    # scale reduction; the diff is in [-1, 1] so the cast is exact
    d6 = (p6 - y.cast(_VAL_DEC)).cast(_VAL_DEC)
    sq = (d6 * d6).cast(_MOMENT)
    g = (
        base.select(
            binc.alias("bin"), p6.alias("__p"), y.alias("__y"), sq.alias("__sq")
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum(F.col("__p").cast(_MOMENT)).cast(_MOMENT).alias("__sp"),
            F.sum("__y").cast("long").alias("__pos"),
            F.sum("__sq").cast(_MOMENT).alias("__sqs"),
        )
    )
    gap = F.abs(
        _div(F.col("__pos").cast("double"), F.col("__n").cast("double"))
        - _div(_d2d(F.col("__sp")), F.col("__n").cast("double"))
    )
    ece_term = F.abs(
        (F.col("__pos").cast(_VAL_DEC).cast(_MOMENT) - F.col("__sp")).cast(
            _MOMENT
        )
    )
    return g.agg(
        F.sum("__n").cast("long").alias("n"),
        _div(
            _d2d(F.sum(ece_term).cast(_MOMENT)),
            F.sum("__n").cast("double"),
        ).alias("ece"),
        F.max(gap).alias("mce"),
        _div(
            _d2d(F.sum("__sqs").cast(_MOMENT)),
            F.sum("__n").cast("double"),
        ).alias("brier"),
    )


def calibration_summary_sql(
    table: str,
    prob_sql: str,
    pos_pred_sql: str,
    bins: int = 10,
) -> str:
    if not 2 <= int(bins) <= 10_000:
        raise ValueError(f"need 2 <= bins <= 10000, got {bins}")
    bins = int(bins)
    return f"""
WITH __b AS (
  SELECT LEAST(CAST(floor(CAST({prob_sql} AS DOUBLE) * {float(bins)})
               AS BIGINT), {bins - 1}) AS bin,
         CAST(CAST(CAST({prob_sql} AS DOUBLE) AS VARCHAR)
              AS DECIMAL(18,6)) AS p,
         CASE WHEN {pos_pred_sql} THEN 1 ELSE 0 END AS y
  FROM {table}
  WHERE CAST({prob_sql} AS DOUBLE) BETWEEN 0.0 AND 1.0
    AND ({pos_pred_sql}) IS NOT NULL
),
__g AS (
  SELECT bin, COUNT(*)::BIGINT AS n,
         CAST(SUM(CAST(p AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sp,
         SUM(y)::BIGINT AS pos,
         CAST(SUM(CAST(CAST(p - CAST(y AS DECIMAL(18,6)) AS DECIMAL(18,6))
                            AS DECIMAL(19,6))
                       * CAST(CAST(p - CAST(y AS DECIMAL(18,6))
                                   AS DECIMAL(18,6)) AS DECIMAL(19,6)))
              AS DECIMAL(38,12)) AS sqs
  FROM __b GROUP BY bin
)
SELECT SUM(n)::BIGINT AS n,
       CAST(CAST(CAST(SUM(CAST(abs(CAST(CAST(pos AS DECIMAL(18,6))
                                        AS DECIMAL(38,12)) - sp)
                               AS DECIMAL(38,12))) AS DECIMAL(38,12))
                 AS VARCHAR) AS DOUBLE)
         / CAST(SUM(n) AS DOUBLE) AS ece,
       MAX(abs(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)
               - CAST(CAST(sp AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)))
         AS mce,
       CAST(CAST(CAST(SUM(sqs) AS DECIMAL(38,12)) AS VARCHAR) AS DOUBLE)
         / CAST(SUM(n) AS DOUBLE) AS brier
FROM __g
"""


def _poisson_case_sql(u_sql: str) -> str:
    whens = " ".join(
        f"WHEN {u_sql} < {c!r} THEN {k}" for k, c in enumerate(_POIS1_CDF)
    )
    return f"(CASE {whens} ELSE 8 END)"


def _poisson_case(u: Column) -> Column:
    out = F.lit(8)
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        out = F.when(u < F.lit(_POIS1_CDF[k]), F.lit(k)).otherwise(out)
    return out


def bootstrap_mean_ci(
    df: DataFrame,
    id_col: str,
    value_col: str,
    b: int = 200,
    alpha: float = 0.05,
    salt: str = "boot",
    round_to: int = 9,
) -> DataFrame:
    """One-row percentile-bootstrap CI for the mean of ``value_col`` via
    the Poisson bootstrap (Chamandy et al., Google 2012: resample weights
    ~ Poisson(1) instead of multinomial, so each row's weight in each
    replicate is a pure per-row draw — no global coordination). Output
    ``(n, b, est_mean, ci_lo, ci_hi)``.

    Determinism: ONE md5 per row (``id:salt``) yields two 32-bit words
    (h1, h2); the replicate-``i`` uniform is ``((h1 + i·h2) mod 2^32) /
    2^32`` — the Kirsch-Mitzenmacher double-hash the MinHash operator
    already uses, so the per-(row, replicate) draw costs integer
    arithmetic, not a hash (measured 32 s → ~3 s at sf0.1, b=200).
    The uniform inverts Poisson(1) CDF literals precomputed in Python —
    no randomness, no exp(), bit-equal across engines, replay-stable.
    CI bounds are pure order statistics of the replicate means (rank
    ``ceil(alpha/2·b)`` from each end) — no quantile interpolation to
    diverge on. CONTRACT: ``id_col`` must be unique per row — duplicate
    ids draw identical weights in every replicate, silently narrowing
    the resample space.

    Scale: the replicate explosion is map-side (b× CPU, not b× shuffle:
    partial aggregation reduces the shuffle to b rows per partition);
    the final window orders b rows. Cost grows linearly in b — 100-500
    replicates is the standard range."""
    b = int(b)
    if b < 2:
        raise ValueError(f"need b >= 2 replicates, got {b}")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"need 0 < alpha < 1, got {alpha}")
    if alpha / 2.0 * b < 1.0:
        raise ValueError(
            f"b={b} cannot resolve alpha={alpha}: need b >= 2/alpha "
            f"({math.ceil(2.0 / alpha)}) replicates"
        )
    m = math.ceil(alpha / 2.0 * b)
    if 2 * m > b:
        raise ValueError(f"b={b} too small for alpha={alpha}")
    rep = F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("__r")
    # one md5 per ROW; replicate draws derive arithmetically (h1 + r*h2)
    key = F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
    md5 = F.md5(key)
    h1 = F.conv(F.substring(md5, 1, 8), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(md5, 9, 8), 16, 10).cast("bigint")
    u = (
        (F.col("__h1") + F.col("__r") * F.col("__h2")) % F.lit(1 << 32)
    ).cast("double") / F.lit(_SCALE32)
    w = _poisson_case(u)
    # x quantizes to integer MICRO-units through the text-hop quantum
    # (the same _q6 every other operator uses — review finding: the SQL
    # twin's former ROUND(v*1e6) disagreed with the decimal cast on
    # ~0.5% of 7-digit inputs): weighted sums are then plain BIGINT
    # aggregation in whole-stage codegen. Magnitude contract:
    # sum(|x|)*8e6 per replicate must fit BIGINT (~1.15e12 in value
    # units) — sub-sample first if a replicate sums past that.
    xu = (_q6(F.col(value_col)) * F.lit(1_000_000)).cast("long")
    base = df.where(F.col(value_col).isNotNull())
    reps = (
        base.select(h1.alias("__h1"), h2.alias("__h2"), xu.alias("__xu"))
        .select("__h1", "__h2", "__xu", rep)
        .select(
            "__r",
            (w.cast("long") * F.col("__xu")).alias("__wx"),
            w.cast("long").alias("__w"),
        )
        .groupBy("__r")
        .agg(
            F.sum("__wx").cast("long").alias("__swx"),
            F.sum("__w").cast("long").alias("__sw"),
        )
        .where(F.col("__sw") > 0)
        .select(
            "__r",
            _div(
                F.col("__swx").cast("double"),
                F.col("__sw").cast("double") * F.lit(1e6),
            ).alias("__mean"),
        )
    )
    # order statistics over the SURVIVING replicates: with tiny n a
    # replicate can draw all-zero weights (P = e^-n each) and drop, so
    # the percentile ranks recompute against the survivor count instead
    # of misaligning (ci_lo) or going silently NULL (ci_hi) against b
    wnd = Window.orderBy(F.col("__mean").asc(), F.col("__r").asc())
    nb_w = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = (
        reps.withColumn("__rn", F.row_number().over(wnd))
        .withColumn("__nb", F.count(F.lit(1)).over(nb_w))
        .withColumn(
            "__lo",
            F.greatest(
                F.lit(1).cast("long"),
                F.ceil(F.lit(alpha / 2.0) * F.col("__nb")).cast("long"),
            ),
        )
    )
    ci = ranked.agg(
        F.round(
            F.min(F.when(F.col("__rn") == F.col("__lo"), F.col("__mean"))),
            round_to,
        ).alias("ci_lo"),
        F.round(
            F.min(
                F.when(
                    F.col("__rn") == F.col("__nb") + 1 - F.col("__lo"),
                    F.col("__mean"),
                )
            ),
            round_to,
        ).alias("ci_hi"),
    )
    xdec = _q6(F.col(value_col))
    est = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            _div(
                _d2d(F.sum(xdec.cast(_MOMENT)).cast(_MOMENT)),
                F.count(F.lit(1)).cast("double"),
            ),
            round_to,
        ).alias("est_mean"),
    )
    return est.crossJoin(F.broadcast(ci)).select(
        "n",
        F.lit(b).cast("long").alias("b"),
        "est_mean",
        "ci_lo",
        "ci_hi",
    )


def bootstrap_mean_ci_sql(
    table: str,
    id_col: str,
    value_sql: str,
    b: int = 200,
    alpha: float = 0.05,
    salt: str = "boot",
    round_to: int = 9,
) -> str:
    b = int(b)
    if b < 2:
        raise ValueError(f"need b >= 2 replicates, got {b}")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"need 0 < alpha < 1, got {alpha}")
    if alpha / 2.0 * b < 1.0:
        raise ValueError(
            f"b={b} cannot resolve alpha={alpha}: need b >= 2/alpha "
            f"({math.ceil(2.0 / alpha)}) replicates"
        )
    m = math.ceil(alpha / 2.0 * b)
    if 2 * m > b:
        raise ValueError(f"b={b} too small for alpha={alpha}")
    # h1/h2/u materialize through CTE stages so the md5 runs once per
    # row and the uniform once per draw — interpolating u into the
    # 8-branch Poisson CASE would otherwise re-evaluate it per WHEN
    h = f"md5(CAST({id_col} AS VARCHAR) || ':{salt}')"
    q6v = _q6_sql(value_sql)
    w = _poisson_case_sql("u")
    return f"""
WITH __rows AS (
  SELECT CAST(CAST({q6v} AS DECIMAL(19,6)) * 1000000 AS BIGINT) AS xu,
         ('0x' || substr({h}, 1, 8))::BIGINT AS h1,
         ('0x' || substr({h}, 9, 8))::BIGINT AS h2
  FROM {table} WHERE ({value_sql}) IS NOT NULL
),
__draws AS (
  SELECT r.__r, xu,
         CAST((h1 + r.__r * h2) % {1 << 32} AS DOUBLE) / {_SCALE32!r} AS u
  FROM __rows CROSS JOIN (SELECT unnest(range({b})) AS __r) r
),
__weighted AS (
  SELECT __r, xu, {w} AS w FROM __draws
),
__reps AS (
  SELECT __r,
         CAST(SUM(CAST(w AS BIGINT) * xu) AS BIGINT) AS swx,
         SUM(w)::BIGINT AS sw
  FROM __weighted
  GROUP BY __r
),
__means AS (
  SELECT __r,
         CAST(swx AS DOUBLE) / (CAST(sw AS DOUBLE) * 1e6) AS m,
         row_number() OVER (ORDER BY CAST(swx AS DOUBLE)
                            / (CAST(sw AS DOUBLE) * 1e6) ASC, __r ASC) AS rn
  FROM __reps WHERE sw > 0
),
__ranksrc AS (
  SELECT *, COUNT(*) OVER () AS nb,
         GREATEST(1, CAST(ceil({alpha / 2.0} * (COUNT(*) OVER ()))
                     AS BIGINT)) AS lo
  FROM __means
),
__ci AS (
  SELECT CASE WHEN ABS(MIN(CASE WHEN rn = lo THEN m END)) >= 1e16 THEN CAST((MIN(CASE WHEN rn = lo THEN m END)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((MIN(CASE WHEN rn = lo THEN m END)) * CAST(ABS(MIN(CASE WHEN rn = lo THEN m END)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS ci_lo,
         CASE WHEN ABS(MIN(CASE WHEN rn = nb + 1 - lo THEN m END)) >= 1e16 THEN CAST((MIN(CASE WHEN rn = nb + 1 - lo THEN m END)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((MIN(CASE WHEN rn = nb + 1 - lo THEN m END)) * CAST(ABS(MIN(CASE WHEN rn = nb + 1 - lo THEN m END)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END
           AS ci_hi
  FROM __ranksrc
),
__est AS (
  SELECT COUNT(*)::BIGINT AS n,
         CAST(CAST(CAST(CAST((CAST(CAST(CAST(SUM(CAST({q6v} AS DECIMAL(38,12)))
                    AS DECIMAL(38,12)) AS VARCHAR) AS DOUBLE)
               / COUNT(*)) * CAST(ABS(CAST(CAST(CAST(SUM(CAST({q6v} AS DECIMAL(38,12)))
                    AS DECIMAL(38,12)) AS VARCHAR) AS DOUBLE)
               / COUNT(*)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS est_mean
  FROM {table} WHERE ({value_sql}) IS NOT NULL
)
SELECT e.n, CAST({b} AS BIGINT) AS b, e.est_mean, c.ci_lo, c.ci_hi
FROM __est e CROSS JOIN __ci c
"""


# ---------------------------------------------------------------------------
# Categorical association and the multi-arm experiment readout
# ---------------------------------------------------------------------------


def chi2_independence(
    df: DataFrame,
    a_col: Column,
    b_col: Column,
) -> DataFrame:
    """One-row chi-squared test of independence between two categorical
    columns plus Cramér's V effect size. Output
    ``(n, r, c, dof, chi2, cramers_v)``.

    Uses the margin identity ``chi2 = n·(Σ_ij o_ij²/(r_i·c_j) − 1)`` so
    the plan is: one contingency aggregation + two margin aggregations +
    equi-joins on the category keys — never a cells×cells anything. The
    per-cell ratio is quantized to DECIMAL(38,12) via the text hop
    (the ``_q6`` convention at 12 dp — direct double ROUND rounds
    HALF_UP on the shortest repr in Spark but on the binary value in
    DuckDB, a 1-ulp tie hazard) and accumulated in DECIMAL, so the sum
    is partition-order independent AND engine-identical. The 12-dp
    quantization can still push Σ a hair below 1 on exactly-independent
    tables (e.g. contingency [[1,2],[2,4]]), so chi2 is clamped at 0
    before the Cramér sqrt — independence reports 0, never −eps/NaN.
    NULL statistics when either variable is constant (dof = 0). Rows
    with NULL in either column are excluded."""
    labeled = (
        df.select(a_col.alias("__a"), b_col.alias("__b"))
        .where(F.col("__a").isNotNull() & F.col("__b").isNotNull())
    )
    cells = labeled.groupBy("__a", "__b").agg(
        F.count(F.lit(1)).cast("long").alias("__o")
    )
    ra = labeled.groupBy("__a").agg(F.count(F.lit(1)).cast("long").alias("__r"))
    cb = labeled.groupBy("__b").agg(F.count(F.lit(1)).cast("long").alias("__c"))
    term = (
        _div(
            F.col("__o").cast("double") * F.col("__o").cast("double"),
            F.col("__r").cast("double") * F.col("__c").cast("double"),
        )
        .cast("string")
        .cast(_MOMENT)
    )
    sums = (
        cells.join(ra, "__a")
        .join(cb, "__b")
        .agg(
            F.sum("__o").cast("long").alias("n"),
            F.count_distinct("__a").cast("long").alias("r"),
            F.count_distinct("__b").cast("long").alias("c"),
            F.sum(term).cast(_MOMENT).alias("__t"),
        )
    )
    dof = (F.col("r") - 1) * (F.col("c") - 1)
    chi2 = F.greatest(
        F.col("n").cast("double") * (_d2d(F.col("__t")) - F.lit(1.0)),
        F.lit(0.0),
    )
    mind = F.least(F.col("r"), F.col("c")) - 1
    v = F.sqrt(
        _div(chi2, F.col("n").cast("double") * mind.cast("double"))
    )
    ok = (F.col("n") > 0) & (dof > 0)
    return sums.select(
        "n",
        "r",
        "c",
        dof.cast("long").alias("dof"),
        F.when(ok, chi2).alias("chi2"),
        F.when(ok, v).alias("cramers_v"),
    )


def chi2_independence_sql(table: str, a_sql: str, b_sql: str) -> str:
    return f"""
WITH __l AS (
  SELECT {a_sql} AS a, {b_sql} AS b FROM {table}
  WHERE ({a_sql}) IS NOT NULL AND ({b_sql}) IS NOT NULL
),
__cells AS (
  SELECT a, b, COUNT(*)::BIGINT AS o FROM __l GROUP BY a, b
),
__ra AS (SELECT a, COUNT(*)::BIGINT AS r FROM __l GROUP BY a),
__cb AS (SELECT b, COUNT(*)::BIGINT AS c FROM __l GROUP BY b),
__s AS (
  SELECT SUM(o)::BIGINT AS n,
         COUNT(DISTINCT cl.a)::BIGINT AS r,
         COUNT(DISTINCT cl.b)::BIGINT AS c,
         CAST(SUM(CAST(CAST(
           (CAST(o AS DOUBLE) * CAST(o AS DOUBLE))
           / (CAST(ra.r AS DOUBLE) * CAST(cb.c AS DOUBLE)) AS VARCHAR)
           AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS t
  FROM __cells cl JOIN __ra ra ON cl.a = ra.a JOIN __cb cb ON cl.b = cb.b
),
__x AS (
  SELECT n, r, c,
         GREATEST(CAST(n AS DOUBLE)
                  * (CAST(CAST(t AS VARCHAR) AS DOUBLE) - 1.0), 0.0) AS chi2
  FROM __s
)
SELECT n, r, c,
       CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
       CASE WHEN n > 0 AND (r - 1) * (c - 1) > 0 THEN chi2 END AS chi2,
       CASE WHEN n > 0 AND (r - 1) * (c - 1) > 0 THEN
         sqrt(chi2 / (CAST(n AS DOUBLE) * CAST(LEAST(r, c) - 1 AS DOUBLE))) END
         AS cramers_v
FROM __x
"""


def experiment_readout(
    df: DataFrame,
    variant_col: str,
    success_pred: Column,
    control: str,
) -> DataFrame:
    """Per-variant experiment table: each arm vs the named control, via
    the pooled two-proportion z (the multi-arm generalization of
    two_proportion_z). Output per variant (control row included with
    NULL lift/z): ``(variant, n, s, rate, lift, z_vs_control)`` ordered
    by variant. Control presence is data-dependent, so it cannot raise
    at plan-build time; a missing control arm yields NULL lift/z on
    every row (left join against the empty control frame) — visible,
    never a silent wrong baseline.

    Scale: one group-by on the variant key + a 1-row broadcast of the
    control arm — variants are dimension-sized by construction."""
    arms = (
        df.where(F.col(variant_col).isNotNull())
        .groupBy(F.col(variant_col).alias("variant"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(success_pred, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias("s"),
        )
    )
    ctl = (
        arms.where(F.col("variant") == control)
        .select(
            F.col("n").alias("__nc"),
            F.col("s").alias("__sc"),
        )
    )
    # LEFT join on TRUE, not crossJoin: an absent control arm must keep
    # every variant row (with NULL stats), not produce an empty result
    j = arms.join(F.broadcast(ctl), F.lit(True), "left")
    n, s = F.col("n").cast("double"), F.col("s").cast("double")
    nc, sc = F.col("__nc").cast("double"), F.col("__sc").cast("double")
    rate = _div(s, n)
    rc = _div(sc, nc)
    pp = _div(s + sc, n + nc)
    se2 = pp * (F.lit(1.0) - pp) * (_div(F.lit(1.0), n) + _div(F.lit(1.0), nc))
    is_ctl = F.col("variant") == control
    return j.select(
        "variant",
        "n",
        "s",
        rate.alias("rate"),
        F.when(~is_ctl, rate - rc).alias("lift"),
        F.when(~is_ctl & (se2 > 0), _div(rate - rc, F.sqrt(se2))).alias(
            "z_vs_control"
        ),
    ).orderBy("variant")


def experiment_readout_sql(
    table: str, variant_sql: str, success_pred_sql: str, control: str
) -> str:
    ctl = control.replace("'", "''")
    return f"""
WITH __arms AS (
  SELECT {variant_sql} AS variant, COUNT(*)::BIGINT AS n,
         SUM(CASE WHEN {success_pred_sql} THEN 1 ELSE 0 END)::BIGINT AS s
  FROM {table} WHERE ({variant_sql}) IS NOT NULL
  GROUP BY variant
),
__ctl AS (SELECT n AS nc, s AS sc FROM __arms WHERE variant = '{ctl}'),
__j AS (SELECT a.*, c.nc, c.sc FROM __arms a LEFT JOIN __ctl c ON TRUE)
SELECT variant, n, s,
       CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
       CASE WHEN variant <> '{ctl}' THEN
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
         - CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE) END AS lift,
       CASE WHEN variant <> '{ctl}'
             AND (CAST(s + sc AS DOUBLE) / CAST(n + nc AS DOUBLE))
                 * (1.0 - CAST(s + sc AS DOUBLE) / CAST(n + nc AS DOUBLE))
                 * (1.0 / CAST(n AS DOUBLE) + 1.0 / CAST(nc AS DOUBLE)) > 0
       THEN (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
             - CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE))
            / sqrt((CAST(s + sc AS DOUBLE) / CAST(n + nc AS DOUBLE))
                   * (1.0 - CAST(s + sc AS DOUBLE) / CAST(n + nc AS DOUBLE))
                   * (1.0 / CAST(n AS DOUBLE) + 1.0 / CAST(nc AS DOUBLE)))
       END AS z_vs_control
FROM __j ORDER BY variant
"""


# ---------------------------------------------------------------------------
# CUPED variance-reduced A/B readout
# ---------------------------------------------------------------------------


def _joint_moments(x: Column, y: Column, in_arm: Column) -> list[Column]:
    """n / Σx / Σy / Σxy / Σx² / Σy² for one arm as conditional exact-
    decimal aggregates ((18,6) operands — squares exact, see module
    note)."""
    xa = _q6(F.when(in_arm, x))
    ya = _q6(F.when(in_arm, y))
    return [
        F.count(ya).cast("long"),
        F.sum(xa.cast(_MOMENT)).cast(_MOMENT),
        F.sum(ya.cast(_MOMENT)).cast(_MOMENT),
        F.sum((xa * ya).cast(_MOMENT)).cast(_MOMENT),
        F.sum((xa * xa).cast(_MOMENT)).cast(_MOMENT),
        F.sum((ya * ya).cast(_MOMENT)).cast(_MOMENT),
    ]


def cuped_ttest(
    df: DataFrame,
    x_col: str,
    y_col: str,
    a_pred: Column,
    b_pred: Column,
) -> DataFrame:
    """One-row CUPED-adjusted Welch t test (Deng et al. WSDM'13):
    variance-reduce the metric ``y`` with pre-experiment covariate ``x``
    before comparing arm A to arm B. Output ``(n_a, n_b, theta,
    mean_a_adj, mean_b_adj, t_adj, dof_adj, var_reduction)``.

    Everything is CLOSED FORM from per-arm joint moment sums — the
    adjusted metric ``y − θ(x − x̄)`` is never materialized per row
    (which would inject order-dependent float sums): θ is the pooled
    cov(x,y)/var(x); adjusted arm means and sample variances come from
    the same six sums via
    ``var(y − θx) = [Σy² − 2θΣxy + θ²Σx² − (Σy − θΣx)²/n]/(n−1)``;
    var_reduction is pooled ρ²(x, y) — the fraction of metric variance
    the covariate removes. One conditional aggregation over the scan.
    NULL statistics when either arm has n < 2 or pooled var(x) is 0.
    Rows with NULL x or y are excluded (impute x upstream — e.g.
    COALESCE to 0 for units with no pre-period)."""
    xd = F.col(x_col).cast("double")
    yd = F.col(y_col).cast("double")
    base = df.where(xd.isNotNull() & yd.isNotNull())
    a = _joint_moments(xd, yd, a_pred)
    b = _joint_moments(xd, yd, b_pred)
    names_a = ["n_a", "__xa", "__ya", "__xya", "__xxa", "__yya"]
    names_b = ["n_b", "__xb", "__yb", "__xyb", "__xxb", "__yyb"]
    agg = base.agg(
        *[c.alias(nm) for c, nm in zip(a, names_a)],
        *[c.alias(nm) for c, nm in zip(b, names_b)],
    )
    # string-hop for every moment column (decimal OR bigint: both parse
    # exactly); see _d2d
    d = lambda c: _d2d(F.col(c))  # noqa: E731
    n = d("n_a") + d("n_b")
    sx = d("__xa") + d("__xb")
    sy = d("__ya") + d("__yb")
    sxy = d("__xya") + d("__xyb")
    sxx = d("__xxa") + d("__xxb")
    syy = d("__yya") + d("__yyb")
    vxy = n * sxy - sx * sy
    vxx = n * sxx - sx * sx
    vyy = n * syy - sy * sy
    theta = _div(vxy, vxx)
    rho2 = _div(vxy * vxy, vxx * vyy)
    xbar = _div(sx, n)

    def arm(nc, sxc, syc, sxyc, sxxc, syyc):
        nn = d(nc)
        mean_adj = _div(d(syc) - theta * d(sxc), nn) + theta * xbar
        var_adj = _div(
            d(syyc)
            - F.lit(2.0) * theta * d(sxyc)
            + theta * theta * d(sxxc)
            - _div(
                (d(syc) - theta * d(sxc)) * (d(syc) - theta * d(sxc)), nn
            ),
            nn - F.lit(1.0),
        )
        return mean_adj, var_adj

    ma, va = arm("n_a", "__xa", "__ya", "__xya", "__xxa", "__yya")
    mb, vb = arm("n_b", "__xb", "__yb", "__xyb", "__xxb", "__yyb")
    se2 = _div(va, d("n_a")) + _div(vb, d("n_b"))
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (vxx > 0)
    t = F.when(ok & (se2 > 0), _div(ma - mb, F.sqrt(se2)))
    dof = F.when(
        ok & (se2 > 0),
        _div(
            se2 * se2,
            _div(
                _div(va, d("n_a")) * _div(va, d("n_a")), d("n_a") - F.lit(1.0)
            )
            + _div(
                _div(vb, d("n_b")) * _div(vb, d("n_b")), d("n_b") - F.lit(1.0)
            ),
        ),
    )
    return agg.select(
        "n_a",
        "n_b",
        F.when(ok, theta).alias("theta"),
        F.when(ok, ma).alias("mean_a_adj"),
        F.when(ok, mb).alias("mean_b_adj"),
        t.alias("t_adj"),
        dof.alias("dof_adj"),
        F.when(ok & (vyy > 0), rho2).alias("var_reduction"),
    )


def cuped_ttest_sql(
    table: str,
    x_sql: str,
    y_sql: str,
    a_pred_sql: str,
    b_pred_sql: str,
) -> str:
    def arm_sums(pred: str, tag: str) -> str:
        xa = _q6_sql(f"CASE WHEN {pred} THEN CAST({x_sql} AS DOUBLE) END")
        ya = _q6_sql(f"CASE WHEN {pred} THEN CAST({y_sql} AS DOUBLE) END")
        m = "DECIMAL(38,12)"
        # (19,6) widening before products: DuckDB's (18,6)x(18,6) int64
        # fast path overflows at runtime on summed magnitudes (values
        # unchanged; Spark keeps (18,6) -- see welch_t_sql note)
        xw = f"CAST({xa} AS DECIMAL(19,6))"
        yw = f"CAST({ya} AS DECIMAL(19,6))"
        return (
            f"COUNT({ya})::BIGINT AS n_{tag},\n"
            f"         CAST(SUM(CAST({xa} AS {m})) AS {m}) AS x_{tag},\n"
            f"         CAST(SUM(CAST({ya} AS {m})) AS {m}) AS y_{tag},\n"
            f"         CAST(SUM({xw} * {yw}) AS {m}) AS xy_{tag},\n"
            f"         CAST(SUM({xw} * {xw}) AS {m}) AS xx_{tag},\n"
            f"         CAST(SUM({yw} * {yw}) AS {m}) AS yy_{tag}"
        )

    return f"""
WITH __m AS (
  SELECT {arm_sums(a_pred_sql, 'a')},
         {arm_sums(b_pred_sql, 'b')}
  FROM {table}
  WHERE ({x_sql}) IS NOT NULL AND ({y_sql}) IS NOT NULL
),
__p AS (
  SELECT n_a, n_b,
         CAST(n_a + n_b AS DOUBLE) AS n,
         CAST(CAST(x_a AS VARCHAR) AS DOUBLE) + CAST(CAST(x_b AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(y_a AS VARCHAR) AS DOUBLE) + CAST(CAST(y_b AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(xy_a AS VARCHAR) AS DOUBLE) + CAST(CAST(xy_b AS VARCHAR) AS DOUBLE) AS sxy,
         CAST(CAST(xx_a AS VARCHAR) AS DOUBLE) + CAST(CAST(xx_b AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(yy_a AS VARCHAR) AS DOUBLE) + CAST(CAST(yy_b AS VARCHAR) AS DOUBLE) AS syy,
         CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
         CAST(CAST(x_a AS VARCHAR) AS DOUBLE) AS xa, CAST(CAST(y_a AS VARCHAR) AS DOUBLE) AS ya,
         CAST(CAST(xy_a AS VARCHAR) AS DOUBLE) AS xya, CAST(CAST(xx_a AS VARCHAR) AS DOUBLE) AS xxa,
         CAST(CAST(yy_a AS VARCHAR) AS DOUBLE) AS yya,
         CAST(CAST(x_b AS VARCHAR) AS DOUBLE) AS xb, CAST(CAST(y_b AS VARCHAR) AS DOUBLE) AS yb,
         CAST(CAST(xy_b AS VARCHAR) AS DOUBLE) AS xyb, CAST(CAST(xx_b AS VARCHAR) AS DOUBLE) AS xxb,
         CAST(CAST(yy_b AS VARCHAR) AS DOUBLE) AS yyb
  FROM __m
),
__t AS (
  SELECT *,
         n * sxy - sx * sy AS vxy,
         n * sxx - sx * sx AS vxx,
         n * syy - sy * sy AS vyy
  FROM __p
),
__adj AS (
  SELECT *,
         (vxy / vxx) AS theta,
         (ya - (vxy / vxx) * xa) / na + (vxy / vxx) * (sx / n) AS ma,
         (yb - (vxy / vxx) * xb) / nb + (vxy / vxx) * (sx / n) AS mb,
         (yya - 2.0 * (vxy / vxx) * xya + (vxy / vxx) * (vxy / vxx) * xxa
          - (ya - (vxy / vxx) * xa) * (ya - (vxy / vxx) * xa) / na)
           / (na - 1.0) AS va,
         (yyb - 2.0 * (vxy / vxx) * xyb + (vxy / vxx) * (vxy / vxx) * xxb
          - (yb - (vxy / vxx) * xb) * (yb - (vxy / vxx) * xb) / nb)
           / (nb - 1.0) AS vb
  FROM __t
)
SELECT n_a, n_b,
       CASE WHEN n_a >= 2 AND n_b >= 2 AND vxx > 0 THEN theta END AS theta,
       CASE WHEN n_a >= 2 AND n_b >= 2 AND vxx > 0 THEN ma END AS mean_a_adj,
       CASE WHEN n_a >= 2 AND n_b >= 2 AND vxx > 0 THEN mb END AS mean_b_adj,
       CASE WHEN n_a >= 2 AND n_b >= 2 AND vxx > 0
             AND va / na + vb / nb > 0
         THEN (ma - mb) / sqrt(va / na + vb / nb) END AS t_adj,
       CASE WHEN n_a >= 2 AND n_b >= 2 AND vxx > 0
             AND va / na + vb / nb > 0
         THEN ((va / na + vb / nb) * (va / na + vb / nb))
              / ((va / na) * (va / na) / (na - 1.0)
                 + (vb / nb) * (vb / nb) / (nb - 1.0)) END AS dof_adj,
       CASE WHEN n_a >= 2 AND n_b >= 2 AND vxx > 0 AND vyy > 0
         THEN (vxy * vxy) / (vxx * vyy) END AS var_reduction
FROM __adj
"""


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

# Benford expected first-digit probabilities log10(1 + 1/d), d = 1..9,
# rounded to 12 dp in Python — no log10 in either engine's plan
_BENFORD_P = [round(math.log10(1.0 + 1.0 / d), 12) for d in range(1, 10)]


def benford_audit(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law (Newcomb
    1881 / Benford 1938; the classic fabricated-numbers detector and a
    cheap data-quality fingerprint for any multiplicative metric).
    Output per digit 1..9: ``(digit, n, freq, expected, dev)`` with
    ``dev = freq − expected``; digits absent from the data emit n = 0
    rows (the 9-row shape is fixed). Rows with NULL/zero values are
    excluded (zero has no leading significant digit); the sign is
    ignored.

    The first significant digit is extracted TEXTUALLY from the
    engine's shortest round-trip repr — identical strings on both
    sides, no log10/pow floating point anywhere; expected values are
    Python literals. One hash aggregation on a 9-key column."""
    # first nonzero digit of the absolute value's shortest repr: strip
    # sign, "0.", and zeros; regexp portable across both engines
    digit = F.regexp_extract(
        F.abs(F.col(value_col).cast("double")).cast("string"),
        "([1-9])",
        1,
    )
    base = (
        df.where(
            F.col(value_col).isNotNull()
            & (F.col(value_col).cast("double") != 0.0)
        )
        # try_cast: a digitless repr (NaN/Infinity) yields '' and ANSI
        # cast would raise; NULL -> filtered, mirroring the twin's
        # TRY_CAST
        .select(digit.try_cast("int").alias("digit"))
        .where(F.col("digit").isNotNull())
    )
    counts = base.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    spark = df.sparkSession
    digits = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    expected = F.element_at(
        F.array(*[F.lit(p) for p in _BENFORD_P]), F.col("digit")
    )
    total = F.sum("n").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    freq = _div(F.col("n").cast("double"), total.cast("double"))
    return (
        digits.join(counts, "digit", "left")
        .select("digit", F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n"))
        .select(
            "digit",
            "n",
            freq.alias("freq"),
            expected.alias("expected"),
            (freq - expected).alias("dev"),
        )
        .orderBy("digit")
    )


def benford_audit_sql(table: str, value_sql: str) -> str:
    # CAST to DOUBLE: a bare VALUES literal parses as DECIMAL in DuckDB
    # (an int-vs-float-class dtype hazard under the driver's hasher)
    exp_rows = ", ".join(
        f"({d + 1}, CAST({p!r} AS DOUBLE))" for d, p in enumerate(_BENFORD_P)
    )
    return f"""
WITH __d AS (
  SELECT TRY_CAST(regexp_extract(
           CAST(abs(CAST({value_sql} AS DOUBLE)) AS VARCHAR),
           '([1-9])', 1) AS INT) AS digit
  FROM {table}
  WHERE ({value_sql}) IS NOT NULL AND CAST({value_sql} AS DOUBLE) <> 0.0
),
__c AS (
  SELECT digit, COUNT(*)::BIGINT AS n FROM __d
  WHERE digit IS NOT NULL GROUP BY digit
),
__e(digit, expected) AS (VALUES {exp_rows}),
__j AS (
  SELECT e.digit, COALESCE(c.n, 0)::BIGINT AS n, e.expected
  FROM __e e LEFT JOIN __c c ON e.digit = c.digit
)
SELECT digit, n,
       CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE) AS freq,
       expected,
       CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE) - expected AS dev
FROM __j ORDER BY digit
"""


def mutual_information(df: DataFrame, a_col: Column, b_col: Column) -> DataFrame:
    """One-row mutual information between two categoricals:
    ``(n, k_a, k_b, mi, h_a, h_b, nmi)`` — MI and the marginal entropies
    in nats (9 dp), plus the sqrt-normalized NMI = MI/√(H(A)·H(B))
    (Strehl & Ghosh JMLR'02), the feature-redundancy/leakage scalar the
    chi2 test's p-value-free cousin: MI is in interpretable units and
    NMI is comparable across cardinalities. NULL NMI when either
    variable is constant (its entropy is zero by definition, pinned
    exactly — the quantized formula would leave ±1e-9 residue and blow
    the ratio up). Rows with NULL in either column are excluded.

    Engine parity: each ln runs on an all-integer ratio converted via
    ``_d2d`` text hops (the pmi_collocations discipline) and its RESULT
    is quantized to (18,9) by the text hop before the exact
    ``count × q9(ln)`` DECIMAL(38,9) accumulation — so a 1-ulp libm
    divergence must land within ~1e-16 of a 9-dp tie to matter, and the
    accumulation is partition-order independent. MI clamps at 0 (exact
    independence can quantize to −eps — the chi2 lesson). One IEEE
    division + ln(n) per output, rounded 9 dp (the cusum convention).

    Scale posture (100 TB): one scan collapses to |A|·|B| cells plus two
    margin frames (vocabulary-sized); the margins broadcast back; one
    1-row reduction. Same shapes as chi2_independence.
    """
    labeled = df.select(a_col.alias("__a"), b_col.alias("__b")).where(
        F.col("__a").isNotNull() & F.col("__b").isNotNull()
    )
    cells = labeled.groupBy("__a", "__b").agg(
        F.count(F.lit(1)).cast("long").alias("__o")
    )
    # ONE corpus pass: margins and the total re-aggregate the
    # vocabulary-sized cells frame instead of re-scanning the fact
    # (the executed plan held 7 parquet scans before this; checkpoint
    # pins the single collapse for its four consumers)
    cells = cells.localCheckpoint()
    ra = cells.groupBy("__a").agg(F.sum("__o").cast("long").alias("__r"))
    cb = cells.groupBy("__b").agg(F.sum("__o").cast("long").alias("__c"))
    tot = cells.agg(F.sum("__o").cast("long").alias("__n"))
    _ex = "decimal(38,0)"
    _q9 = lambda c: c.cast("string").cast("decimal(18,9)")
    _c19 = lambda c: c.cast("decimal(19,0)")
    lmi = F.log(
        _div(
            _d2d((F.col("__n").cast(_ex) * F.col("__o").cast(_ex)).cast(_ex)),
            _d2d((F.col("__r").cast(_ex) * F.col("__c").cast(_ex)).cast(_ex)),
        )
    )
    smi = (
        cells.join(F.broadcast(ra), "__a")
        .join(F.broadcast(cb), "__b")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum((_c19(F.col("__o")) * _q9(lmi)).cast("decimal(38,9)"))
            .cast("decimal(38,9)")
            .alias("__smi"),
            F.count(F.lit(1)).cast("long").alias("__cells"),
        )
    )
    ha = ra.agg(
        F.sum(
            (_c19(F.col("__r")) * _q9(F.log(F.col("__r").cast("double"))))
            .cast("decimal(38,9)")
        )
        .cast("decimal(38,9)")
        .alias("__sa"),
        F.count(F.lit(1)).cast("long").alias("k_a"),
    )
    hb = cb.agg(
        F.sum(
            (_c19(F.col("__c")) * _q9(F.log(F.col("__c").cast("double"))))
            .cast("decimal(38,9)")
        )
        .cast("decimal(38,9)")
        .alias("__sb"),
        F.count(F.lit(1)).cast("long").alias("k_b"),
    )
    one = tot.crossJoin(F.broadcast(smi)).crossJoin(F.broadcast(ha)).crossJoin(
        F.broadcast(hb)
    )
    n_d = F.col("__n").cast("double")
    mi = F.greatest(_div(_d2d(F.col("__smi")), n_d), F.lit(0.0))
    h_of = lambda k, s: F.when(F.col(k) == 1, F.lit(0.0)).otherwise(
        F.greatest(F.log(n_d) - _div(_d2d(F.col(s)), n_d), F.lit(0.0))
    )
    h_a = h_of("k_a", "__sa")
    h_b = h_of("k_b", "__sb")
    return one.select(
        F.col("__n").alias("n"),
        "k_a",
        "k_b",
        F.round(mi, 9).alias("mi"),
        F.round(h_a, 9).alias("h_a"),
        F.round(h_b, 9).alias("h_b"),
        F.round(_div(mi, F.sqrt(h_a * h_b)), 9).alias("nmi"),
    )


def mutual_information_sql(table: str, a_sql: str, b_sql: str) -> str:
    q9 = lambda e: f"CAST(CAST(({e}) * CAST(ABS({e}) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(18,9))"
    d2d = _d2d_sql
    lmi = (
        f"ln({d2d('CAST(CAST(n AS DECIMAL(38,0)) * CAST(o AS DECIMAL(38,0)) AS DECIMAL(38,0))')}"
        f" / {d2d('CAST(CAST(r AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0)) AS DECIMAL(38,0))')})"
    )
    return f"""
WITH __l AS (
  SELECT {a_sql} AS a, {b_sql} AS b FROM {table}
  WHERE ({a_sql}) IS NOT NULL AND ({b_sql}) IS NOT NULL
),
__cells AS (SELECT a, b, COUNT(*)::BIGINT AS o FROM __l GROUP BY a, b),
__ra AS (SELECT a, COUNT(*)::BIGINT AS r FROM __l GROUP BY a),
__cb AS (SELECT b, COUNT(*)::BIGINT AS c FROM __l GROUP BY b),
__tot AS (SELECT COUNT(*)::BIGINT AS n FROM __l),
__smi AS (
  SELECT CAST(SUM(CAST(CAST(o AS DECIMAL(19,0)) * {q9(lmi)}
                       AS DECIMAL(38,9))) AS DECIMAL(38,9)) AS smi
  FROM __cells JOIN __ra USING (a) JOIN __cb USING (b) CROSS JOIN __tot
),
__ha AS (
  SELECT CAST(SUM(CAST(CAST(r AS DECIMAL(19,0))
                       * {q9('ln(CAST(r AS DOUBLE))')}
                       AS DECIMAL(38,9))) AS DECIMAL(38,9)) AS sa,
         COUNT(*)::BIGINT AS k_a
  FROM __ra
),
__hb AS (
  SELECT CAST(SUM(CAST(CAST(c AS DECIMAL(19,0))
                       * {q9('ln(CAST(c AS DOUBLE))')}
                       AS DECIMAL(38,9))) AS DECIMAL(38,9)) AS sb,
         COUNT(*)::BIGINT AS k_b
  FROM __cb
),
__x AS (
  SELECT n, k_a, k_b,
         GREATEST({d2d('smi')} / CAST(n AS DOUBLE), 0.0) AS mi,
         CASE WHEN k_a = 1 THEN 0.0
              ELSE GREATEST(ln(CAST(n AS DOUBLE))
                            - ({d2d('sa')} / CAST(n AS DOUBLE)), 0.0)
         END AS h_a,
         CASE WHEN k_b = 1 THEN 0.0
              ELSE GREATEST(ln(CAST(n AS DOUBLE))
                            - ({d2d('sb')} / CAST(n AS DOUBLE)), 0.0)
         END AS h_b
  FROM __tot CROSS JOIN __smi CROSS JOIN __ha CROSS JOIN __hb
)
SELECT n, k_a, k_b,
       CASE WHEN ABS(mi) >= 1e16 THEN CAST((mi) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((mi) * CAST(ABS(mi) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS mi,
       CASE WHEN ABS(h_a) >= 1e16 THEN CAST((h_a) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((h_a) * CAST(ABS(h_a) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS h_a,
       CASE WHEN ABS(h_b) >= 1e16 THEN CAST((h_b) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((h_b) * CAST(ABS(h_b) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS h_b,
       CASE WHEN h_a * h_b <> 0.0
            THEN CASE WHEN ABS(mi / sqrt(h_a * h_b)) >= 1e16 THEN CAST((mi / sqrt(h_a * h_b)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((mi / sqrt(h_a * h_b)) * CAST(ABS(mi / sqrt(h_a * h_b)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END END AS nmi
FROM __x
"""


def krippendorff_alpha(
    df: DataFrame,
    unit_col: str,
    value_col: str,
    max_raters: int = 8,
    round_to: int = 9,
) -> DataFrame:
    """One-row Krippendorff's alpha (nominal) over a LONG ratings frame
    ``(unit, value)`` — one row per individual rating: the
    inter-annotator agreement statistic that, unlike Cohen's kappa,
    handles ANY number of raters and MISSING ratings (Krippendorff,
    Content Analysis 2004 §11).  Output ``(n_units, n_ratings,
    n_categories, do_num, de_num, alpha)``.

    Exact-integer formulation: with per-unit category counts n_uc and
    m_u = Σ_c n_uc,

        alpha = 1 − (n−1) · Σ_u (m_u² − Σ_c n_uc²)/(m_u−1)
                     / (n² − Σ_c n_c²)

    The only rational is the per-unit 1/(m_u−1): scaling by
    L = lcm(1..max_raters−1) makes every term integer (DECIMAL(38,0)
    sums — margin products overflow int64 at ~3e9 ratings, the
    cohens_kappa discipline), so both engines hit ONE IEEE division at
    the very end.  Units with fewer than 2 ratings drop (they carry no
    agreement information); NULL values drop.  alpha is NULL when no
    unit has 2+ ratings or when every rating is the same category
    (de_num = 0 — agreement is undefined without variation, not 1.0).

    Scale: one (unit, value) count aggregation, one unit-sized pass,
    one category-margin aggregation — no pairs anywhere (the m_u²
    identity replaces pair enumeration).
    """
    import math

    L = math.lcm(*range(1, max(int(max_raters), 2)))
    base = df.select(
        F.col(unit_col).alias("__u"), F.col(value_col).alias("__v")
    ).where(F.col("__v").isNotNull())
    per_uc = base.groupBy("__u", "__v").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    per_u = per_uc.groupBy("__u").agg(
        F.sum("__c").cast("long").alias("__m"),
        F.sum(F.expr("__c * __c")).cast("long").alias("__s2"),
    ).where(F.col("__m") >= 2)
    # Ã = Σ_u L·(m² − Σc²)/(m−1): (m−1) divides L ONLY while
    # m ≤ max_raters — beyond that the integer division silently
    # truncates and deflates the unit's disagreement (review-caught), so
    # the violation must FAIL, not skew; the term is folded through
    # assert_true so pruning cannot drop the check. Terms sum in
    # DECIMAL(38,0) (the margin-product discipline).
    guard = F.assert_true(
        F.col("__m") <= F.lit(int(max_raters)),
        F.lit(
            f"krippendorff_alpha: a unit has more ratings than "
            f"max_raters={int(max_raters)}; raise max_raters"
        ),
    )
    term = F.expr(f"(({L} div (__m - 1)) * (__m * __m - __s2))")
    a_num = per_u.agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum(
            F.when(guard.isNull(), term).cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("__A"),
    )
    # margins over the SAME unit set (units dropped above contribute no
    # ratings to n_c either — the standard convention)
    margins = (
        per_uc.join(per_u.select("__u"), "__u")
        .groupBy("__v")
        .agg(F.sum("__c").cast("long").alias("__nc"))
    )
    marg = margins.agg(
        F.count(F.lit(1)).cast("long").alias("n_categories"),
        F.sum("__nc").cast("long").alias("n_ratings"),
        F.sum(F.expr("CAST(__nc AS DECIMAL(38,0)) * __nc"))
        .cast("decimal(38,0)")
        .alias("__sc2"),
    )
    j = a_num.crossJoin(F.broadcast(marg))
    n = F.col("n_ratings").cast("decimal(38,0)")
    do_num = (n - F.lit(1)).cast("decimal(38,0)") * F.col("__A")
    de_num = F.lit(int(L)).cast("decimal(38,0)") * (
        n * n - F.col("__sc2")
    )
    # _d2d, not a direct cast: the decimal nums exceed 2^53 unscaled at
    # ~L·n² ratings and the direct decimal→double cast double-rounds
    return j.select(
        "n_units",
        "n_ratings",
        "n_categories",
        _d2d(do_num).alias("do_num"),
        _d2d(de_num).alias("de_num"),
        F.round(
            F.lit(1.0) - F.try_divide(_d2d(do_num), _d2d(de_num)),
            round_to,
        ).alias("alpha"),
    )


def krippendorff_alpha_sql(
    table: str,
    unit_sql: str,
    value_sql: str,
    max_raters: int = 8,
    round_to: int = 9,
) -> str:
    import math

    L = math.lcm(*range(1, max(int(max_raters), 2)))
    return f"""
WITH __b AS (
  SELECT {unit_sql} AS u, {value_sql} AS v FROM {table}
  WHERE {value_sql} IS NOT NULL
),
__uc AS (
  SELECT u, v, CAST(COUNT(*) AS BIGINT) AS c FROM __b GROUP BY u, v
),
__pu AS (
  SELECT u, CAST(SUM(c) AS BIGINT) AS m,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM __uc GROUP BY u HAVING SUM(c) >= 2
),
__a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
         CAST(SUM(CAST(CASE WHEN m > {int(max_raters)}
                  THEN CAST(error('krippendorff_alpha: a unit has more '
                       'ratings than max_raters={int(max_raters)}') AS BIGINT)
                  ELSE ({L} // (m - 1)) * (m * m - s2) END
                  AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS A
  FROM __pu
),
__mg AS (
  SELECT c.v, CAST(SUM(c.c) AS BIGINT) AS nc
  FROM __uc c JOIN __pu p ON c.u = p.u
  GROUP BY c.v
),
__m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_categories,
         CAST(SUM(nc) AS BIGINT) AS n_ratings,
         CAST(SUM(CAST(nc AS DECIMAL(38,0)) * nc) AS DECIMAL(38,0)) AS sc2
  FROM __mg
)
SELECT a.n_units, m.n_ratings, m.n_categories,
       {_d2d_sql("(CAST(m.n_ratings AS DECIMAL(38,0)) - 1) * a.A")}
         AS do_num,
       {_d2d_sql(f"CAST({L} AS DECIMAL(38,0)) * (CAST(m.n_ratings AS DECIMAL(38,0)) * m.n_ratings - m.sc2)")}
         AS de_num,
       CAST(CAST(CAST(CAST((1.0 - {_d2d_sql("(CAST(m.n_ratings AS DECIMAL(38,0)) - 1) * a.A")}
                   / NULLIF({_d2d_sql(f"CAST({L} AS DECIMAL(38,0)) * (CAST(m.n_ratings AS DECIMAL(38,0)) * m.n_ratings - m.sc2)")}, 0)) * CAST(ABS(1.0 - {_d2d_sql("(CAST(m.n_ratings AS DECIMAL(38,0)) - 1) * a.A")}
                   / NULLIF({_d2d_sql(f"CAST({L} AS DECIMAL(38,0)) * (CAST(m.n_ratings AS DECIMAL(38,0)) * m.n_ratings - m.sc2)")}, 0)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS alpha
FROM __a a CROSS JOIN __m m
"""


def wilson_intervals(
    df: DataFrame,
    group_col: str,
    success: Column,
    z: float = 1.959963984540054,
    round_to: int = 9,
) -> DataFrame:
    """(grp, n, k, rate, lo, hi): per-group binomial proportion with the
    Wilson score interval (Wilson JASA 1927) — the interval that stays
    inside [0,1] and behaves at k=0/k=n, where the Wald interval
    collapses; the standard error bar for per-slice pass rates, filter
    keep-rates and conversion shares.

        center = (p + z²/2n) / (1 + z²/n)
        half   = z·sqrt(p(1−p)/n + z²/4n²) / (1 + z²/n)

    The z quantile is a PYTHON literal (the mde_planning convention —
    neither engine evaluates Φ⁻¹); everything else is one fixed IEEE
    expression of the integer (n, k) per group with identical
    association in both dialects, 9dp-rounded on output.  One
    conditional-count aggregation; output group-sized."""
    g = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        # when/otherwise(0), not cast: SUM(cast) is NULL on an all-NULL
        # predicate group while the CASE twin yields 0 (module convention)
        F.sum(F.when(success, 1).otherwise(0)).cast("long").alias("k"),
    )
    zz = float(z) * float(z)
    n = F.col("n").cast("double")
    p = F.col("k").cast("double") / n
    denom = F.lit(1.0) + F.lit(zz) / n
    center = (p + F.lit(zz) / (F.lit(2.0) * n)) / denom
    half = (
        F.lit(float(z))
        * F.sqrt(
            p * (F.lit(1.0) - p) / n
            + F.lit(zz) / (F.lit(4.0) * n * n)
        )
        / denom
    )
    return g.select(
        "grp",
        "n",
        "k",
        F.round(p, round_to).alias("rate"),
        F.round(center - half, round_to).alias("lo"),
        F.round(center + half, round_to).alias("hi"),
    ).orderBy("grp")


def wilson_intervals_sql(
    table: str,
    group_sql: str,
    success_sql: str,
    z: float = 1.959963984540054,
    round_to: int = 9,
) -> str:
    zz = repr(float(z) * float(z))
    zs = repr(float(z))
    return f"""
WITH __g AS (
  SELECT {group_sql} AS grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN {success_sql} THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM {table} GROUP BY grp
)
SELECT grp, n, k,
       CASE WHEN ABS(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) >= 1e16 THEN CAST((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(ABS(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS rate,
       CAST(CAST(CAST(CAST((((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
               + {zz} / (2.0 * CAST(n AS DOUBLE)))
              / (1.0 + {zz} / CAST(n AS DOUBLE)))
             - ({zs} * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                  * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                  / CAST(n AS DOUBLE)
                  + {zz} / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                / (1.0 + {zz} / CAST(n AS DOUBLE)))) * CAST(ABS(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
               + {zz} / (2.0 * CAST(n AS DOUBLE)))
              / (1.0 + {zz} / CAST(n AS DOUBLE)))
             - ({zs} * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                  * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                  / CAST(n AS DOUBLE)
                  + {zz} / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                / (1.0 + {zz} / CAST(n AS DOUBLE)))) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS lo,
       CAST(CAST(CAST(CAST((((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
               + {zz} / (2.0 * CAST(n AS DOUBLE)))
              / (1.0 + {zz} / CAST(n AS DOUBLE)))
             + ({zs} * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                  * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                  / CAST(n AS DOUBLE)
                  + {zz} / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                / (1.0 + {zz} / CAST(n AS DOUBLE)))) * CAST(ABS(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
               + {zz} / (2.0 * CAST(n AS DOUBLE)))
              / (1.0 + {zz} / CAST(n AS DOUBLE)))
             + ({zs} * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                  * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                  / CAST(n AS DOUBLE)
                  + {zz} / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                / (1.0 + {zz} / CAST(n AS DOUBLE)))) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS hi
FROM __g ORDER BY grp
"""


def _wilson_bounds(n, k, z):
    """(lo, hi) Column pair: the Wilson bounds as one fixed IEEE
    expression of integer columns n/k — shared by wilson_intervals and
    the Newcombe difference (identical association in the SQL twins)."""
    zz = float(z) * float(z)
    nd = n.cast("double")
    p = k.cast("double") / nd
    denom = F.lit(1.0) + F.lit(zz) / nd
    center = (p + F.lit(zz) / (F.lit(2.0) * nd)) / denom
    half = (
        F.lit(float(z))
        * F.sqrt(p * (F.lit(1.0) - p) / nd + F.lit(zz) / (F.lit(4.0) * nd * nd))
        / denom
    )
    return p, center - half, center + half


def _wilson_bounds_sql(n: str, k: str, z: float) -> tuple[str, str, str]:
    zz = repr(float(z) * float(z))
    zs = repr(float(z))
    p = f"(CAST({k} AS DOUBLE) / CAST({n} AS DOUBLE))"
    nd = f"CAST({n} AS DOUBLE)"
    denom = f"(1.0 + {zz} / {nd})"
    center = f"(({p} + {zz} / (2.0 * {nd})) / {denom})"
    half = (
        f"({zs} * sqrt({p} * (1.0 - {p}) / {nd}"
        f" + {zz} / (4.0 * {nd} * {nd})) / {denom})"
    )
    return p, f"({center} - {half})", f"({center} + {half})"


def newcombe_diff(
    df: DataFrame,
    group_col: str,
    treat_pred: Column,
    success: Column,
    z: float = 1.959963984540054,
    round_to: int = 9,
) -> DataFrame:
    """(grp, n_t, k_t, n_c, k_c, diff, lo, hi): two-proportion
    difference with the Newcombe square-and-add score interval
    (Newcombe, Stat Med 1998 method 10) — Wilson bounds per arm,
    combined as

        lo = d − sqrt((p₁−l₁)² + (u₂−p₂)²)
        hi = d + sqrt((u₁−p₁)² + (p₂−l₂)²)

    the [−1,1]-safe error bar for per-slice treatment-vs-control rate
    deltas, well-behaved at 0/n and n/n where the Wald difference
    interval is not.  Arms with n = 0 yield NULLs (try_divide).  One
    conditional-count aggregation per group; z a python literal; the
    whole finish is a fixed IEEE expression shared with the SQL twin.
    """
    g = df.groupBy(F.col(group_col).alias("grp")).agg(
        # when/otherwise(0), not cast: SUM(cast) is NULL on an all-NULL
        # predicate group while the CASE twins yield 0 (module convention)
        F.sum(F.when(treat_pred, 1).otherwise(0)).cast("long").alias("n_t"),
        F.sum(F.when(treat_pred & success, 1).otherwise(0))
        .cast("long")
        .alias("k_t"),
        F.sum(F.when(~treat_pred, 1).otherwise(0)).cast("long").alias("n_c"),
        F.sum(F.when((~treat_pred) & success, 1).otherwise(0))
        .cast("long")
        .alias("k_c"),
    )
    p1, l1, u1 = _wilson_bounds(F.col("n_t"), F.col("k_t"), z)
    p2, l2, u2 = _wilson_bounds(F.col("n_c"), F.col("k_c"), z)
    d = p1 - p2
    lo = d - F.sqrt((p1 - l1) * (p1 - l1) + (u2 - p2) * (u2 - p2))
    hi = d + F.sqrt((u1 - p1) * (u1 - p1) + (p2 - l2) * (p2 - l2))
    # an empty arm must yield NULLs identically: Spark double/0 is Inf
    # while DuckDB's is NULL, so the guard — not division semantics —
    # carries the contract
    both = (F.col("n_t") > 0) & (F.col("n_c") > 0)
    return g.select(
        "grp",
        "n_t",
        "k_t",
        "n_c",
        "k_c",
        F.round(F.when(both, d), round_to).alias("diff"),
        F.round(F.when(both, lo), round_to).alias("lo"),
        F.round(F.when(both, hi), round_to).alias("hi"),
    ).orderBy("grp")


def newcombe_diff_sql(
    table: str,
    group_sql: str,
    treat_sql: str,
    success_sql: str,
    z: float = 1.959963984540054,
    round_to: int = 9,
) -> str:
    _, l1, u1 = _wilson_bounds_sql("n_t", "k_t", z)
    _, l2, u2 = _wilson_bounds_sql("n_c", "k_c", z)
    p1 = "(CAST(k_t AS DOUBLE) / CAST(n_t AS DOUBLE))"
    p2 = "(CAST(k_c AS DOUBLE) / CAST(n_c AS DOUBLE))"
    d = f"({p1} - {p2})"
    lo = (
        f"({d} - sqrt(({p1} - {l1}) * ({p1} - {l1})"
        f" + ({u2} - {p2}) * ({u2} - {p2})))"
    )
    hi = (
        f"({d} + sqrt(({u1} - {p1}) * ({u1} - {p1})"
        f" + ({p2} - {l2}) * ({p2} - {l2})))"
    )
    return f"""
WITH __g AS (
  SELECT {group_sql} AS grp,
         CAST(SUM(CASE WHEN {treat_sql} THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         CAST(SUM(CASE WHEN ({treat_sql}) AND ({success_sql})
                  THEN 1 ELSE 0 END) AS BIGINT) AS k_t,
         CAST(SUM(CASE WHEN NOT ({treat_sql}) THEN 1 ELSE 0 END) AS BIGINT)
           AS n_c,
         CAST(SUM(CASE WHEN NOT ({treat_sql}) AND ({success_sql})
                  THEN 1 ELSE 0 END) AS BIGINT) AS k_c
  FROM {table} GROUP BY grp
)
SELECT grp, n_t, k_t, n_c, k_c,
       CASE WHEN ABS(CASE WHEN n_t > 0 AND n_c > 0 THEN {d} END) >= 1e16 THEN CAST((CASE WHEN n_t > 0 AND n_c > 0 THEN {d} END) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CASE WHEN n_t > 0 AND n_c > 0 THEN {d} END) * CAST(ABS(CASE WHEN n_t > 0 AND n_c > 0 THEN {d} END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS diff,
       CASE WHEN ABS(CASE WHEN n_t > 0 AND n_c > 0 THEN {lo} END) >= 1e16 THEN CAST((CASE WHEN n_t > 0 AND n_c > 0 THEN {lo} END) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CASE WHEN n_t > 0 AND n_c > 0 THEN {lo} END) * CAST(ABS(CASE WHEN n_t > 0 AND n_c > 0 THEN {lo} END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS lo,
       CASE WHEN ABS(CASE WHEN n_t > 0 AND n_c > 0 THEN {hi} END) >= 1e16 THEN CAST((CASE WHEN n_t > 0 AND n_c > 0 THEN {hi} END) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CASE WHEN n_t > 0 AND n_c > 0 THEN {hi} END) * CAST(ABS(CASE WHEN n_t > 0 AND n_c > 0 THEN {hi} END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS hi
FROM __g ORDER BY grp
"""


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    a_pred: Column,
    b_pred: Column,
    round_to: int = 9,
) -> DataFrame:
    """One-row Mann-Whitney U test (Wilcoxon rank-sum) between two
    arms — the nonparametric two-sample location test for metrics too
    skewed for welch_t (Mann & Whitney, Ann. Math. Stat. 1947). Output
    ``(n_a, n_b, u2_a, z)``: the DOUBLED U statistic of arm A (2·U —
    doubling keeps tie midranks integral, the auc_rank_sum rank_sum2
    convention; halve for the textbook U) and its normal approximation
    with the tie-corrected variance

        z = (U − n_a·n_b/2) / sqrt(n_a·n_b/12 · ((N+1) − Σ(t³−t)/(N(N−1))))

    Exact-integer formulation on auc_rank_sum's midrank machinery: the
    doubled midrank sum rs2 and the tie term Σ(t³−t) accumulate in
    DECIMAL(38,0) (t³ via three (12,0)-operand multiplies, exact far
    past any real tie group), so both engines reach ONE fixed IEEE
    expression from identical integers. Rows matching neither predicate
    (or with NULL value/predicates) are excluded; a row matching BOTH
    predicates counts toward arm A only — pass disjoint arms. z is NULL
    when either arm is empty or every value is tied (zero variance).

    Scale: one distinct-value collapse (support-sized — pre-round a
    continuous metric, the ks_drift contract), one cumulative window
    over the support, one 1-row finish."""
    in_a = F.when(a_pred, F.lit(1)).otherwise(F.lit(0))
    g = (
        df.where(
            F.col(value_col).isNotNull()
            & a_pred.isNotNull()
            & b_pred.isNotNull()
            & (a_pred | b_pred)
        )
        .select(
            F.col(value_col).cast("double").alias("__s"),
            in_a.alias("__a"),
        )
        .groupBy("__s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__cnt"),
            F.sum("__a").cast("long").alias("__na"),
        )
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.withColumn("__cum", F.sum("__cnt").over(w))
    # 2*midrank of every row tied at this value = 2*(cum − cnt) + cnt + 1
    term = F.col("__na").cast("decimal(19,0)") * (
        F.lit(2) * (F.col("__cum") - F.col("__cnt")) + F.col("__cnt") + F.lit(1)
    ).cast("decimal(19,0)")
    tie = (
        F.col("__cnt").cast("decimal(12,0)")
        * F.col("__cnt").cast("decimal(12,0)")
        * F.col("__cnt").cast("decimal(12,0)")
        - F.col("__cnt").cast("decimal(38,0)")
    )
    agg = cum.agg(
        F.sum("__na").cast("long").alias("n_a"),
        (F.sum("__cnt") - F.sum("__na")).cast("long").alias("n_b"),
        F.sum(term).cast("decimal(38,0)").alias("__rs2"),
        F.sum(tie).cast("decimal(38,0)").alias("__ties"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    nn = na + nb
    # u2 = 2*U_a = rs2 − n_a(n_a+1), exact in DECIMAL(38,0)
    u2 = F.col("__rs2") - F.col("n_a").cast("decimal(19,0)") * (
        F.col("n_a") + F.lit(1)
    ).cast("decimal(19,0)")
    ua = _d2d(u2) / F.lit(2.0)
    var = (
        na * nb / F.lit(12.0)
        * ((nn + F.lit(1.0)) - _div(_d2d(F.col("__ties")), nn * (nn - F.lit(1.0))))
    )
    z = _div(ua - na * nb / F.lit(2.0), F.sqrt(var))
    return agg.select(
        "n_a",
        "n_b",
        _d2d(u2).alias("u2_a"),
        F.round(
            F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), z), round_to
        ).alias("z"),
    )


def mann_whitney_u_sql(
    table: str,
    value_sql: str,
    a_pred_sql: str,
    b_pred_sql: str,
    round_to: int = 9,
) -> str:
    return f"""
WITH __g AS (
  SELECT CAST({value_sql} AS DOUBLE) AS s, COUNT(*)::BIGINT AS cnt,
         SUM(CASE WHEN {a_pred_sql} THEN 1 ELSE 0 END)::BIGINT AS na
  FROM {table}
  WHERE ({value_sql}) IS NOT NULL AND ({a_pred_sql}) IS NOT NULL
    AND ({b_pred_sql}) IS NOT NULL AND (({a_pred_sql}) OR ({b_pred_sql}))
  GROUP BY s
),
__cum AS (
  SELECT na, cnt,
         CAST(SUM(cnt) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS cum
  FROM __g
),
__agg AS (
  SELECT SUM(na)::BIGINT AS n_a, (SUM(cnt) - SUM(na))::BIGINT AS n_b,
         CAST(SUM(CAST(na AS DECIMAL(19,0))
                  * CAST(2 * (cum - cnt) + cnt + 1 AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS rs2,
         CAST(SUM(CAST(cnt AS DECIMAL(12,0)) * CAST(cnt AS DECIMAL(12,0))
                  * CAST(cnt AS DECIMAL(12,0))
                  - CAST(cnt AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS ties
  FROM __cum
),
__fin AS (
  SELECT n_a, n_b,
         {_d2d_sql("rs2 - CAST(n_a AS DECIMAL(19,0)) * CAST(n_a + 1 AS DECIMAL(19,0))")} AS u2_a,
         CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
         CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS nn,
         {_d2d_sql("ties")} AS tiesd
  FROM __agg
)
SELECT n_a, n_b, u2_a,
       CAST(CAST(CAST(CAST((CASE WHEN n_a > 0 AND n_b > 0 THEN
         (u2_a / 2.0 - nad * nbd / 2.0)
         / sqrt(nad * nbd / 12.0
                * ((nn + 1.0) - tiesd / (nn * (nn - 1.0))))
       END) * CAST(ABS(CASE WHEN n_a > 0 AND n_b > 0 THEN
         (u2_a / 2.0 - nad * nbd / 2.0)
         / sqrt(nad * nbd / 12.0
                * ((nn + 1.0) - tiesd / (nn * (nn - 1.0))))
       END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS z
FROM __fin
"""


def fleiss_kappa(
    df: DataFrame,
    unit_col: str,
    value_col: str,
    n_raters: int,
    round_to: int = 9,
) -> DataFrame:
    """One-row Fleiss' kappa over a LONG ratings frame ``(unit, value)``
    with a FIXED number of raters per unit (Fleiss, Psych. Bull. 1971)
    — the classic fixed-panel agreement statistic; krippendorff_alpha
    is the generalization when raters can skip units. Output
    ``(n_units, n_raters, n_categories, p_bar, p_e, kappa)``.

    Exact-integer accumulation: with per-unit category counts n_ij,
    A = Σ_i Σ_j n_ij², M = n·m total ratings, D = m−1, S = Σ_j c_j²
    (squared category margins),

        P̄  = (A − M) / (M·D)     P̄e = S / M²     κ = (P̄ − P̄e)/(1 − P̄e)

    A and S accumulate in DECIMAL(38,0) (margin products overflow int64
    at ~3e9 ratings — the cohens_kappa discipline); P̄ and P̄e are each
    ONE correctly-rounded IEEE division from identical integers, so the
    κ finish is a fixed IEEE expression of bit-identical doubles in both
    engines. A unit with a rating count ≠ n_raters FAILS via assert_true
    (folded through the aggregate so pruning cannot drop the check) —
    Fleiss is undefined on ragged panels; use krippendorff_alpha
    instead. κ is NULL when P̄e = 1 (every rating in one category:
    chance agreement is 1 and κ is undefined, not 1.0).

    Scale: one (unit, value) count aggregation, one unit-sized pass, one
    category-margin aggregation — no pair enumeration anywhere."""
    m = int(n_raters)
    base = df.select(
        F.col(unit_col).alias("__u"), F.col(value_col).alias("__v")
    ).where(F.col("__v").isNotNull())
    per_uc = base.groupBy("__u", "__v").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    per_u = per_uc.groupBy("__u").agg(
        F.sum("__c").cast("long").alias("__m"),
        F.sum(F.expr("__c * __c")).cast("long").alias("__s2"),
    )
    guard = F.assert_true(
        F.col("__m") == F.lit(m),
        F.lit(
            f"fleiss_kappa: a unit has a rating count != n_raters={m}; "
            "the panel is ragged — use krippendorff_alpha"
        ),
    )
    a_num = per_u.agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum(F.when(guard.isNull(), F.col("__s2")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("__A"),
    )
    margins = per_uc.groupBy("__v").agg(
        F.sum("__c").cast("long").alias("__nc")
    )
    marg = margins.agg(
        F.count(F.lit(1)).cast("long").alias("n_categories"),
        F.sum("__nc").cast("long").alias("__M"),
        F.sum(
            F.expr("CAST(__nc AS DECIMAL(19,0)) * CAST(__nc AS DECIMAL(19,0))")
        )
        .cast("decimal(38,0)")
        .alias("__S"),
    )
    j = a_num.crossJoin(F.broadcast(marg))
    big_m = F.col("__M").cast("decimal(19,0)")
    # (19,0)×(19,0)→(38,0) exact products (the module's operand
    # discipline; a (38,0)×(38,0) multiply is a DuckDB bind error)
    p_bar = _div(
        _d2d(F.col("__A") - F.col("__M").cast("decimal(38,0)")),
        _d2d(big_m * F.lit(m - 1).cast("decimal(19,0)")),
    )
    p_e = _div(_d2d(F.col("__S")), _d2d(big_m * big_m))
    kappa = _div(p_bar - p_e, F.lit(1.0) - p_e)
    return j.select(
        "n_units",
        F.lit(m).cast("long").alias("n_raters"),
        "n_categories",
        F.round(p_bar, round_to).alias("p_bar"),
        F.round(p_e, round_to).alias("p_e"),
        F.round(kappa, round_to).alias("kappa"),
    )


def fleiss_kappa_sql(
    table: str,
    unit_sql: str,
    value_sql: str,
    n_raters: int,
    round_to: int = 9,
) -> str:
    m = int(n_raters)
    p_bar = (
        f"({_d2d_sql('A - CAST(M AS DECIMAL(38,0))')}"
        f" / {_d2d_sql(f'CAST(M AS DECIMAL(19,0)) * CAST({m - 1} AS DECIMAL(19,0))')})"
    )
    p_e = (
        f"({_d2d_sql('S')}"
        f" / {_d2d_sql('CAST(M AS DECIMAL(19,0)) * CAST(M AS DECIMAL(19,0))')})"
    )
    return f"""
WITH __uc AS (
  SELECT {unit_sql} AS u, {value_sql} AS v, COUNT(*)::BIGINT AS c
  FROM {table} WHERE ({value_sql}) IS NOT NULL
  GROUP BY u, v
),
__pu AS (
  SELECT u, SUM(c)::BIGINT AS m, SUM(c * c)::BIGINT AS s2
  FROM __uc GROUP BY u
),
__a AS (
  SELECT COUNT(*)::BIGINT AS n_units,
         CAST(SUM(CASE WHEN m = {m} THEN s2
                       ELSE CAST(error('fleiss_kappa: ragged panel')
                                 AS BIGINT) END)
              AS DECIMAL(38,0)) AS A
  FROM __pu
),
__marg AS (
  SELECT COUNT(*)::BIGINT AS n_categories, SUM(nc)::BIGINT AS M,
         CAST(SUM(CAST(nc AS DECIMAL(19,0)) * CAST(nc AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS S
  FROM (SELECT v, SUM(c)::BIGINT AS nc FROM __uc GROUP BY v)
)
SELECT n_units, CAST({m} AS BIGINT) AS n_raters, n_categories,
       CASE WHEN ABS({p_bar}) >= 1e16 THEN CAST(({p_bar}) AS DOUBLE) ELSE CAST(CAST(CAST(CAST(({p_bar}) * CAST(ABS({p_bar}) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS p_bar,
       CASE WHEN ABS({p_e}) >= 1e16 THEN CAST(({p_e}) AS DOUBLE) ELSE CAST(CAST(CAST(CAST(({p_e}) * CAST(ABS({p_e}) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS p_e,
       CASE WHEN ABS(({p_bar} - {p_e}) / (1.0 - {p_e})) >= 1e16 THEN CAST((({p_bar} - {p_e}) / (1.0 - {p_e})) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((({p_bar} - {p_e}) / (1.0 - {p_e})) * CAST(ABS(({p_bar} - {p_e}) / (1.0 - {p_e})) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS kappa
FROM __a CROSS JOIN __marg
"""


def cochran_armitage(
    df: DataFrame,
    dose_col: Column,
    success_pred: Column,
    round_to: int = 9,
) -> DataFrame:
    """One-row Cochran-Armitage trend test: is a binary rate MONOTONE in
    an ordered integer dose (Cochran Biometrics'54 / Armitage'55)? The
    chi2 independence test asks "does the rate differ by level"; this
    asks the sharper ordered question — rate drift across hours of day,
    model versions, or bucketed exposure levels. Output ``(n, r,
    n_levels, z)`` with dose scores = the integer dose values
    themselves and

        T = Σ_k w_k (r_k − n_k R/N),  Var = (R/N)(1−R/N)(Σw²n − (Σwn)²/N)
        z = T / sqrt(Var)

    cleared to the exact-integer form z = (N·Swr − R·Swn) · sqrt(N) /
    (sqrt(R(N−R)) · sqrt(N·Sw2n − Swn²)): every sum is an integer in
    DECIMAL(38,0) via (19,0)-operand products, both engines reach one
    fixed IEEE expression, and the two sqrt factors keep every operand
    inside the 38-digit lattice (a single radicand would need w²N⁴).
    NULL dose / NULL predicate rows are excluded; z is NULL when R = 0,
    R = N, or the dose has no variance. Scale: one dose-level collapse
    (support-sized), one 1-row finish."""
    base = df.where(
        dose_col.isNotNull() & success_pred.isNotNull()
    ).select(
        dose_col.cast("long").alias("__w"),
        F.when(success_pred, F.lit(1)).otherwise(F.lit(0)).alias("__y"),
    )
    lev = base.groupBy("__w").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__y").cast("long").alias("__r"),
    )
    w19 = F.col("__w").cast("decimal(19,0)")
    agg = lev.agg(
        F.sum("__n").cast("long").alias("n"),
        F.sum("__r").cast("long").alias("r"),
        F.count(F.lit(1)).cast("long").alias("n_levels"),
        F.sum(w19 * F.col("__n").cast("decimal(19,0)"))
        .cast("decimal(38,0)")
        .alias("__swn"),
        F.sum(w19 * F.col("__r").cast("decimal(19,0)"))
        .cast("decimal(38,0)")
        .alias("__swr"),
        F.sum(
            (w19 * w19).cast("decimal(19,0)") * F.col("__n").cast("decimal(19,0)")
        )
        .cast("decimal(38,0)")
        .alias("__sw2n"),
    )
    n19 = F.col("n").cast("decimal(19,0)")
    r19 = F.col("r").cast("decimal(19,0)")
    num = _d2d(
        (n19 * F.col("__swr").cast("decimal(19,0)")).cast("decimal(38,0)")
        - (r19 * F.col("__swn").cast("decimal(19,0)")).cast("decimal(38,0)")
    )
    f1 = F.sqrt(_d2d(r19 * (n19 - r19)))
    f2 = F.sqrt(
        _d2d(
            (n19 * F.col("__sw2n").cast("decimal(19,0)")).cast("decimal(38,0)")
            - (
                F.col("__swn").cast("decimal(19,0)")
                * F.col("__swn").cast("decimal(19,0)")
            ).cast("decimal(38,0)")
        )
    )
    z = _div(num * F.sqrt(F.col("n").cast("double")), f1 * f2)
    return agg.select(
        "n", "r", "n_levels", F.round(z, round_to).alias("z")
    )


def cochran_armitage_sql(
    table: str,
    dose_sql: str,
    success_sql: str,
    round_to: int = 9,
) -> str:
    num = _d2d_sql(
        "CAST(CAST(n AS DECIMAL(19,0)) * CAST(swr AS DECIMAL(19,0)) AS DECIMAL(38,0))"
        " - CAST(CAST(r AS DECIMAL(19,0)) * CAST(swn AS DECIMAL(19,0)) AS DECIMAL(38,0))"
    )
    f1 = _d2d_sql(
        "CAST(r AS DECIMAL(19,0)) * CAST(n - r AS DECIMAL(19,0))"
    )
    f2 = _d2d_sql(
        "CAST(CAST(n AS DECIMAL(19,0)) * CAST(sw2n AS DECIMAL(19,0)) AS DECIMAL(38,0))"
        " - CAST(CAST(swn AS DECIMAL(19,0)) * CAST(swn AS DECIMAL(19,0)) AS DECIMAL(38,0))"
    )
    return f"""
WITH __lev AS (
  SELECT CAST({dose_sql} AS BIGINT) AS w, COUNT(*)::BIGINT AS nk,
         SUM(CASE WHEN {success_sql} THEN 1 ELSE 0 END)::BIGINT AS rk
  FROM {table}
  WHERE ({dose_sql}) IS NOT NULL AND ({success_sql}) IS NOT NULL
  GROUP BY w
),
__agg AS (
  SELECT SUM(nk)::BIGINT AS n, SUM(rk)::BIGINT AS r,
         COUNT(*)::BIGINT AS n_levels,
         CAST(SUM(CAST(w AS DECIMAL(19,0)) * CAST(nk AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS swn,
         CAST(SUM(CAST(w AS DECIMAL(19,0)) * CAST(rk AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS swr,
         CAST(SUM(CAST(CAST(w AS DECIMAL(19,0)) * CAST(w AS DECIMAL(19,0))
                       AS DECIMAL(19,0))
                  * CAST(nk AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS sw2n
  FROM __lev
)
SELECT n, r, n_levels,
       CAST(CAST(CAST(CAST((({num}) * sqrt(CAST(n AS DOUBLE))
             / (sqrt({f1}) * sqrt({f2}))) * CAST(ABS(({num}) * sqrt(CAST(n AS DOUBLE))
             / (sqrt({f1}) * sqrt({f2}))) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS z
FROM __agg
"""


def brown_forsythe(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 9,
) -> DataFrame:
    """One-row Brown-Forsythe test: do the groups have EQUAL SPREAD
    (Brown & Forsythe, JASA 1974 — Levene's test on median-centered
    deviations, the robust form)? welch_t/mann_whitney compare
    location; this is the variance-homogeneity gate that tells you
    whether a location test's equal-spread reading is even meaningful,
    and the dispersion-drift alarm for per-slice metric stability.
    Output ``(n, n_groups, ssb, ssw, f_stat)``: the one-way ANOVA F on
    z_ij = |x_ij − median_g|.

    Determinism: medians are the exact-percentile convention
    (quantile_cont, 9dp-rounded — robust_outliers' contract);
    deviations quantize to DECIMAL(18,6) via the text hop, group/grand
    means re-quantize to the same lattice, and every squared term is an
    (18,6)² = (37,12)-exact product summed in DECIMAL(38,12) (DuckDB
    twin widens factors to (19,6) — the int64 fast-path overflow), so
    both engines reach ONE fixed IEEE expression from identical
    decimals. SSB sums the per-ROW (m̄_g − m̄)² so no decimal×count
    product ever leaves the 38-digit lattice. NULL groups/values are
    excluded; F is NULL when SSW = 0 or n_groups < 2.

    Scale: three scans, each ending in a group-sized aggregation
    (median pass, deviation-sum pass, squared-term pass); group frames
    broadcast back — the robust_outliers plan shape."""
    base = df.where(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("double").alias("__v"),
    )
    med = base.groupBy("__g").agg(
        F.round(F.percentile(F.col("__v"), F.lit(0.5)), 9).alias("__med")
    )
    z = base.join(F.broadcast(med), "__g").select(
        "__g", _q6(F.abs(F.col("__v") - F.col("__med"))).alias("__z")
    )
    sums = z.groupBy("__g").agg(
        F.sum("__z").cast("decimal(38,6)").alias("__s"),
        F.count(F.lit(1)).cast("long").alias("__n"),
    )
    means = sums.select(
        "__g", _q6(_div(_d2d(F.col("__s")), F.col("__n"))).alias("__mg")
    )
    tot = sums.agg(
        F.sum("__s").cast("decimal(38,6)").alias("__st"),
        F.sum("__n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
    ).select(
        "n",
        "n_groups",
        _q6(_div(_d2d(F.col("__st")), F.col("n"))).alias("__m"),
    )
    terms = (
        z.join(F.broadcast(means), "__g")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "n_groups",
            (
                (F.col("__mg") - F.col("__m")).cast(_VAL_DEC)
                * (F.col("__mg") - F.col("__m")).cast(_VAL_DEC)
            ).alias("__b"),
            (
                (F.col("__z") - F.col("__mg")).cast(_VAL_DEC)
                * (F.col("__z") - F.col("__mg")).cast(_VAL_DEC)
            ).alias("__w"),
        )
    )
    agg = terms.groupBy("n", "n_groups").agg(
        F.sum("__b").cast(_MOMENT).alias("__ssb"),
        F.sum("__w").cast(_MOMENT).alias("__ssw"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("n_groups").cast("double")
    f_stat = _div(
        _d2d(F.col("__ssb")) * (nd - kd),
        _d2d(F.col("__ssw")) * (kd - F.lit(1.0)),
    )
    return agg.select(
        "n",
        "n_groups",
        _d2d(F.col("__ssb")).alias("ssb"),
        _d2d(F.col("__ssw")).alias("ssw"),
        F.round(
            F.when(F.col("n_groups") >= 2, f_stat), round_to
        ).alias("f_stat"),
    )


def brown_forsythe_sql(
    table: str,
    group_sql: str,
    value_sql: str,
    round_to: int = 9,
) -> str:
    q6_mean_g = _q6_sql(f"{_d2d_sql('s.s')} / s.n")
    q6_mean_t = _q6_sql(f"{_d2d_sql('t.st')} / t.n")
    return f"""
WITH __b AS (
  SELECT {group_sql} AS g, CAST({value_sql} AS DOUBLE) AS v
  FROM {table}
  WHERE ({group_sql}) IS NOT NULL AND ({value_sql}) IS NOT NULL
),
__med AS (
  SELECT g, CASE WHEN ABS(quantile_cont(v, 0.5)) >= 1e16 THEN CAST((quantile_cont(v, 0.5)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((quantile_cont(v, 0.5)) * CAST(ABS(quantile_cont(v, 0.5)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS med FROM __b GROUP BY g
),
__z AS (
  SELECT b.g, {_q6_sql("abs(b.v - m.med)")} AS z
  FROM __b b JOIN __med m ON b.g = m.g
),
__s AS (
  SELECT g, CAST(SUM(z) AS DECIMAL(38,6)) AS s, COUNT(*)::BIGINT AS n
  FROM __z GROUP BY g
),
__mg AS (
  SELECT s.g, {q6_mean_g} AS mg FROM __s s
),
__t AS (
  SELECT CAST(SUM(s) AS DECIMAL(38,6)) AS st, SUM(n)::BIGINT AS n,
         COUNT(*)::BIGINT AS n_groups
  FROM __s
),
__tm AS (
  SELECT t.n, t.n_groups, {q6_mean_t} AS m FROM __t t
),
__terms AS (
  SELECT tm.n, tm.n_groups,
         CAST(CAST(mg.mg - tm.m AS DECIMAL(18,6)) AS DECIMAL(19,6))
           * CAST(CAST(mg.mg - tm.m AS DECIMAL(18,6)) AS DECIMAL(19,6)) AS tb,
         CAST(CAST(z.z - mg.mg AS DECIMAL(18,6)) AS DECIMAL(19,6))
           * CAST(CAST(z.z - mg.mg AS DECIMAL(18,6)) AS DECIMAL(19,6)) AS tw
  FROM __z z JOIN __mg mg ON z.g = mg.g CROSS JOIN __tm tm
),
__agg AS (
  SELECT n, n_groups,
         CAST(SUM(tb) AS DECIMAL(38,12)) AS ssb,
         CAST(SUM(tw) AS DECIMAL(38,12)) AS ssw
  FROM __terms GROUP BY n, n_groups
)
SELECT n, n_groups,
       {_d2d_sql("ssb")} AS ssb, {_d2d_sql("ssw")} AS ssw,
       CAST(CAST(CAST(CAST((CASE WHEN n_groups >= 2 THEN
         ({_d2d_sql("ssb")} * (CAST(n AS DOUBLE) - CAST(n_groups AS DOUBLE)))
         / ({_d2d_sql("ssw")} * (CAST(n_groups AS DOUBLE) - 1.0))
       END) * CAST(ABS(CASE WHEN n_groups >= 2 THEN
         ({_d2d_sql("ssb")} * (CAST(n AS DOUBLE) - CAST(n_groups AS DOUBLE)))
         / ({_d2d_sql("ssw")} * (CAST(n_groups AS DOUBLE) - 1.0))
       END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS f_stat
FROM __agg
"""


def auc_delong(
    df: DataFrame,
    score_col: str,
    pos_pred: Column,
    z: float = 1.959963984540054,
    round_to: int = 9,
) -> DataFrame:
    """One-row ROC AUC with the DeLong standard error and CI (DeLong,
    DeLong & Clarke-Pearson, Biometrics 1988): auc_rank_sum gives the
    point estimate; this adds the error bar a model-comparison decision
    actually needs, from the variance of the PLACEMENT values

        p_i = (#neg < s_i + ½·#neg = s_i)/n₂   (positives; q_j mirrored)
        SE² = Var(p)/n₁ + Var(q)/n₂

    Exact-integer formulation on the distinct-score table: 2·n₂·p_i =
    2·neg_below + neg_tied is an INTEGER shared by every positive tied
    at s, so Σp and Σp² clear to integer sums (P2 and P2² as
    (19,0)-operand products in DECIMAL(38,0)); both engines reach one
    fixed IEEE expression. The (19,0) bound means a CLASS larger than
    ~1.5e9 rows fails loudly on the P2² cast rather than silently
    wrong — at that n the DeLong SE is ~0 and a sampled AUC is the
    right tool anyway. Output ``(n_pos, n_neg, auc, se, lo, hi)`` with
    the CI clamped to [0,1]; se/lo/hi NULL when either class is empty
    or has a single row.

    Scale: one distinct-score collapse (support-sized — pre-round a
    continuous score, the ks_drift contract), one cumulative window
    over the support, one 1-row finish."""
    lbl = F.when(pos_pred, F.lit(1)).otherwise(F.lit(0))
    g = (
        df.where(F.col(score_col).isNotNull() & pos_pred.isNotNull())
        .select(F.col(score_col).cast("double").alias("__s"), lbl.alias("__y"))
        .groupBy("__s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__cnt"),
            F.sum("__y").cast("long").alias("__pos"),
        )
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, 0)
    # posabove = n1 − cumpos needs the TOTAL positives on every row, so
    # the full-frame window rides the same select as the cumulative ones
    # (a later withColumn could not order by the already-dropped __s)
    w_all = Window.orderBy("__s").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = g.select(
        "__cnt",
        "__pos",
        (F.col("__cnt") - F.col("__pos")).alias("__neg"),
        F.sum("__cnt").over(w).alias("__cum"),
        F.sum("__pos").over(w).alias("__cumpos"),
        F.sum("__pos").over(w_all).alias("__n1"),
    )
    cumneg = F.col("__cum") - F.col("__cumpos")
    negbelow = cumneg - F.col("__neg")
    p2 = (F.lit(2) * negbelow + F.col("__neg")).cast("decimal(19,0)")
    posabove = F.col("__n1") - F.col("__cumpos")
    q2 = (F.lit(2) * posabove + F.col("__pos")).cast("decimal(19,0)")
    agg = cum.agg(
        F.sum("__pos").cast("long").alias("n_pos"),
        F.sum("__neg").cast("long").alias("n_neg"),
        F.sum(F.col("__pos").cast("decimal(19,0)") * p2)
        .cast("decimal(38,0)")
        .alias("__a2"),
        F.sum(
            F.col("__pos").cast("decimal(19,0)") * (p2 * p2).cast("decimal(19,0)")
        )
        .cast("decimal(38,0)")
        .alias("__qa2"),
        F.sum(F.col("__neg").cast("decimal(19,0)") * q2)
        .cast("decimal(38,0)")
        .alias("__b2"),
        F.sum(
            F.col("__neg").cast("decimal(19,0)") * (q2 * q2).cast("decimal(19,0)")
        )
        .cast("decimal(38,0)")
        .alias("__qb2"),
    )
    n1d = F.col("n_pos").cast("double")
    n2d = F.col("n_neg").cast("double")
    a2d, qa2d = _d2d(F.col("__a2")), _d2d(F.col("__qa2"))
    b2d, qb2d = _d2d(F.col("__b2")), _d2d(F.col("__qb2"))
    auc = _div(a2d, F.lit(2.0) * n1d * n2d)
    s10 = _div(
        qa2d - _div(a2d * a2d, n1d),
        (n1d - F.lit(1.0)) * F.lit(4.0) * n2d * n2d,
    )
    s01 = _div(
        qb2d - _div(b2d * b2d, n2d),
        (n2d - F.lit(1.0)) * F.lit(4.0) * n1d * n1d,
    )
    se = F.sqrt(_div(s10, n1d) + _div(s01, n2d))
    ok = (F.col("n_pos") > 1) & (F.col("n_neg") > 1)
    zl = F.lit(float(z))
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(
            F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0), auc), round_to
        ).alias("auc"),
        F.round(F.when(ok, se), round_to).alias("se"),
        F.round(F.when(ok, F.greatest(auc - zl * se, F.lit(0.0))), round_to).alias(
            "lo"
        ),
        F.round(F.when(ok, F.least(auc + zl * se, F.lit(1.0))), round_to).alias(
            "hi"
        ),
    )


def auc_delong_sql(
    table: str,
    score_sql: str,
    pos_pred_sql: str,
    z: float = 1.959963984540054,
    round_to: int = 9,
) -> str:
    zs = repr(float(z))
    auc = f"({_d2d_sql('a2')} / (2.0 * n1d * n2d))"
    s10 = (
        f"(({_d2d_sql('qa2')} - {_d2d_sql('a2')} * {_d2d_sql('a2')} / n1d)"
        f" / ((n1d - 1.0) * 4.0 * n2d * n2d))"
    )
    s01 = (
        f"(({_d2d_sql('qb2')} - {_d2d_sql('b2')} * {_d2d_sql('b2')} / n2d)"
        f" / ((n2d - 1.0) * 4.0 * n1d * n1d))"
    )
    se = f"sqrt({s10} / n1d + {s01} / n2d)"
    return f"""
WITH __g AS (
  SELECT CAST({score_sql} AS DOUBLE) AS s, COUNT(*)::BIGINT AS cnt,
         SUM(CASE WHEN {pos_pred_sql} THEN 1 ELSE 0 END)::BIGINT AS pos
  FROM {table}
  WHERE ({score_sql}) IS NOT NULL AND ({pos_pred_sql}) IS NOT NULL
  GROUP BY s
),
__cum AS (
  SELECT cnt, pos, cnt - pos AS neg,
         CAST(SUM(cnt) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(SUM(pos) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS cumpos,
         CAST(SUM(pos) OVER () AS BIGINT) AS n1
  FROM __g
),
__p AS (
  SELECT pos, neg,
         CAST(2 * ((cum - cumpos) - neg) + neg AS DECIMAL(19,0)) AS p2,
         CAST(2 * (n1 - cumpos) + pos AS DECIMAL(19,0)) AS q2
  FROM __cum
),
__agg AS (
  SELECT SUM(pos)::BIGINT AS n_pos, SUM(neg)::BIGINT AS n_neg,
         CAST(SUM(CAST(pos AS DECIMAL(19,0)) * p2) AS DECIMAL(38,0)) AS a2,
         CAST(SUM(CAST(pos AS DECIMAL(19,0))
                  * CAST(p2 * p2 AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS qa2,
         CAST(SUM(CAST(neg AS DECIMAL(19,0)) * q2) AS DECIMAL(38,0)) AS b2,
         CAST(SUM(CAST(neg AS DECIMAL(19,0))
                  * CAST(q2 * q2 AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS qb2
  FROM __p
),
__d AS (
  SELECT n_pos, n_neg, a2, qa2, b2, qb2,
         CAST(n_pos AS DOUBLE) AS n1d, CAST(n_neg AS DOUBLE) AS n2d
  FROM __agg
)
SELECT n_pos, n_neg,
       CASE WHEN ABS(CASE WHEN n_pos > 0 AND n_neg > 0 THEN {auc} END) >= 1e16 THEN CAST((CASE WHEN n_pos > 0 AND n_neg > 0 THEN {auc} END) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CASE WHEN n_pos > 0 AND n_neg > 0 THEN {auc} END) * CAST(ABS(CASE WHEN n_pos > 0 AND n_neg > 0 THEN {auc} END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END
         AS auc,
       CASE WHEN ABS(CASE WHEN n_pos > 1 AND n_neg > 1 THEN {se} END) >= 1e16 THEN CAST((CASE WHEN n_pos > 1 AND n_neg > 1 THEN {se} END) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CASE WHEN n_pos > 1 AND n_neg > 1 THEN {se} END) * CAST(ABS(CASE WHEN n_pos > 1 AND n_neg > 1 THEN {se} END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END
         AS se,
       CAST(CAST(CAST(CAST((CASE WHEN n_pos > 1 AND n_neg > 1 THEN
         greatest({auc} - {zs} * {se}, 0.0) END) * CAST(ABS(CASE WHEN n_pos > 1 AND n_neg > 1 THEN
         greatest({auc} - {zs} * {se}, 0.0) END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS lo,
       CAST(CAST(CAST(CAST((CASE WHEN n_pos > 1 AND n_neg > 1 THEN
         least({auc} + {zs} * {se}, 1.0) END) * CAST(ABS(CASE WHEN n_pos > 1 AND n_neg > 1 THEN
         least({auc} + {zs} * {se}, 1.0) END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS hi
FROM __d
"""


def mcnemar(
    df: DataFrame,
    rule_a: Column,
    rule_b: Column,
    round_to: int = 9,
) -> DataFrame:
    """One-row McNemar test for two paired binary rules over the same
    rows (McNemar Psychometrika 1947): ``(n, n_both, n_a_only,
    n_b_only, n_neither, chi2_cc)`` with the continuity-corrected

        χ² = (max(|b − c| − 1, 0))² / (b + c)

    where b/c are the discordant counts (A-only / B-only). The filter-
    migration readout: swapping quality rule A for rule B, the marginal
    pass rates can look identical while b+c says how many documents
    actually flip — and χ² whether the flips are one-sided. Compare
    against the literal χ²₁ quantile (3.841459 at 5%) — no p-value
    (erf), the module convention. Rows where either rule is NULL are
    excluded; χ² is NULL when b + c = 0 (no discordant pairs). The
    max(…, 0) clamp keeps |b−c| ≤ 1 cases at 0 instead of the spurious
    1/(b+c) the naive corrected formula yields. Single-pass conditional
    aggregation — no shuffle beyond the 1-row agg."""
    a = rule_a.cast("boolean")
    b = rule_b.cast("boolean")
    base = df.where(a.isNotNull() & b.isNotNull()).select(
        a.alias("__a"), b.alias("__b")
    )
    one = lambda p: F.sum(F.when(p, 1).otherwise(0)).cast("long")  # noqa: E731
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        one(F.col("__a") & F.col("__b")).alias("n_both"),
        one(F.col("__a") & ~F.col("__b")).alias("n_a_only"),
        one(~F.col("__a") & F.col("__b")).alias("n_b_only"),
        one(~F.col("__a") & ~F.col("__b")).alias("n_neither"),
    )
    d = F.greatest(
        F.abs(F.col("n_a_only") - F.col("n_b_only")) - 1, F.lit(0)
    ).cast("double")
    chi2 = _div(d * d, (F.col("n_a_only") + F.col("n_b_only")).cast("double"))
    return agg.select(
        "n", "n_both", "n_a_only", "n_b_only", "n_neither",
        F.round(chi2, round_to).alias("chi2_cc"),
    )


def mcnemar_sql(
    table: str, rule_a_sql: str, rule_b_sql: str, round_to: int = 9
) -> str:
    return f"""
WITH __m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN ({rule_a_sql}) AND ({rule_b_sql}) THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
         CAST(SUM(CASE WHEN ({rule_a_sql}) AND NOT ({rule_b_sql}) THEN 1 ELSE 0 END) AS BIGINT) AS n_a_only,
         CAST(SUM(CASE WHEN NOT ({rule_a_sql}) AND ({rule_b_sql}) THEN 1 ELSE 0 END) AS BIGINT) AS n_b_only,
         CAST(SUM(CASE WHEN NOT ({rule_a_sql}) AND NOT ({rule_b_sql}) THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
  FROM {table}
  WHERE ({rule_a_sql}) IS NOT NULL AND ({rule_b_sql}) IS NOT NULL
)
SELECT n, n_both, n_a_only, n_b_only, n_neither,
       CAST(CAST(CAST(CAST((CASE WHEN n_a_only + n_b_only > 0
                  THEN CAST(GREATEST(abs(n_a_only - n_b_only) - 1, 0) AS DOUBLE)
                       * CAST(GREATEST(abs(n_a_only - n_b_only) - 1, 0) AS DOUBLE)
                       / CAST(n_a_only + n_b_only AS DOUBLE)
             END) * CAST(ABS(CASE WHEN n_a_only + n_b_only > 0
                  THEN CAST(GREATEST(abs(n_a_only - n_b_only) - 1, 0) AS DOUBLE)
                       * CAST(GREATEST(abs(n_a_only - n_b_only) - 1, 0) AS DOUBLE)
                       / CAST(n_a_only + n_b_only AS DOUBLE)
             END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS chi2_cc
FROM __m
"""
