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

from pyspark.sql import Column, DataFrame, Window, functions as F

# values quantize to DECIMAL(19,6) on entry (the group.py exact-sum
# convention): squares are then exact at 12 dp, so sum(x) and sum(x^2)
# are order-independent and engine-identical
_MOMENT = "decimal(38,12)"
_VAL_DEC = "decimal(19,6)"


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
    auc = (
        F.col("__rs2").cast("double") / F.lit(2.0)
        - F.col("n_pos").cast("double")
        * (F.col("n_pos").cast("double") + F.lit(1.0))
        / F.lit(2.0)
    ) / (F.col("n_pos").cast("double") * F.col("n_neg").cast("double"))
    return agg.select(
        "n_pos",
        "n_neg",
        F.col("__rs2").cast("double").alias("rank_sum2"),
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
SELECT n_pos, n_neg, CAST(rs2 AS DOUBLE) AS rank_sum2,
       ROUND(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         (CAST(rs2 AS DOUBLE) / 2.0
          - CAST(n_pos AS DOUBLE) * (CAST(n_pos AS DOUBLE) + 1.0) / 2.0)
         / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
       END, {round_to}) AS auc
FROM __agg
"""


def _arm_moments(value: Column, in_arm: Column) -> list[Column]:
    """n / exact-decimal Σx / Σx² for one arm, as conditional aggregates
    over a single scan (x quantizes to DECIMAL(19,6) on entry, so x² is
    exact at 12dp and both sums are order-independent)."""
    x = F.when(in_arm, value).cast(_VAL_DEC)
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
    n < 2 or both variances are zero. Values quantize to DECIMAL(19,6)
    for the moment sums (the repo's order-independence convention)."""
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
    ma = F.col("__sa").cast("double") / n_a
    mb = F.col("__sb").cast("double") / n_b
    va = (
        F.col("__qa").cast("double")
        - F.col("__sa").cast("double") * F.col("__sa").cast("double") / n_a
    ) / (n_a - F.lit(1.0))
    vb = (
        F.col("__qb").cast("double")
        - F.col("__sb").cast("double") * F.col("__sb").cast("double") / n_b
    ) / (n_b - F.lit(1.0))
    se2 = va / n_a + vb / n_b
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2)
    t = F.when(ok & (se2 > 0), (ma - mb) / F.sqrt(se2))
    dof = F.when(
        ok & (se2 > 0),
        (se2 * se2)
        / (
            (va / n_a) * (va / n_a) / (n_a - F.lit(1.0))
            + (vb / n_b) * (vb / n_b) / (n_b - F.lit(1.0))
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
        x = (
            f"CAST(CASE WHEN {pred} THEN CAST({value_sql} AS DOUBLE) END"
            " AS DECIMAL(19,6))"
        )
        return (
            f"COUNT({x})::BIGINT AS n_{tag},\n"
            f"         CAST(SUM(CAST({x} AS DECIMAL(38,12)))"
            f" AS DECIMAL(38,12)) AS s_{tag},\n"
            f"         CAST(SUM(CAST({x} * {x} AS DECIMAL(38,12)))"
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
         CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
         CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
         (CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)
            / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0) AS va,
         (CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)
            / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0) AS vb
  FROM __m
)
SELECT n_a, n_b,
       ROUND(CASE WHEN n_a > 0 THEN ma END, {round_to}) AS mean_a,
       ROUND(CASE WHEN n_b > 0 THEN mb END, {round_to}) AS mean_b,
       ROUND(CASE WHEN n_a >= 2 AND n_b >= 2
                   AND va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE) > 0
         THEN (ma - mb) / sqrt(va / CAST(n_a AS DOUBLE)
                               + vb / CAST(n_b AS DOUBLE)) END, {round_to})
         AS t_stat,
       ROUND(CASE WHEN n_a >= 2 AND n_b >= 2
                   AND va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE) > 0
         THEN ((va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE))
               * (va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE)))
              / ((va / CAST(n_a AS DOUBLE)) * (va / CAST(n_a AS DOUBLE))
                   / (CAST(n_a AS DOUBLE) - 1.0)
                 + (vb / CAST(n_b AS DOUBLE)) * (vb / CAST(n_b AS DOUBLE))
                   / (CAST(n_b AS DOUBLE) - 1.0)) END, {round_to}) AS dof
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
    pa, pb = s_a / n_a, s_b / n_b
    pp = (s_a + s_b) / (n_a + n_b)
    se2 = pp * (F.lit(1.0) - pp) * (F.lit(1.0) / n_a + F.lit(1.0) / n_b)
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return agg.select(
        "n_a",
        "s_a",
        "n_b",
        "s_b",
        F.round(F.when(F.col("n_a") > 0, pa), round_to).alias("p_a"),
        F.round(F.when(F.col("n_b") > 0, pb), round_to).alias("p_b"),
        F.round(F.when(ok & (se2 > 0), (pa - pb) / F.sqrt(se2)), round_to).alias(
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
       ROUND(CASE WHEN n_a > 0 THEN pa END, {round_to}) AS p_a,
       ROUND(CASE WHEN n_b > 0 THEN pb END, {round_to}) AS p_b,
       ROUND(CASE WHEN n_a > 0 AND n_b > 0
                   AND pp * (1.0 - pp) * (1.0 / CAST(n_a AS DOUBLE)
                                          + 1.0 / CAST(n_b AS DOUBLE)) > 0
         THEN (pa - pb) / sqrt(pp * (1.0 - pp)
                               * (1.0 / CAST(n_a AS DOUBLE)
                                  + 1.0 / CAST(n_b AS DOUBLE))) END,
         {round_to}) AS z_stat
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
    pe = F.col("__pe").cast("double") / (n_d * n_d)
    po = F.col("agree").cast("double") / n_d
    return joined.select(
        "n",
        "agree",
        F.round(F.when(F.col("n") > 0, po), round_to).alias("po"),
        F.round(F.when(F.col("n") > 0, pe), round_to).alias("pe"),
        F.round(
            F.when(
                (F.col("n") > 0) & (pe < 1.0), (po - pe) / (F.lit(1.0) - pe)
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
       ROUND(CASE WHEN d.n > 0
         THEN CAST(d.agree AS DOUBLE) / CAST(d.n AS DOUBLE) END,
         {round_to}) AS po,
       ROUND(CASE WHEN d.n > 0
         THEN CAST(p.pe_num AS DOUBLE)
              / (CAST(d.n AS DOUBLE) * CAST(d.n AS DOUBLE)) END,
         {round_to}) AS pe,
       ROUND(CASE WHEN d.n > 0 AND CAST(p.pe_num AS DOUBLE)
                  / (CAST(d.n AS DOUBLE) * CAST(d.n AS DOUBLE)) < 1.0
         THEN (CAST(d.agree AS DOUBLE) / CAST(d.n AS DOUBLE)
               - CAST(p.pe_num AS DOUBLE)
                 / (CAST(d.n AS DOUBLE) * CAST(d.n AS DOUBLE)))
              / (1.0 - CAST(p.pe_num AS DOUBLE)
                 / (CAST(d.n AS DOUBLE) * CAST(d.n AS DOUBLE))) END,
         {round_to}) AS kappa
FROM __diag d CROSS JOIN __pe p
"""
