"""Exact isotonic regression (PAV) as declarative algebra — the
monotone calibrator behind reliability-diagram repair.

``calibration_bins`` (stats_tests) DIAGNOSES miscalibration; isotonic
regression FIXES it: the nondecreasing step function g minimizing
Σ w·(y − g(s))² over the score support, the standard nonparametric
calibrator (Zadrozny & Elkan KDD'02; Robertson/Wright/Dykstra 1988).
The classical algorithm is Pool-Adjacent-Violators — inherently
sequential.  This implementation instead evaluates the CLOSED FORM

    fit[i] = max_{j ≤ i}  min_{k ≥ i}  wavg(y over cells j..k)

(the minimax identity, RWD 1988 thm 1.4.4) — which is pure join+window
algebra over the SCORE SUPPORT:

1. collapse rows to per-score cells ``(score, cnt, pos)`` — the only
   fact-table shuffle; the support is DOMAIN-bounded (the ks_drift /
   weighted-quantiles contract: quantize continuous scores first);
2. prefix sums over the ordered cells (one window);
3. all (j ≤ k) cell pairs by equi-join with ``wavg(j..k)`` from prefix
   differences — support², not data², rows;
4. suffix-min over k within each j (one window), then the row at
   ``k = i`` holds min_{k' ≥ i} wavg(j..i'); a max-groupBy over k
   finishes fit[i].

Engine parity: prefix sums are integers, so every ``wavg`` is ONE IEEE
division of identical integers in both engines; min/max over identical
double sets are deterministic (no tie hazard — equal doubles give equal
results).  The output fit is additionally 9dp-rounded (the
robust_outliers boundary convention) purely for display stability.

Scale posture (100 TB): support² pairs with support ≤ a few thousand is
<10M rows regardless of input size; everything after step 1 is
support-bounded.  The monotone-fit table is then a broadcast-join
calibration map for the full corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def isotonic_fit(
    df: DataFrame,
    score: Column,
    label: Column,
) -> DataFrame:
    """(score, cnt, pos, rate_raw, rate_fit): the isotonic (monotone
    nondecreasing) calibrated rate per score-support point.  ``score``
    must be integer-valued (quantize upstream); ``label`` boolean."""
    cells = (
        df.select(
            score.cast("long").alias("score"),
            label.cast("long").alias("__y"),
        )
        .groupBy("score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("__y").cast("long").alias("pos"),
        )
    )
    w = Window.orderBy("score")
    pre = cells.select(
        "score",
        "cnt",
        "pos",
        F.row_number().over(w).cast("long").alias("__i"),
        F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("__cc"),
        F.sum("pos").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("__cp"),
    )
    # (j <= k) pairs: wavg(j..k) from prefix differences.  The join key
    # is a constant (single series); both sides are support-sized.
    lo = pre.select(
        F.col("__i").alias("__j"),
        (F.col("__cc") - F.col("cnt")).alias("__cc0"),
        (F.col("__cp") - F.col("pos")).alias("__cp0"),
    )
    hi = pre.select(
        F.col("__i").alias("__k"),
        F.col("__cc").alias("__cc1"),
        F.col("__cp").alias("__cp1"),
    )
    pairs = lo.crossJoin(hi).where(F.col("__j") <= F.col("__k"))
    avg = (
        (F.col("__cp1") - F.col("__cp0")).cast("double")
        / (F.col("__cc1") - F.col("__cc0")).cast("double")
    )
    wj = (
        Window.partitionBy("__j")
        .orderBy(F.desc("__k"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scored = pairs.select(
        "__j", "__k", F.min(avg).over(wj).alias("__sm")
    )
    fit = scored.groupBy(F.col("__k").alias("__i")).agg(
        F.max("__sm").alias("__fit")
    )
    return (
        pre.join(F.broadcast(fit), "__i")
        .select(
            "score",
            "cnt",
            "pos",
            F.round(
                F.col("pos").cast("double") / F.col("cnt").cast("double"), 9
            ).alias("rate_raw"),
            F.round(F.col("__fit"), 9).alias("rate_fit"),
        )
        .orderBy("score")
    )


def isotonic_fit_sql(table: str, score_sql: str, label_sql: str) -> str:
    return f"""
WITH __cells AS (
  SELECT CAST({score_sql} AS BIGINT) AS score,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(CASE WHEN {label_sql} THEN 1 ELSE 0 END) AS BIGINT) AS pos
  FROM {table} GROUP BY score
),
__pre AS (
  SELECT score, cnt, pos,
         CAST(ROW_NUMBER() OVER (ORDER BY score) AS BIGINT) AS i,
         CAST(SUM(cnt) OVER (ORDER BY score
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cc,
         CAST(SUM(pos) OVER (ORDER BY score
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cp
  FROM __cells
),
__pairs AS (
  SELECT l.i AS j, h.i AS k,
         CAST(h.cp - (l.cp - l.pos) AS DOUBLE)
           / CAST(h.cc - (l.cc - l.cnt) AS DOUBLE) AS a
  FROM __pre l JOIN __pre h ON l.i <= h.i
),
__sm AS (
  SELECT j, k,
         MIN(a) OVER (PARTITION BY j ORDER BY k DESC
                      ROWS UNBOUNDED PRECEDING) AS sm
  FROM __pairs
),
__fit AS (
  SELECT k AS i, MAX(sm) AS fit FROM __sm GROUP BY k
)
SELECT p.score, p.cnt, p.pos,
       CASE WHEN ABS(CAST(p.pos AS DOUBLE) / p.cnt) >= 1e16 THEN CAST((CAST(p.pos AS DOUBLE) / p.cnt) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(p.pos AS DOUBLE) / p.cnt) * CAST(ABS(CAST(p.pos AS DOUBLE) / p.cnt) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS rate_raw,
       CASE WHEN ABS(f.fit) >= 1e16 THEN CAST((f.fit) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((f.fit) * CAST(ABS(f.fit) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS rate_fit
FROM __pre p JOIN __fit f ON p.i = f.i
ORDER BY p.score
"""
