"""DISTRIBUTION aggregation — quantiles / PMF / CDF of a numeric field.

Reference: KLL-family quantiles sketch with three output modes
(/root/reference src/test/java/com/yahoo/bullet/storm/FilterBoltTest.java:
740-786 — PMF over split points 0,50,100 yields 4 rows
{range, count, probability} including the +/-inf edge bins with exact
counts; DistributionType QUANTILE/PMF/CDF import at FilterBoltTest.java:17;
output field names via QuantileSketch.{RANGE,COUNT,PROBABILITY}_FIELD,
FilterBoltTest.java:79-86).

Output columns (lowercased for SQL friendliness, same set as the
reference): QUANTILE -> (quantile, value); PMF/CDF -> (range, count,
probability). Range labels use ASCII infinity: "(-inf, 0.0)",
"[0.0, 50.0)", "[100.0, +inf)"; CDF bins are "(-inf, s)" prefix masses plus
a final "(-inf, +inf)" total, matching the DataSketches getCDF definition
(mass strictly below each split point) that backs the reference.

Spark lowering — one pass, no Python:
* QUANTILE: exact ``percentile(col, array(fractions))`` (linear
  interpolation, identical to DuckDB quantile_cont) -> posexplode. At
  extreme scale swap to approx_percentile: same plan shape, bounded state.
* PMF: bin index = sum of (v >= split) comparisons (whole-stage codegen),
  single hash aggregate on <= k+1 keys, then a broadcast join against the
  k+1 static bin labels so empty bins emit count 0 like the sketch does.
* CDF: conditional-sum aggregate (one row), stack() to rows — zero
  shuffles beyond the scan-side partial agg.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from bullet_storm_spark.operators.common import apply_post, fmt_point, post_sql
from bullet_storm_spark.plans.query import (
    Distribution,
    DistributionType,
    PostAggregation,
)

RANGE_FIELD = "range"
COUNT_FIELD = "count"
PROBABILITY_FIELD = "probability"
QUANTILE_FIELD = "quantile"
VALUE_FIELD = "value"

NEG_INF = "-inf"
POS_INF = "+inf"


def pmf_labels(points: Sequence[float]) -> list[str]:
    """k split points -> k+1 half-open range labels."""
    pts = [fmt_point(p) for p in points]
    labels = [f"({NEG_INF}, {pts[0]})"]
    labels += [f"[{pts[i]}, {pts[i + 1]})" for i in range(len(pts) - 1)]
    labels.append(f"[{pts[-1]}, {POS_INF})")
    return labels


def cdf_labels(points: Sequence[float]) -> list[str]:
    return [f"({NEG_INF}, {fmt_point(p)})" for p in points] + [
        f"({NEG_INF}, {POS_INF})"
    ]


def _round(col, round_to):
    return F.round(col, round_to) if round_to is not None else col


def apply(df: DataFrame, agg: Distribution, post: Sequence[PostAggregation]) -> DataFrame:
    v = F.col(agg.field).cast("double")
    points = [float(p) for p in agg.points]
    if not points:
        raise ValueError("Distribution requires at least one point")

    if agg.dist_type == DistributionType.QUANTILE:
        pct = (
            F.percentile_approx(v, F.lit(points), F.lit(agg.accuracy))
            if agg.approx
            else F.percentile(v, F.lit(points))
        )
        row = df.where(v.isNotNull()).agg(pct.alias("__vals"))
        fracs = F.lit(points)
        out = (
            row.select(F.posexplode("__vals").alias("__i", VALUE_FIELD))
            .select(
                F.element_at(fracs, F.col("__i") + 1).alias(QUANTILE_FIELD),
                _round(F.col(VALUE_FIELD), agg.round_to).alias(VALUE_FIELD),
            )
        )
        return apply_post(out, post, None)

    if agg.dist_type == DistributionType.PMF:
        # one conditional-sum pass: bin_i count = #(v in [s_{i-1}, s_i)) via
        # per-split prefix masses — a single aggregate row stacked to k+1
        # bins (zero joins; empty bins emit 0 like the sketch does)
        aggs = [
            F.sum((v < F.lit(p)).cast("bigint")).alias(f"__lt{i}")
            for i, p in enumerate(points)
        ] + [F.count(F.lit(1)).alias("__total")]
        row = df.where(v.isNotNull()).agg(*aggs)
        labels = pmf_labels(points)
        pairs = []
        for i, lbl in enumerate(labels):
            if i == 0:
                cnt = f"coalesce(__lt0, 0L)"
            elif i < len(points):
                cnt = f"coalesce(__lt{i}, 0L) - coalesce(__lt{i - 1}, 0L)"
            else:
                cnt = f"__total - coalesce(__lt{len(points) - 1}, 0L)"
            pairs += [f"'{lbl}'", f"({cnt})"]
        stacked = row.select(
            F.expr(
                f"stack({len(labels)}, {', '.join(pairs)}) "
                f"AS ({RANGE_FIELD}, {COUNT_FIELD})"
            ),
            F.col("__total"),
        )
        out = stacked.select(
            RANGE_FIELD,
            COUNT_FIELD,
            _round(F.col(COUNT_FIELD) / F.col("__total"), agg.round_to).alias(
                PROBABILITY_FIELD
            ),
        )
        return apply_post(out, post, None)

    if agg.dist_type == DistributionType.CDF:
        aggs = [
            F.sum((v < F.lit(p)).cast("bigint")).alias(f"__c{i}")
            for i, p in enumerate(points)
        ] + [F.count(F.lit(1)).alias("__total")]
        row = df.where(v.isNotNull()).agg(*aggs)
        labels = cdf_labels(points)
        pairs = []
        for i in range(len(points)):
            pairs += [f"'{labels[i]}'", f"coalesce(__c{i}, 0L)"]
        pairs += [f"'{labels[-1]}'", "__total"]
        stacked = row.select(
            F.expr(
                f"stack({len(points) + 1}, {', '.join(pairs)}) "
                f"AS ({RANGE_FIELD}, {COUNT_FIELD})"
            ),
            F.col("__total"),
        )
        out = stacked.select(
            RANGE_FIELD,
            COUNT_FIELD,
            _round(
                F.col(COUNT_FIELD) / F.col("__total"), agg.round_to
            ).alias(PROBABILITY_FIELD),
        )
        return apply_post(out, post, None)

    raise ValueError(f"unsupported distribution type {agg.dist_type}")


def sql(agg: Distribution, base_sql: str, post: Sequence[PostAggregation]) -> str:
    if agg.approx and agg.dist_type == DistributionType.QUANTILE:
        raise ValueError(
            "approximate QUANTILE has no exact SQL oracle; omit the oracle "
            "entry for a rows-only check"
        )
    points = [float(p) for p in agg.points]
    f = agg.field
    rnd = agg.round_to
    base = f"SELECT CAST({f} AS DOUBLE) AS v FROM ({base_sql}) WHERE {f} IS NOT NULL"

    def r(expr: str) -> str:
        return f"CASE WHEN ABS({expr}) >= 1e16 THEN CAST(({expr}) AS DOUBLE) ELSE CAST(CAST(CAST(CAST(({expr}) * CAST(ABS({expr}) >= POWER(10.0, -({rnd}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{rnd})) AS VARCHAR) AS DOUBLE) END" if rnd is not None else expr

    if agg.dist_type == DistributionType.QUANTILE:
        arms = [
            # CAST: a bare 0.1 literal is DECIMAL in DuckDB, DOUBLE in Spark
            f"SELECT CAST({fmt_point(p)} AS DOUBLE) AS {QUANTILE_FIELD}, "
            f"{r(f'quantile_cont(v, {fmt_point(p)})')} AS {VALUE_FIELD} "
            f"FROM ({base})"
            for p in points
        ]
        inner = " UNION ALL ".join(arms)
        return post_sql(inner, post, None)

    if agg.dist_type == DistributionType.PMF:
        labels = pmf_labels(points)
        bin_expr = " + ".join(
            f"CAST(v >= {fmt_point(p)} AS INTEGER)" for p in points
        )
        values = ", ".join(
            f"({i}, '{lbl}')" for i, lbl in enumerate(labels)
        )
        inner = (
            f"WITH binned AS (SELECT ({bin_expr}) AS bin FROM ({base})), "
            f"counts AS (SELECT bin, COUNT(*) AS c FROM binned GROUP BY bin), "
            f"bins(bin, {RANGE_FIELD}) AS (VALUES {values}), "
            f"tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM binned) "
            f"SELECT {RANGE_FIELD}, CAST(COALESCE(c, 0) AS BIGINT) AS {COUNT_FIELD}, "
            f"{r('COALESCE(c, 0) / t')} AS {PROBABILITY_FIELD} "
            f"FROM bins LEFT JOIN counts USING (bin) CROSS JOIN tot"
        )
        return post_sql(inner, post, None)

    if agg.dist_type == DistributionType.CDF:
        labels = cdf_labels(points)
        sums = ", ".join(
            f"CAST(COALESCE(SUM(CAST(v < {fmt_point(p)} AS INTEGER)), 0) AS BIGINT)"
            f" AS c{i}"
            for i, p in enumerate(points)
        )
        arms = [
            f"SELECT '{labels[i]}' AS {RANGE_FIELD}, c{i} AS {COUNT_FIELD}, "
            f"{r(f'c{i} / CAST(total AS DOUBLE)')} AS {PROBABILITY_FIELD} FROM agg"
            for i in range(len(points))
        ] + [
            f"SELECT '{labels[-1]}' AS {RANGE_FIELD}, total AS {COUNT_FIELD}, "
            f"{r('total / CAST(total AS DOUBLE)')} AS {PROBABILITY_FIELD} FROM agg"
        ]
        inner = (
            f"WITH agg AS (SELECT {sums}, COUNT(*) AS total FROM ({base})) "
            + " UNION ALL ".join(arms)
        )
        return post_sql(inner, post, None)

    raise ValueError(f"unsupported distribution type {agg.dist_type}")


def weighted_quantiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    weight_col,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact weighted lower quantiles per key: ``(key, q, wq)`` — the
    smallest value whose cumulative weight reaches ``q``·W (the
    "weighted median" family: e.g. the document length at which half the
    TOKEN MASS sits in shorter documents, which is what batch packing and
    truncation budgets care about — the unweighted median answers a
    different question whenever length and weight correlate, i.e.
    always).

    Entirely EXACT arithmetic: weights must be non-negative integers
    (token counts, bytes, rows), each ``q`` must be exact at 3 decimals;
    the threshold test is ``cumw ≥ q·W`` in DECIMAL — no engine touches
    a float anywhere, so parity is structural. NULL when a key's total
    weight is 0.

    Scale posture (100 TB): one scan collapses to the (key, value)
    support; the cumulative window runs per key over the support (the
    ks_drift contract — pre-quantize a continuous value to bound it);
    one conditional-min aggregation per key emits |qs| rows.
    """
    if not qs:
        raise ValueError("need at least one quantile")
    for q in qs:
        if not (0.0 < q <= 1.0) or round(q, 3) != q:
            raise ValueError(
                f"each q must be in (0, 1] and exact at 3 decimals, got {q}"
            )
    w_col = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    sup = (
        df.select(
            F.col(key_col).alias("__k"),
            F.col(value_col).alias("__v"),
            w_col.cast("long").alias("__w"),
        )
        .where(F.col("__v").isNotNull() & (F.col("__w") >= 0))
        .groupBy("__k", "__v")
        .agg(F.sum("__w").cast("long").alias("__sw"))
    )
    from pyspark.sql import Window as _W

    w_cum = _W.partitionBy("__k").orderBy("__v").rowsBetween(
        _W.unboundedPreceding, _W.currentRow
    )
    w_tot = _W.partitionBy("__k")
    cum = sup.select(
        "__k",
        "__v",
        F.sum("__sw").over(w_cum).cast("long").alias("__cum"),
        F.sum("__sw").over(w_tot).cast("long").alias("__tot"),
    )
    # q exact at 3 decimals -> the threshold test is the all-integer
    # 1000·cumw ≥ qm·W ((19,0)x(19,0) -> (38,0) int128-exact in both
    # engines; a decimal-fraction multiply would hit Spark's precision
    # adjustment and round)
    _c19 = lambda c: c.cast("decimal(19,0)")
    picks = []
    for q in qs:
        qm = int(round(q * 1000))
        picks.append(
            F.min(
                F.when(
                    (F.col("__tot") > 0)
                    & (
                        F.lit(1000).cast("decimal(19,0)") * _c19(F.col("__cum"))
                        >= F.lit(qm).cast("decimal(19,0)")
                        * _c19(F.col("__tot"))
                    ),
                    F.col("__v"),
                )
            ).alias(f"__q{qm}")
        )
    agg = cum.groupBy("__k").agg(*picks)
    arms = [
        F.struct(
            F.lit(float(q)).alias("q"),
            F.col(f"__q{int(round(q * 1000))}").alias("wq"),
        )
        for q in qs
    ]
    return (
        agg.select(
            F.col("__k").alias(key_col), F.explode(F.array(*arms)).alias("__e")
        )
        .select(key_col, "__e.q", "__e.wq")
        .orderBy(key_col, "q")
    )


def weighted_quantiles_sql(
    table: str,
    key_col: str,
    value_col: str,
    weight_sql: str,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
) -> str:
    if not qs:
        raise ValueError("need at least one quantile")
    for q in qs:
        if not (0.0 < q <= 1.0) or round(q, 3) != q:
            raise ValueError(
                f"each q must be in (0, 1] and exact at 3 decimals, got {q}"
            )
    picks = ", ".join(
        f"MIN(CASE WHEN tot > 0 AND "
        f"CAST(1000 AS DECIMAL(19,0)) * CAST(cum AS DECIMAL(19,0)) >= "
        f"CAST({int(round(q * 1000))} AS DECIMAL(19,0)) * CAST(tot AS DECIMAL(19,0)) "
        f"THEN v END) AS q{int(round(q * 1000))}"
        for q in qs
    )
    arms = "\nUNION ALL\n".join(
        f"SELECT k AS {key_col}, CAST({float(q)!r} AS DOUBLE) AS q, "
        f"q{int(round(q * 1000))} AS wq FROM __a"
        for q in qs
    )
    return f"""
WITH __sup AS (
  SELECT {key_col} AS k, {value_col} AS v,
         SUM(CAST({weight_sql} AS BIGINT))::BIGINT AS sw
  FROM {table}
  WHERE {value_col} IS NOT NULL AND CAST({weight_sql} AS BIGINT) >= 0
  GROUP BY 1, 2
),
__cum AS (
  SELECT k, v,
         CAST(SUM(sw) OVER (PARTITION BY k ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         CAST(SUM(sw) OVER (PARTITION BY k) AS BIGINT) AS tot
  FROM __sup
),
__a AS (
  SELECT k, {picks} FROM __cum GROUP BY k
)
{arms}
ORDER BY {key_col}, q
"""


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """(grp, v, n, pct_permille, v_norm): cross-group quantile
    normalization — each group's value support mapped onto the POOLED
    distribution (Bolstad et al. Bioinformatics 2003, the microarray
    normalization transplanted to corpus curation): a doc that sits at
    its source's 70th percentile of length is assigned the pooled 70th-
    percentile length, so per-source scale drift cancels before any
    global threshold runs.  The row-level transform is then one
    broadcast join of this support-sized mapping.

    ALL-INTEGER lattice: within-group position is the doubled midrank
    permille ``(1000·(2·cum_before + c)) div (2·n)`` and the pooled
    lookup is the weighted-quantiles threshold scan, materialized as an
    EXACT permille table — each pooled support row explodes to the
    integer permille range it covers (``(1000·cum_prev) div N + 1 ..
    (1000·cum) div N``, 1001 rows total, p=0 pinned to the pooled
    minimum), so the group↔pooled composition is an EQUI-join on the
    permille key.  No engine evaluates a float anywhere; quantization
    to 1/1000 fractions is the documented, deterministic resolution
    (the weighted_quantiles q-grid convention).

    Scale posture (100 TB): one scan to the (group, value) support;
    cumulative windows run over supports (domain-bounded — the ks_drift
    contract); the permille table is always 1001 rows.  Row counts up
    to ~9.2e15 stay exact in the int64 products (1000·cum).
    """
    sup = (
        df.select(
            F.col(group_col).alias("grp"), F.col(value_col).alias("v")
        )
        .where(F.col("v").isNotNull())
        .groupBy("grp", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wg = Window.partitionBy("grp").orderBy("v")
    per_grp = sup.select(
        "grp",
        "v",
        "c",
        (
            F.sum("c").over(wg.rowsBetween(Window.unboundedPreceding, 0))
            - F.col("c")
        ).cast("long").alias("__cb"),
        F.sum("c").over(Window.partitionBy("grp")).cast("long").alias("n"),
    ).select(
        "grp",
        "v",
        "n",
        F.expr(
            "CAST((1000 * (2 * __cb + c)) div (2 * n) AS BIGINT)"
        ).alias("pct_permille"),
    )
    pooled = (
        df.select(F.col(value_col).alias("v"))
        .where(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wp = Window.orderBy("v")
    pooled_cum = pooled.select(
        "v",
        (
            F.sum("c").over(wp.rowsBetween(Window.unboundedPreceding, 0))
            - F.col("c")
        ).cast("long").alias("__cb"),
        F.sum("c").over(wp.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("__cum"),
        F.sum("c").over(
            wp.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).cast("long").alias("__N"),
    )
    lo = F.expr(
        "CASE WHEN __cb = 0 THEN CAST(0 AS BIGINT) "
        "ELSE CAST((1000 * __cb) div __N + 1 AS BIGINT) END"
    )
    hi = F.expr("CAST((1000 * __cum) div __N AS BIGINT)")
    # a support row can cover NO permille point (lo > hi): Spark's
    # sequence() would silently REVERSE there (descending ranges), so
    # the empty case must be an explicit empty array — DuckDB's
    # range(lo, hi+1) is empty by definition
    permille = pooled_cum.select(
        F.col("v").alias("v_norm"),
        F.explode(
            F.when(lo <= hi, F.sequence(lo, hi)).otherwise(
                F.array().cast("array<bigint>")
            )
        ).alias("pct_permille"),
    )
    return (
        per_grp.join(F.broadcast(permille), "pct_permille")
        .select("grp", "v", "n", "pct_permille", "v_norm")
        .orderBy("grp", "v")
    )


def quantile_normalize_sql(table: str, group_sql: str, value_sql: str) -> str:
    return f"""
WITH __s AS (
  SELECT {group_sql} AS grp, {value_sql} AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM {table} WHERE {value_sql} IS NOT NULL GROUP BY grp, v
),
__g AS (
  SELECT grp, v,
         CAST(SUM(c) OVER (PARTITION BY grp ORDER BY v
              ROWS UNBOUNDED PRECEDING) - c AS BIGINT) AS cb,
         c,
         CAST(SUM(c) OVER (PARTITION BY grp) AS BIGINT) AS n
  FROM __s
),
__gp AS (
  SELECT grp, v, n,
         (1000 * (2 * cb + c)) // (2 * n) AS pct_permille
  FROM __g
),
__p AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT {value_sql} AS v FROM {table} WHERE {value_sql} IS NOT NULL)
  GROUP BY v
),
__pc AS (
  SELECT v,
         CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c
              AS BIGINT) AS cb,
         CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum,
         CAST(SUM(c) OVER () AS BIGINT) AS N
  FROM __p
),
__pm AS (
  SELECT v AS v_norm,
         UNNEST(range(
           CASE WHEN cb = 0 THEN 0 ELSE (1000 * cb) // N + 1 END,
           (1000 * cum) // N + 1
         )) AS pct_permille
  FROM __pc
)
SELECT g.grp, g.v, g.n, CAST(g.pct_permille AS BIGINT) AS pct_permille,
       m.v_norm
FROM __gp g JOIN __pm m ON g.pct_permille = m.pct_permille
ORDER BY g.grp, g.v
"""
