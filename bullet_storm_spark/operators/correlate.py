"""Pairwise Pearson correlation matrix in ONE aggregation pass,
dual-compiled.

The feature-redundancy pre-flight: before anyone trains on (or samples
by) a set of numeric columns, the correlation matrix says which of them
are the same signal. The naive formulation — unpivot to (row, col,
value) and self-join on the row id — shuffles the fact table against
itself; this operator instead computes every pairwise moment
(Σx, Σx², Σxy for all pairs) as explicit columns of a SINGLE
map-side-combined aggregation, so a k-column matrix over 100 TB is one
scan, one 1-row reduction, and a k²-row literal explode. Rows with a
NULL in ANY requested column are excluded (listwise completeness, the
textbook matrix definition — documented because pairwise-complete
would need per-pair counts).

Engine parity (the stats_tests convention): values quantize to
DECIMAL(18,6) on entry, so products are (37,12)-exact in both engines;
the exact sums convert via the ``_d2d`` text hop and the closed form

    corr = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²))

runs in IEEE doubles with identical association on both sides (explicit
parentheses mirror the Column tree — the SCALING.md BM25 lesson).
Zero-variance columns yield NULL correlations (``try_divide``).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, Window, functions as F

from bullet_storm_spark.operators.stats_tests import (
    _MOMENT,
    _VAL_DEC,
    _d2d,
    _d2d_sql,
    _div,
    _q6,
    _q6_sql,
)


def correlation_matrix(
    df: DataFrame, cols: list[str], exact_decimal: bool = False
) -> DataFrame:
    """Pairwise Pearson correlations: ``(col_x, col_y, n, corr)`` for
    every unordered pair of ``cols`` (col_x < col_y positionally),
    ordered by (col_x, col_y). Pass ``exact_decimal=True`` when every
    input column is already an exact DECIMAL with scale ≤ 6: the entry
    quantize is then a pure rescale (no rounding, engine-identical) and
    the per-row double→string→decimal text hop — the dominant per-row
    cost, measured 3.2 s vs 1.3 s at sf0.1 — is skipped."""
    complete = df.where(
        F.expr(" AND ".join(f"{c} IS NOT NULL" for c in cols))
    )
    ent = (
        (lambda c: F.col(c).cast(_VAL_DEC))
        if exact_decimal
        else (lambda c: F.col(c).cast("double").cast("string").cast(_VAL_DEC))
    )
    # the moment pass is CPU-bound (the entry quantize, then k² decimal
    # multiplies per row) and reduces to ONE row, so its cost is the
    # PARTIAL phase — which runs at the scan's parallelism. A single-file
    # table scans as one effective task (guide §2.5 input skew); spread
    # the raw rows BEFORE the per-row decimal casts so both the quantize
    # and the products run at full width. Gated on the actual scan width
    # so a production table that already scans wide never pays a
    # pointless extra shuffle. Round-robin is retry-safe
    # (sortBeforeRepartition, SPARK-23207) and result-neutral: every
    # aggregate here is an exact decimal sum or count, identical under
    # any row order and grouping.
    par = df.sparkSession.sparkContext.defaultParallelism
    if complete.rdd.getNumPartitions() < par:
        complete = complete.select(*cols).repartition(par)
    vals = complete.select(*[ent(c).alias(c) for c in cols])
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast(_MOMENT)).cast(_MOMENT).alias(f"__s_{c}"))
        aggs.append(
            F.sum((F.col(c) * F.col(c)).cast(_MOMENT))
            .cast(_MOMENT)
            .alias(f"__q_{c}")
        )
    for x, y in combinations(cols, 2):
        aggs.append(
            F.sum((F.col(x) * F.col(y)).cast(_MOMENT))
            .cast(_MOMENT)
            .alias(f"__p_{x}__{y}")
        )
    one = vals.agg(*aggs)
    n_d = F.col("n").cast("double")
    pairs = []
    for x, y in combinations(cols, 2):
        sx, sy = _d2d(F.col(f"__s_{x}")), _d2d(F.col(f"__s_{y}"))
        qx, qy = _d2d(F.col(f"__q_{x}")), _d2d(F.col(f"__q_{y}"))
        sxy = _d2d(F.col(f"__p_{x}__{y}"))
        num = (n_d * sxy) - (sx * sy)
        # clamp the variance arms at 0 before the sqrt: a catastrophic
        # cancellation can leave −eps, which Spark sqrts to NaN while
        # DuckDB raises (the chi2_independence lesson)
        vx = F.greatest((n_d * qx) - (sx * sx), F.lit(0.0))
        vy = F.greatest((n_d * qy) - (sy * sy), F.lit(0.0))
        den = F.sqrt(vx * vy)
        pairs.append(
            F.struct(
                F.lit(x).alias("col_x"),
                F.lit(y).alias("col_y"),
                F.col("n").alias("n"),
                _div(num, den).alias("corr"),
            )
        )
    return (
        one.select(F.explode(F.array(*pairs)).alias("__e"))
        .select("__e.col_x", "__e.col_y", "__e.n", "__e.corr")
        .orderBy("col_x", "col_y")
    )


def correlation_matrix_sql(
    table: str, cols: list[str], exact_decimal: bool = False
) -> str:
    # (19,6) operands: DuckDB types a d*d product at w1+w2 digits and
    # overflows the int64 backing of an (18,6)x(18,6) product; 19 digits
    # force int128 arithmetic — (38,12), exact, equal to Spark's (37,12)
    # (the stats_tests widening convention)
    if exact_decimal:
        qv = lambda c: f"CAST({c} AS DECIMAL(19,6))"
    else:
        qv = (
            lambda c: f"CAST(CAST(CAST({c} AS DOUBLE) AS VARCHAR)"
            " AS DECIMAL(19,6))"
        )
    complete = " AND ".join(f"{c} IS NOT NULL" for c in cols)
    sums = ["COUNT(*)::BIGINT AS n"]
    for c in cols:
        sums.append(
            f"CAST(SUM(CAST({qv(c)} AS DECIMAL(38,12))) AS DECIMAL(38,12))"
            f" AS s_{c}"
        )
        sums.append(
            f"CAST(SUM(CAST({qv(c)} * {qv(c)} AS DECIMAL(38,12)))"
            f" AS DECIMAL(38,12)) AS q_{c}"
        )
    for x, y in combinations(cols, 2):
        sums.append(
            f"CAST(SUM(CAST({qv(x)} * {qv(y)} AS DECIMAL(38,12)))"
            f" AS DECIMAL(38,12)) AS p_{x}__{y}"
        )
    arms = []
    for x, y in combinations(cols, 2):
        sx, sy = _d2d_sql(f"s_{x}"), _d2d_sql(f"s_{y}")
        qx, qy = _d2d_sql(f"q_{x}"), _d2d_sql(f"q_{y}")
        sxy = _d2d_sql(f"p_{x}__{y}")
        nd = "CAST(n AS DOUBLE)"
        num = f"(({nd} * {sxy}) - ({sx} * {sy}))"
        den = (
            f"sqrt(GREATEST(({nd} * {qx}) - ({sx} * {sx}), 0.0)"
            f" * GREATEST(({nd} * {qy}) - ({sy} * {sy}), 0.0))"
        )
        arms.append(
            f"SELECT '{x}' AS col_x, '{y}' AS col_y, n,"
            f" CASE WHEN {den} <> 0.0 THEN {num} / {den} END AS corr"
            f" FROM __m"
        )
    union = "\nUNION ALL\n".join(arms)
    return f"""
WITH __m AS (
  SELECT {', '.join(sums)}
  FROM {table} WHERE {complete}
)
{union}
ORDER BY col_x, col_y
"""


def spearman(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_expr=None,
    y_expr=None,
) -> DataFrame:
    """One-row Spearman rank correlation with exact tie midranks:
    ``(n, rho)``. Rows with a NULL in either column are excluded.

    Midranks come from each column's SUPPORT (value → count → cumulative
    count), not from a global per-row sort: ``2·midrank = 2·cum_before +
    cnt + 1`` is an integer (the auc_rank_sum identity), Spearman is
    scale-invariant, so the whole statistic runs on integer doubled
    ranks with DECIMAL(38,0)-exact moments — both engines reach one
    closed-form IEEE finish on identical inputs. The support-sized
    cumulative window carries the same contract as ks_drift/auc: bound
    the support at scale by pre-quantizing continuous values via
    ``x_expr``/``y_expr`` (e.g. round a price to whole units — the rank
    correlation of the quantized value is what you asked for then).

    Scale posture (100 TB): one scan for each column's support
    aggregation (map-side combined), support-sized rank windows, two
    broadcast-joins of the rank maps back onto the fact, one 1-row
    moment reduction. Σ(2r)² ≈ 4n³ stays inside DECIMAL(38,0) to n≈10¹².
    """
    xe = x_expr if x_expr is not None else F.col(x_col)
    ye = y_expr if y_expr is not None else F.col(y_col)
    pts = df.select(xe.alias("__x"), ye.alias("__y")).where(
        F.col("__x").isNotNull() & F.col("__y").isNotNull()
    )

    def rank_map(col):
        sup = pts.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("__c"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return sup.select(
            col,
            (
                F.lit(2) * F.coalesce(F.sum("__c").over(w), F.lit(0))
                + F.col("__c")
                + F.lit(1)
            ).cast("long").alias(f"__r{col}"),
        )

    ranked = pts.join(F.broadcast(rank_map("__x")), "__x").join(
        F.broadcast(rank_map("__y")), "__y"
    )
    ex = "decimal(38,0)"
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("__r__x").cast(ex)).cast(ex).alias("__sx"),
        F.sum(F.col("__r__y").cast(ex)).cast(ex).alias("__sy"),
        F.sum((F.col("__r__x").cast(ex) * F.col("__r__x").cast(ex))).cast(ex).alias("__qx"),
        F.sum((F.col("__r__y").cast(ex) * F.col("__r__y").cast(ex))).cast(ex).alias("__qy"),
        F.sum((F.col("__r__x").cast(ex) * F.col("__r__y").cast(ex))).cast(ex).alias("__pxy"),
    )
    n_d = F.col("n").cast("double")
    sx, sy = _d2d(F.col("__sx")), _d2d(F.col("__sy"))
    qx, qy = _d2d(F.col("__qx")), _d2d(F.col("__qy"))
    pxy = _d2d(F.col("__pxy"))
    num = (n_d * pxy) - (sx * sy)
    vx = F.greatest((n_d * qx) - (sx * sx), F.lit(0.0))
    vy = F.greatest((n_d * qy) - (sy * sy), F.lit(0.0))
    return agg.select("n", _div(num, F.sqrt(vx * vy)).alias("rho"))


def spearman_sql(
    table: str,
    x_col: str,
    y_col: str,
    x_sql: str | None = None,
    y_sql: str | None = None,
) -> str:
    xe = x_sql if x_sql is not None else x_col
    ye = y_sql if y_sql is not None else y_col
    return f"""
WITH __p AS (
  SELECT {xe} AS x, {ye} AS y FROM {table}
  WHERE {xe} IS NOT NULL AND {ye} IS NOT NULL
),
__rx AS (
  SELECT x,
         (2 * COALESCE(SUM(c) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          + c + 1)::BIGINT AS rx
  FROM (SELECT x, COUNT(*)::BIGINT AS c FROM __p GROUP BY x)
),
__ry AS (
  SELECT y,
         (2 * COALESCE(SUM(c) OVER (ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          + c + 1)::BIGINT AS ry
  FROM (SELECT y, COUNT(*)::BIGINT AS c FROM __p GROUP BY y)
),
__m AS (
  SELECT COUNT(*)::BIGINT AS n,
         CAST(SUM(CAST(rx AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(CAST(ry AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(rx AS DECIMAL(19,0)) * CAST(rx AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS qx,
         CAST(SUM(CAST(ry AS DECIMAL(19,0)) * CAST(ry AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS qy,
         CAST(SUM(CAST(rx AS DECIMAL(19,0)) * CAST(ry AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS pxy
  FROM __p JOIN __rx USING (x) JOIN __ry USING (y)
)
SELECT n,
       CASE WHEN sqrt(GREATEST((CAST(n AS DOUBLE) * {_d2d_sql('qx')})
                      - ({_d2d_sql('sx')} * {_d2d_sql('sx')}), 0.0)
                 * GREATEST((CAST(n AS DOUBLE) * {_d2d_sql('qy')})
                      - ({_d2d_sql('sy')} * {_d2d_sql('sy')}), 0.0)) <> 0.0
            THEN ((CAST(n AS DOUBLE) * {_d2d_sql('pxy')})
                  - ({_d2d_sql('sx')} * {_d2d_sql('sy')}))
                 / sqrt(GREATEST((CAST(n AS DOUBLE) * {_d2d_sql('qx')})
                        - ({_d2d_sql('sx')} * {_d2d_sql('sx')}), 0.0)
                      * GREATEST((CAST(n AS DOUBLE) * {_d2d_sql('qy')})
                        - ({_d2d_sql('sy')} * {_d2d_sql('sy')}), 0.0))
       END AS rho
FROM __m
"""


def percentile_rank(
    df: DataFrame,
    key_col: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """Within-key midrank percentile of a score: ``(id, key, value,
    pct_rank)`` with ``pct_rank = midrank/n ∈ (0, 1]`` — the
    quantile-normalization transform that makes a quality score
    comparable ACROSS sources before a global threshold cuts it (a
    0.8-quantile arXiv doc and a 0.8-quantile webtext doc survive
    together, where their raw scores live on different scales). Ties
    share their midrank (the auc_rank_sum convention). NULL values are
    excluded.

    Engine parity: ``pct_rank = dr/(2n)`` where ``dr`` is the integer
    doubled midrank from the support-sized rank map — one IEEE division
    of exact integers, no accumulation anywhere.

    Scale posture (100 TB): per-key support aggregation + support-sized
    cumulative windows (the ks_drift contract: pre-quantize continuous
    scores), then ONE broadcast join of the rank map back onto the fact
    — the fact table itself never shuffles on the value.
    """
    pts = df.select(
        F.col(key_col).alias("__k"),
        F.col(id_col).alias("__id"),
        F.col(value_col).alias("__v"),
    ).where(F.col("__v").isNotNull())
    sup = pts.groupBy("__k", "__v").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    w_cum = Window.partitionBy("__k").orderBy("__v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_tot = Window.partitionBy("__k")
    rmap = sup.select(
        "__k",
        "__v",
        (
            F.lit(2) * F.coalesce(F.sum("__c").over(w_cum), F.lit(0))
            + F.col("__c")
            + F.lit(1)
        ).cast("long").alias("__dr"),
        F.sum("__c").over(w_tot).cast("long").alias("__n"),
    )
    return (
        pts.join(F.broadcast(rmap), ["__k", "__v"])
        .select(
            F.col("__id").alias(id_col),
            F.col("__k").alias(key_col),
            F.col("__v").alias(value_col),
            (
                F.col("__dr").cast("double")
                / (F.lit(2).cast("long") * F.col("__n")).cast("double")
            ).alias("pct_rank"),
        )
        .orderBy(key_col, id_col)
    )


def percentile_rank_sql(
    table: str,
    key_col: str,
    id_col: str,
    value_col: str,
) -> str:
    return f"""
WITH __p AS (
  SELECT {key_col} AS k, {id_col} AS id, {value_col} AS v FROM {table}
  WHERE {value_col} IS NOT NULL
),
__r AS (
  SELECT k, v,
         (2 * COALESCE(SUM(c) OVER (PARTITION BY k ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          + c + 1)::BIGINT AS dr,
         CAST(SUM(c) OVER (PARTITION BY k) AS BIGINT) AS n
  FROM (SELECT k, v, COUNT(*)::BIGINT AS c FROM __p GROUP BY k, v)
)
SELECT p.id AS {id_col}, p.k AS {key_col}, p.v AS {value_col},
       CAST(dr AS DOUBLE) / CAST(2 * n AS DOUBLE) AS pct_rank
FROM __p p JOIN __r r ON p.k = r.k AND p.v = r.v
ORDER BY {key_col}, {id_col}
"""


def kendall_tau_hourly(
    df: DataFrame, key_col: str = "event_type", round_to: int = 9
) -> DataFrame:
    """Per-key Kendall τ-b between the hourly event COUNT and the hourly
    VALUE mass over the densified calendar spine: ``(key, n_hours,
    concordant, discordant, tau_b)`` ordered by key (Kendall Biometrika
    1938; τ-b tie form per Agresti 2010 §2.1.2) — does "busier hours
    carry proportionally more value" hold monotonically, the rank
    complement to ``spearman`` that weighs pair inversions instead of
    rank displacement (τ is less sensitive to a few large displacements).

        τ-b = (C − D) / sqrt((n₀ − T_x)(n₀ − T_y)),  n₀ = n(n−1)/2

    C/D count concordant/discordant hour pairs; T_x/T_y count pairs tied
    on each variable (pairs tied on both are in both T's — the τ-b
    convention). The y series is the per-hour Σ of the (18,6)-quantized
    value — an EXACT decimal, so pair comparisons are exact in both
    engines; all counts are integers with decimal(38,0) products, one
    IEEE finish. NULL τ when either variable is constant.

    Scale posture: the mann_kendall shape — one corpus collapse to
    calendar-bounded (key, hour) cells, span²-bounded pair comparisons
    per key behind a key equi-join (trend.py:383 precedent)."""
    ex = "decimal(38,0)"
    obs = (
        df.select(
            F.col(key_col).alias("__key"),
            F.expr("(ts_ns div 1000) div 3600000000").alias("hour"),
            _q6(F.col("value")).alias("__v"),
        )
        .groupBy("__key", "hour")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__cnt"),
            F.sum(F.col("__v").cast(_MOMENT)).cast(_MOMENT).alias("__sv"),
        )
    )
    spine = (
        obs.groupBy("__key")
        .agg(F.min("hour").alias("__h0"), F.max("hour").alias("__h1"))
        .select(
            "__key", F.explode(F.sequence("__h0", "__h1")).alias("hour")
        )
    )
    cells = spine.join(obs, ["__key", "hour"], "left").select(
        "__key",
        "hour",
        F.coalesce("__cnt", F.lit(0)).cast("long").alias("x"),
        F.coalesce("__sv", F.lit(0).cast(_MOMENT)).cast(_MOMENT).alias("y"),
    )
    a = cells.select(
        "__key", F.col("hour").alias("h1"),
        F.col("x").alias("x1"), F.col("y").alias("y1"),
    )
    b = cells.select(
        "__key", F.col("hour").alias("h2"),
        F.col("x").alias("x2"), F.col("y").alias("y2"),
    )
    cx = F.signum((F.col("x2") - F.col("x1")).cast("double")).cast("int")
    cy = F.signum((F.col("y2") - F.col("y1")).cast("double")).cast("int")
    pairs = (
        a.join(b, "__key")
        .where(F.col("h2") > F.col("h1"))
        .groupBy("__key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n0"),
            F.sum(F.when(cx * cy > 0, 1).otherwise(0)).cast("long").alias("concordant"),
            F.sum(F.when(cx * cy < 0, 1).otherwise(0)).cast("long").alias("discordant"),
            F.sum(F.when(cx == 0, 1).otherwise(0)).cast("long").alias("__tx"),
            F.sum(F.when(cy == 0, 1).otherwise(0)).cast("long").alias("__ty"),
        )
    )
    nt = cells.groupBy("__key").agg(F.count(F.lit(1)).cast("long").alias("n_hours"))
    j = pairs.join(nt, "__key")
    den = (
        (F.col("__n0").cast(ex) - F.col("__tx").cast(ex))
        * (F.col("__n0").cast(ex) - F.col("__ty").cast(ex))
    )
    tau = F.round(
        _div(
            (F.col("concordant") - F.col("discordant")).cast("double"),
            F.sqrt(_d2d(den)),
        ),
        round_to,
    )
    return j.select(
        F.col("__key").alias("key"),
        "n_hours",
        "concordant",
        "discordant",
        tau.alias("tau_b"),
    ).orderBy("key")


def kendall_tau_hourly_sql(
    table: str, key_col: str = "event_type", round_to: int = 9
) -> str:
    d = "DECIMAL(38,0)"
    v = _q6_sql("value")
    return f"""
WITH __obs AS (
  SELECT {key_col} AS key, epoch_us(ts) // 3600000000 AS hour,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(CAST({v} AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sv
  FROM {table} GROUP BY key, hour
),
__spine AS (
  SELECT o.key, UNNEST(range(o.h0, o.h1 + 1)) AS hour
  FROM (SELECT key, MIN(hour) AS h0, MAX(hour) AS h1
        FROM __obs GROUP BY key) o
),
__cells AS (
  SELECT s.key, s.hour,
         CAST(COALESCE(o.cnt, 0) AS BIGINT) AS x,
         CAST(COALESCE(o.sv, 0) AS DECIMAL(38,12)) AS y
  FROM __spine s LEFT JOIN __obs o ON s.key = o.key AND s.hour = o.hour
),
__pairs AS (
  SELECT a.key,
         CAST(COUNT(*) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN (CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END)
                          * (CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END) > 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
         CAST(SUM(CASE WHEN (CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END)
                          * (CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END) < 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
         CAST(SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT) AS tx,
         CAST(SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT) AS ty
  FROM __cells a JOIN __cells b ON a.key = b.key AND b.hour > a.hour
  GROUP BY a.key
),
__n AS (
  SELECT key, CAST(COUNT(*) AS BIGINT) AS n_hours FROM __cells GROUP BY key
)
SELECT p.key, n.n_hours, p.concordant, p.discordant,
       CAST(CAST(CAST(CAST((CASE WHEN (CAST(p.n0 AS {d}) - p.tx) * (CAST(p.n0 AS {d}) - p.ty) > 0
                  THEN CAST(p.concordant - p.discordant AS DOUBLE)
                       / sqrt({_d2d_sql(f'(CAST(p.n0 AS {d}) - p.tx) * (CAST(p.n0 AS {d}) - p.ty)')})
             END) * CAST(ABS(CASE WHEN (CAST(p.n0 AS {d}) - p.tx) * (CAST(p.n0 AS {d}) - p.ty) > 0
                  THEN CAST(p.concordant - p.discordant AS DOUBLE)
                       / sqrt({_d2d_sql(f'(CAST(p.n0 AS {d}) - p.tx) * (CAST(p.n0 AS {d}) - p.ty)')})
             END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS tau_b
FROM __pairs p JOIN __n n ON p.key = n.key
ORDER BY p.key
"""


def partial_correlation(
    df: DataFrame,
    x_col: str,
    y_col: str,
    z_col: str,
    round_to: int = 9,
) -> DataFrame:
    """One-row first-order partial correlation: ``(n, r_xy, r_xz, r_yz,
    r_xy_z)`` — the x↔y association with the confounder z regressed
    out of both (Fisher 1924 recursion):

        r_xy·z = (r_xy − r_xz·r_yz) / sqrt((1 − r_xz²)(1 − r_yz²))

    The "is this correlation real or just z" pre-flight for any pair a
    pipeline is about to treat as a signal (e.g. quantity↔price looks
    correlated until discount is controlled). Listwise completeness
    (rows with a NULL in ANY of the three columns are excluded — the
    correlation_matrix contract).

    Engine parity: every pairwise moment (Σx, Σx², Σxy for the three
    pairs) comes from the SAME single map-side-combined aggregation in
    (18,6)-quantized decimals (the correlation_matrix convention); the
    three r's and the partial are fixed IEEE expressions. NULL when
    either conditioning correlation is ±1 (degenerate denominator) or
    any variance is 0."""
    q = lambda c: _q6(F.col(c).cast("double"))  # noqa: E731
    base = df.where(
        F.col(x_col).isNotNull()
        & F.col(y_col).isNotNull()
        & F.col(z_col).isNotNull()
    ).select(q(x_col).alias("__x"), q(y_col).alias("__y"), q(z_col).alias("__z"))
    s = lambda c: F.sum(F.col(c).cast(_MOMENT)).cast(_MOMENT)  # noqa: E731
    sp = lambda a, b: F.sum(  # noqa: E731
        (F.col(a) * F.col(b)).cast(_MOMENT)
    ).cast(_MOMENT)
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        s("__x").alias("__sx"), s("__y").alias("__sy"), s("__z").alias("__sz"),
        sp("__x", "__x").alias("__qx"), sp("__y", "__y").alias("__qy"),
        sp("__z", "__z").alias("__qz"),
        sp("__x", "__y").alias("__pxy"), sp("__x", "__z").alias("__pxz"),
        sp("__y", "__z").alias("__pyz"),
    )
    n_d = F.col("n").cast("double")

    def corr(pab, sa, sb, qa, qb):
        num = (n_d * _d2d(F.col(pab))) - (_d2d(F.col(sa)) * _d2d(F.col(sb)))
        va = F.greatest(
            (n_d * _d2d(F.col(qa))) - (_d2d(F.col(sa)) * _d2d(F.col(sa))),
            F.lit(0.0),
        )
        vb = F.greatest(
            (n_d * _d2d(F.col(qb))) - (_d2d(F.col(sb)) * _d2d(F.col(sb))),
            F.lit(0.0),
        )
        return _div(num, F.sqrt(va * vb))

    withr = agg.select(
        "n",
        corr("__pxy", "__sx", "__sy", "__qx", "__qy").alias("__rxy"),
        corr("__pxz", "__sx", "__sz", "__qx", "__qz").alias("__rxz"),
        corr("__pyz", "__sy", "__sz", "__qy", "__qz").alias("__ryz"),
    )
    # each factor clamped at 0 like the first-level variance arms above:
    # a conditioning correlation can exceed 1 by an FP ulp on a
    # near-collinear confounder, where an unclamped sqrt(negative) is NaN
    # here but an ERROR in the DuckDB twin (ADVICE r8); the zero
    # denominator then flows through _div to the documented NULL
    den = F.sqrt(
        F.greatest(F.lit(1.0) - F.col("__rxz") * F.col("__rxz"), F.lit(0.0))
        * F.greatest(F.lit(1.0) - F.col("__ryz") * F.col("__ryz"), F.lit(0.0))
    )
    return withr.select(
        "n",
        F.round(F.col("__rxy"), round_to).alias("r_xy"),
        F.round(F.col("__rxz"), round_to).alias("r_xz"),
        F.round(F.col("__ryz"), round_to).alias("r_yz"),
        F.round(
            _div(
                F.col("__rxy") - F.col("__rxz") * F.col("__ryz"), den
            ),
            round_to,
        ).alias("r_xy_z"),
    )


def partial_correlation_sql(
    table: str,
    x_sql: str,
    y_sql: str,
    z_sql: str,
    round_to: int = 9,
) -> str:
    def q(e):
        return _q6_sql(f"CAST({e} AS DOUBLE)")

    def w(e):
        return f"CAST({e} AS DECIMAL(19,6))"

    cols = {"x": q(x_sql), "y": q(y_sql), "z": q(z_sql)}
    sums = ",\n         ".join(
        f"CAST(SUM(CAST({cols[a]} AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS s{a}"
        for a in "xyz"
    )
    prods = ",\n         ".join(
        f"CAST(SUM({w(cols[a])} * {w(cols[b])}) AS DECIMAL(38,12)) AS p{a}{b}"
        for a, b in ("xx", "yy", "zz", "xy", "xz", "yz")
    )

    def corr(ab, a, b):
        num = (
            f"(CAST(n AS DOUBLE) * {_d2d_sql(f'p{ab}')})"
            f" - ({_d2d_sql(f's{a}')} * {_d2d_sql(f's{b}')})"
        )
        va = (
            f"GREATEST((CAST(n AS DOUBLE) * {_d2d_sql(f'p{a}{a}')})"
            f" - ({_d2d_sql(f's{a}')} * {_d2d_sql(f's{a}')}), 0.0)"
        )
        vb = (
            f"GREATEST((CAST(n AS DOUBLE) * {_d2d_sql(f'p{b}{b}')})"
            f" - ({_d2d_sql(f's{b}')} * {_d2d_sql(f's{b}')}), 0.0)"
        )
        return f"({num}) / NULLIF(sqrt({va} * {vb}), 0.0)"

    return f"""
WITH __m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {sums},
         {prods}
  FROM {table}
  WHERE ({x_sql}) IS NOT NULL AND ({y_sql}) IS NOT NULL
        AND ({z_sql}) IS NOT NULL
),
__r AS (
  SELECT n,
         {corr('xy', 'x', 'y')} AS rxy,
         {corr('xz', 'x', 'z')} AS rxz,
         {corr('yz', 'y', 'z')} AS ryz
  FROM __m
)
SELECT n,
       CASE WHEN ABS(rxy) >= 1e16 THEN CAST((rxy) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((rxy) * CAST(ABS(rxy) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS r_xy,
       CASE WHEN ABS(rxz) >= 1e16 THEN CAST((rxz) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((rxz) * CAST(ABS(rxz) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS r_xz,
       CASE WHEN ABS(ryz) >= 1e16 THEN CAST((ryz) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((ryz) * CAST(ABS(ryz) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS r_yz,
       CAST(CAST(CAST(CAST(((rxy - rxz * ryz)
             / NULLIF(sqrt(GREATEST(1.0 - rxz * rxz, 0.0)
                           * GREATEST(1.0 - ryz * ryz, 0.0)), 0.0)) * CAST(ABS((rxy - rxz * ryz)
             / NULLIF(sqrt(GREATEST(1.0 - rxz * rxz, 0.0)
                           * GREATEST(1.0 - ryz * ryz, 0.0)), 0.0)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS r_xy_z
FROM __r
"""
