"""Privacy-risk audits over quasi-identifiers: k-anonymity and
l-diversity.

Before a corpus (or a user/event table joined into one) ships to a
training pipeline, the standard re-identification pre-flight asks two
questions (Sweeney 2002, "k-anonymity: a model for protecting privacy";
Machanavajjhala et al. ICDE 2006, "l-diversity"):

- **k-anonymity**: for a chosen set of quasi-identifier (QI) columns,
  how many rows sit in QI-equivalence classes smaller than k?  A row in
  a class of size 1 is uniquely re-identifiable from the QIs alone.
- **l-diversity**: within each QI class, how many DISTINCT values of a
  sensitive attribute appear?  A class that is k-large but carries a
  single sensitive value still leaks it (the homogeneity attack).

Spark-first shape — both audits are hash aggregations, nothing else:

- ``k_anonymity_audit``: ONE groupBy over the QI tuple produces the
  class-size table (this is the only shuffle of the fact table); the
  per-threshold risk accounting is a second aggregation over that
  class-sized (not row-sized) frame, finished with an unpivot of the
  threshold literals.  At 100 TB the class table is orders of magnitude
  smaller than the input (that is the point of QI generalization), so
  everything after the first exchange is cheap.
- ``l_diversity_audit``: groupBy (QI, sensitive) then groupBy QI —
  Catalyst executes the distinct count as two-level partial
  aggregation; the histogram finish runs over the class table.

Both emit compact reports (rows = thresholds or distinct-count support)
— audit artifacts, not per-row flags — so the driver-side result is
bounded regardless of input size.

cf. SURVEY.md §2 extension surface (the reference engine has no privacy
tooling; this pairs with operators/pii.py, which audits free text while
these audit the structured side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: list[Column],
    ks: list[int] = (2, 5, 10, 20),
) -> DataFrame:
    """(k, classes_total, rows_total, classes_below, rows_below,
    rows_below_share): one row per threshold k — how many QI classes
    (and rows inside them) fall below k members.

    ``qi_cols`` are already-generalized Column expressions (banded
    balances, truncated geo, ...); generalization choice is the
    caller's policy decision, the audit just measures it.
    """
    qi = [c.alias(f"__qi{i}") for i, c in enumerate(qi_cols)]
    classes = df.select(*qi).groupBy(
        *[f"__qi{i}" for i in range(len(qi))]
    ).agg(F.count(F.lit(1)).alias("__sz"))
    agg_cols = [
        F.count(F.lit(1)).cast("long").alias("classes_total"),
        F.sum("__sz").cast("long").alias("rows_total"),
    ]
    for k in ks:
        below = F.col("__sz") < F.lit(int(k))
        agg_cols.append(
            F.sum(below.cast("long")).cast("long").alias(f"__cb_{k}")
        )
        agg_cols.append(
            F.sum(F.when(below, F.col("__sz")).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"__rb_{k}")
        )
    totals = classes.agg(*agg_cols)
    # unpivot the per-threshold columns into rows: stack() stays in
    # codegen and the frame is ONE row, so this is free
    stack_args = ", ".join(
        f"{int(k)}L, __cb_{k}, __rb_{k}" for k in ks
    )
    out = totals.select(
        "classes_total",
        "rows_total",
        F.expr(
            f"stack({len(ks)}, {stack_args}) AS (k, classes_below, rows_below)"
        ),
    )
    return out.select(
        F.col("k").cast("long").alias("k"),
        "classes_total",
        "rows_total",
        F.col("classes_below").cast("long").alias("classes_below"),
        F.col("rows_below").cast("long").alias("rows_below"),
        # try_divide: on an empty input rows_total = 0 and bare `/`
        # yields NaN while the NULLIF twin yields NULL (repo convention
        # for data-dependent denominators)
        F.round(
            F.try_divide(
                F.col("rows_below").cast("double"), F.col("rows_total")
            ),
            9,
        ).alias("rows_below_share"),
    ).orderBy("k")


def k_anonymity_audit_sql(
    table: str,
    qi_sql: list[str],
    ks: list[int] = (2, 5, 10, 20),
) -> str:
    qi = ", ".join(
        f"{expr} AS __qi{i}" for i, expr in enumerate(qi_sql)
    )
    names = ", ".join(f"__qi{i}" for i in range(len(qi_sql)))
    per_k = "\nUNION ALL\n".join(
        f"SELECT {int(k)}::BIGINT AS k, classes_total, rows_total,\n"
        f"       __cb_{k} AS classes_below, __rb_{k} AS rows_below\n"
        f"FROM __t"
        for k in ks
    )
    cb = ",\n".join(
        f"         CAST(SUM(CASE WHEN __sz < {int(k)} THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS __cb_{k},\n"
        f"         CAST(SUM(CASE WHEN __sz < {int(k)} THEN __sz ELSE 0 END)"
        f" AS BIGINT) AS __rb_{k}"
        for k in ks
    )
    return f"""
WITH __c AS (
  SELECT {names}, COUNT(*) AS __sz
  FROM (SELECT {qi} FROM {table})
  GROUP BY {names}
),
__t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS classes_total,
         CAST(SUM(__sz) AS BIGINT) AS rows_total,
{cb}
  FROM __c
)
SELECT k, classes_total, rows_total, classes_below, rows_below,
       CASE WHEN ABS(CAST(rows_below AS DOUBLE) / NULLIF(rows_total, 0)) >= 1e16 THEN CAST((CAST(rows_below AS DOUBLE) / NULLIF(rows_total, 0)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(rows_below AS DOUBLE) / NULLIF(rows_total, 0)) * CAST(ABS(CAST(rows_below AS DOUBLE) / NULLIF(rows_total, 0)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END
         AS rows_below_share
FROM ({per_k}) ORDER BY k
"""


def l_diversity_audit(
    df: DataFrame,
    qi_cols: list[Column],
    sensitive: Column,
    l_min: int = 3,
) -> DataFrame:
    """(distinct_sensitive, n_classes, n_rows, at_risk): histogram of QI
    classes by how many DISTINCT sensitive values they contain;
    ``at_risk`` marks buckets below ``l_min``.  The d=1 bucket is the
    homogeneity-attack set: every row in it reveals its sensitive value
    to anyone who knows the QIs."""
    qi_names = [f"__qi{i}" for i in range(len(qi_cols))]
    base = df.select(
        *[c.alias(n) for c, n in zip(qi_cols, qi_names)],
        sensitive.alias("__s"),
    )
    per_class = base.groupBy(*qi_names).agg(
        F.count_distinct(F.col("__s")).cast("long").alias("__d"),
        F.count(F.lit(1)).cast("long").alias("__sz"),
    )
    return (
        per_class.groupBy(F.col("__d").alias("distinct_sensitive"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum("__sz").cast("long").alias("n_rows"),
        )
        .select(
            "distinct_sensitive",
            "n_classes",
            "n_rows",
            (F.col("distinct_sensitive") < F.lit(int(l_min)))
            .cast("long")
            .alias("at_risk"),
        )
        .orderBy("distinct_sensitive")
    )


def l_diversity_audit_sql(
    table: str,
    qi_sql: list[str],
    sensitive_sql: str,
    l_min: int = 3,
) -> str:
    qi = ", ".join(f"{e} AS __qi{i}" for i, e in enumerate(qi_sql))
    names = ", ".join(f"__qi{i}" for i in range(len(qi_sql)))
    return f"""
WITH __b AS (
  SELECT {qi}, {sensitive_sql} AS __s FROM {table}
),
__c AS (
  SELECT {names}, CAST(COUNT(DISTINCT __s) AS BIGINT) AS __d,
         CAST(COUNT(*) AS BIGINT) AS __sz
  FROM __b GROUP BY {names}
)
SELECT __d AS distinct_sensitive,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(__sz) AS BIGINT) AS n_rows,
       CAST(CASE WHEN __d < {int(l_min)} THEN 1 ELSE 0 END AS BIGINT)
         AS at_risk
FROM __c GROUP BY __d ORDER BY __d
"""


def t_closeness_audit(
    df: DataFrame,
    qi_cols: list[Column],
    sensitive_ordinal: Column,
    round_to: int = 9,
) -> DataFrame:
    """One-row t-closeness audit over an ORDINAL sensitive attribute:
    ``(classes_total, rows_total, t_max, t_mean, classes_over_015)`` —
    the distributional member of the privacy family (k-anonymity counts
    class sizes, l-diversity counts distinct sensitive values; neither
    catches a class whose value DISTRIBUTION leaks — all-low-balance,
    say). t is the Earth Mover's Distance between each QI class's
    sensitive distribution and the global one; for an ordinal attribute
    with m support values, EMD = Σ|cumshare_class − cumshare_global|
    / (m−1) (Li, Li & Venkatasubramanian ICDE 2007 §4.2). The 0.15
    threshold column uses the paper's illustrative t.

    Engine parity: cumulative shares are exact-integer cumulative
    counts divided once per support point; the per-class EMD and the
    t_mean average both accumulate 9dp-rounded terms in DECIMAL — the
    lm_score order-free convention, partition- and engine-independent.
    The support size m is a bounded driver-side scalar (the frozen-
    codebook precedent). Rows with a NULL sensitive value are
    excluded.

    Scale posture: one (class × support) aggregation, support-sized
    windows per class, one class-frame reduction — the k_anonymity
    shuffle plus a support factor."""
    named = [c.alias(f"__qi{i}") for i, c in enumerate(qi_cols)]
    keys = [f"__qi{i}" for i in range(len(qi_cols))]
    base = df.select(*named, sensitive_ordinal.alias("__s")).where(
        F.col("__s").isNotNull()
    )
    cells = base.groupBy(*keys, "__s").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    # densify each class onto the GLOBAL support (absent values carry
    # zero mass but still accumulate cumulative share)
    support = cells.select("__s").distinct()
    classes = cells.select(*keys).distinct()
    dense = (
        classes.crossJoin(support)
        .join(cells, [*keys, "__s"], "left")
        .select(*keys, "__s", F.coalesce("__c", F.lit(0)).cast("long").alias("__c"))
    )
    wclass = (
        Window.partitionBy(*keys)
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wglob = (
        Window.partitionBy(F.lit(1))
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    glob = (
        cells.groupBy("__s")
        .agg(F.sum("__c").cast("long").alias("__gc"))
        .withColumn("__gcum", F.sum("__gc").over(wglob).cast("long"))
        .withColumn(
            "__gn",
            F.sum("__gc").over(Window.partitionBy(F.lit(1))).cast("long"),
        )
        .select(
            "__s",
            F.round(
                F.col("__gcum").cast("double") / F.col("__gn").cast("double"), 9
            ).alias("__gshare"),
        )
    )
    per_cell = (
        dense.withColumn("__ccum", F.sum("__c").over(wclass).cast("long"))
        .withColumn(
            "__cn",
            F.sum("__c").over(Window.partitionBy(*keys)).cast("long"),
        )
        .join(glob, "__s")
        .withColumn(
            "__diff",
            F.abs(
                F.round(
                    F.col("__ccum").cast("double") / F.col("__cn").cast("double"),
                    9,
                )
                - F.col("__gshare")
            ),
        )
    )
    m = support.count()  # bounded ordinal support: a driver-side scalar
    per_class = per_cell.groupBy(*keys, "__cn").agg(
        F.round(
            F.sum(F.round(F.col("__diff"), 9).cast("decimal(38,9)")).cast("double")
            / F.lit(float(max(m - 1, 1))),
            9,
        ).alias("t"),
    )
    return per_class.agg(
        F.count(F.lit(1)).cast("long").alias("classes_total"),
        F.sum("__cn").cast("long").alias("rows_total"),
        F.max("t").alias("t_max"),
        F.round(
            F.sum(F.round(F.col("t"), 9).cast("decimal(38,9)")).cast("double")
            / F.count(F.lit(1)),
            round_to,
        ).alias("t_mean"),
        F.sum(F.when(F.col("t") > 0.15, 1).otherwise(0))
        .cast("long")
        .alias("classes_over_015"),
    )


def t_closeness_audit_sql(
    table: str,
    qi_sql: list[str],
    sensitive_sql: str,
    round_to: int = 9,
) -> str:
    qi = ", ".join(f"{e} AS __qi{i}" for i, e in enumerate(qi_sql))
    names = ", ".join(f"__qi{i}" for i in range(len(qi_sql)))
    on = " AND ".join(
        f"c.__qi{i} = cl.__qi{i}" for i in range(len(qi_sql))
    )
    return f"""
WITH __b AS (
  SELECT {qi}, ({sensitive_sql}) AS s FROM {table}
  WHERE ({sensitive_sql}) IS NOT NULL
),
__cells AS (
  SELECT {names}, s, CAST(COUNT(*) AS BIGINT) AS c
  FROM __b GROUP BY {names}, s
),
__support AS (SELECT DISTINCT s FROM __cells),
__m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM __support),
__classes AS (SELECT DISTINCT {names} FROM __cells),
__dense AS (
  SELECT cl.*, sp.s, CAST(COALESCE(c.c, 0) AS BIGINT) AS c
  FROM __classes cl CROSS JOIN __support sp
  LEFT JOIN __cells c ON {on} AND c.s = sp.s
),
__glob AS (
  SELECT s,
         CAST(CAST(CAST(CAST((CAST(SUM(gc) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING)
                    AS DOUBLE)
               / CAST(SUM(gc) OVER () AS DOUBLE)) * CAST(ABS(CAST(SUM(gc) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING)
                    AS DOUBLE)
               / CAST(SUM(gc) OVER () AS DOUBLE)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) AS gshare
  FROM (SELECT s, CAST(SUM(c) AS BIGINT) AS gc FROM __cells GROUP BY s)
),
__pc AS (
  SELECT {names}, d.s,
         CAST(SUM(c) OVER (PARTITION BY {names} ORDER BY d.s
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ccum,
         CAST(SUM(c) OVER (PARTITION BY {names}) AS BIGINT) AS cn
  FROM __dense d
),
__diff AS (
  SELECT {names}, cn,
         abs(CASE WHEN ABS(CAST(ccum AS DOUBLE) / CAST(cn AS DOUBLE)) >= 1e16 THEN CAST((CAST(ccum AS DOUBLE) / CAST(cn AS DOUBLE)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(ccum AS DOUBLE) / CAST(cn AS DOUBLE)) * CAST(ABS(CAST(ccum AS DOUBLE) / CAST(cn AS DOUBLE)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END
             - g.gshare) AS diff
  FROM __pc p JOIN __glob g ON p.s = g.s
),
__t AS (
  SELECT {names}, cn,
         CAST(CAST(CAST(CAST((CAST(SUM(CAST(CASE WHEN ABS(diff) >= 1e16 THEN CAST((diff) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((diff) * CAST(ABS(diff) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS DECIMAL(38,9))) AS DOUBLE)
               / CAST(GREATEST(m - 1, 1) AS DOUBLE)) * CAST(ABS(CAST(SUM(CAST(CASE WHEN ABS(diff) >= 1e16 THEN CAST((diff) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((diff) * CAST(ABS(diff) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS DECIMAL(38,9))) AS DOUBLE)
               / CAST(GREATEST(m - 1, 1) AS DOUBLE)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) AS t
  FROM __diff, __m GROUP BY {names}, cn, m
)
SELECT CAST(COUNT(*) AS BIGINT) AS classes_total,
       CAST(SUM(cn) AS BIGINT) AS rows_total,
       MAX(t) AS t_max,
       CAST(CAST(CAST(CAST((CAST(SUM(CAST(CASE WHEN ABS(t) >= 1e16 THEN CAST((t) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((t) * CAST(ABS(t) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS DECIMAL(38,9))) AS DOUBLE)
             / COUNT(*)) * CAST(ABS(CAST(SUM(CAST(CASE WHEN ABS(t) >= 1e16 THEN CAST((t) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((t) * CAST(ABS(t) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS DECIMAL(38,9))) AS DOUBLE)
             / COUNT(*)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS t_mean,
       CAST(SUM(CASE WHEN t > 0.15 THEN 1 ELSE 0 END) AS BIGINT)
         AS classes_over_015
FROM __t
"""


def reidentification_risk(
    df: DataFrame,
    qi_cols: list[Column],
    round_to: int = 9,
) -> DataFrame:
    """One-row re-identification risk summary over the QI classes —
    ``(classes_total, rows_total, min_class, prosecutor_risk,
    journalist_risk, marketer_risk, unique_rows, unique_share)`` — the
    three standard attacker models over the SAME generalized
    quasi-identifiers the k-anonymity audit measures (El Emam & Dankar,
    JAMIA 2008):

    * prosecutor: the attacker knows the target IS in the data —
      worst-case risk = 1/min class size;
    * journalist: re-identify ANYONE — also bounded by 1/min k
      (reported separately for the standard two-row readout);
    * marketer: expected share re-identified matching each row to its
      class uniformly = (Σ per-class 1) / N = classes/N.

    ``unique_rows`` counts singleton classes (k = 1): each is an exact
    re-identification. Engine parity: everything is integer counts with
    three IEEE divisions. Scale: one QI-tuple shuffle (the k-anonymity
    posture), a 1-row reduction."""
    from bullet_storm_spark.operators.stats_tests import _div

    qi = [c.alias(f"__qi{i}") for i, c in enumerate(qi_cols)]
    classes = df.select(*qi).groupBy(
        *[f"__qi{i}" for i in range(len(qi))]
    ).agg(F.count(F.lit(1)).cast("long").alias("__sz"))
    agg = classes.agg(
        F.count(F.lit(1)).cast("long").alias("classes_total"),
        F.sum("__sz").cast("long").alias("rows_total"),
        F.min("__sz").cast("long").alias("min_class"),
        F.sum(F.when(F.col("__sz") == 1, 1).otherwise(0))
        .cast("long")
        .alias("unique_rows"),
    )
    inv_min = _div(F.lit(1.0), F.col("min_class").cast("double"))
    return agg.select(
        "classes_total",
        "rows_total",
        "min_class",
        F.round(inv_min, round_to).alias("prosecutor_risk"),
        F.round(inv_min, round_to).alias("journalist_risk"),
        F.round(
            _div(
                F.col("classes_total").cast("double"),
                F.col("rows_total").cast("double"),
            ),
            round_to,
        ).alias("marketer_risk"),
        "unique_rows",
        F.round(
            _div(
                F.col("unique_rows").cast("double"),
                F.col("rows_total").cast("double"),
            ),
            round_to,
        ).alias("unique_share"),
    )


def reidentification_risk_sql(
    table: str,
    qi_sqls: list[str],
    round_to: int = 9,
) -> str:
    from bullet_storm_spark.operators.stats_tests import _qround_sql

    qi = ", ".join(f"({q}) AS qi{i}" for i, q in enumerate(qi_sqls))
    keys = ", ".join(f"qi{i}" for i in range(len(qi_sqls)))
    inv_min = "1.0 / CAST(min_class AS DOUBLE)"
    return f"""
WITH __cls AS (
  SELECT {qi}, CAST(COUNT(*) AS BIGINT) AS sz
  FROM {table} GROUP BY {keys}
),
__a AS (
  SELECT COUNT(*)::BIGINT AS classes_total,
         CAST(SUM(sz) AS BIGINT) AS rows_total,
         CAST(MIN(sz) AS BIGINT) AS min_class,
         SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END)::BIGINT AS unique_rows
  FROM __cls
)
SELECT classes_total, rows_total, min_class,
       {_qround_sql(inv_min, round_to)} AS prosecutor_risk,
       {_qround_sql(inv_min, round_to)} AS journalist_risk,
       {_qround_sql("CAST(classes_total AS DOUBLE) / CAST(rows_total AS DOUBLE)", round_to)} AS marketer_risk,
       unique_rows,
       {_qround_sql("CAST(unique_rows AS DOUBLE) / CAST(rows_total AS DOUBLE)", round_to)} AS unique_share
FROM __a
"""


def generalization_ladder(
    df: DataFrame,
    cat_cols: list[Column],
    numeric_col: Column,
    bands: list[float] = (100.0, 1000.0, 10000.0),
    round_to: int = 9,
) -> DataFrame:
    """Utility/privacy trade-off ladder: the k-anonymity headline (min
    class size, singleton share, marketer risk) at INCREASING
    generalization of the numeric quasi-identifier — one row per band
    width, ``(band_width, classes_total, min_class, unique_rows,
    unique_share, marketer_risk)`` ordered by band. The table a policy
    review actually reads: "banding balances at 100 leaves 4% of rows
    unique; at 1000 nobody is" — pick the coarsest rung that meets the
    k target and keep the rest of the utility.

    Engine parity: band assignment is FLOOR(x / width) on identical
    doubles (width a plan literal), classes are exact integer counts,
    two IEEE divisions per rung. Scale: one QI shuffle per rung over a
    bounded rung list (the k-anonymity posture, |bands| passes)."""
    from bullet_storm_spark.operators.stats_tests import _div

    out = None
    for w in bands:
        qi = [c.alias(f"__qi{i}") for i, c in enumerate(cat_cols)]
        qi.append(
            F.floor(numeric_col / F.lit(float(w))).cast("long").alias("__qin")
        )
        classes = df.select(*qi).groupBy(
            *[c_name for c_name in [f"__qi{i}" for i in range(len(cat_cols))] + ["__qin"]]
        ).agg(F.count(F.lit(1)).cast("long").alias("__sz"))
        agg = classes.agg(
            F.lit(float(w)).alias("band_width"),
            F.count(F.lit(1)).cast("long").alias("classes_total"),
            F.sum("__sz").cast("long").alias("__rows"),
            F.min("__sz").cast("long").alias("min_class"),
            F.sum(F.when(F.col("__sz") == 1, 1).otherwise(0))
            .cast("long")
            .alias("unique_rows"),
        )
        rung = agg.select(
            "band_width",
            "classes_total",
            "min_class",
            "unique_rows",
            F.round(
                _div(
                    F.col("unique_rows").cast("double"),
                    F.col("__rows").cast("double"),
                ),
                round_to,
            ).alias("unique_share"),
            F.round(
                _div(
                    F.col("classes_total").cast("double"),
                    F.col("__rows").cast("double"),
                ),
                round_to,
            ).alias("marketer_risk"),
        )
        out = rung if out is None else out.unionByName(rung)
    return out.orderBy("band_width")


def generalization_ladder_sql(
    table: str,
    cat_sqls: list[str],
    numeric_sql: str,
    bands: list[float] = (100.0, 1000.0, 10000.0),
    round_to: int = 9,
) -> str:
    from bullet_storm_spark.operators.stats_tests import _qround_sql

    parts = []
    for w in bands:
        qi = ", ".join(f"({q}) AS qi{i}" for i, q in enumerate(cat_sqls))
        keys = ", ".join(f"qi{i}" for i in range(len(cat_sqls)))
        parts.append(f"""
SELECT CAST({float(w)!r} AS DOUBLE) AS band_width,
       COUNT(*)::BIGINT AS classes_total,
       CAST(MIN(sz) AS BIGINT) AS min_class,
       CAST(SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT) AS unique_rows,
       {_qround_sql("CAST(SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(SUM(sz) AS DOUBLE)", round_to)} AS unique_share,
       {_qround_sql("CAST(COUNT(*) AS DOUBLE) / CAST(SUM(sz) AS DOUBLE)", round_to)} AS marketer_risk
FROM (
  SELECT {qi},
         CAST(FLOOR(({numeric_sql}) / {float(w)!r}) AS BIGINT) AS qin,
         CAST(COUNT(*) AS BIGINT) AS sz
  FROM {table} GROUP BY {keys}, qin
)""")
    union = "\nUNION ALL\n".join(parts)
    return f"SELECT * FROM ({union}) ORDER BY band_width"
