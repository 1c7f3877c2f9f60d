"""Skew-aware aggregation: salted two-phase groupBy.

AQE's skew handling covers joins and post-shuffle coalescing, but a
pathological hot GROUP BY key (one key holding most rows) still funnels its
partial-aggregated row stream through one reducer when per-partition group
counts are large. Salting splits each key into ``salt_buckets`` sub-keys
for the first aggregation, then re-aggregates the (tiny) salted results —
two shuffles, both uniform.

Use when a known-skewed key (e.g. the empty-string user id, the null
bucket, one viral document) dominates; for well-distributed keys the plain
single-shuffle groupBy wins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from bullet_storm_spark.plans.query import GroupOperation, GroupOpType

_DECIMAL = "decimal(38,6)"


def salted_group_agg(
    df: DataFrame,
    keys: list[str],
    operations: list[GroupOperation],
    salt_buckets: int = 32,
) -> DataFrame:
    """groupBy(keys).agg(operations) with salted pre-aggregation. Supports
    COUNT / COUNT_FIELD / SUM / MIN / MAX / AVG; results are identical to
    the unsalted plan (decimal accumulators keep sums order-independent)."""
    salt = (F.rand(42) * salt_buckets).cast("int").alias("__salt")
    stage1_aggs: list[Column] = []
    stage2_aggs: list[Column] = []
    for i, op in enumerate(operations):
        f = F.col(op.field) if op.field else None
        t = op.op
        if t in (GroupOpType.COUNT, GroupOpType.COUNT_FIELD):
            src = F.count(F.lit(1)) if t == GroupOpType.COUNT else F.count(f)
            stage1_aggs.append(src.alias(f"__p{i}"))
            stage2_aggs.append(F.sum(f"__p{i}").alias(op.alias))
        elif t == GroupOpType.SUM:
            stage1_aggs.append(F.sum(f.cast(_DECIMAL)).alias(f"__p{i}"))
            col = F.sum(f"__p{i}")
            col = col.cast("double") if op.exact_decimal else col.cast("double")
            stage2_aggs.append(_maybe_round(col, op).alias(op.alias))
        elif t == GroupOpType.MIN:
            stage1_aggs.append(F.min(f).alias(f"__p{i}"))
            stage2_aggs.append(F.min(f"__p{i}").alias(op.alias))
        elif t == GroupOpType.MAX:
            stage1_aggs.append(F.max(f).alias(f"__p{i}"))
            stage2_aggs.append(F.max(f"__p{i}").alias(op.alias))
        elif t == GroupOpType.AVG:
            stage1_aggs.append(F.sum(f.cast(_DECIMAL)).alias(f"__ps{i}"))
            stage1_aggs.append(F.count(f).alias(f"__pn{i}"))
            col = F.sum(f"__ps{i}").cast("double") / F.sum(f"__pn{i}")
            stage2_aggs.append(_maybe_round(col, op).alias(op.alias))
        else:  # pragma: no cover
            raise ValueError(f"unsupported op {t}")
    stage1 = df.groupBy(*[F.col(k) for k in keys], salt).agg(*stage1_aggs)
    return stage1.groupBy(*[F.col(k) for k in keys]).agg(*stage2_aggs)


def _maybe_round(col: Column, op: GroupOperation) -> Column:
    return F.round(col, op.round_to) if op.round_to is not None else col


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed (left) side salted and the right side
    replicated ``salt_buckets`` ways, so a hot join key spreads over
    ``salt_buckets`` reducers instead of funneling through one.

    Semantics are identical to ``left.join(right, on, how)`` for inner and
    left joins (each left row carries exactly one salt value; each right
    row exists once per salt, and a left row meets each matching right row
    exactly once — at its own salt). Use when BOTH sides are too large to
    broadcast and the left key histogram is pathological; AQE's runtime
    skew split covers sort-merge joins after the fact, this covers the
    planned shape. Right-side replication costs ``salt_buckets`` ×
    |right|, so keep the right side the smaller relation.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if "__salt" in left.columns or "__salt" in right.columns:
        # withColumn would silently replace the user's column and the
        # final drop would discard it — corrupt output, no error
        raise ValueError("salted_join reserves the column name '__salt'")
    # per-ROW salt on the left (a key-derived salt would send the whole hot
    # key to one bucket); the right side exists once per salt value, so the
    # join result is invariant to the salt assignment — rand() is safe here
    l = left.withColumn(
        "__salt", (F.rand(17) * salt_buckets).cast("int")
    )
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = l.join(r, [on, "__salt"], how)
    return out.drop("__salt")


# --- key-skew profile ------------------------------------------------------


def key_skew_profile(
    df: DataFrame, key_cols: list[str], top_n: int = 10, round_to: int = 6
) -> DataFrame:
    """One-row skew pre-flight for a join/groupBy key: ``(n_rows, n_keys,
    max_count, top1_share, topN_share, gini)``. Decides BEFORE a 100 TB
    shuffle whether the key needs the salted fallback (`salted_join` /
    `salted_group_agg`), AQE skew hints, or nothing: gini near 0 =
    uniform, near 1 = one key owns the table; top1_share is the single
    hottest reducer's fraction directly.

    Shape: one hash aggregation to key cardinality, then a global-window
    rank over the (k-row) count frame — the same k-sized-frame contract
    as the duplication profile; if key cardinality itself is huge,
    profile a hash-sample of keys instead. Σ(i·c) accumulates in
    DECIMAL(38,0) (exact, order-free — and immune to the BIGINT overflow
    a 1e9-key × 1e12-row corpus would hit); the Gini formula
    ``(2·A)/(k·T) − (k+1)/k`` is evaluated in doubles written identically
    in both dialects."""
    from pyspark.sql import Window

    cnt = df.groupBy(*key_cols).agg(F.count(F.lit(1)).cast("long").alias("__c"))
    asc = Window.orderBy(F.col("__c").asc(), *[F.col(k).asc() for k in key_cols])
    desc = Window.orderBy(
        F.col("__c").desc(), *[F.col(k).desc() for k in key_cols]
    )
    ranked = cnt.select(
        F.col("__c"),
        F.row_number().over(asc).alias("__i"),
        F.row_number().over(desc).alias("__j"),
    )
    agg = ranked.agg(
        F.sum("__c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("__c").alias("max_count"),
        F.sum(F.col("__i").cast("decimal(38,0)") * F.col("__c")).alias("__A"),
        F.sum(
            F.when(F.col("__j") <= int(top_n), F.col("__c")).otherwise(0)
        )
        .cast("long")
        .alias("__topn"),
    )
    rt = int(round_to)
    return agg.select(
        "n_rows",
        "n_keys",
        "max_count",
        F.round(F.col("max_count") / F.col("n_rows").cast("double"), rt).alias(
            "top1_share"
        ),
        F.round(F.col("__topn") / F.col("n_rows").cast("double"), rt).alias(
            "topn_share"
        ),
        F.round(
            (F.lit(2.0) * F.col("__A").cast("double"))
            / (F.col("n_keys").cast("double") * F.col("n_rows"))
            - (F.col("n_keys") + F.lit(1.0)) / F.col("n_keys"),
            rt,
        ).alias("gini"),
    )


def key_skew_profile_sql(
    table: str, key_cols: list[str], top_n: int = 10, round_to: int = 6
) -> str:
    keys = ", ".join(key_cols)
    asc = ", ".join([f"c, {', '.join(key_cols)}"])
    desc = ", ".join(["c DESC"] + [f"{k} DESC" for k in key_cols])
    rt = int(round_to)
    return f"""
WITH cnt AS (
  SELECT {keys}, COUNT(*)::BIGINT AS c FROM {table} GROUP BY {keys}
), rk AS (
  SELECT c,
         row_number() OVER (ORDER BY {asc}) AS i,
         row_number() OVER (ORDER BY {desc}) AS j
  FROM cnt
), agg AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         MAX(c) AS max_count,
         CAST(SUM(CAST(i AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS A,
         CAST(SUM(CASE WHEN j <= {int(top_n)} THEN c ELSE 0 END) AS BIGINT)
           AS topn
  FROM rk
)
SELECT n_rows, n_keys, max_count,
       CASE WHEN ABS(max_count / CAST(n_rows AS DOUBLE)) >= 1e16 THEN CAST((max_count / CAST(n_rows AS DOUBLE)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((max_count / CAST(n_rows AS DOUBLE)) * CAST(ABS(max_count / CAST(n_rows AS DOUBLE)) >= POWER(10.0, -({rt}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{rt})) AS VARCHAR) AS DOUBLE) END AS top1_share,
       CASE WHEN ABS(topn / CAST(n_rows AS DOUBLE)) >= 1e16 THEN CAST((topn / CAST(n_rows AS DOUBLE)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((topn / CAST(n_rows AS DOUBLE)) * CAST(ABS(topn / CAST(n_rows AS DOUBLE)) >= POWER(10.0, -({rt}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{rt})) AS VARCHAR) AS DOUBLE) END AS topn_share,
       CAST(CAST(CAST(CAST(((2.0 * CAST(A AS DOUBLE)) / (CAST(n_keys AS DOUBLE) * n_rows)
             - (n_keys + 1.0) / n_keys) * CAST(ABS((2.0 * CAST(A AS DOUBLE)) / (CAST(n_keys AS DOUBLE) * n_rows)
             - (n_keys + 1.0) / n_keys) >= POWER(10.0, -({rt}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{rt})) AS VARCHAR) AS DOUBLE) AS gini
FROM agg
"""
