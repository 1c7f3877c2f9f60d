"""Lakehouse MERGE INTO (upsert) semantics as pure DataFrame algebra.

The standard table-maintenance primitive (Delta/Iceberg ``MERGE INTO``,
the batch form of a CDC apply): given a target table and a batch of
updates keyed the same way,

- a key only in the updates becomes an **insert**,
- a key in both takes the update's values — an **update**, unless every
  compared column is identical, in which case it is a **keep** (no-op
  update detection, the real-world filter for CDC echo noise),
- a key only in the target is a **keep**.

Spark-first shape: ONE full-outer hash join on the key (broadcast when
the update batch is small — AQE decides; at 100 TB the usual deployment
bucketizes both sides on the key so the join is zero-exchange), then
pure column expressions for the coalesce + action tag. No window, no
second pass; the accounting report is one hash aggregation over the
action column.

cf. reference query/table semantics in SURVEY.md §2.6 (the reference
engine has no table maintenance at all — this is part of the pipeline
extension surface, like CDC compaction in events_latest_by_key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Merged table: ``(key, *value_cols, action)`` with action in
    ``('insert', 'update', 'keep')``. Update rows win on matched keys;
    matched-and-identical rows are tagged ``keep``."""
    t = target.select(key_col, *value_cols)
    u = updates.select(key_col, *value_cols)
    ucols = {c: f"__u_{c}" for c in value_cols}
    u = u.select(
        F.col(key_col), *[F.col(c).alias(a) for c, a in ucols.items()]
    ).withColumn("__in_u", F.lit(True))
    j = t.withColumn("__in_t", F.lit(True)).join(u, key_col, "full_outer")
    same = None
    for c in value_cols:
        eq = F.col(c).eqNullSafe(F.col(ucols[c]))
        same = eq if same is None else (same & eq)
    action = (
        F.when(F.col("__in_t").isNull(), F.lit("insert"))
        .when(F.col("__in_u").isNull(), F.lit("keep"))
        .when(same, F.lit("keep"))
        .otherwise(F.lit("update"))
    )
    merged = [
        F.when(F.col("__in_u").isNotNull(), F.col(ucols[c]))
        .otherwise(F.col(c))
        .alias(c)
        for c in value_cols
    ]
    return j.select(F.col(key_col), *merged, action.alias("action")).orderBy(
        key_col
    )


def merge_upsert_sql(
    target: str, updates: str, key_col: str, value_cols: list[str]
) -> str:
    # Presence MARKERS (__in_t/__in_u), not key-NULL tests, decide which
    # side a row came from: a NULL-keyed target row also has t.key IS
    # NULL after the full-outer join (NULL keys never match), and a
    # key-NULL test would tag it 'insert' while the DataFrame twin's
    # presence flags correctly say 'keep'.
    same = " AND ".join(
        f"t.{c} IS NOT DISTINCT FROM u.{c}" for c in value_cols
    )
    merged = ", ".join(
        f"CASE WHEN u.__in_u IS NOT NULL THEN u.{c} ELSE t.{c} END AS {c}"
        for c in value_cols
    )
    return f"""
SELECT COALESCE(t.{key_col}, u.{key_col}) AS {key_col},
       {merged},
       CASE WHEN t.__in_t IS NULL THEN 'insert'
            WHEN u.__in_u IS NULL THEN 'keep'
            WHEN {same} THEN 'keep'
            ELSE 'update' END AS action
FROM (SELECT *, TRUE AS __in_t FROM {target}) t
FULL OUTER JOIN (SELECT *, TRUE AS __in_u FROM {updates}) u
  ON t.{key_col} = u.{key_col}
ORDER BY {key_col}
"""


def merge_accounting(
    target: DataFrame,
    updates: DataFrame,
    key_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Per-action row counts — what a MERGE job logs: ``(action, n)``."""
    m = merge_upsert(target, updates, key_col, value_cols)
    return (
        m.groupBy("action")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("action")
    )


def merge_accounting_sql(
    target: str, updates: str, key_col: str, value_cols: list[str]
) -> str:
    inner = merge_upsert_sql(target, updates, key_col, value_cols)
    return f"""
SELECT action, CAST(COUNT(*) AS BIGINT) AS n
FROM ({inner}) GROUP BY action ORDER BY action
"""
