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


def scd2_build(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_us: F.Column,
    tiebreak_col: str,
    far_future_us: int = 32503680000000000,  # 3000-01-01, exact in int64
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 history from a change stream:
    ``(key, attr, valid_from_us, valid_to_us, version, is_current)``.

    The other half of table maintenance next to ``merge_upsert``: where
    MERGE keeps only the latest value per key, SCD2 keeps every value
    with its validity interval — the dimension shape every point-in-time
    (as-of) join downstream wants.  Semantics:

    - events for a key are ordered by ``(ts_us, tiebreak_col)`` (the
      tiebreaker makes the history deterministic under same-timestamp
      changes — without it the interval bounds are engine-dependent);
    - consecutive events with an UNCHANGED attribute are collapsed (CDC
      echo suppression, same contract as merge_upsert's no-op
      detection);
    - ``valid_to_us`` of a version is the ``valid_from_us`` of the next
      one (half-open intervals); the current version gets a far-future
      sentinel instead of NULL so the column stays int64 end-to-end
      (a NULL here would coerce the whole column to float64 in pandas
      on BOTH engines — exact below 2^53 µs, but the sentinel keeps the
      lattice integer, per the repo dtype conventions).

    Plan: ONE shuffle on the key; LAG (change detection) → filter →
    LEAD + ROW_NUMBER (interval bounds + version) all share the same
    window partitioning, so Catalyst runs them in a single WindowExec
    chain without re-exchanging.  At 100 TB this is the minimal shape —
    a per-key ordinal history cannot be built with less than one
    key-partitioned sort.
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(key_col).alias("key"),
        F.col(attr_col).alias("attr"),
        ts_us.cast("long").alias("__us"),
        F.col(tiebreak_col).alias("__tb"),
    )
    w = Window.partitionBy("key").orderBy("__us", "__tb")
    # first-row detection must be POSITIONAL (__rn = 1), not
    # __prev IS NULL: a stream whose attribute is legitimately NULL in
    # consecutive events would otherwise never collapse (review-caught —
    # NULL attr echoes produced split versions)
    changed = base.select(
        "*",
        F.lag("attr").over(w).alias("__prev"),
        F.row_number().over(w).alias("__rn"),
    ).where(
        (F.col("__rn") == 1) | ~F.col("attr").eqNullSafe(F.col("__prev"))
    )
    # the filtered frame keeps the same partitioning; LEAD/ROW_NUMBER
    # reuse it (one WindowExec, no second exchange)
    w2 = Window.partitionBy("key").orderBy("__us", "__tb")
    out = changed.select(
        F.col("key"),
        F.col("attr"),
        F.col("__us").alias("valid_from_us"),
        F.coalesce(
            F.lead("__us").over(w2), F.lit(int(far_future_us))
        ).alias("valid_to_us"),
        F.row_number().over(w2).cast("long").alias("version"),
        F.lead("__us").over(w2).isNull().cast("long").alias("is_current"),
    )
    return out.orderBy("key", "version")


def scd2_build_sql(
    table: str,
    key_col: str,
    attr_col: str,
    ts_us_sql: str,
    tiebreak_col: str,
    far_future_us: int = 32503680000000000,
) -> str:
    return f"""
WITH __b AS (
  SELECT {key_col} AS key, {attr_col} AS attr,
         CAST({ts_us_sql} AS BIGINT) AS __us, {tiebreak_col} AS __tb
  FROM {table}
),
__lag AS (
  SELECT *, LAG(attr) OVER (PARTITION BY key ORDER BY __us, __tb) AS __prev,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY __us, __tb) AS __rn
  FROM __b
),
__chg AS (
  SELECT * FROM __lag
  WHERE __rn = 1 OR attr IS DISTINCT FROM __prev
)
SELECT key, attr, __us AS valid_from_us,
       COALESCE(LEAD(__us) OVER (PARTITION BY key ORDER BY __us, __tb),
                {int(far_future_us)}) AS valid_to_us,
       CAST(ROW_NUMBER() OVER (PARTITION BY key ORDER BY __us, __tb)
            AS BIGINT) AS version,
       CAST(CASE WHEN LEAD(__us) OVER (PARTITION BY key
                                       ORDER BY __us, __tb) IS NULL
                 THEN 1 ELSE 0 END AS BIGINT) AS is_current
FROM __chg ORDER BY key, version
"""


def scd2_summary(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_us: F.Column,
    tiebreak_col: str,
) -> DataFrame:
    """(versions, n_keys, n_current): how churned the dimension is — a
    histogram of keys by how many SCD2 versions they accumulated.  The
    long tail IS the signal: keys with dozens of versions are either
    genuinely volatile or a CDC-noise symptom merge_upsert's no-op
    suppression should have caught upstream."""
    hist = scd2_build(df, key_col, attr_col, ts_us, tiebreak_col)
    per_key = hist.groupBy("key").agg(
        F.max("version").alias("versions"),
        F.sum("is_current").cast("long").alias("__cur"),
    )
    return (
        per_key.groupBy("versions")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("__cur").cast("long").alias("n_current"),
        )
        .orderBy("versions")
    )


def scd2_summary_sql(
    table: str,
    key_col: str,
    attr_col: str,
    ts_us_sql: str,
    tiebreak_col: str,
) -> str:
    inner = scd2_build_sql(table, key_col, attr_col, ts_us_sql, tiebreak_col)
    return f"""
WITH __h AS ({inner}),
__k AS (
  SELECT key, MAX(version) AS versions,
         CAST(SUM(is_current) AS BIGINT) AS __cur
  FROM __h GROUP BY key
)
SELECT versions, CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(__cur) AS BIGINT) AS n_current
FROM __k GROUP BY versions ORDER BY versions
"""


def scd2_transition_matrix(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_us: F.Column,
    tiebreak_col: str,
) -> DataFrame:
    """(prev_attr, attr, n_changes): how the dimension MOVES — for every
    SCD2 version after the first, the (previous value → new value)
    transition count.  The consumer-side proof of the history table: a
    point-in-time lookup of "what was this key's state just before this
    version began" against the validity lattice itself.

    The lookup is the PIT-join predicate ``valid_from ≤ t−1 < valid_to``
    evaluated at each version's own start minus one µs — which the
    half-open lattice answers with exactly the preceding version, even
    for same-µs changes (an empty [t, t) interval can never match).
    One equi-join on the key with a residual range filter: at 100 TB the
    per-key version count is the residual's bound, the join itself is
    plain hash partitioning.
    """
    hist = scd2_build(df, key_col, attr_col, ts_us, tiebreak_col)
    later = hist.where(F.col("version") > 1).select(
        F.col("key"),
        F.col("attr"),
        (F.col("valid_from_us") - F.lit(1)).alias("__probe"),
    )
    prev = hist.select(
        F.col("key"),
        F.col("attr").alias("prev_attr"),
        F.col("valid_from_us").alias("__f"),
        F.col("valid_to_us").alias("__t"),
    )
    joined = later.join(prev, "key").where(
        (F.col("__f") <= F.col("__probe")) & (F.col("__probe") < F.col("__t"))
    )
    return (
        joined.groupBy("prev_attr", "attr")
        .agg(F.count(F.lit(1)).cast("long").alias("n_changes"))
        .orderBy("prev_attr", "attr")
    )


def scd2_transition_matrix_sql(
    table: str,
    key_col: str,
    attr_col: str,
    ts_us_sql: str,
    tiebreak_col: str,
) -> str:
    inner = scd2_build_sql(table, key_col, attr_col, ts_us_sql, tiebreak_col)
    return f"""
WITH __h AS ({inner}),
__later AS (
  SELECT key, attr, valid_from_us - 1 AS probe
  FROM __h WHERE version > 1
),
__j AS (
  SELECT p.attr AS prev_attr, l.attr
  FROM __later l JOIN __h p ON l.key = p.key
  WHERE p.valid_from_us <= l.probe AND l.probe < p.valid_to_us
)
SELECT prev_attr, attr, CAST(COUNT(*) AS BIGINT) AS n_changes
FROM __j GROUP BY prev_attr, attr ORDER BY prev_attr, attr
"""
