"""Corpus snapshot diff — dataset-version accounting by content hash.

Training corpora are rebuilt continuously (new crawl, new filters, new
dedup config); before swapping a version in, the pipeline needs the
added / removed / changed / unchanged breakdown between two snapshots —
the dataset analogue of a git diff, and the input to incremental
re-tokenization (only `added`+`changed` need reprocessing).

Spark-first shape (100 TB posture):

* each side collapses to (id, content_fingerprint) on the scan — md5 of
  normalized text (`functions/text.fingerprint`), 16 bytes per doc, so
  the join shuffles fingerprints, never documents.
* the diff is ONE full-outer hash join on the id — both sides shuffle
  once on the same uniform key; no skew (ids are unique per side).
* the summary is a 4-row hash aggregation over the statuses.

Incremental reprocessing then uses the `added`/`changed` id set as a
semi-join against the new snapshot — the ids are the small side and
broadcast (same posture as operators/bloom.py's reduction join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bullet_storm_spark.functions.text import fingerprint, fingerprint_sql

STATUSES = ("added", "removed", "changed", "unchanged")


def corpus_diff(
    old: DataFrame, new: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, status, old_fp, new_fp): per-document version diff between
    two corpus snapshots, by normalized-content fingerprint. ``status``
    is added / removed / changed / unchanged."""
    # presence is tested on the ID, not the fingerprint — a doc whose
    # TEXT is NULL is still present (its fp is NULL), and fp comparison
    # is null-safe so NULL-text vs real-text counts as 'changed'
    of = old.select(
        F.col(id_col).alias("__oid"),
        fingerprint(text_col).alias("old_fp"),
    )
    nf = new.select(
        F.col(id_col).alias("__nid"),
        fingerprint(text_col).alias("new_fp"),
    )
    joined = of.join(nf, of["__oid"] == nf["__nid"], "full_outer")
    status = (
        F.when(F.col("__oid").isNull(), F.lit("added"))
        .when(F.col("__nid").isNull(), F.lit("removed"))
        .when(~F.col("old_fp").eqNullSafe(F.col("new_fp")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        F.coalesce("__oid", "__nid").alias("id"),
        status.alias("status"),
        "old_fp",
        "new_fp",
    ).orderBy("id")


def corpus_diff_sql(old_table: str, new_table: str, id_col: str, text_col: str) -> str:
    fp = fingerprint_sql(text_col)
    return f"""
WITH __o AS (SELECT {id_col} AS id, {fp} AS old_fp FROM {old_table}),
__n AS (SELECT {id_col} AS id, {fp} AS new_fp FROM {new_table})
SELECT COALESCE(o.id, n.id) AS id,
       CASE WHEN o.id IS NULL THEN 'added'
            WHEN n.id IS NULL THEN 'removed'
            WHEN o.old_fp IS DISTINCT FROM n.new_fp THEN 'changed'
            ELSE 'unchanged' END AS status,
       o.old_fp, n.new_fp
FROM __o o FULL OUTER JOIN __n n ON o.id = n.id
ORDER BY id
"""


def diff_summary(
    old: DataFrame, new: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(status, n, pct_of_new): the 4-row release table — how much of the
    new snapshot is reprocessing work (added+changed), how much churn
    (removed). ``pct_of_new`` is n / |new snapshot| rounded, NULL for
    ``removed`` rows which are not in the new snapshot."""
    d = corpus_diff(old, new, id_col, text_col)
    counts = d.groupBy("status").agg(F.count(F.lit(1)).cast("long").alias("n"))
    new_total = new.agg(F.count(F.lit(1)).cast("long").alias("__t"))
    return (
        counts.crossJoin(F.broadcast(new_total))
        .select(
            "status",
            "n",
            F.when(
                F.col("status") != "removed",
                F.round(F.col("n") / F.col("__t"), 6),
            ).alias("pct_of_new"),
        )
        .orderBy("status")
    )


def diff_summary_sql(
    old_table: str, new_table: str, id_col: str, text_col: str
) -> str:
    diff = corpus_diff_sql(old_table, new_table, id_col, text_col)
    return f"""
WITH __d AS ({diff}),
__t AS (SELECT COUNT(*)::BIGINT AS t FROM {new_table})
SELECT status, COUNT(*)::BIGINT AS n,
       CASE WHEN status <> 'removed'
            THEN CASE WHEN ABS(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(__t.t)) >= 1e16 THEN CAST((CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(__t.t)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(__t.t)) * CAST(ABS(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(__t.t)) >= POWER(10.0, -(6+1)) AS INT) AS VARCHAR) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) END
            END AS pct_of_new
FROM __d, __t GROUP BY status ORDER BY status
"""
