"""Count-Min sketch frequency summaries, dual-compiled.

SpaceSaving (operators/sketches.py) answers "what are the top keys?" with m
counters; the Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms
2005) answers the complementary question — "how often did THIS key occur?"
— for EVERY key, in depth x width counters regardless of key cardinality.
Estimates only ever overestimate (collisions add, never subtract), with
error <= n/width at probability 1 - 2^-depth per the classic bound.

The Spark-first observation: a CMS is just ``groupBy(row, col).sum`` —
the sketch IS a tiny DataFrame. That makes it, unlike driver-merged
sketches:
* fully distributed to build (one map-side-combined shuffle over d*w
  cells, never the key cardinality);
* mergeable across shards/days by unioning sketch tables and re-summing
  (associative, exactly like the reference's sketch-union result merge,
  SURVEY.md §2.4);
* broadcastable to probe (d*w rows — the estimate join is a broadcast
  hash join against the corpus's distinct keys, or an array-literal scan
  expression for fixed probe keys, same trade as operators/bloom.py).

Hashing is the same Kirsch-Mitzenmacher md5 scheme as MinHash/Bloom
(row i probes column (h1 + i*h2) mod width), so the DuckDB oracle agrees
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bullet_storm_spark.operators.bloom import _halves, _halves_sql


def _check(width: int, depth: int) -> None:
    if width < 2:
        raise ValueError(f"need width >= 2, got {width}")
    if not 1 <= depth <= 16:
        raise ValueError(f"need 1 <= depth <= 16, got {depth}")


def cms_build(
    df: DataFrame, key_col: str, width: int = 128, depth: int = 4
) -> DataFrame:
    """(row_idx, col_idx, cnt): the non-zero cells of a depth x width
    Count-Min sketch counting every OCCURRENCE of ``key_col`` (not
    distinct keys). Zero cells are omitted; estimate readers treat a
    missing cell as 0."""
    _check(width, depth)
    h1, h2 = _halves(F.col(key_col).cast("string"))
    cells = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(depth - 1)),
            lambda i: F.struct(
                i.cast("bigint").alias("r"),
                F.pmod(h1 + i.cast("bigint") * h2, F.lit(width)).alias("c"),
            ),
        )
    )
    return (
        df.select(cells.alias("__cell"))
        .groupBy(
            F.col("__cell.r").alias("row_idx"), F.col("__cell.c").alias("col_idx")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("row_idx", "col_idx")
    )


def cms_build_sql(table: str, key_expr: str, width: int = 128, depth: int = 4) -> str:
    _check(width, depth)
    h1, h2 = _halves_sql("CAST(__key AS VARCHAR)")
    return f"""
WITH __keys AS (SELECT {key_expr} AS __key FROM {table}),
__cells AS (
  SELECT t.i AS row_idx, (({h1}) + t.i * ({h2})) % {width} AS col_idx
  FROM __keys, range(0, {depth}) t(i)
)
SELECT row_idx, col_idx, COUNT(*) AS cnt
FROM __cells GROUP BY row_idx, col_idx
ORDER BY row_idx, col_idx
"""


def cms_estimate_audit(
    df: DataFrame,
    key_col: str,
    width: int = 128,
    depth: int = 4,
    top_n: int = 20,
) -> DataFrame:
    """(key, exact_cnt, est_cnt, overestimate) for the ``top_n`` keys by
    exact count (ties broken by key for an engine-independent cut) — the
    sketch-accuracy audit. ``est_cnt >= exact_cnt`` is a STRUCTURAL
    guarantee of CMS (asserted in tests); ``overestimate`` is the
    collision-induced error the width/depth config buys.

    Plan shape: the sketch is built once (d*w cells) and broadcast; the
    exact side is one groupBy on the key; the probe is a broadcast hash
    join per depth row + a min-aggregate back on the key — nothing scales
    with corpus size except the two scans."""
    _check(width, depth)
    sketch = cms_build(df, key_col, width=width, depth=depth)
    exact = (
        df.groupBy(F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "key")
        .limit(int(top_n))
    )
    h1, h2 = _halves(F.col("key").cast("string"))
    probes = exact.select(
        "key",
        "exact_cnt",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda i: F.struct(
                    i.cast("bigint").alias("r"),
                    F.pmod(h1 + i.cast("bigint") * h2, F.lit(width)).alias("c"),
                ),
            )
        ).alias("__cell"),
    )
    return (
        probes.join(
            F.broadcast(sketch),
            (F.col("__cell.r") == F.col("row_idx"))
            & (F.col("__cell.c") == F.col("col_idx")),
            "left",
        )
        .groupBy("key", "exact_cnt")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
        .select(
            "key",
            "exact_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("exact_cnt")).alias("overestimate"),
        )
        .orderBy(F.desc("exact_cnt"), "key")
    )


def cms_estimate_audit_sql(
    table: str,
    key_expr: str,
    width: int = 128,
    depth: int = 4,
    top_n: int = 20,
) -> str:
    _check(width, depth)
    h1, h2 = _halves_sql("CAST(__key AS VARCHAR)")
    hp1, hp2 = _halves_sql("CAST(key AS VARCHAR)")
    return f"""
WITH __keys AS (SELECT {key_expr} AS __key FROM {table}),
__cells AS (
  SELECT t.i AS row_idx, (({h1}) + t.i * ({h2})) % {width} AS col_idx
  FROM __keys, range(0, {depth}) t(i)
),
__sketch AS (
  SELECT row_idx, col_idx, COUNT(*) AS cnt
  FROM __cells GROUP BY row_idx, col_idx
),
__exact AS (
  SELECT __key AS key, COUNT(*) AS exact_cnt
  FROM __keys GROUP BY __key
  ORDER BY exact_cnt DESC, key LIMIT {int(top_n)}
),
__probes AS (
  SELECT key, exact_cnt, t.i AS r,
         (({hp1}) + t.i * ({hp2})) % {width} AS c
  FROM __exact, range(0, {depth}) t(i)
),
__est AS (
  SELECT key, exact_cnt, MIN(COALESCE(s.cnt, 0)) AS est_cnt
  FROM __probes p LEFT JOIN __sketch s
    ON p.r = s.row_idx AND p.c = s.col_idx
  GROUP BY key, exact_cnt
)
SELECT key, exact_cnt, est_cnt, est_cnt - exact_cnt AS overestimate
FROM __est ORDER BY exact_cnt DESC, key
"""
