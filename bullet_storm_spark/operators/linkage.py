"""Structured-record linkage (entity resolution), dual-compiled.

Every dedup operator in this package keys on unstructured content (text
shingles, embeddings, fingerprints). Production entity resolution on
STRUCTURED records (customers, suppliers, catalog items) is a different
shape — the Fellegi-Sunter pipeline: block on cheap equality keys,
compare candidate pairs field-by-field (string edit distance, numeric
proximity, exact agreement), and sum per-field agreement weights into a
match score.

Scale shape (100 TB posture):
* blocking is ONE equi-join on the block key tuple — candidate count is
  sum of block sizes squared, bounded by the blocking choice, never
  corpus². Callers pick keys so blocks stay executor-sized (the same
  contract as the LSH bucket operators; block-size audit included);
* per-pair comparators are pure JVM column expressions (levenshtein,
  abs-diff, equality) inside whole-stage codegen — no Python, no UDF;
* scoring is a projection; the threshold filter runs before the
  orderBy, so only matches survive the final sort.

Reference: Fellegi & Sunter, JASA 1969 (the linkage-weight model);
blocking posture follows the survey in Christen, TKDE 2012. The Bullet
reference engine has no record-linkage surface (SURVEY.md §2.6
extension).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class Comparator:
    """One field comparison: ``kind`` in {'exact', 'levenshtein',
    'abs_diff'}. ``scale`` is the distance at which the field's
    contribution decays to zero (levenshtein / abs_diff); ``weight`` is
    the field's agreement weight in the score."""

    field: str
    kind: str
    weight: float = 1.0
    scale: float = 1.0


def _pair_score(c: Comparator):
    l = F.col(f"l.{c.field}")
    r = F.col(f"r.{c.field}")
    if c.kind == "exact":
        sim = F.when(l == r, F.lit(1.0)).otherwise(F.lit(0.0))
    elif c.kind == "levenshtein":
        # any distance >= scale contributes exactly 0, so the banded
        # O(n·scale) early-exit form (threshold arg, Spark 3.5+) replaces
        # the full O(n·m) matrix: -1 ("above threshold") maps to scale,
        # which the greatest() clamps to the same 0 contribution
        thr = max(int(-(-c.scale // 1)), 1)  # ceil(scale)
        dist = F.levenshtein(l, r, thr).cast("double")
        dist = F.when(dist < 0, F.lit(float(c.scale))).otherwise(dist)
        sim = F.greatest(F.lit(0.0), F.lit(1.0) - dist / F.lit(float(c.scale)))
    elif c.kind == "abs_diff":
        dist = F.abs(l - r).cast("double")
        sim = F.greatest(F.lit(0.0), F.lit(1.0) - dist / F.lit(float(c.scale)))
    else:  # pragma: no cover
        raise ValueError(f"unknown comparator kind {c.kind!r}")
    return sim * c.weight


def _pair_score_sql(c: Comparator) -> str:
    l, r = f"l.{c.field}", f"r.{c.field}"
    if c.kind == "exact":
        sim = f"(CASE WHEN {l} = {r} THEN 1.0 ELSE 0.0 END)"
    elif c.kind == "levenshtein":
        sim = f"greatest(0.0, 1.0 - levenshtein({l}, {r}) / {float(c.scale)})"
    elif c.kind == "abs_diff":
        sim = f"greatest(0.0, 1.0 - abs({l} - {r}) / {float(c.scale)})"
    else:  # pragma: no cover
        raise ValueError(f"unknown comparator kind {c.kind!r}")
    return f"({sim} * {float(c.weight)})"


def record_linkage_pairs(
    df: DataFrame,
    id_col: str,
    block_on: list[str],
    comparators: list[Comparator],
    threshold: float = 1.5,
    round_to: int = 6,
    ordered: bool = True,
) -> DataFrame:
    """(id_a, id_b, score) — candidate pairs from equality blocking on
    ``block_on``, scored as the weighted sum of per-field similarities,
    kept when score >= threshold."""
    if not block_on:
        # an empty block list would silently degrade to an unblocked
        # all-pairs cross join (O(n^2) BroadcastNestedLoopJoin) —
        # blocking is mandatory at scale
        raise ValueError("record_linkage_pairs requires >= 1 block_on column")
    cols = {id_col, *block_on, *(c.field for c in comparators)}
    base = df.select(*sorted(cols))
    # spread the probe side: the comparator work runs on the streamed side
    # of a broadcast join, and a single-file table otherwise probes in one
    # task (measured 7.3 s -> ~1 s at sf0.1 on the 15k-customer table)
    l = base.repartition(
        df.sparkSession.sparkContext.defaultParallelism
    ).alias("l")
    r = base.alias("r")
    cond = F.col(f"l.{id_col}") < F.col(f"r.{id_col}")
    for b in block_on:
        cond = cond & (F.col(f"l.{b}") == F.col(f"r.{b}"))
    score = F.round(
        sum((_pair_score(c) for c in comparators), F.lit(0.0)), round_to
    )
    out = (
        l.join(r, cond)
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            score.alias("score"),
        )
        .where(F.col("score") >= threshold)
    )
    # ordered=False skips the determinism-only sort for order-insensitive
    # consumers (connected components in resolve_entities) — guide §2.4
    return out.orderBy("id_a", "id_b") if ordered else out


def record_linkage_pairs_sql(
    table: str,
    id_col: str,
    block_on: list[str],
    comparators: list[Comparator],
    threshold: float = 1.5,
    round_to: int = 6,
) -> str:
    if not block_on:
        raise ValueError("record_linkage_pairs_sql requires >= 1 block_on column")
    block = " AND ".join(f"l.{b} = r.{b}" for b in block_on)
    score = " + ".join(_pair_score_sql(c) for c in comparators)
    return f"""
SELECT id_a, id_b, score FROM (
  SELECT l.{id_col} AS id_a, r.{id_col} AS id_b,
         CASE WHEN ABS({score}) >= 1e16 THEN CAST(({score}) AS DOUBLE) ELSE CAST(CAST(CAST(CAST(({score}) * CAST(ABS({score}) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS score
  FROM {table} l JOIN {table} r
    ON l.{id_col} < r.{id_col} AND {block}
) WHERE score >= {threshold}
ORDER BY id_a, id_b
"""


def block_size_audit(
    df: DataFrame,
    block_on: list[str],
    top_n: int = 20,
) -> DataFrame:
    """(block cols..., n_records, n_pairs) for the ``top_n`` largest
    blocks — the pre-flight skew check before a linkage run: a block of
    m records generates m(m-1)/2 candidate pairs, so one hot block can
    dominate the whole join. Run this first; if the top block is
    unbounded, add another blocking key."""
    counts = df.groupBy(*block_on).agg(F.count("*").alias("n_records"))
    return (
        counts.withColumn(
            "n_pairs",
            (F.col("n_records") * (F.col("n_records") - 1) / 2).cast("long"),
        )
        .orderBy(F.desc("n_pairs"), *block_on)
        .limit(top_n)
    )


def block_size_audit_sql(table: str, block_on: list[str], top_n: int = 20) -> str:
    cols = ", ".join(block_on)
    return f"""
SELECT {cols}, n_records,
       CAST(n_records * (n_records - 1) / 2 AS BIGINT) AS n_pairs
FROM (SELECT {cols}, COUNT(*)::BIGINT AS n_records FROM {table} GROUP BY {cols})
ORDER BY n_pairs DESC, {cols}
LIMIT {top_n}
"""


def resolve_entities(
    df: DataFrame,
    id_col: str,
    block_on: list[str],
    comparators: list[Comparator],
    threshold: float = 1.5,
    survivor_col: str | None = None,
) -> DataFrame:
    """Full entity-resolution pass: linkage pairs -> transitive closure
    (connected components over the match graph) -> survivorship. Output
    one row per input record: ``(id, cluster_id, cluster_size,
    canonical_id, is_canonical)`` where ``canonical_id`` is the cluster
    member with the greatest ``survivor_col`` (record id ascending as the
    tie-break; min id when no survivor column is given) — the
    master-record election every MDM pipeline runs after matching.

    Scale: the component step shuffles only the match graph (see
    dedup.connected_components); the corpus joins the label table once,
    by its natural key; survivorship is one window over the cluster key.
    """
    from pyspark.sql import Window

    from bullet_storm_spark.operators.dedup import connected_components

    pairs = record_linkage_pairs(
        df, id_col, block_on, comparators, threshold, ordered=False
    )
    comp = connected_components(pairs)
    keep = [id_col] + ([survivor_col] if survivor_col else [])
    base = df.select(*keep)
    labeled = base.join(
        comp, base[id_col] == comp["node"], "left"
    ).select(
        *keep, F.coalesce(F.col("cluster"), F.col(id_col)).alias("cluster_id")
    )
    wc = Window.partitionBy("cluster_id")
    order = (
        [F.desc(survivor_col), F.asc(id_col)] if survivor_col else [F.asc(id_col)]
    )
    ws = Window.partitionBy("cluster_id").orderBy(*order)
    return (
        labeled.select(
            F.col(id_col),
            "cluster_id",
            F.count("*").over(wc).cast("long").alias("cluster_size"),
            F.first(id_col).over(ws).alias("canonical_id"),
        )
        .withColumn("is_canonical", F.col(id_col) == F.col("canonical_id"))
        .orderBy(id_col)
    )


def resolve_entities_sql(
    table: str,
    id_col: str,
    block_on: list[str],
    comparators: list[Comparator],
    threshold: float = 1.5,
    survivor_col: str | None = None,
) -> str:
    pairs = record_linkage_pairs_sql(
        table, id_col, block_on, comparators, threshold
    ).strip()
    pairs = pairs[: pairs.rindex("ORDER BY")]
    order = (
        f"{survivor_col} DESC, {id_col} ASC" if survivor_col else f"{id_col} ASC"
    )
    # MATERIALIZED is load-bearing (see dedup_clusters_sql): the recursive
    # step re-scans edges each iteration
    return f"""
WITH RECURSIVE base_pairs AS MATERIALIZED (
  SELECT id_a, id_b FROM ({pairs})
), edges AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM base_pairs
  UNION
  SELECT id_b, id_a FROM base_pairs
), reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
), comp AS (
  SELECT src AS node, LEAST(src, MIN(dst)) AS cluster FROM reach GROUP BY src
), labeled AS (
  SELECT t.{id_col} AS id{', t.' + survivor_col if survivor_col else ''},
         COALESCE(c.cluster, t.{id_col}) AS cluster_id
  FROM {table} t LEFT JOIN comp c ON t.{id_col} = c.node
)
SELECT id AS {id_col}, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id)::BIGINT AS cluster_size,
       FIRST_VALUE(id) OVER (PARTITION BY cluster_id ORDER BY {order})
         AS canonical_id,
       id = FIRST_VALUE(id) OVER (PARTITION BY cluster_id ORDER BY {order})
         AS is_canonical
FROM labeled
ORDER BY {id_col}
"""


def sorted_neighborhood_audit(
    df: DataFrame,
    id_col: str,
    sort_key: Column,
    agree_cols: list[str],
    window: int = 5,
) -> DataFrame:
    """(n_records, n_pairs, *n_agree_<col>): the sorted-neighborhood
    blocking audit (Hernández & Stolfo SIGMOD'95) — the OTHER classic
    blocking family next to ``record_linkage_pairs``' equality blocking:
    sort records by a fuzzy key, take every pair within a sliding window
    of ``window`` positions as candidates.  Equality blocking misses
    near-misses that cross block values; sorted neighborhood catches
    them when the sort key places them adjacently.  The audit counts,
    per agreement column, how many candidate pairs agree — the
    pre-flight for choosing (sort key, window) before the comparator
    stage runs.

    Spark-first: the global ordinal comes from ``assign_dense_ids``
    (range exchange + broadcast offsets — NOT a single-partition
    window); the window-of-w pair generation is an EQUI-join on the
    ``idx div w`` band (a pair within distance w spans at most two
    adjacent width-w bands, so the probe side explodes to {b, b+1}) with
    the exact distance predicate as a residual — never a BNLJ.

    The sort key MUST be made tie-free by appending ``id_col`` (done
    internally): a tied order would make the candidate set
    engine-dependent.
    """
    from bullet_storm_spark.operators.ids import assign_dense_ids

    w = int(window)
    if w < 2:
        raise ValueError(f"window must be >= 2, got {w}")
    base = df.select(
        F.col(id_col).alias("__id"),
        sort_key.cast("long").alias("__sk"),
        *[F.col(c).alias(f"__a_{c}") for c in agree_cols],
    )
    idx = assign_dense_ids(base, ["__sk", "__id"], id_name="__idx")
    lhs = idx.select(
        "__idx",
        *[f"__a_{c}" for c in agree_cols],
        F.expr(f"__idx div {w}").alias("__b"),
    )
    rhs = idx.select(
        F.col("__idx").alias("__jdx"),
        *[F.col(f"__a_{c}").alias(f"__b_{c}") for c in agree_cols],
        F.explode(
            F.array(F.expr(f"__idx div {w} - 1"), F.expr(f"__idx div {w}"))
        ).alias("__b"),
    )
    pairs = lhs.join(rhs, "__b").where(
        (F.col("__jdx") > F.col("__idx"))
        & (F.col("__jdx") - F.col("__idx") <= F.lit(w - 1))
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_pairs")] + [
        F.sum(
            F.col(f"__a_{c}").eqNullSafe(F.col(f"__b_{c}")).cast("long")
        )
        .cast("long")
        .alias(f"n_agree_{c}")
        for c in agree_cols
    ]
    rep = pairs.agg(*aggs)
    n = base.agg(F.count(F.lit(1)).cast("long").alias("n_records"))
    return rep.crossJoin(F.broadcast(n)).select(
        "n_records", "n_pairs", *[f"n_agree_{c}" for c in agree_cols]
    )


def sorted_neighborhood_audit_sql(
    table: str,
    id_col: str,
    sort_key_sql: str,
    agree_cols: list[str],
    window: int = 5,
) -> str:
    w = int(window)
    pair_cols = ", ".join(
        f"a.{c} AS a_{c}, b.{c} AS b_{c}" for c in agree_cols
    )
    agree = ",\n       ".join(
        f"CAST(SUM(CASE WHEN a_{c} IS NOT DISTINCT FROM b_{c}"
        f" THEN 1 ELSE 0 END) AS BIGINT) AS n_agree_{c}"
        for c in agree_cols
    )
    return f"""
WITH __b AS (
  SELECT {id_col} AS __id, CAST({sort_key_sql} AS BIGINT) AS __sk,
         {", ".join(agree_cols)}
  FROM {table}
),
__i AS (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY __sk, __id) AS BIGINT)
           AS __idx
  FROM __b
),
__p AS (
  SELECT a.__idx AS i, b.__idx AS j, {pair_cols}
  FROM __i a JOIN __i b
    ON b.__idx > a.__idx AND b.__idx - a.__idx <= {w - 1}
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM __b) AS n_records,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       {agree}
FROM __p
"""
