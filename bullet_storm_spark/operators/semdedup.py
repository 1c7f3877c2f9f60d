"""SemDeDup-style semantic deduplication over an embedding column.

Design follows the published SemDeDup recipe (Abbas et al., arXiv
2303.09540): cluster embeddings with k-means, then inside each cluster drop
every item whose cosine similarity to another cluster member exceeds a
threshold, keeping one canonical representative per near-duplicate relation.
This is the embedding-space sibling of the MinHash/SimHash text dedup in
``operators/dedup.py`` (no bullet-storm counterpart — extension surface).

Spark-first shape (100 TB posture):

* Cluster assignment is a pure column expression over a FROZEN centroid
  codebook (one constant-folded literal + ``array_sort`` HOF) — it rides the
  scan with no shuffle and is bit-reproducible against the DuckDB twin, the
  same posture as ``similarity.ivf_neighbors_frozen``. Production fits the
  codebook offline (``similarity.ivf_centroids``) and ships it as literals.
* The only shuffle is the self equi-join on the cell id (hash join — pinned
  nested-loop-free in ``tests/test_plan_quality.py``). Within-cell pairwise
  work is O(sum cell_size**2); cell size is the ``n_centroids`` knob, so the
  quadratic term is bounded at ~ (N/k)**2 per cell on centroid-spread data —
  never O(N**2) globally.
* Keep rule: the lowest id in each near-duplicate relation survives — the
  repo's canonical deterministic rule (cf. ``exact_dedup``,
  ``deduplicate``). SemDeDup's keep-farthest-from-centroid variant is the
  same pair set with a different ORDER BY; lowest-id keeps the decision
  deterministic and oracle-checkable without tie-break drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bullet_storm_spark.functions.vectors import (
    as_double,
    cosine,
    cosine_sql,
    dot,
    dot_fixed,
    norm_fixed,
)
from bullet_storm_spark.operators.similarity import _planes_lit, seeded_centroids


def assign_cells_frozen(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
) -> DataFrame:
    """(id, v, cell): nearest frozen centroid by dot product (centroids are
    unit vectors, so dot ranking == cosine ranking), ties to the lowest
    centroid index — sequential index-order evaluation in both engines."""
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    v = as_double(F.col("v"))
    ranked = F.array_sort(
        F.transform(
            _planes_lit(centroids),
            lambda c, i: F.struct(
                (-dot(v, c)).alias("nd"), i.cast("int").alias("i")
            ),
        )
    )
    return base.select("id", "v", F.element_at(ranked, 1)["i"].alias("cell"))


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]] | None = None,
    threshold: float = 0.7,
    n_centroids: int = 16,
    dim: int = 64,
    round_to: int = 6,
    candidate_pair_budget: int | None = None,
) -> DataFrame:
    """(id, cell, keep): keep=False iff a lower-id member of the same
    cluster has cosine >= threshold. Output ordered by id.

    The cosine is rounded to ``round_to`` decimals before the threshold
    test so the Spark and DuckDB programs make identical keep decisions.

    ``candidate_pair_budget`` prices the in-cell pair join
    (Σ C(cell, 2)) before it runs and raises loudly over budget
    (`operators.pair_budget`, the family-wide guard); raise
    ``n_centroids`` (smaller cells) or pass finer ``centroids``."""
    cents = centroids or seeded_centroids(dim, n_centroids)
    # the unrolled fixed-dim forms are only HOF-identical when the
    # vectors really have ``dim`` entries; caller-supplied centroids
    # define the true dimension, so derive it from them
    dim = len(cents[0])
    assigned = assign_cells_frozen(df, id_col, vec_col, cents)
    if candidate_pair_budget is not None:
        from bullet_storm_spark.operators.pair_budget import (
            check_candidate_pair_budget,
        )

        check_candidate_pair_budget(
            assigned.select("cell"),
            ["cell"],
            candidate_pair_budget,
            "semantic_dedup",
            "Raise n_centroids (smaller cells) or pass finer centroids; "
            "the hot cell names the dense cluster.",
        )
    # norm once per vector + unrolled dot per pair (bit-identical to the
    # HOF cosine — functions.vectors fixed-form contract), and the pair
    # side hash-distributed on the high-cardinality id so the in-cell
    # pair compute never runs at the (single-row-group) scan parallelism
    withn = assigned.withColumn("__nrm", norm_fixed(F.col("v"), dim))
    left = withn.select(
        F.col("id").alias("l_id"),
        F.col("v").alias("l_v"),
        F.col("__nrm").alias("l_n"),
        "cell",
    ).repartition(df.sparkSession.sparkContext.defaultParallelism, "l_id")
    right = withn.select(
        F.col("id").alias("r_id"),
        F.col("v").alias("r_v"),
        F.col("__nrm").alias("r_n"),
        "cell",
    )
    dropped = (
        left.join(right, "cell")
        .where(F.col("l_id") < F.col("r_id"))
        .where(
            F.round(
                dot_fixed(F.col("l_v"), F.col("r_v"), dim)
                / (F.col("l_n") * F.col("r_n")),
                round_to,
            )
            >= F.lit(threshold)
        )
        .select(F.col("r_id").alias("id"))
        .distinct()
    )
    return (
        assigned.join(dropped.withColumn("dropped", F.lit(True)), "id", "left")
        .select("id", "cell", F.col("dropped").isNull().alias("keep"))
        .orderBy("id")
    )


def semantic_dedup_sql(
    table: str,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]] | None = None,
    threshold: float = 0.7,
    n_centroids: int = 16,
    dim: int = 64,
    round_to: int = 6,
) -> str:
    cents = centroids or seeded_centroids(dim, n_centroids)
    entries = ", ".join(
        "{'nd': -list_dot_product(v::DOUBLE[], ["
        + ", ".join(repr(x) for x in c)
        + f"]), 'i': {i}}}"
        for i, c in enumerate(cents)
    )
    cos = f"CAST(CAST(CAST(CAST(({cosine_sql('l.v', 'r.v')}) * CAST(ABS({cosine_sql('l.v', 'r.v')}) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE)"
    return f"""
WITH base AS (SELECT {id_col} AS id, {vec_col} AS v FROM {table}),
assigned AS (
  SELECT id, v, list_sort([{entries}])[1].i AS cell FROM base
),
dropped AS (
  SELECT DISTINCT r.id AS id
  FROM assigned l JOIN assigned r ON l.cell = r.cell AND l.id < r.id
  WHERE {cos} >= {threshold!r}
)
SELECT a.id, a.cell, (d.id IS NULL) AS keep
FROM assigned a LEFT JOIN dropped d ON a.id = d.id
ORDER BY a.id
"""


def semantic_dedup_report(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    **kw,
) -> DataFrame:
    """Per-cluster accounting: (cell, n, kept, dropped) — the operational
    view for tuning threshold/n_centroids. Same plan as semantic_dedup
    plus one hash aggregation on the (small) cell key."""
    decisions = semantic_dedup(df, id_col, vec_col, **kw)
    return (
        decisions.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("keep").cast("long")).alias("kept"),
            F.sum((~F.col("keep")).cast("long")).alias("dropped"),
        )
        .orderBy("cell")
    )


def semantic_dedup_report_sql(table: str, id_col: str, vec_col: str, **kw) -> str:
    inner = semantic_dedup_sql(table, id_col, vec_col, **kw)
    return f"""
SELECT cell, COUNT(*) AS n,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept,
       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS dropped
FROM ({inner})
GROUP BY cell
ORDER BY cell
"""
