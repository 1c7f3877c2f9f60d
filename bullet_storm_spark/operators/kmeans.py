"""Distributed spherical k-means (Lloyd) over the FULL embedding corpus.

`similarity.ivf_centroids` fits its codebook on a bounded driver-side
sample — the right cost for seeding an IVF index. This module is the
exact trainer for when the codebook itself is the product (semantic-dedup
cells, outlier baselines, cluster-balanced mixing): every iteration
assigns ALL vectors distributed and recomputes means distributed, so the
result reflects the whole corpus, not a sample.

Determinism contract (why this is testable without an engine twin): the
iterative driver loop cannot be one SQL statement, so the entry is
rows-only — but every step is exactly reproducible by a pure-Python
oracle (tests/test_kmeans.py):
* init is the k lowest-id vectors, unit-normalized, coords rounded 9dp —
  no RNG;
* assignment ranks by dot(v, centroid) with ties to the lowest centroid
  index (`semdedup.assign_cells_frozen`, sequential index-order HOF
  evaluation — same result on any engine);
* the per-dimension mean sums 9dp-rounded doubles in DECIMAL(38,12)
  (order-free — a float sum would depend on partitioning), divides by the
  exact member count, then the new unit-normalized centroid rounds to 9dp
  before it becomes next iteration's literal.

Scale posture (100 TB): per iteration, ONE distributed assignment (the
frozen-codebook expression rides the scan — no shuffle) + ONE
(cell, dim) aggregation whose output is k x dim rows (map-side partials
collapse every partition to at most k x dim rows before the exchange).
Driver state is the codebook only (k x dim floats); the corpus is never
collected. Empty cells keep their previous centroid (standard Lloyd
treatment, deterministic).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from bullet_storm_spark.functions.vectors import as_double
from bullet_storm_spark.operators.semdedup import assign_cells_frozen

COORD_DP = 9  # rounding grid for unit-vector coordinates


def _unit(vec: list[float]) -> list[float]:
    n = math.sqrt(sum(x * x for x in vec))
    if n <= 0:
        return [0.0 for _ in vec]
    return [round(x / n, COORD_DP) for x in vec]


def kmeans_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 4,
) -> list[list[float]]:
    """Fit k unit centroids over the full corpus; returns the codebook
    (k lists of 9dp-rounded floats), ready for `assign_cells_frozen` /
    `semdedup` / `embedding_outlier_report`."""
    init_rows = (
        df.select(F.col(id_col).alias("__id"), as_double(F.col(vec_col)).alias("__v"))
        .orderBy("__id")
        .limit(k)
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(
            f"k-means needs at least k={k} vectors to seed; input has "
            f"{len(init_rows)}"
        )
    cents = [_unit([float(x) for x in r["__v"]]) for r in init_rows]
    for _ in range(int(iters)):
        assigned = assign_cells_frozen(df, id_col, vec_col, cents)
        # unit-normalize each member, round coords to the 9dp grid, then
        # decimal-sum per (cell, dim): the sum is order-free and exactly
        # reproducible by the pure-Python oracle
        v = as_double(F.col("v"))
        nrm = F.sqrt(
            F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
        )
        unit = F.transform(v, lambda x: F.round(x / nrm, COORD_DP))
        stats = (
            assigned.where(nrm > 0)
            .select("cell", F.posexplode(unit).alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(
                F.sum(F.col("x").cast("decimal(38,12)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new = {c: list(cents[c]) for c in range(k)}
        by_cell: dict[int, list] = {}
        for r in stats:
            by_cell.setdefault(r["cell"], []).append(r)
        for cell, rows in by_cell.items():
            mean = [0.0] * len(cents[0])
            for r in rows:
                mean[r["dim"]] = float(r["s"]) / r["n"]
            new[cell] = _unit(mean)
        cents = [new[c] for c in range(k)]
    return cents


def kmeans_report(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """(cell, n_members, mean_sim, centroid_l1): the trained codebook's
    cluster profile — member count, mean cosine of members to their
    centroid (cluster tightness), and the centroid's L1 mass (a compact
    codebook fingerprint the pytest oracle can assert on). One distributed
    assignment + one cell-keyed aggregation over the final codebook."""
    cents = kmeans_train(df, id_col, vec_col, k=k, iters=iters)
    assigned = assign_cells_frozen(df, id_col, vec_col, cents)
    v = as_double(F.col("v"))
    nrm = F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    # dot(unit_v, centroid) == cosine (centroids are unit); round before
    # the decimal sum so the mean is order-free
    from bullet_storm_spark.operators.similarity import _planes_lit

    cent_arr = F.element_at(_planes_lit(cents), F.col("cell") + 1)
    sim = F.round(
        F.aggregate(
            F.zip_with(v, cent_arr, lambda x, c: x * c),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        / nrm,
        COORD_DP,
    )
    l1 = [round(sum(abs(x) for x in c), round_to) for c in cents]
    l1_lit = F.array(*[F.lit(x) for x in l1])
    stats = (
        assigned.where(nrm > 0)
        .select("cell", sim.alias("__sim"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.round(
                F.sum(F.col("__sim").cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1)),
                round_to,
            ).alias("mean_sim"),
        )
    )
    # every codebook cell gets a row — a cell Lloyd left empty reports
    # n_members = 0 / mean_sim NULL rather than silently disappearing
    spark = df.sparkSession
    all_cells = spark.range(len(cents)).select(F.col("id").cast("int").alias("cell"))
    return (
        all_cells.join(stats, "cell", "left")
        .select(
            "cell",
            F.coalesce("__n", F.lit(0)).alias("n_members"),
            "mean_sim",
            F.element_at(l1_lit, F.col("cell") + 1).alias("centroid_l1"),
        )
        .orderBy("cell")
    )
