"""Product quantization (PQ) for embedding columns, dual-compiled.

Int8 scalar quantization (operators/quantize.py) cuts vector bytes 4x;
PQ is the next rung on the same ladder: split each vector into ``m``
subspaces, quantize every subspace to one of ``ksub`` codebook centroids,
and store only the m code indices — for the entry settings (dim=64, m=8,
ksub=16) that is 8 small ints per vector instead of 64 floats, a ~32x
scan/shuffle-byte cut, which at 100 TB is the difference between an ANN
sweep that reads 3 TB and one that reads 100. Asymmetric distance
computation (ADC) keeps the QUERY full-precision and scores a candidate
from its codes alone: dot(q, v_hat) = sum_j dot(q_j, C_j[code_j]) — per
candidate O(m) table lookups instead of O(dim) multiplies (Jegou,
Douze, Schmid, "Product Quantization for Nearest Neighbor Search",
IEEE TPAMI 2011).

Frozen-codebook posture, exactly as operators/similarity.py's IVF: the
codebook ships as ONE constant-folded ``from_json`` literal (analysis-
O(1)), assignment/ADC are pure column expressions, and both engines fold
float sums sequentially — so encode, reconstruction audit, and the whole
approximate top-k are hash-checkable against the DuckDB twin. Production
fits the codebook offline (k-means per subspace over a sample) and
passes it in; the seeded default stands in for a fitted one in-sandbox.

Scale shape: encode rides the scan (no shuffle); ADC search scans only
the codes column (+ the broadcast query set); nothing here is ever
all-pairs on full vectors.
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from bullet_storm_spark.functions.vectors import as_double, dot
from bullet_storm_spark.operators.similarity import LSH_SEED, _rank_topk


def pq_codebook(
    dim: int = 64, m: int = 8, ksub: int = 16, seed: int = LSH_SEED
) -> list[list[list[float]]]:
    """Deterministic codebook: m sub-codebooks of ksub centroids of
    dim/m components, scaled ~N(0, 1/sqrt(dim)) to match unit-vector
    subspace energy; rounded to 6dp so the literal rendering is identical
    in both generated programs."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    rng = np.random.RandomState(seed + 31)
    cb = rng.randn(m, ksub, dim // m) / np.sqrt(dim)
    return [
        [[round(float(x), 6) for x in cent] for cent in sub] for sub in cb
    ]


def _sub_lit(sub: list[list[float]]) -> Column:
    return F.from_json(F.lit(json.dumps(sub)), "array<array<double>>")


def _cb_lit(cb: list[list[list[float]]]) -> Column:
    return F.from_json(F.lit(json.dumps(cb)), "array<array<array<double>>>")


def _sqdist(a: Column, b: Column) -> Column:
    d = F.zip_with(a, b, lambda x, y: x - y)
    return dot(d, d)


def _codes_col(v: Column, cb: list[list[list[float]]]) -> Column:
    """array<int> of per-subspace nearest-centroid indices (0-based).
    Argmin via (distance, index) struct sort — index tie-break, the same
    deterministic pattern as similarity.ivf_neighbors_frozen."""
    m = len(cb)
    dsub = len(cb[0][0])
    codes = []
    for j in range(m):
        sub = F.slice(v, j * dsub + 1, dsub)
        ranked = F.array_sort(
            F.transform(
                _sub_lit(cb[j]),
                lambda c, i: F.struct(
                    _sqdist(sub, c).alias("d"), i.cast("int").alias("i")
                ),
            )
        )
        codes.append(F.element_at(ranked, 1)["i"])
    return F.array(*codes)


def _sqdist_sql(vec_expr: str, off: int, cent: list[float]) -> str:
    arr = "[" + ", ".join(repr(x) for x in cent) + "]"
    diff = (
        f"list_transform(range(1, {len(cent) + 1}), "
        f"i -> {vec_expr}[{off} + i] - ({arr})[i])"
    )
    return f"list_dot_product({diff}, {diff})"


def _codes_sql(vec_expr: str, cb: list[list[list[float]]]) -> str:
    dsub = len(cb[0][0])
    per_sub = []
    for j, sub in enumerate(cb):
        entries = ", ".join(
            f"{{'d': {_sqdist_sql(vec_expr, j * dsub, cent)}, 'i': {i}}}"
            for i, cent in enumerate(sub)
        )
        per_sub.append(f"(list_sort([{entries}]))[1].i")
    return "[" + ", ".join(per_sub) + "]"


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebook: list[list[list[float]]] | None = None,
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
) -> DataFrame:
    """(id, codes array<int>): each vector reduced to m codebook indices.
    Pure column expressions — rides the scan, no shuffle."""
    cb = codebook or pq_codebook(dim, m, ksub)
    v = as_double(F.col("__v"))
    return (
        df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .select(F.col("__id").alias(id_col), _codes_col(v, cb).alias("codes"))
        .orderBy(id_col)
    )


def pq_encode_sql(
    table: str,
    id_col: str,
    vec_col: str,
    codebook: list[list[list[float]]] | None = None,
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
) -> str:
    cb = codebook or pq_codebook(dim, m, ksub)
    return (
        f"SELECT {id_col}, {_codes_sql('v', cb)} AS codes "
        f"FROM (SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {table}) "
        f"ORDER BY {id_col}"
    )


def pq_report(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebook: list[list[list[float]]] | None = None,
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    round_to: int = 6,
) -> DataFrame:
    """Reconstruction audit: (id, m, rel_err) where rel_err =
    ||v - v_hat|| / ||v|| for the decoded vector v_hat — the per-row
    check that the codebook actually fits the data (the PQ analogue of
    quantize.quantization_report)."""
    cb = codebook or pq_codebook(dim, m, ksub)
    dsub = len(cb[0][0])
    v = as_double(F.col("__v"))
    base = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    coded = base.select("__id", "__v", _codes_col(v, cb).alias("__codes"))
    err2 = F.lit(0.0)
    for j in range(len(cb)):
        sub = F.slice(as_double(F.col("__v")), j * dsub + 1, dsub)
        cent = F.element_at(
            F.element_at(_cb_lit(cb), j + 1), F.element_at("__codes", j + 1) + 1
        )
        err2 = err2 + _sqdist(sub, cent)
    n2 = dot(as_double(F.col("__v")), as_double(F.col("__v")))
    return coded.select(
        F.col("__id").alias(id_col),
        F.lit(len(cb)).alias("m"),
        F.round(F.sqrt(err2) / F.sqrt(n2), round_to).alias("rel_err"),
    ).orderBy(id_col)


def pq_report_sql(
    table: str,
    id_col: str,
    vec_col: str,
    codebook: list[list[list[float]]] | None = None,
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    round_to: int = 6,
) -> str:
    cb = codebook or pq_codebook(dim, m, ksub)
    dsub = len(cb[0][0])
    err_terms = []
    for j, sub in enumerate(cb):
        arr = (
            "["
            + ", ".join(
                "[" + ", ".join(repr(x) for x in cent) + "]" for cent in sub
            )
            + "]"
        )
        diff = (
            f"list_transform(range(1, {dsub + 1}), "
            f"i -> v[{j * dsub} + i] - (({arr})[codes[{j + 1}] + 1])[i])"
        )
        err_terms.append(f"list_dot_product({diff}, {diff})")
    err2 = " + ".join(err_terms)
    return f"""
WITH base AS (SELECT {id_col} AS id, {vec_col}::DOUBLE[] AS v FROM {table}),
coded AS (SELECT id, v, {_codes_sql('v', cb)} AS codes FROM base)
SELECT id AS {id_col}, {len(cb)} AS m,
       CASE WHEN ABS(sqrt({err2}) / sqrt(list_dot_product(v, v))) >= 1e16 THEN CAST((sqrt({err2}) / sqrt(list_dot_product(v, v))) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((sqrt({err2}) / sqrt(list_dot_product(v, v))) * CAST(ABS(sqrt({err2}) / sqrt(list_dot_product(v, v))) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS rel_err
FROM coded ORDER BY {id_col}
"""


def pq_neighbors(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_pred: Column,
    codebook: list[list[list[float]]] | None = None,
    k: int = 5,
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    round_to: int = 6,
) -> DataFrame:
    """ADC top-k: queries keep full vectors (broadcast-sized by
    contract), candidates are scored from their m codes alone —
    adc_cos = sum_j dot(q_j, C_j[code_j]) / (||q|| * ||v_hat||).
    The candidate scan reads codes only (~32x fewer bytes than vectors);
    per-candidate work is m sub-dots against the constant codebook.
    Output (query_id, neighbor_id, adc_cos, rank); self excluded."""
    cb = codebook or pq_codebook(dim, m, ksub)
    dsub = len(cb[0][0])
    par = df.sparkSession.sparkContext.defaultParallelism
    base = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), query_pred.alias("is_q")
    )
    # queries never need codes — just the full vector, its norm, and a
    # precomputed ADC lookup table lut[j][c] = dot(q_j, C_j[c]) (m*ksub
    # sub-dots ONCE per query row), so each (query, candidate) pair costs
    # m array lookups instead of m sub-dots
    lut = F.transform(
        _cb_lit(cb),
        lambda sub, j: F.transform(
            sub,
            lambda c: dot(
                # slice(qv, j*dsub+1, dsub): positional math on the
                # transform index keeps one expression for all subspaces
                F.slice(as_double(F.col("qv")), j * dsub + 1, dsub),
                c,
            ),
        ),
    )
    queries = (
        base.where(F.col("is_q"))
        .select(F.col("id").alias("query_id"), F.col("v").alias("qv"))
        .select(
            "query_id",
            F.sqrt(dot(as_double(F.col("qv")), as_double(F.col("qv")))).alias("__qn"),
            lut.alias("__lut"),
        )
    )
    # candidates: the argmin encode is the heavy per-row expression — an
    # exchange first spreads the single-file scan across the cluster so
    # encoding parallelizes (same discipline as the text-op token
    # materialization), and codes are computed exactly once
    recon2 = F.lit(0.0)
    for j in range(len(cb)):
        cent = F.element_at(
            F.element_at(_cb_lit(cb), j + 1), F.element_at("codes", j + 1) + 1
        )
        recon2 = recon2 + dot(cent, cent)
    cands = (
        base.repartition(par)
        .select("id", _codes_col(as_double(F.col("v")), cb).alias("codes"))
        .select("id", "codes", recon2.alias("__r2"))
    )
    adc = F.aggregate(
        F.zip_with(
            F.col("__lut"),
            F.col("codes"),
            lambda l, c: F.element_at(l, c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    score = F.round(adc / (F.col("__qn") * F.sqrt(F.col("__r2"))), round_to)
    pairs = (
        F.broadcast(queries)
        .join(cands, F.col("query_id") != F.col("id"))
        .select("query_id", F.col("id").alias("neighbor_id"), score.alias("cos"))
    )
    return _rank_topk(pairs, k)


def pq_neighbors_sql(
    table: str,
    id_col: str,
    vec_col: str,
    query_pred_sql: str,
    codebook: list[list[list[float]]] | None = None,
    k: int = 5,
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    round_to: int = 6,
) -> str:
    cb = codebook or pq_codebook(dim, m, ksub)
    dsub = len(cb[0][0])
    adc_terms, recon_terms = [], []
    for j, sub in enumerate(cb):
        arr = (
            "["
            + ", ".join(
                "[" + ", ".join(repr(x) for x in cent) + "]" for cent in sub
            )
            + "]"
        )
        cent = f"(({arr})[c.codes[{j + 1}] + 1])"
        qsub = f"list_slice(q.qv, {j * dsub + 1}, {(j + 1) * dsub})"
        adc_terms.append(f"list_dot_product({qsub}, {cent})")
        recon_terms.append(f"list_dot_product({cent}, {cent})")
    score = (
        f"CAST(CAST(CAST(CAST(({' + '.join(adc_terms)}) / "
        f"(sqrt(list_dot_product(q.qv, q.qv)) * sqrt({' + '.join(recon_terms)})) "
        f"AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE)"
    )
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {vec_col}::DOUBLE[] AS v, ({query_pred_sql}) AS is_q
  FROM {table}
),
coded AS (SELECT id, v, is_q, {_codes_sql('v', cb)} AS codes FROM base),
q AS (SELECT id AS query_id, v AS qv FROM coded WHERE is_q)
SELECT query_id, c.id AS neighbor_id, {score} AS cos,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY {score} DESC, c.id ASC) AS INTEGER)
         AS rank
FROM q JOIN coded c ON q.query_id <> c.id
QUALIFY rank <= {k}
ORDER BY query_id, rank
"""


def ivfpq_neighbors(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_pred: Column,
    k: int = 5,
    nprobe: int = 4,
    n_centroids: int = 16,
    codebook: list[list[list[float]]] | None = None,
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    round_to: int = 6,
) -> DataFrame:
    """IVF-PQ: the two scale levers composed — the coarse IVF codebook
    prunes the search to ``nprobe`` of ``n_centroids`` cells (~N * nprobe
    / n_centroids candidates per query) and PQ codes score each surviving
    candidate from m bytes (the FAISS IVFPQ shape; non-residual variant
    — codes quantize the raw vector, which keeps every step a pure
    column expression and the whole pipeline hash-checkable; residual
    encoding is the production refinement, same plan shape). Both
    codebooks are frozen constant-folded literals; the only shuffle keys
    on the cell id. Output (query_id, neighbor_id, adc_cos, rank)."""
    from bullet_storm_spark.operators.similarity import (
        _planes_lit,
        seeded_centroids,
    )

    cents = seeded_centroids(dim, n_centroids)
    cb = codebook or pq_codebook(dim, m, ksub)
    dsub = len(cb[0][0])
    par = df.sparkSession.sparkContext.defaultParallelism
    base = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), query_pred.alias("is_q")
    )
    v = as_double(F.col("v"))
    ranked = F.array_sort(
        F.transform(
            _planes_lit(cents),
            lambda c, i: F.struct((-dot(v, c)).alias("nd"), i.cast("int").alias("i")),
        )
    )
    probes = F.transform(F.slice(ranked, 1, nprobe), lambda s: s["i"])
    # candidates: top-1 cell + PQ codes, the heavy per-row expressions
    # parallelized behind one exchange and computed exactly once
    recon2 = F.lit(0.0)
    for j in range(len(cb)):
        cent = F.element_at(
            F.element_at(_cb_lit(cb), j + 1), F.element_at("codes", j + 1) + 1
        )
        recon2 = recon2 + dot(cent, cent)
    cands = (
        base.repartition(par)
        .select("id", F.element_at(probes, 1).alias("cell"), _codes_col(v, cb).alias("codes"))
        .select("id", "cell", "codes", recon2.alias("__r2"))
    )
    lut = F.transform(
        _cb_lit(cb),
        lambda sub, j: F.transform(
            sub,
            lambda c: dot(F.slice(as_double(F.col("qv")), j * dsub + 1, dsub), c),
        ),
    )
    queries = (
        base.where(F.col("is_q"))
        .select(F.col("id").alias("query_id"), F.col("v").alias("qv"), probes.alias("__p"))
        .select(
            "query_id",
            F.sqrt(dot(as_double(F.col("qv")), as_double(F.col("qv")))).alias("__qn"),
            lut.alias("__lut"),
            F.explode("__p").alias("cell"),
        )
    )
    adc = F.aggregate(
        F.zip_with(F.col("__lut"), F.col("codes"), lambda l, c: F.element_at(l, c + 1)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    score = F.round(adc / (F.col("__qn") * F.sqrt(F.col("__r2"))), round_to)
    pairs = (
        F.broadcast(queries)
        .join(cands, "cell")
        .where(F.col("query_id") != F.col("id"))
        .select("query_id", F.col("id").alias("neighbor_id"), score.alias("cos"))
    )
    return _rank_topk(pairs, k)


def ivfpq_neighbors_sql(
    table: str,
    id_col: str,
    vec_col: str,
    query_pred_sql: str,
    k: int = 5,
    nprobe: int = 4,
    n_centroids: int = 16,
    codebook: list[list[list[float]]] | None = None,
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    round_to: int = 6,
) -> str:
    from bullet_storm_spark.operators.similarity import seeded_centroids

    cents = seeded_centroids(dim, n_centroids)
    cb = codebook or pq_codebook(dim, m, ksub)
    dsub = len(cb[0][0])
    entries = ", ".join(
        "{'nd': -list_dot_product(v::DOUBLE[], ["
        + ", ".join(repr(x) for x in c)
        + f"]), 'i': {i}}}"
        for i, c in enumerate(cents)
    )
    adc_terms, recon_terms = [], []
    for j, sub in enumerate(cb):
        arr = (
            "["
            + ", ".join("[" + ", ".join(repr(x) for x in cent) + "]" for cent in sub)
            + "]"
        )
        cent = f"(({arr})[c.codes[{j + 1}] + 1])"
        qsub = f"list_slice(q.qv, {j * dsub + 1}, {(j + 1) * dsub})"
        adc_terms.append(f"list_dot_product({qsub}, {cent})")
        recon_terms.append(f"list_dot_product({cent}, {cent})")
    score = (
        f"CAST(CAST(CAST(CAST(({' + '.join(adc_terms)}) / "
        f"(sqrt(list_dot_product(q.qv, q.qv)) * sqrt({' + '.join(recon_terms)})) "
        f"AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE)"
    )
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {vec_col}::DOUBLE[] AS v, ({query_pred_sql}) AS is_q
  FROM {table}
),
assigned AS (
  SELECT id, v, is_q,
         list_transform(list_slice(list_sort([{entries}]), 1, {nprobe}),
                        x -> x.i) AS probes
  FROM base
),
cands AS (
  SELECT id, probes[1] AS cell, {_codes_sql('v', cb)} AS codes
  FROM assigned
),
q AS (
  SELECT id AS query_id, v AS qv, UNNEST(probes) AS cell
  FROM assigned WHERE is_q
)
SELECT query_id, c.id AS neighbor_id, {score} AS cos,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY {score} DESC, c.id ASC) AS INTEGER)
         AS rank
FROM q JOIN cands c ON q.cell = c.cell AND q.query_id <> c.id
QUALIFY rank <= {k}
ORDER BY query_id, rank
"""


def ann_recall_report(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_pred: Column,
    k: int = 5,
    nprobe: int = 4,
    n_centroids: int = 16,
    codebook: list[list[list[float]]] | None = None,
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    round_to: int = 6,
) -> DataFrame:
    """Per-query recall@k of the IVF-PQ pipeline against exact brute-force
    cosine ground truth: (query_id, exact_k, found, recall) ordered by
    query_id. The ANN analogue of dedup.lsh_recall_audit — the
    measurement that justifies (nprobe, m, ksub) on a bounded sample
    before trusting the approximate index on the full corpus. Ground
    truth embeds the brute-force verifier, so callers bound the query
    set exactly as they do for ann_brute_force_topk."""
    from bullet_storm_spark.operators.similarity import brute_force_neighbors

    exact = brute_force_neighbors(
        df, id_col, vec_col, query_pred, k, round_to, dim=dim
    ).select("query_id", "neighbor_id")
    approx = ivfpq_neighbors(
        df, id_col, vec_col, query_pred, k, nprobe, n_centroids,
        codebook, dim, m, ksub, round_to,
    ).select("query_id", "neighbor_id", F.lit(1).alias("__found"))
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("exact_k"),
            F.sum(F.coalesce(F.col("__found"), F.lit(0)))
            .cast("bigint")
            .alias("found"),
            F.round(
                F.sum(F.coalesce(F.col("__found"), F.lit(0)))
                / F.count(F.lit(1)),
                round_to,
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


def ann_recall_report_sql(
    table: str,
    id_col: str,
    vec_col: str,
    query_pred_sql: str,
    k: int = 5,
    nprobe: int = 4,
    n_centroids: int = 16,
    codebook: list[list[list[float]]] | None = None,
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    round_to: int = 6,
) -> str:
    from bullet_storm_spark.functions.vectors import cosine_sql

    # ground truth inlined (brute_force_neighbors_sql binds its predicate
    # over the aliased projection; here both arms bind over the original
    # table columns so ONE predicate string drives both)
    cos = f"CAST(CAST(CAST(CAST(({cosine_sql('q.qv', 'c.v')}) * CAST(ABS({cosine_sql('q.qv', 'c.v')}) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE)"
    approx = ivfpq_neighbors_sql(
        table, id_col, vec_col, query_pred_sql, k, nprobe, n_centroids,
        codebook, dim, m, ksub, round_to,
    )
    return f"""
WITH gbase AS (
  SELECT {id_col} AS id, {vec_col} AS v, ({query_pred_sql}) AS is_q
  FROM {table}
),
gq AS (SELECT id AS query_id, v AS qv FROM gbase WHERE is_q),
exact_ranked AS (
  SELECT query_id, c.id AS neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {cos} DESC, c.id ASC) AS rnk
  FROM gq q JOIN gbase c ON q.query_id <> c.id
),
exact_k AS (SELECT query_id, neighbor_id FROM exact_ranked WHERE rnk <= {k}),
approx_k AS (SELECT query_id, neighbor_id, 1 AS found FROM ({approx}))
SELECT query_id,
       COUNT(*) AS exact_k,
       CAST(SUM(COALESCE(found, 0)) AS BIGINT) AS found,
       CASE WHEN ABS(SUM(COALESCE(found, 0)) / COUNT(*)) >= 1e16 THEN CAST((SUM(COALESCE(found, 0)) / COUNT(*)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((SUM(COALESCE(found, 0)) / COUNT(*)) * CAST(ABS(SUM(COALESCE(found, 0)) / COUNT(*)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS recall
FROM exact_k LEFT JOIN approx_k USING (query_id, neighbor_id)
GROUP BY query_id
ORDER BY query_id
"""


def ivfpq_build_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    codebook: list[list[list[float]]] | None = None,
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
) -> DataFrame:
    """Persistable IVF-PQ index rows: (id, cell, codes, r2) — the coarse
    cell, the m PQ codes, and the precomputed reconstructed norm. Per
    vector that is ~m small ints + 2 scalars instead of the full vector,
    so the stored index is ~32x smaller than ivf_build_index's
    (id, v, cell) rows — at 100 TB of embeddings the index fits where
    the vectors don't. Write with ``.write.partitionBy("cell")`` so a
    probe's scan prunes to its nprobe cell directories; reload in any
    later session and probe with ivfpq_probe_index (same frozen
    codebooks — the production serving cycle, mirroring
    similarity.ivf_build_index)."""
    from bullet_storm_spark.operators.similarity import (
        _planes_lit,
        seeded_centroids,
    )

    cents = seeded_centroids(dim, n_centroids)
    cb = codebook or pq_codebook(dim, m, ksub)
    par = df.sparkSession.sparkContext.defaultParallelism
    v = as_double(F.col("v"))
    ranked = F.array_sort(
        F.transform(
            _planes_lit(cents),
            lambda c, i: F.struct((-dot(v, c)).alias("nd"), i.cast("int").alias("i")),
        )
    )
    recon2 = F.lit(0.0)
    for j in range(len(cb)):
        cent = F.element_at(
            F.element_at(_cb_lit(cb), j + 1), F.element_at("codes", j + 1) + 1
        )
        recon2 = recon2 + dot(cent, cent)
    return (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .repartition(par)
        .select(
            "id",
            F.element_at(ranked, 1)["i"].alias("cell"),
            _codes_col(v, cb).alias("codes"),
        )
        .select("id", "cell", "codes", recon2.alias("r2"))
    )


def ivfpq_probe_index(
    index: DataFrame,
    query_df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    nprobe: int = 4,
    n_centroids: int = 16,
    codebook: list[list[list[float]]] | None = None,
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    round_to: int = 6,
) -> DataFrame:
    """Top-k for ``query_df`` against a STORED IVF-PQ index: queries rank
    their nprobe cells and build the ADC lookup table (tiny, broadcast);
    one hash join on the cell key scores index rows from codes alone. On
    a cell-partitioned parquet index the scan prunes to the probed cell
    directories — the index bytes a probe touches are
    ~|index| * nprobe / n_centroids * (m + 2 values)."""
    from bullet_storm_spark.operators.similarity import (
        _planes_lit,
        seeded_centroids,
    )

    cents = seeded_centroids(dim, n_centroids)
    cb = codebook or pq_codebook(dim, m, ksub)
    dsub = len(cb[0][0])
    qv = as_double(F.col("qv"))
    ranked = F.array_sort(
        F.transform(
            _planes_lit(cents),
            lambda c, i: F.struct((-dot(qv, c)).alias("nd"), i.cast("int").alias("i")),
        )
    )
    probes = F.transform(F.slice(ranked, 1, nprobe), lambda s: s["i"])
    lut = F.transform(
        _cb_lit(cb),
        lambda sub, j: F.transform(
            sub, lambda c: dot(F.slice(qv, j * dsub + 1, dsub), c)
        ),
    )
    queries = (
        query_df.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .select(
            "query_id",
            F.sqrt(dot(qv, qv)).alias("__qn"),
            lut.alias("__lut"),
            F.explode(probes).alias("cell"),
        )
    )
    adc = F.aggregate(
        F.zip_with(F.col("__lut"), F.col("codes"), lambda l, c: F.element_at(l, c + 1)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    score = F.round(adc / (F.col("__qn") * F.sqrt(F.col("r2"))), round_to)
    pairs = (
        F.broadcast(queries)
        .join(index.select("id", "cell", "codes", "r2"), "cell")
        .where(F.col("query_id") != F.col("id"))
        .select("query_id", F.col("id").alias("neighbor_id"), score.alias("cos"))
    )
    return _rank_topk(pairs, k)


def _flit(values) -> Column:
    """Nested float-list literal as one constant-folded node (same
    rationale as similarity._planes_lit; json round-trips the shortest
    decimal repr, so both generated programs parse identical doubles)."""
    return F.from_json(
        F.lit(json.dumps(values)),
        "array<double>" if not isinstance(values[0], list) else (
            "array<array<double>>" if not isinstance(values[0][0], list)
            else "array<array<array<double>>>"
        ),
    )


def _residual_tables(cents, cb):
    """Python-precomputed constants for residual IVF-PQ scoring: per-cell
    centroid norm^2, per-(cell, sub, code) centroid-x-codeword cross dot,
    and per-(sub, code) codeword norm^2 — every cell/code-dependent float
    becomes a literal lookup, so the only runtime float work is the
    per-query LUT and the final ordered sums (identical fold order in
    both engines)."""
    dsub = len(cb[0][0])
    cnorm2 = [sum(x * x for x in c) for c in cents]
    cross = [
        [
            [
                sum(
                    c[j * dsub + t] * cent[t]
                    for t in range(dsub)
                )
                for cent in cb[j]
            ]
            for j in range(len(cb))
        ]
        for c in cents
    ]
    rnorm2 = [[sum(x * x for x in cent) for cent in sub] for sub in cb]
    return cnorm2, cross, rnorm2


def ivfpq_residual_neighbors(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_pred: Column,
    k: int = 5,
    nprobe: int = 4,
    n_centroids: int = 16,
    codebook: list[list[list[float]]] | None = None,
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    round_to: int = 6,
) -> DataFrame:
    """RESIDUAL IVF-PQ — the production FAISS encoding: PQ codes quantize
    v - centroid[cell] (residuals are smaller and better covered by the
    codebook), and ADC scores dot(q, c + decode(codes)) = dot(q, c) +
    sum_j lut[j][code_j]. The per-query lookup table is cell-independent
    (codebook subspaces are global), dot(q, c) rides the exploded
    (query, probe-cell) rows, and every cell/code-dependent norm/cross
    term is a precomputed literal — so the pipeline stays hash-checkable
    end-to-end. Candidate cost: m lookups + 3 literal-table sums per
    pair; index bytes identical to the non-residual variant."""
    from bullet_storm_spark.operators.similarity import (
        _planes_lit,
        seeded_centroids,
    )

    cents = seeded_centroids(dim, n_centroids)
    cb = codebook or pq_codebook(dim, m, ksub)
    dsub = len(cb[0][0])
    cnorm2, cross, rnorm2 = _residual_tables(cents, cb)
    par = df.sparkSession.sparkContext.defaultParallelism
    base = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), query_pred.alias("is_q")
    )
    v = as_double(F.col("v"))
    ranked = F.array_sort(
        F.transform(
            _planes_lit(cents),
            lambda c, i: F.struct((-dot(v, c)).alias("nd"), i.cast("int").alias("i")),
        )
    )
    probes = F.transform(F.slice(ranked, 1, nprobe), lambda s: s["i"])
    residual = F.zip_with(
        v, F.element_at(_flit(cents), F.col("cell") + 1), lambda x, c: x - c
    )
    # candidate side: cell -> residual -> codes, then literal-table score
    # components; each heavy expression materializes behind its select
    celled = (
        base.repartition(par)
        .select("id", "v", F.element_at(probes, 1).alias("cell"))
        .select("id", "cell", residual.alias("__res"))
        .select("id", "cell", _codes_col(F.col("__res"), cb).alias("codes"))
    )
    cn2 = F.element_at(_flit(cnorm2), F.col("cell") + 1)
    cross2 = F.lit(0.0)
    r2 = F.lit(0.0)
    for j in range(len(cb)):
        code1 = F.element_at("codes", j + 1) + 1
        cross2 = cross2 + F.element_at(
            F.element_at(F.element_at(_flit(cross), F.col("cell") + 1), j + 1), code1
        )
        r2 = r2 + F.element_at(F.element_at(_flit(rnorm2), j + 1), code1)
    cands = celled.select(
        "id", "cell", "codes",
        F.sqrt(cn2 + 2 * cross2 + r2).alias("__vn"),
    )
    lut = F.transform(
        _cb_lit(cb),
        lambda sub, j: F.transform(
            sub,
            lambda c: dot(F.slice(as_double(F.col("qv")), j * dsub + 1, dsub), c),
        ),
    )
    queries = (
        base.where(F.col("is_q"))
        .select(F.col("id").alias("query_id"), F.col("v").alias("qv"), probes.alias("__p"))
        .select(
            "query_id",
            "qv",
            F.sqrt(dot(as_double(F.col("qv")), as_double(F.col("qv")))).alias("__qn"),
            lut.alias("__lut"),
            F.explode("__p").alias("cell"),
        )
        .select(
            "query_id",
            "__qn",
            "__lut",
            "cell",
            dot(
                as_double(F.col("qv")), F.element_at(_flit(cents), F.col("cell") + 1)
            ).alias("__qc"),
        )
    )
    adc = F.aggregate(
        F.zip_with(F.col("__lut"), F.col("codes"), lambda l, c: F.element_at(l, c + 1)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    score = F.round((F.col("__qc") + adc) / (F.col("__qn") * F.col("__vn")), round_to)
    pairs = (
        F.broadcast(queries)
        .join(cands, "cell")
        .where(F.col("query_id") != F.col("id"))
        .select("query_id", F.col("id").alias("neighbor_id"), score.alias("cos"))
    )
    return _rank_topk(pairs, k)


def ivfpq_residual_neighbors_sql(
    table: str,
    id_col: str,
    vec_col: str,
    query_pred_sql: str,
    k: int = 5,
    nprobe: int = 4,
    n_centroids: int = 16,
    codebook: list[list[list[float]]] | None = None,
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    round_to: int = 6,
) -> str:
    from bullet_storm_spark.operators.similarity import seeded_centroids

    cents = seeded_centroids(dim, n_centroids)
    cb = codebook or pq_codebook(dim, m, ksub)
    dsub = len(cb[0][0])
    cnorm2, cross, rnorm2 = _residual_tables(cents, cb)
    entries = ", ".join(
        "{'nd': -list_dot_product(v::DOUBLE[], ["
        + ", ".join(repr(x) for x in c)
        + f"]), 'i': {i}}}"
        for i, c in enumerate(cents)
    )
    cents_lit = (
        "[" + ", ".join("[" + ", ".join(repr(x) for x in c) + "]" for c in cents) + "]"
    )
    cn2_lit = "[" + ", ".join(repr(x) for x in cnorm2) + "]"
    cross_lit = (
        "["
        + ", ".join(
            "["
            + ", ".join(
                "[" + ", ".join(repr(x) for x in codes) + "]" for codes in cell_tab
            )
            + "]"
            for cell_tab in cross
        )
        + "]"
    )
    r2_lit = (
        "["
        + ", ".join("[" + ", ".join(repr(x) for x in sub) + "]" for sub in rnorm2)
        + "]"
    )
    cross_sum = " + ".join(
        f"(({cross_lit})[cell + 1])[{j + 1}][codes[{j + 1}] + 1]"
        for j in range(len(cb))
    )
    r2_sum = " + ".join(
        f"({r2_lit})[{j + 1}][codes[{j + 1}] + 1]" for j in range(len(cb))
    )
    adc_terms = []
    for j, sub in enumerate(cb):
        arr = (
            "["
            + ", ".join("[" + ", ".join(repr(x) for x in cent) + "]" for cent in sub)
            + "]"
        )
        cent = f"(({arr})[c.codes[{j + 1}] + 1])"
        qsub = f"list_slice(q.qv, {j * dsub + 1}, {(j + 1) * dsub})"
        adc_terms.append(f"list_dot_product({qsub}, {cent})")
    score = (
        f"CAST(CAST(CAST(CAST(((q.qc + {' + '.join(adc_terms)}) / "
        f"(sqrt(list_dot_product(q.qv, q.qv)) * c.vn)) * CAST(ABS((q.qc + {' + '.join(adc_terms)}) / "
        f"(sqrt(list_dot_product(q.qv, q.qv)) * c.vn)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE)"
    )
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {vec_col}::DOUBLE[] AS v, ({query_pred_sql}) AS is_q
  FROM {table}
),
assigned AS (
  SELECT id, v, is_q,
         list_transform(list_slice(list_sort([{entries}]), 1, {nprobe}),
                        x -> x.i) AS probes
  FROM base
),
resid AS (
  SELECT id, v, probes[1] AS cell,
         list_transform(range(1, {dim + 1}),
                        i -> v[i] - (({cents_lit})[probes[1] + 1])[i]) AS res
  FROM assigned
),
coded AS (SELECT id, cell, {_codes_sql('res', cb)} AS codes FROM resid),
cands AS (
  SELECT id, cell, codes,
         sqrt(({cn2_lit})[cell + 1] + 2 * ({cross_sum}) + ({r2_sum})) AS vn
  FROM coded
),
q AS (
  SELECT query_id, qv, cell,
         list_dot_product(qv, ({cents_lit})[cell + 1]) AS qc
  FROM (SELECT id AS query_id, v AS qv, UNNEST(probes) AS cell
        FROM assigned WHERE is_q)
)
SELECT query_id, c.id AS neighbor_id, {score} AS cos,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY {score} DESC, c.id ASC) AS INTEGER)
         AS rank
FROM q JOIN cands c ON q.cell = c.cell AND q.query_id <> c.id
QUALIFY rank <= {k}
ORDER BY query_id, rank
"""
