"""Ranked-retrieval evaluation: NDCG@k / MRR / precision / recall, dual-compiled.

The measurement half of the retrieval stack (operators/retrieval.py is the
ranking half): given a ranked *run* (query_id, rank, doc_id) and graded
*relevance judgments* (query_id, doc_id, rel), produce the standard IR
metrics per query — exactly what a training-data pipeline needs to grade a
retriever before trusting it for RAG curation or hard-negative mining
(Jarvelin & Kekalainen TOIS'02 for NDCG; TREC's MRR/P@k/R@k).

Engine-parity design: NDCG's discount ``1/log2(rank+1)`` is the one
transcendental in the formula, and ``log2`` is NOT bit-specified across
libm implementations — so the discounts for ranks ``1..k`` are precomputed
in PYTHON, rounded to 12 dp, and emitted as DECIMAL(14,12) literals into
BOTH plans (a k-sized lookup, k bounded). Gains ``2^rel - 1`` are integer
bit-shifts. Every per-hit contribution is therefore an EXACT decimal
product; DCG/IDCG accumulate in DECIMAL(38,12) (order-independent), and
the only float ops are the final divisions of identical doubles — the
whole metric is hash-exact across engines by construction, not by luck.

Scale shape (100 TB): everything is an equi-join or a window partitioned
by query_id. The run is |Q| x k rows, qrels |Q| x judgments; the join is
on (query_id, doc_id) — no pair generation, no global window. Metrics for
a million-query eval set are one shuffle on query_id.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from bullet_storm_spark.functions.text import tokens, tokens_sql
from bullet_storm_spark.operators.retrieval import _query_terms
from bullet_storm_spark.operators.stats_tests import _d2d

# graded relevance is clamped here before the 2^rel gain: judgments are
# small ordinals (TREC uses 0..4); 30 keeps the gain far inside BIGINT
# and DECIMAL(14,0) while making silent clamping impossible to hit with
# any sane judgment scale
_REL_CLAMP = 30
_MAX_K = 1000


def _discounts(k: int) -> list[str]:
    """``1/log2(rank+1)`` for ranks 1..k, rounded to 12 dp in Python so
    both engines consume the identical literal (no libm in either plan)."""
    return [f"{round(1.0 / math.log2(r + 1), 12):.12f}" for r in range(1, k + 1)]


def _check_k(k: int) -> int:
    k = int(k)
    if not 1 <= k <= _MAX_K:
        # the discount lookup is a k-sized plan literal; an unbounded k
        # would grow the plan itself, not the data
        raise ValueError(f"need 1 <= k <= {_MAX_K}, got {k}")
    return k


def _gain_col() -> F.Column:
    # (2^rel - 1) as an exact integer-shift, Burges-style exponential gain
    return F.expr(
        f"cast(shiftleft(cast(1 as bigint), least(cast(rel as int), {_REL_CLAMP}))"
        " - 1 as decimal(14,0))"
    )


def retrieval_eval(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    round_to: int = 9,
) -> DataFrame:
    """Per-query IR metrics for ``run`` against ``qrels``. Output
    ``(query_id, n_rel, n_ret, hits, precision_at_k, recall_at_k, rr,
    ndcg)`` ordered by query_id.

    ``run`` needs columns (query_id, rank, doc_id) with rank 1-based and
    unique per query (bm25_topk / hybrid_rrf emit exactly this shape);
    ``qrels`` needs (query_id, doc_id, rel) with rel > 0 meaning relevant
    (rel <= 0 rows are judged-nonrelevant and ignored, TREC convention).
    CONTRACT: (query_id, doc_id) must be unique in both inputs — a
    duplicate judgment or a duplicate run row double-counts through the
    hit join (qrels generators in this repo emit unique pairs; dedupe
    upstream if yours does not).
    Queries with no positive judgments are dropped (NDCG undefined);
    judged queries missing from the run get an all-zero row. ``rr`` is
    MRR@k: 1/rank of the first relevant hit within the top k, else 0."""
    k = _check_k(k)
    disc = F.array(
        *[F.lit(s).cast("decimal(14,12)") for s in _discounts(k)]
    )
    qr = (
        qrels.where(F.col("rel") > 0)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("rel").cast("int").alias("rel"),
        )
    )
    runk = run.where(F.col("rank") <= k).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("rank").cast("int").alias("rank"),
    )
    # Both inputs are bounded (|Q|·k run rows, |Q|·judgments qrels rows)
    # but sit atop full corpus pipelines (BM25 run, token-explode
    # qrels), and Catalyst does NOT dedupe a common subplan under
    # differently-keyed shuffles — every extra consumer re-runs the
    # whole upstream pipeline. The metrics are therefore folded into
    # exactly one aggregation per input (qstats over qrels, run_agg over
    # the run⋈qrels join): the run pipeline executes once and qrels
    # twice, vs 2×/3× in the naive four-branch shape (11 corpus scans →
    # 6 in the executed plan). An eager localCheckpoint of qr was
    # measured SLOWER at sf0.1 (it blocks on a separate materialization
    # job while BM25 dominates the remaining cost), so the plan stays
    # fully declarative.
    contrib = (_gain_col() * F.element_at(disc, F.col("rank"))).cast(
        "decimal(38,12)"
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("rel"), F.asc("doc_id")
    )
    # n_rel and IDCG in ONE pass over qrels: rank relevant docs by grade,
    # discount the top k, count them all
    qstats = (
        qr.withColumn("rank", F.row_number().over(wq))
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rel"),
            F.sum(F.when(F.col("rank") <= k, contrib)).alias("__idcg"),
        )
    )
    # n_ret, hits, first hit and DCG in ONE pass over the run: left-join
    # the judgments onto the retained ranks ((query_id, doc_id) unique on
    # both sides, so no fan-out) and aggregate matched vs all rows
    run_agg = (
        runk.join(qr, ["query_id", "doc_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ret"),
            F.count("rel").cast("long").alias("hits"),
            F.min(F.when(F.col("rel").isNotNull(), F.col("rank"))).alias(
                "__first_hit"
            ),
            F.sum(F.when(F.col("rel").isNotNull(), contrib)).alias("__dcg"),
        )
    )
    hits = F.coalesce(F.col("hits"), F.lit(0).cast("long"))
    # _d2d: at rel near _REL_CLAMP the gains push the decimal's unscaled
    # value past 2^53, where the direct cast double-rounds differently
    # per engine (review finding; safe-by-magnitude only for small
    # TREC-style grades)
    dcg_d = _d2d(
        F.coalesce(F.col("__dcg"), F.lit(0).cast("decimal(38,12)"))
    )
    return (
        qstats.join(run_agg, "query_id", "left")
        .select(
            "query_id",
            "n_rel",
            F.coalesce(F.col("n_ret"), F.lit(0).cast("long")).alias("n_ret"),
            hits.alias("hits"),
            F.round(hits.cast("double") / F.lit(float(k)), round_to).alias(
                "precision_at_k"
            ),
            F.round(
                hits.cast("double") / F.col("n_rel").cast("double"), round_to
            ).alias("recall_at_k"),
            F.round(
                F.coalesce(
                    F.lit(1.0) / F.col("__first_hit").cast("double"),
                    F.lit(0.0),
                ),
                round_to,
            ).alias("rr"),
            F.round(dcg_d / _d2d(F.col("__idcg")), round_to).alias(
                "ndcg"
            ),
        )
        .orderBy("query_id")
    )


def retrieval_eval_sql(
    run_sql: str,
    qrels_sql: str,
    k: int = 10,
    round_to: int = 9,
) -> str:
    """DuckDB twin: ``run_sql`` / ``qrels_sql`` are complete SELECTs
    (e.g. bm25_topk_sql / term_overlap_qrels_sql) embedded as
    subqueries. "rank" is quoted throughout — it is a window-function
    keyword in DuckDB scalar position."""
    k = _check_k(k)
    disc_rows = ", ".join(
        f"({r + 1}, CAST({s} AS DECIMAL(14,12)))"
        for r, s in enumerate(_discounts(k))
    )
    gain = (
        f"CAST((CAST(1 AS BIGINT) << LEAST(CAST(rel AS INT), {_REL_CLAMP}))"
        " - 1 AS DECIMAL(14,0))"
    )
    return f"""
WITH __run AS ({run_sql}),
__qrels AS ({qrels_sql}),
__qr AS (
  SELECT CAST(query_id AS BIGINT) AS query_id,
         CAST(doc_id AS BIGINT) AS doc_id, CAST(rel AS INT) AS rel
  FROM __qrels WHERE rel > 0
),
__runk AS (
  SELECT CAST(query_id AS BIGINT) AS query_id,
         CAST(doc_id AS BIGINT) AS doc_id, CAST("rank" AS INT) AS rnk
  FROM __run WHERE "rank" <= {k}
),
__disc(rnk, disc) AS (VALUES {disc_rows}),
__hits AS (
  SELECT r.query_id, COUNT(*)::BIGINT AS hits, MIN(r.rnk) AS first_hit,
         SUM(CAST({gain} * d.disc AS DECIMAL(38,12))) AS dcg
  FROM __runk r
  JOIN __qr q ON r.query_id = q.query_id AND r.doc_id = q.doc_id
  JOIN __disc d ON r.rnk = d.rnk
  GROUP BY r.query_id
),
__ideal AS (
  SELECT query_id, rel,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rel DESC, doc_id) AS rnk
  FROM __qr
),
__idcg AS (
  SELECT i.query_id, SUM(CAST({gain} * d.disc AS DECIMAL(38,12))) AS idcg
  FROM __ideal i JOIN __disc d ON i.rnk = d.rnk
  WHERE i.rnk <= {k}
  GROUP BY i.query_id
),
__base AS (
  SELECT query_id, COUNT(*)::BIGINT AS n_rel FROM __qr GROUP BY query_id
),
__nret AS (
  SELECT query_id, COUNT(*)::BIGINT AS n_ret FROM __runk GROUP BY query_id
)
SELECT b.query_id, b.n_rel,
       COALESCE(nr.n_ret, 0)::BIGINT AS n_ret,
       COALESCE(h.hits, 0)::BIGINT AS hits,
       CASE WHEN ABS(CAST(COALESCE(h.hits, 0) AS DOUBLE) / {float(k)}) >= 1e16 THEN CAST((CAST(COALESCE(h.hits, 0) AS DOUBLE) / {float(k)}) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(COALESCE(h.hits, 0) AS DOUBLE) / {float(k)}) * CAST(ABS(CAST(COALESCE(h.hits, 0) AS DOUBLE) / {float(k)}) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END
         AS precision_at_k,
       CASE WHEN ABS(CAST(COALESCE(h.hits, 0) AS DOUBLE) / CAST(b.n_rel AS DOUBLE)) >= 1e16 THEN CAST((CAST(COALESCE(h.hits, 0) AS DOUBLE) / CAST(b.n_rel AS DOUBLE)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(COALESCE(h.hits, 0) AS DOUBLE) / CAST(b.n_rel AS DOUBLE)) * CAST(ABS(CAST(COALESCE(h.hits, 0) AS DOUBLE) / CAST(b.n_rel AS DOUBLE)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS recall_at_k,
       CASE WHEN ABS(COALESCE(1.0 / CAST(h.first_hit AS DOUBLE), 0.0)) >= 1e16 THEN CAST((COALESCE(1.0 / CAST(h.first_hit AS DOUBLE), 0.0)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((COALESCE(1.0 / CAST(h.first_hit AS DOUBLE), 0.0)) * CAST(ABS(COALESCE(1.0 / CAST(h.first_hit AS DOUBLE), 0.0)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END
         AS rr,
       CAST(CAST(CAST(CAST((CAST(CAST(COALESCE(h.dcg, CAST(0 AS DECIMAL(38,12)))
                       AS VARCHAR) AS DOUBLE)
             / CAST(CAST(i.idcg AS VARCHAR) AS DOUBLE)) * CAST(ABS(CAST(CAST(COALESCE(h.dcg, CAST(0 AS DECIMAL(38,12)))
                       AS VARCHAR) AS DOUBLE)
             / CAST(CAST(i.idcg AS VARCHAR) AS DOUBLE)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS ndcg
FROM __base b
JOIN __idcg i ON b.query_id = i.query_id
LEFT JOIN __hits h ON b.query_id = h.query_id
LEFT JOIN __nret nr ON b.query_id = nr.query_id
ORDER BY b.query_id
"""


def term_overlap_qrels(
    df: DataFrame,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    min_match: int = 2,
    grade_by_tf: bool = False,
    tf_cap: int = 8,
) -> DataFrame:
    """Deterministic graded judgments from term overlap. Default grade:
    ``rel`` = number of DISTINCT query terms present in the document;
    with ``grade_by_tf`` it is the total OCCURRENCE count of query terms
    capped at ``tf_cap`` (a finer grade the retriever's length-normalized
    ranking does not trivially reproduce — keeps NDCG off the 1.0
    ceiling on term-dense corpora). Either way a document is judged only
    when its DISTINCT-term overlap reaches
    ``min(min_match, n_terms(query))``. Output ``(query_id, doc_id, rel)``.

    This is a lexical pseudo-qrels generator (the Cranfield shortcut used
    when no human judgments exist): documents matching more of the query
    are more relevant. Tokenization is the corpus tokenizer, so a
    retriever evaluated against it is measured on its own vocabulary.

    Scale: the corpus explodes to (doc, token) once, is pruned by the
    broadcast query-term set BEFORE any aggregation, and the count is one
    shuffle on (query_id, doc) — candidate volume is the sum of df(t)
    over query terms, linear in corpus size."""
    if min_match < 1:
        raise ValueError(f"need min_match >= 1, got {min_match}")
    if grade_by_tf and not 1 <= tf_cap <= _REL_CLAMP:
        raise ValueError(f"need 1 <= tf_cap <= {_REL_CLAMP}, got {tf_cap}")
    qterms = _query_terms(queries)
    n_terms: dict[int, int] = {}
    for qid, _ in qterms:
        n_terms[qid] = n_terms.get(qid, 0) + 1
    spark = df.sparkSession
    qdf = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(qid).cast("long").alias("query_id"),
                        F.lit(t).alias("token"),
                    )
                    for qid, t in qterms
                ]
            )
        ).alias("__q")
    ).select("__q.query_id", "__q.token")
    floor_df = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(qid).cast("long").alias("query_id"),
                        F.lit(min(min_match, n)).cast("int").alias("__mm"),
                    )
                    for qid, n in sorted(n_terms.items())
                ]
            )
        ).alias("__f")
    ).select("__f.query_id", "__f.__mm")
    tok = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(tokens(text_col)).alias("token"),
    ).where(F.col("token") != "")
    grade = (
        F.least(F.count(F.lit(1)), F.lit(tf_cap).cast("long")).cast("int")
        if grade_by_tf
        else F.count_distinct("token").cast("int")
    )
    matched = (
        tok.join(F.broadcast(qdf), "token")
        .groupBy("query_id", "doc_id")
        .agg(
            grade.alias("rel"),
            F.count_distinct("token").cast("int").alias("__m"),
        )
    )
    return (
        matched.join(F.broadcast(floor_df), "query_id")
        .where(F.col("__m") >= F.col("__mm"))
        .select("query_id", "doc_id", "rel")
        .orderBy("query_id", "doc_id")
    )


def term_overlap_qrels_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    min_match: int = 2,
    grade_by_tf: bool = False,
    tf_cap: int = 8,
) -> str:
    if min_match < 1:
        raise ValueError(f"need min_match >= 1, got {min_match}")
    if grade_by_tf and not 1 <= tf_cap <= _REL_CLAMP:
        raise ValueError(f"need 1 <= tf_cap <= {_REL_CLAMP}, got {tf_cap}")
    qterms = _query_terms(queries)
    n_terms: dict[int, int] = {}
    for qid, _ in qterms:
        n_terms[qid] = n_terms.get(qid, 0) + 1
    vals = ", ".join(
        f"({qid}, '" + t.replace("'", "''") + "')" for qid, t in qterms
    )
    floors = ", ".join(
        f"({qid}, {min(min_match, n)})" for qid, n in sorted(n_terms.items())
    )
    grade = (
        f"LEAST(COUNT(*), {tf_cap})::INT"
        if grade_by_tf
        else "COUNT(DISTINCT t.token)::INT"
    )
    return f"""
SELECT m.query_id, m.doc_id, m.rel
FROM (
  SELECT q.query_id::BIGINT AS query_id, t.doc_id,
         {grade} AS rel,
         COUNT(DISTINCT t.token)::INT AS m
  FROM (
    SELECT {id_col}::BIGINT AS doc_id,
           unnest({tokens_sql(text_col)}) AS token
    FROM {table}
  ) t
  JOIN (VALUES {vals}) q(query_id, token) ON t.token = q.token
  WHERE t.token <> ''
  GROUP BY q.query_id, t.doc_id
) m
JOIN (VALUES {floors}) f(query_id, mm) ON m.query_id = f.query_id
WHERE m.m >= f.mm
ORDER BY m.query_id, m.doc_id
"""
