"""BM25 ranked retrieval over a document corpus, dual-compiled.

The missing piece between the similarity joins (vocab.tfidf_pairs — doc
pairs) and ANN (operators/similarity.py — embedding neighbors): classic
lexical *query → top-k documents* retrieval (Robertson & Walker SIGIR'94;
the idf variant is Lucene's ``ln(1 + (N - df + 0.5)/(df + 0.5))``, always
positive). In a training-data pipeline this is the retrieval half of RAG
corpus curation, hard-negative mining for embedding training, and the
lexical baseline every dense retriever is measured against.

Scale shape (100 TB): the corpus collapses to a posting list
(term, doc, tf) — one wordcount shuffle. The query set is dimension-sized
(Q queries x a few terms each) and rides a broadcast, so candidate volume
is sum over query terms of df(t) — LINEAR in corpus size, never
corpus-quadratic (contrast the all-pairs joins, which need a df_cap as a
skew bound; here the optional df_cap is only a stopword/efficiency prune).
Per-(query, doc) scores aggregate on a composite key with map-side
partials; the top-k is a Q-partition window, Q tiny by construction.

Engine parity follows the tfidf_pairs contract: each per-term
contribution is rounded to 12 dp and accumulated in DECIMAL(38,12), so
the score is partitioning-independent and hash-exact across engines; the
final score is rounded to ``round_to`` BEFORE ranking so both engines
make the same tie call, with doc id as the total-order tiebreak.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window, functions as F

from bullet_storm_spark.functions.text import tokens, tokens_sql
from bullet_storm_spark.operators.common import hub_checkpoint
from bullet_storm_spark.operators.vocab import _resolve_df_cap

# Python twin of functions.text.tokens() for the dimension-sized query
# strings (lowercase, trim, whitespace split) — queries are plan literals,
# so they tokenize at plan-build time. re.ASCII pins Python's \s to the
# same ASCII set Java/RE2 \s matches; non-ASCII query text is rejected
# outright (Unicode whitespace/case-folding differs per engine, and a
# query that tokenizes differently from the corpus silently scores 0
# against its own exact text).
_WS_RE = re.compile(r"\s+", re.ASCII)


def _check_params(k: int, k1: float, b: float) -> None:
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    if k1 < 0:
        raise ValueError(f"need k1 >= 0, got {k1}")
    if not 0.0 <= b <= 1.0:
        # b > 1 can drive the length-norm denominator non-positive for
        # shorter-than-average documents
        raise ValueError(f"need 0 <= b <= 1, got {b}")


def _query_terms(queries) -> list[tuple[int, str]]:
    if not queries:
        raise ValueError("bm25_topk requires >= 1 (query_id, text) pair")
    out: list[tuple[int, str]] = []
    seen: set[tuple[int, str]] = set()
    for qid, text in queries:
        text = str(text)
        if not text.isascii():
            raise ValueError(
                f"query {qid!r} contains non-ASCII text; engine-identical "
                "tokenization is only guaranteed for ASCII queries"
            )
        terms = [t for t in _WS_RE.split(text.strip().lower()) if t]
        if not terms:
            raise ValueError(f"query {qid!r} has no tokens")
        for t in terms:  # distinct terms per query (qtf simplification)
            if (int(qid), t) not in seen:
                seen.add((int(qid), t))
                out.append((int(qid), t))
    return out


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    df_cap: int | float | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Top-``k`` documents per query by BM25. Output
    ``(query_id, rank, doc_id, n_terms_matched, score)``.

    ``queries`` is a list of ``(query_id, text)`` literals — a
    dimension-sized broadcast, the retrieval analogue of
    decontam's benchmark index. ``df_cap`` (optional; int >= 2 absolute
    or float fraction of N) drops ultra-common terms before the join —
    an efficiency prune only, BM25's idf already down-weights them.
    Corpus stats (N, avgdl) are defined over documents with >= 1 token
    (tokenless docs can never match) and ride a 1-row broadcast."""
    qterms = _query_terms(queries)
    k = int(k)
    _check_params(k, k1, b)
    tok = df.select(
        F.col(id_col).alias("__doc"), F.explode(tokens(text_col)).alias("token")
    ).where(F.col("token") != "")
    # tf is the hub every other statistic derives from (dl = Σ tf per
    # doc, corpus stats from dl, df per token) — materialize it ONCE:
    # without the cut each consumer branch re-ran the whole
    # tokenize+explode+count pipeline over the corpus (8 parquet scans
    # of the document table in the before-plan, one per branch; exchange
    # reuse never fires across differently-aggregated lineages). Same
    # shared-intermediate discipline as the graph edge list. Size-gated
    # (hub_checkpoint): at a small corpus the checkpoint job + barrier
    # outweigh the re-derivations (measured text_retrieval_eval paired
    # A/B 1.34 s ungated vs 1.75 s checkpointed at sf0.1).
    tf_raw = tok.groupBy("__doc", "token").agg(
        F.count("*").cast("long").alias("__tf")
    )
    tf = hub_checkpoint(tf_raw, df)
    # dl derives from the HUB only when the hub is actually materialized
    # (sum of per-(doc,token) counts == count of tokens per doc, integer-
    # exact either way). With the gate OFF, deriving dl from tf would
    # inline the (doc,token) aggregation into dl's lineage — one extra
    # Exchange per consumer vs the r10 shape (VERDICT r11 item 4: the
    # gate-off after-plan read 34 Exchanges vs r10's 30 and the entry
    # regressed 29%); the direct per-doc count keeps the r10 lineage.
    if tf is tf_raw:
        dl = tok.groupBy("__doc").agg(F.count("*").cast("long").alias("__dl"))
    else:
        dl = tf.groupBy("__doc").agg(F.sum("__tf").cast("long").alias("__dl"))
    stats = dl.agg(
        F.count("*").cast("long").alias("__N"),
        F.avg("__dl").alias("__avgdl"),
    )
    dfreq = tf.groupBy("token").agg(F.count("*").cast("long").alias("__df"))
    if df_cap is not None:
        cap = _resolve_df_cap(df_cap)
        if isinstance(cap, float):
            dfreq = dfreq.crossJoin(F.broadcast(stats.select("__N"))).where(
                F.col("__df")
                <= F.greatest(
                    F.lit(2).cast("long"),
                    F.ceil(F.lit(cap) * F.col("__N")).cast("long"),
                )
            ).select("token", "__df")
        else:
            dfreq = dfreq.where(F.col("__df") <= cap)
    q = F.explode(
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
    qdf = df.sparkSession.range(1).select(q).select("__q.query_id", "__q.token")
    idf = F.log(
        F.lit(1.0)
        + (F.col("__N") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    tf_part = (F.col("__tf") * (k1 + 1.0)) / (
        F.col("__tf")
        + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
    )
    contrib = F.round(idf * tf_part, 12)
    # dfreq pruned to query terms BEFORE the broadcast: dimension-sized,
    # never vocabulary-sized on the wire
    qdfreq = dfreq.join(F.broadcast(qdf.select("token").distinct()), "token")
    scored = (
        tf.join(F.broadcast(qdf), "token")
        .join(dl, "__doc")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qdfreq), "token")
        .select("query_id", "__doc", contrib.alias("__c"))
        .groupBy("query_id", "__doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
            F.round(
                F.sum(F.col("__c").cast("decimal(38,12)")).cast("double"),
                round_to,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.col("__doc").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            F.col("__doc").alias("doc_id"),
            "n_terms_matched",
            "score",
        )
        .orderBy("query_id", "rank")
    )


def bm25_topk_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    df_cap: int | float | None = None,
    round_to: int = 6,
) -> str:
    qterms = _query_terms(queries)
    k = int(k)
    _check_params(k, k1, b)
    vals = ", ".join(
        f"({qid}, '" + t.replace("'", "''") + "')" for qid, t in qterms
    )
    cap_pred = ""
    if df_cap is not None:
        cap = _resolve_df_cap(df_cap)
        if isinstance(cap, float):
            cap_pred = (
                "  WHERE dfc <= greatest(2, CAST(ceil("
                f"{cap} * (SELECT N FROM __stats)) AS BIGINT))\n"
            )
        else:
            cap_pred = f"  WHERE dfc <= {cap}\n"
    return f"""
WITH __tok AS (
  SELECT {id_col} AS doc, unnest({tokens_sql(text_col)}) AS token
  FROM {table}
), __nonempty AS (SELECT * FROM __tok WHERE token <> ''),
__tf AS (
  SELECT doc, token, COUNT(*)::BIGINT AS tf FROM __nonempty GROUP BY doc, token
),
__dl AS (
  SELECT doc, COUNT(*)::BIGINT AS dl FROM __nonempty GROUP BY doc
),
__stats AS (
  SELECT COUNT(*)::BIGINT AS N, AVG(dl) AS avgdl FROM __dl
),
__dfreq AS (
  SELECT token, COUNT(*)::BIGINT AS dfc FROM __tf GROUP BY token
),
__dfreq_kept AS (
  SELECT token, dfc FROM __dfreq
{cap_pred}),
__q(query_id, token) AS (VALUES {vals}),
__scored AS (
  SELECT q.query_id::BIGINT AS query_id, t.doc,
         COUNT(*)::BIGINT AS n_terms_matched,
         CAST(CAST(CAST(CAST((CAST(SUM(CAST(CAST(CAST(CAST(CAST((ln(1.0 + (s.N - d.dfc + 0.5) / (d.dfc + 0.5))
           * ((t.tf * ({k1} + 1.0))
              / (t.tf + {k1} * (1.0 - {b} + {b} * l.dl / s.avgdl)))) * CAST(ABS(ln(1.0 + (s.N - d.dfc + 0.5) / (d.dfc + 0.5))
           * ((t.tf * ({k1} + 1.0))
              / (t.tf + {k1} * (1.0 - {b} + {b} * l.dl / s.avgdl)))) >= POWER(10.0, -(12+1)) AS INT) AS VARCHAR) AS DECIMAL(38,12)) AS VARCHAR) AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)) * CAST(ABS(CAST(SUM(CAST(CAST(CAST(CAST(CAST((ln(1.0 + (s.N - d.dfc + 0.5) / (d.dfc + 0.5))
           * ((t.tf * ({k1} + 1.0))
              / (t.tf + {k1} * (1.0 - {b} + {b} * l.dl / s.avgdl)))) * CAST(ABS(ln(1.0 + (s.N - d.dfc + 0.5) / (d.dfc + 0.5))
           * ((t.tf * ({k1} + 1.0))
              / (t.tf + {k1} * (1.0 - {b} + {b} * l.dl / s.avgdl)))) >= POWER(10.0, -(12+1)) AS INT) AS VARCHAR) AS DECIMAL(38,12)) AS VARCHAR) AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS score
  FROM __tf t
  JOIN __q q ON t.token = q.token
  JOIN __dl l ON t.doc = l.doc
  CROSS JOIN __stats s
  JOIN __dfreq_kept d ON t.token = d.token
  GROUP BY q.query_id, t.doc
),
__ranked AS (
  SELECT query_id, doc, n_terms_matched, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc ASC) AS BIGINT)
           AS rank
  FROM __scored
)
SELECT query_id, rank, doc AS doc_id, n_terms_matched, score
FROM __ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# Query-by-document BM25 and the hybrid sparse+dense RRF stack
# ---------------------------------------------------------------------------


def bm25_topk_by_doc(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_ids: list[int],
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """BM25 where the queries ARE documents: each id in ``query_ids``
    retrieves its top-``k`` most similar OTHER documents (self excluded,
    matching brute_force_neighbors' contract) using its own distinct
    tokens as the query. Unlike :func:`bm25_topk`, tokenization happens
    entirely engine-side through the shared ``tokens()`` expression, so
    there is no ASCII restriction and no Python tokenizer twin to keep
    in sync.

    Scale: the query postings are |query_ids| documents' distinct
    tokens — dimension-sized, broadcast; everything else is the
    :func:`bm25_topk` shape (posting-list wordcount + broadcast probe,
    linear candidate volume)."""
    if not query_ids:
        raise ValueError("bm25_topk_by_doc requires >= 1 query id")
    k = int(k)
    _check_params(k, k1, b)
    qids = [int(q) for q in query_ids]
    tok = df.select(
        F.col(id_col).alias("__doc"), F.explode(tokens(text_col)).alias("token")
    ).where(F.col("token") != "")
    # tf is the hub every other statistic derives from (dl = Σ tf per
    # doc, corpus stats from dl, df per token) — materialize it ONCE:
    # without the cut each consumer branch re-ran the whole
    # tokenize+explode+count pipeline over the corpus (8 parquet scans
    # of the document table in the before-plan, one per branch; exchange
    # reuse never fires across differently-aggregated lineages). Same
    # shared-intermediate discipline as the graph edge list. Size-gated
    # (hub_checkpoint): at a small corpus the checkpoint job + barrier
    # outweigh the re-derivations (measured text_retrieval_eval paired
    # A/B 1.34 s ungated vs 1.75 s checkpointed at sf0.1).
    tf_raw = tok.groupBy("__doc", "token").agg(
        F.count("*").cast("long").alias("__tf")
    )
    tf = hub_checkpoint(tf_raw, df)
    # gate-off: derive dl straight from tok (the r10 lineage — see
    # bm25_topk above); gate-on: from the materialized hub (integer-
    # exact either way: sum of per-(doc,token) counts == token count)
    if tf is tf_raw:
        dl = tok.groupBy("__doc").agg(F.count("*").cast("long").alias("__dl"))
    else:
        dl = tf.groupBy("__doc").agg(F.sum("__tf").cast("long").alias("__dl"))
    stats = dl.agg(
        F.count("*").cast("long").alias("__N"),
        F.avg("__dl").alias("__avgdl"),
    )
    dfreq = tf.groupBy("token").agg(F.count("*").cast("long").alias("__df"))
    qdf = (
        tok.where(F.col("__doc").isin(qids))
        .select(F.col("__doc").cast("long").alias("query_id"), "token")
        .distinct()
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__N") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    tf_part = (F.col("__tf") * (k1 + 1.0)) / (
        F.col("__tf")
        + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
    )
    contrib = F.round(idf * tf_part, 12)
    qdfreq = dfreq.join(F.broadcast(qdf.select("token").distinct()), "token")
    scored = (
        tf.join(F.broadcast(qdf), "token")
        .where(F.col("query_id") != F.col("__doc"))
        .join(dl, "__doc")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qdfreq), "token")
        .select("query_id", "__doc", contrib.alias("__c"))
        .groupBy("query_id", "__doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
            F.round(
                F.sum(F.col("__c").cast("decimal(38,12)")).cast("double"),
                round_to,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.col("__doc").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            F.col("__doc").alias("doc_id"),
            "n_terms_matched",
            "score",
        )
        .orderBy("query_id", "rank")
    )


def bm25_topk_by_doc_sql(
    table: str,
    id_col: str,
    text_col: str,
    query_ids: list[int],
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> str:
    if not query_ids:
        raise ValueError("bm25_topk_by_doc requires >= 1 query id")
    k = int(k)
    _check_params(k, k1, b)
    ids = ", ".join(str(int(q)) for q in query_ids)
    return f"""
WITH __tok AS (
  SELECT {id_col} AS doc, unnest({tokens_sql(text_col)}) AS token
  FROM {table}
), __nonempty AS (SELECT * FROM __tok WHERE token <> ''),
__tf AS (
  SELECT doc, token, COUNT(*)::BIGINT AS tf FROM __nonempty GROUP BY doc, token
),
__dl AS (
  SELECT doc, COUNT(*)::BIGINT AS dl FROM __nonempty GROUP BY doc
),
__stats AS (
  SELECT COUNT(*)::BIGINT AS N, AVG(dl) AS avgdl FROM __dl
),
__dfreq AS (
  SELECT token, COUNT(*)::BIGINT AS dfc FROM __tf GROUP BY token
),
__q AS (
  SELECT DISTINCT CAST(doc AS BIGINT) AS query_id, token
  FROM __nonempty WHERE doc IN ({ids})
),
__scored AS (
  SELECT q.query_id, t.doc,
         COUNT(*)::BIGINT AS n_terms_matched,
         CAST(CAST(CAST(CAST((CAST(SUM(CAST(CAST(CAST(CAST(CAST((ln(1.0 + (s.N - d.dfc + 0.5) / (d.dfc + 0.5))
           * ((t.tf * ({k1} + 1.0))
              / (t.tf + {k1} * (1.0 - {b} + {b} * l.dl / s.avgdl)))) * CAST(ABS(ln(1.0 + (s.N - d.dfc + 0.5) / (d.dfc + 0.5))
           * ((t.tf * ({k1} + 1.0))
              / (t.tf + {k1} * (1.0 - {b} + {b} * l.dl / s.avgdl)))) >= POWER(10.0, -(12+1)) AS INT) AS VARCHAR) AS DECIMAL(38,12)) AS VARCHAR) AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)) * CAST(ABS(CAST(SUM(CAST(CAST(CAST(CAST(CAST((ln(1.0 + (s.N - d.dfc + 0.5) / (d.dfc + 0.5))
           * ((t.tf * ({k1} + 1.0))
              / (t.tf + {k1} * (1.0 - {b} + {b} * l.dl / s.avgdl)))) * CAST(ABS(ln(1.0 + (s.N - d.dfc + 0.5) / (d.dfc + 0.5))
           * ((t.tf * ({k1} + 1.0))
              / (t.tf + {k1} * (1.0 - {b} + {b} * l.dl / s.avgdl)))) >= POWER(10.0, -(12+1)) AS INT) AS VARCHAR) AS DECIMAL(38,12)) AS VARCHAR) AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS score
  FROM __tf t
  JOIN __q q ON t.token = q.token AND q.query_id <> t.doc
  JOIN __dl l ON t.doc = l.doc
  CROSS JOIN __stats s
  JOIN __dfreq d ON t.token = d.token
  GROUP BY q.query_id, t.doc
),
__ranked AS (
  SELECT query_id, doc, n_terms_matched, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc ASC) AS BIGINT)
           AS rank
  FROM __scored
)
SELECT query_id, rank, doc AS doc_id, n_terms_matched, score
FROM __ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


def hybrid_rrf(
    docs: DataFrame,
    embs: DataFrame,
    doc_id_col: str,
    text_col: str,
    vec_id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 5,
    pool: int = 10,
    c: int = 60,
    round_to: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, rrf, rank): the modern hybrid-search
    stack — BM25 lexical retrieval fused with exact dense cosine
    retrieval by reciprocal-rank fusion (Cormack SIGIR'09), querying by
    document over an id-aligned (documents, embeddings) table pair.
    Rank-based fusion needs no score calibration between the sparse and
    dense backends; each contributes its top-``pool`` list and missing
    entries contribute 0.

    Scale: cost is entirely in the two rankers (each documented linear
    shapes); the fusion join touches only |Q| x pool rank rows."""
    from bullet_storm_spark.operators.similarity import brute_force_neighbors

    if k < 1 or pool < k or c < 1:
        raise ValueError(f"need 1 <= k <= pool and c >= 1, got {k=} {pool=} {c=}")
    qids = [int(q) for q in query_ids]
    lex = bm25_topk_by_doc(
        docs, doc_id_col, text_col, qids, k=pool, round_to=round_to
    ).select(
        "query_id",
        F.col("doc_id").alias("neighbor_id"),
        F.col("rank").alias("__rl"),
    )
    # brute_force_neighbors aliases its id column to "id" before applying
    # the predicate, so the query filter references that alias
    den = brute_force_neighbors(
        embs, vec_id_col, vec_col, F.col("id").isin(qids), k=pool, dim=dim
    ).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        F.col("rank").alias("__rd"),
    )
    fused = lex.join(den, ["query_id", "neighbor_id"], "full_outer").select(
        "query_id",
        "neighbor_id",
        F.round(
            F.coalesce(1.0 / (F.lit(c) + F.col("__rl")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(c) + F.col("__rd")), F.lit(0.0)),
            9,
        ).alias("rrf"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("neighbor_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def hybrid_rrf_sql(
    doc_table: str,
    emb_table: str,
    doc_id_col: str,
    text_col: str,
    vec_id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 5,
    pool: int = 10,
    c: int = 60,
    round_to: int = 6,
) -> str:
    from bullet_storm_spark.operators.similarity import brute_force_neighbors_sql

    if k < 1 or pool < k or c < 1:
        raise ValueError(f"need 1 <= k <= pool and c >= 1, got {k=} {pool=} {c=}")
    qids = [int(q) for q in query_ids]
    ids = ", ".join(str(q) for q in qids)
    lex = bm25_topk_by_doc_sql(
        doc_table, doc_id_col, text_col, qids, k=pool, round_to=round_to
    )
    den = brute_force_neighbors_sql(
        emb_table, vec_id_col, vec_col, f"id IN ({ids})", k=pool
    )
    return f"""
WITH __lex AS (
  SELECT query_id, doc_id AS neighbor_id, rank AS rl FROM ({lex}) t
),
__den AS (
  SELECT CAST(query_id AS BIGINT) AS query_id,
         CAST(neighbor_id AS BIGINT) AS neighbor_id, rank AS rd
  FROM ({den}) t
),
__fused AS (
  SELECT COALESCE(a.query_id, b.query_id) AS query_id,
         COALESCE(a.neighbor_id, b.neighbor_id) AS neighbor_id,
         CAST(CAST(CAST(CAST((COALESCE(1.0 / ({c} + a.rl), 0.0)
               + COALESCE(1.0 / ({c} + b.rd), 0.0)) * CAST(ABS(COALESCE(1.0 / ({c} + a.rl), 0.0)
               + COALESCE(1.0 / ({c} + b.rd), 0.0)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) AS rrf
  FROM __lex a FULL OUTER JOIN __den b
    ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
)
SELECT query_id, neighbor_id, rrf,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf DESC, neighbor_id ASC) AS BIGINT)
         AS rank
FROM __fused
QUALIFY rank <= {k}
ORDER BY query_id, rank
"""
