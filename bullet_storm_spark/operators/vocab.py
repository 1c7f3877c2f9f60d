"""Vocabulary building over a document corpus: per-token term frequency,
document frequency, and smoothed IDF, top-N by term frequency.

The classic wordcount shape, written so both shuffles carry partial
aggregates (reference parity: this extends the text-analysis surface of
the LLM-pipeline extensions; no bullet-storm counterpart).

Scale posture (100 TB): the first aggregation keys on (doc, token), so hot
tokens ("the") are spread across as many reducers as there are documents —
no single hot key. The second aggregation keys on token alone, but its
input is already one row per (doc, token) and Spark's partial (map-side)
aggregation collapses each upstream partition to one row per distinct
token before the exchange, so the final shuffle moves at most
|partitions| x |vocab| rows, independent of corpus size. The top-N is a
TakeOrderedAndProject (per-partition heads merged on the driver), never a
global sort. IDF needs the corpus size N, which rides a broadcast of a
1-row aggregate — no driver-side count action, the whole plan stays lazy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from bullet_storm_spark.functions.text import tokens, tokens_sql
from bullet_storm_spark.operators.common import hub_checkpoint


def vocabulary(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 1000,
    round_to: int = 6,
) -> DataFrame:
    """Top-``top_n`` tokens by term frequency. Output
    ``(token, term_freq, doc_freq, idf)`` where ``idf`` is the smoothed
    ``ln((1 + N) / (1 + doc_freq))`` over corpus size N. Deterministic
    total order: term_freq desc, token asc (tokens are unique after the
    group-by, so the LIMIT boundary is never ambiguous)."""
    tok = df.select(
        F.col(id_col).alias("__doc"), F.explode(tokens(text_col)).alias("token")
    ).where(F.col("token") != "")
    per_doc = tok.groupBy("__doc", "token").agg(F.count("*").alias("__cnt"))
    vocab = per_doc.groupBy("token").agg(
        F.sum("__cnt").cast("long").alias("term_freq"),
        F.count("*").cast("long").alias("doc_freq"),
    )
    n_docs = df.agg(F.count("*").alias("__n"))
    return (
        vocab.crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            "term_freq",
            "doc_freq",
            F.round(
                F.log((F.lit(1) + F.col("__n")) / (F.lit(1) + F.col("doc_freq"))),
                round_to,
            ).alias("idf"),
        )
        .orderBy(F.desc("term_freq"), "token")
        .limit(top_n)
    )


def vocabulary_sql(
    table: str,
    id_col: str,
    text_col: str,
    top_n: int = 1000,
    round_to: int = 6,
) -> str:
    return f"""
WITH tok AS (
  SELECT {id_col} AS doc, unnest({tokens_sql(text_col)}) AS token FROM {table}
), per_doc AS (
  SELECT doc, token, COUNT(*) AS cnt
  FROM tok WHERE token <> '' GROUP BY doc, token
), vocab AS (
  SELECT token, SUM(cnt)::BIGINT AS term_freq, COUNT(*)::BIGINT AS doc_freq
  FROM per_doc GROUP BY token
)
SELECT token, term_freq, doc_freq,
       CAST(CAST(CAST(CAST((ln((1 + (SELECT COUNT(*) FROM {table}))::DOUBLE
                / (1 + doc_freq))) * CAST(ABS(ln((1 + (SELECT COUNT(*) FROM {table}))::DOUBLE
                / (1 + doc_freq))) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS idf
FROM vocab
ORDER BY term_freq DESC, token
LIMIT {top_n}
"""


def lm_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = 1.0,
    round_to: int = 6,
) -> DataFrame:
    """Unigram language-model quality score per document: (id, n_tokens,
    cross_entropy) where cross_entropy = -mean ln p(token) under the
    corpus unigram model p(w) = (tf_w + alpha) / (T + alpha * V)
    (add-alpha smoothing over vocabulary size V, total tokens T). This is
    the CCNet-style "how surprising is this document under the corpus
    distribution" curation signal (Wenzek et al., CCNet, LREC 2020 — they
    use a KenLM; the unigram model is the dependency-free in-sandbox
    form; the plan shape is identical for any token-level LM).

    Scale shape: ONE token-keyed aggregation builds the model (vocab-
    sized), one join tags each token row with its probability (broadcast
    under threshold, hash join on the token key beyond it), one doc-keyed
    aggregation scores. Per-token ln p rounds to 9dp and sums in
    DECIMAL — the mean is order-free and the whole score hash-MATCHes the
    DuckDB twin."""
    tok = df.select(
        F.col(id_col).alias("__doc"), F.explode(tokens(text_col)).alias("token")
    ).where(F.col("token") != "")
    # the unigram model feeds the totals AND the scoring join;
    # materialize the vocab-sized frame once so the corpus tokenize runs
    # twice (model + scoring — inherent), not three times (guide §3.3).
    # The corpus-sized token stream itself is deliberately NOT
    # checkpointed: vocab is the scale-bounded hub. Size-gated
    # (hub_checkpoint): below the threshold the checkpoint job costs
    # more than the third tokenize it saves (measured 0.54 vs 0.69 s at
    # sf0.1).
    vocab = hub_checkpoint(
        tok.groupBy("token").agg(F.count("*").cast("long").alias("__tf")),
        df,
    )
    totals = vocab.agg(
        F.sum("__tf").cast("long").alias("__T"),
        F.count("*").cast("long").alias("__V"),
    )
    logp = F.round(
        F.log(
            (F.col("__tf") + F.lit(float(alpha)))
            / (F.col("__T") + F.lit(float(alpha)) * F.col("__V"))
        ),
        9,
    )
    scored = (
        tok.join(vocab, "token")
        .crossJoin(F.broadcast(totals))
        .select("__doc", logp.alias("__logp"))
    )
    return (
        scored.groupBy("__doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(
                -F.sum(F.col("__logp").cast("decimal(38,9)")).cast("double")
                / F.count(F.lit(1)),
                round_to,
            ).alias("cross_entropy"),
        )
        .withColumnRenamed("__doc", id_col)
        .orderBy(id_col)
    )


def lm_score_sql(
    table: str,
    id_col: str,
    text_col: str,
    alpha: float = 1.0,
    round_to: int = 6,
) -> str:
    return f"""
WITH tok AS (
  SELECT {id_col} AS doc, unnest({tokens_sql(text_col)}) AS token FROM {table}
), nonempty AS (SELECT * FROM tok WHERE token <> ''),
vocab AS (
  SELECT token, COUNT(*)::BIGINT AS tf FROM nonempty GROUP BY token
),
totals AS (SELECT SUM(tf)::BIGINT AS T, COUNT(*)::BIGINT AS V FROM vocab),
scored AS (
  SELECT n.doc,
         CAST(CAST(CAST(CAST((ln((v.tf + {float(alpha)!r})
                  / (t.T + {float(alpha)!r} * t.V))) * CAST(ABS(ln((v.tf + {float(alpha)!r})
                  / (t.T + {float(alpha)!r} * t.V))) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) AS logp
  FROM nonempty n JOIN vocab v USING (token) CROSS JOIN totals t
)
SELECT doc AS {id_col}, COUNT(*)::BIGINT AS n_tokens,
       CASE WHEN ABS(-CAST(SUM(CAST(logp AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*)) >= 1e16 THEN CAST((-CAST(SUM(CAST(logp AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((-CAST(SUM(CAST(logp AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*)) * CAST(ABS(-CAST(SUM(CAST(logp AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS cross_entropy
FROM scored GROUP BY doc ORDER BY {id_col}
"""


def tfidf_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Top-``top_k`` characteristic terms per document by TF-IDF:
    ``(id, rank, token, tf, tfidf)`` where ``tfidf = tf * ln((1 + N) /
    (1 + doc_freq))`` (same smoothed IDF as :func:`vocabulary`). The
    per-doc ordering is (ROUNDED tfidf desc, token asc) so the rank-k
    boundary is engine-independent — ties can't be cut differently by a
    sub-round-off ln() discrepancy.

    Scale shape: the (doc, token) aggregation spreads hot tokens across
    documents (no hot key); the doc-frequency table is vocab-sized and
    joins on the token key (broadcast under threshold / shuffled hash
    beyond — AQE's call); N rides a broadcast 1-row aggregate; the final
    per-doc top-k is ONE window partitioned by the doc id — the corpus'
    natural key, uniform by construction."""
    tok = df.select(
        F.col(id_col).alias("__doc"), F.explode(tokens(text_col)).alias("token")
    ).where(F.col("token") != "")
    # the (doc, token, tf) frame feeds TWO consumers (doc-frequency and
    # the scoring join base); size-gated hub: above the threshold one
    # materialization replaces two corpus tokenize+explode runs, below it
    # the checkpoint's fixed job costs more than the duplicate lineage
    # (driver-measured -16% at sf0.1 when unconditional — guide §3.3)
    per_doc = hub_checkpoint(
        tok.groupBy("__doc", "token").agg(F.count("*").cast("long").alias("tf")),
        df,
    )
    dfreq = per_doc.groupBy("token").agg(F.count("*").cast("long").alias("__df"))
    n_docs = df.agg(F.count("*").alias("__n"))
    scored = (
        per_doc.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "__doc",
            "token",
            "tf",
            F.round(
                F.col("tf")
                * F.log((F.lit(1) + F.col("__n")) / (F.lit(1) + F.col("__df"))),
                round_to,
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__doc").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_k)
        .select(F.col("__doc").alias(id_col), "rank", "token", "tf", "tfidf")
        .orderBy(id_col, "rank")
    )


def tfidf_terms_sql(
    table: str,
    id_col: str,
    text_col: str,
    top_k: int = 5,
    round_to: int = 6,
) -> str:
    return f"""
WITH tok AS (
  SELECT {id_col} AS doc, unnest({tokens_sql(text_col)}) AS token FROM {table}
), per_doc AS (
  SELECT doc, token, COUNT(*)::BIGINT AS tf
  FROM tok WHERE token <> '' GROUP BY doc, token
), dfreq AS (
  SELECT token, COUNT(*)::BIGINT AS df FROM per_doc GROUP BY token
), scored AS (
  SELECT doc, token, tf,
         CAST(CAST(CAST(CAST((tf * ln((1 + (SELECT COUNT(*) FROM {table}))::DOUBLE
                       / (1 + df))) * CAST(ABS(tf * ln((1 + (SELECT COUNT(*) FROM {table}))::DOUBLE
                       / (1 + df))) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS tfidf
  FROM per_doc JOIN dfreq USING (token)
)
SELECT doc AS {id_col},
       row_number() OVER (PARTITION BY doc
                          ORDER BY tfidf DESC, token ASC)::BIGINT AS rank,
       token, tf, tfidf
FROM scored
QUALIFY rank <= {top_k}
ORDER BY {id_col}, rank
"""


def source_divergence(
    df: DataFrame,
    stratum_col: str,
    text_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-source distribution drift: ``(stratum, n_tokens, vocab_size,
    kl_to_corpus)`` where ``kl_to_corpus = KL(P_s || P_corpus) =
    sum over tokens in s of p_s(w) * ln(p_s(w) / p_c(w))`` with the
    unsmoothed within-source distribution ``p_s`` and corpus distribution
    ``p_c`` (well-defined — every source token is a corpus token). This is
    the corpus-analytics pass run before choosing mixing weights: a
    source with high KL is distributionally far from the blend (dialect,
    boilerplate, or contamination) and gets inspected before training.

    Hash-exact across engines: per-token terms round to 12 dp then sum in
    DECIMAL(38,12) — order-free, so the score is independent of
    partitioning (same treatment as lm_score).

    Scale shape (100 TB): ONE (stratum, token) aggregation (hot tokens
    spread across strata), the corpus vocabulary derived from it by a
    second vocab-bounded aggregation, a token-keyed join between two
    vocab-sized tables (broadcast under threshold), per-stratum totals as
    a |strata|-row broadcast, one final |strata|-keyed aggregation.
    The raw corpus is scanned once and shuffled once."""
    tok = df.select(
        F.col(stratum_col).alias("__src"),
        F.explode(tokens(text_col)).alias("token"),
    ).where(F.col("token") != "")
    # the (stratum, token) frame feeds THREE consumers (corpus vocab,
    # per-stratum totals, and the join base); materialize once so the
    # corpus tokenize+explode runs once, not three times (guide §3.3) —
    # the frame is strata × vocabulary, not corpus-sized
    per_src = (
        tok.groupBy("__src", "token")
        .agg(F.count("*").cast("long").alias("__tfs"))
        .localCheckpoint()
    )
    corpus = per_src.groupBy("token").agg(F.sum("__tfs").cast("long").alias("__tfc"))
    totals = per_src.groupBy("__src").agg(F.sum("__tfs").cast("long").alias("__Ts"))
    grand = corpus.agg(F.sum("__tfc").cast("long").alias("__Tc"))
    ps = F.col("__tfs") / F.col("__Ts")
    pc = F.col("__tfc") / F.col("__Tc")
    term = F.round(ps * F.log(ps / pc), 12)
    return (
        per_src.join(corpus, "token")
        .join(F.broadcast(totals), "__src")
        .crossJoin(F.broadcast(grand))
        .select("__src", "__Ts", term.alias("__term"))
        .groupBy("__src")
        .agg(
            F.first("__Ts").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("vocab_size"),
            F.round(
                F.sum(F.col("__term").cast("decimal(38,12)")).cast("double"),
                round_to,
            ).alias("kl_to_corpus"),
        )
        .withColumnRenamed("__src", stratum_col)
        .orderBy(stratum_col)
    )


def source_divergence_sql(
    table: str,
    stratum_col: str,
    text_col: str,
    round_to: int = 6,
) -> str:
    return f"""
WITH tok AS (
  SELECT {stratum_col} AS src, unnest({tokens_sql(text_col)}) AS token
  FROM {table}
), nonempty AS (SELECT * FROM tok WHERE token <> ''),
per_src AS (
  SELECT src, token, COUNT(*)::BIGINT AS tfs FROM nonempty GROUP BY src, token
), corpus AS (
  SELECT token, SUM(tfs)::BIGINT AS tfc FROM per_src GROUP BY token
), totals AS (
  SELECT src, SUM(tfs)::BIGINT AS Ts FROM per_src GROUP BY src
), grand AS (SELECT SUM(tfc)::BIGINT AS Tc FROM corpus),
terms AS (
  SELECT p.src, t.Ts,
         CASE WHEN ABS((p.tfs / t.Ts) * ln((p.tfs / t.Ts) / (c.tfc / g.Tc))) >= 1e16 THEN CAST(((p.tfs / t.Ts) * ln((p.tfs / t.Ts) / (c.tfc / g.Tc))) AS DOUBLE) ELSE CAST(CAST(CAST(CAST(((p.tfs / t.Ts) * ln((p.tfs / t.Ts) / (c.tfc / g.Tc))) * CAST(ABS((p.tfs / t.Ts) * ln((p.tfs / t.Ts) / (c.tfc / g.Tc))) >= POWER(10.0, -(12+1)) AS INT) AS VARCHAR) AS DECIMAL(38,12)) AS VARCHAR) AS DOUBLE) END
           AS term
  FROM per_src p
  JOIN corpus c USING (token)
  JOIN totals t ON p.src = t.src
  CROSS JOIN grand g
)
SELECT src AS {stratum_col}, ANY_VALUE(Ts) AS n_tokens,
       COUNT(*)::BIGINT AS vocab_size,
       CASE WHEN ABS(CAST(SUM(CAST(term AS DECIMAL(38,12))) AS DOUBLE)) >= 1e16 THEN CAST((CAST(SUM(CAST(term AS DECIMAL(38,12))) AS DOUBLE)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(SUM(CAST(term AS DECIMAL(38,12))) AS DOUBLE)) * CAST(ABS(CAST(SUM(CAST(term AS DECIMAL(38,12))) AS DOUBLE)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END
         AS kl_to_corpus
FROM terms GROUP BY src ORDER BY {stratum_col}
"""


def curriculum_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    stratum_col: str,
    n_buckets: int = 4,
    alpha: float = 1.0,
    round_to: int = 6,
) -> DataFrame:
    """Curriculum mixing report: ``(bucket, stratum, n_docs, mean_ce)`` —
    documents ranked by unigram-LM cross-entropy (:func:`lm_score`) and
    cut into ``n_buckets`` ntile difficulty buckets, cross-tabulated by
    source. This is the table a curriculum schedule is written from
    ("easy-first: bucket 1 epochs 2x") and the skew check before
    quality-weighted mixing (a source concentrated in the hardest bucket
    is suspect). The ntile orders by (cross_entropy, id) — a total order,
    so the bucket boundary is engine-independent; per-cell means sum
    6dp-rounded scores in DECIMAL (order-free).

    Scale note: ntile is ONE global sort over (score, id) — a DIAGNOSTIC
    report (bounded |buckets| x |strata| output), not a per-record tag; to
    tag 100 TB of records, freeze this report's bucket boundaries and
    re-apply them as literal thresholds riding the scan."""
    from pyspark.sql import Window

    scores = lm_score(df, id_col, text_col, alpha=alpha)
    joined = df.select(
        F.col(id_col).alias("__jid"), F.col(stratum_col).alias("__src")
    ).join(scores, F.col("__jid") == F.col(id_col))
    w = Window.orderBy("cross_entropy", F.col(id_col))
    return (
        joined.select(
            "__src",
            "cross_entropy",
            F.ntile(int(n_buckets)).over(w).alias("bucket"),
        )
        .groupBy("bucket", "__src")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.sum(F.col("cross_entropy").cast("decimal(38,9)")).cast("double")
                / F.count(F.lit(1)),
                round_to,
            ).alias("mean_ce"),
        )
        .withColumnRenamed("__src", stratum_col)
        .orderBy("bucket", stratum_col)
    )


def curriculum_report_sql(
    table: str,
    id_col: str,
    text_col: str,
    stratum_col: str,
    n_buckets: int = 4,
    alpha: float = 1.0,
    round_to: int = 6,
) -> str:
    inner = lm_score_sql(table, id_col, text_col, alpha=alpha)
    return f"""
WITH __scores AS ({inner}),
__tiled AS (
  SELECT t.{stratum_col} AS src, s.cross_entropy,
         ntile({int(n_buckets)}) OVER (ORDER BY s.cross_entropy, s.{id_col})
           AS bucket
  FROM __scores s JOIN {table} t ON s.{id_col} = t.{id_col}
)
SELECT bucket, src AS {stratum_col}, COUNT(*)::BIGINT AS n_docs,
       CAST(CAST(CAST(CAST((CAST(SUM(CAST(cross_entropy AS DECIMAL(38,9))) AS DOUBLE)
             / COUNT(*)) * CAST(ABS(CAST(SUM(CAST(cross_entropy AS DECIMAL(38,9))) AS DOUBLE)
             / COUNT(*)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS mean_ce
FROM __tiled GROUP BY bucket, src ORDER BY bucket, src
"""


def tfidf_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    df_cap: int = 100,
    min_sim: float = 0.3,
    candidate_pair_budget: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, n_shared_terms, cosine): document pairs with TF-IDF
    cosine similarity >= ``min_sim``, computed over the MID-FREQUENCY
    vocabulary (terms appearing in 2..``df_cap`` documents; a float
    ``df_cap`` in (0,1) is a corpus-size fraction resolved at plan time). This is the
    classic sparse similarity join (Bayardo et al., WWW 2007 "Scaling Up
    All Pairs Similarity Search" — the df_cap prune is their
    high-frequency-term cut): the complement to embedding cosine
    (operators/similarity.py) when no embeddings exist, and to MinHash
    (operators/dedup.py) when graded similarity, not a Jaccard threshold,
    is wanted.

    Semantics: w(d,t) = tf * ln(N/df) rounded to 9 dp; norms and dot
    products accumulate 12-dp-rounded terms in DECIMAL(38,12) so the
    score is partitioning-independent and hash-exact across engines;
    cosine is rounded to 6 dp before the threshold so both engines make
    the same boundary call.

    Scale shape (100 TB): the corpus collapses to a posting list
    (term, doc, w) — vocabulary-height × bounded df. Candidate volume is
    sum over kept terms of df², bounded by df_cap × corpus postings: the
    df_cap contract is BOTH the relevance prune (ubiquitous terms carry
    no signal) and the skew bound (no term explodes the join). One
    term-keyed self-join moving (id, w) only, one pair-keyed aggregation,
    one doc-keyed norm join. Nothing is corpus-quadratic.
    """
    cap = _resolve_df_cap(df_cap)
    tok = df.select(
        F.col(id_col).alias("__id"), F.explode(tokens(text_col)).alias("token")
    ).where(F.col("token") != "")
    # (doc, token, tf) hub: feeds doc-frequency AND the posting join —
    # materialize so the corpus tokenize+explode runs once (guide §3.3)
    tf = (
        tok.groupBy("__id", "token")
        .agg(F.count("*").cast("long").alias("__tf"))
        .localCheckpoint()
    )
    dfreq = tf.groupBy("token").agg(F.count("*").cast("long").alias("__df"))
    n_docs = df.select(F.count_distinct(F.col(id_col)).cast("long").alias("__N"))
    if isinstance(cap, float):
        # fractional cap resolves corpus-side: size-independent config
        cap_col = F.greatest(
            F.lit(2).cast("long"),
            F.ceil(F.lit(cap) * F.col("__N")).cast("long"),
        )
    else:
        cap_col = F.lit(cap).cast("long")
    posting = (
        tf.join(dfreq.where(F.col("__df") >= 2), "token")
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("__df") <= cap_col)
        .select(
            "__id",
            "token",
            F.round(
                F.col("__tf") * F.log(F.col("__N") / F.col("__df")), 9
            ).alias("__w"),
        )
        # a term with df == N gets idf ln(1) = 0: keeping its zero-weight
        # postings lets an all-such-terms document reach norm 0, whose
        # 0/0 = NaN cosine passes the >= threshold in both engines (NaN
        # sorts high). Zero weights carry no signal — drop them.
        .where(F.col("__w") > 0)
        # the kept posting list feeds the norm aggregation and BOTH
        # sides of the term self-join (plus the budget pre-flight);
        # materialize once — vocabulary-height × df_cap-bounded
        .localCheckpoint()
    )
    if candidate_pair_budget is not None:
        from bullet_storm_spark.operators.pair_budget import (
            check_candidate_pair_budget,
        )

        # priced on the kept posting list: Sigma C(df, 2) over kept
        # terms is exactly the term self-join's pre-aggregation volume
        check_candidate_pair_budget(
            posting.select("token"),
            ["token"],
            candidate_pair_budget,
            "tfidf_pairs",
            "Lower df_cap (drops hotter terms from the join) or dedup "
            "exact first; the hot bucket names the term.",
        )
    norms = posting.groupBy("__id").agg(
        F.sqrt(
            F.sum(
                F.round(F.col("__w") * F.col("__w"), 12).cast("decimal(38,12)")
            ).cast("double")
        ).alias("__norm")
    )
    right = posting.select(
        F.col("__id").alias("__id_b"), "token", F.col("__w").alias("__w_b")
    )
    dots = (
        posting.join(right, "token")
        .where(F.col("__id") < F.col("__id_b"))
        .select(
            F.col("__id").alias("__a"),
            F.col("__id_b").alias("__b"),
            F.round(F.col("__w") * F.col("__w_b"), 12).alias("__p"),
        )
        .groupBy("__a", "__b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_terms"),
            F.sum(F.col("__p").cast("decimal(38,12)")).cast("double").alias("__dot"),
        )
    )
    na = norms.select(F.col("__id").alias("__a"), F.col("__norm").alias("__na"))
    nb = norms.select(F.col("__id").alias("__b"), F.col("__norm").alias("__nb"))
    return (
        dots.join(na, "__a")
        .join(nb, "__b")
        .select(
            F.col("__a").alias("doc_a"),
            F.col("__b").alias("doc_b"),
            "n_shared_terms",
            F.round(F.col("__dot") / (F.col("__na") * F.col("__nb")), 6).alias(
                "cosine"
            ),
        )
        .where(F.col("cosine") >= float(min_sim))
        .orderBy("doc_a", "doc_b")
    )


def tfidf_pairs_sql(
    table: str,
    id_col: str,
    text_col: str,
    df_cap: int = 100,
    min_sim: float = 0.3,
) -> str:
    cap = _resolve_df_cap(df_cap)
    if isinstance(cap, float):
        cap_sql = f"greatest(2, CAST(ceil({cap} * n.N) AS BIGINT))"
    else:
        cap_sql = str(cap)
    return f"""
WITH __tok AS (
  SELECT {id_col} AS id, unnest({tokens_sql(text_col)}) AS token FROM {table}
), __nonempty AS (SELECT * FROM __tok WHERE token <> ''),
__tf AS (
  SELECT id, token, COUNT(*)::BIGINT AS tf FROM __nonempty GROUP BY id, token
),
__dfreq AS (
  SELECT token, COUNT(*)::BIGINT AS dfc FROM __tf GROUP BY token
),
__n AS (SELECT COUNT(DISTINCT {id_col})::BIGINT AS N FROM {table}),
__posting0 AS (
  SELECT t.id, t.token, CASE WHEN ABS(t.tf * ln(n.N / d.dfc)) >= 1e16 THEN CAST((t.tf * ln(n.N / d.dfc)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((t.tf * ln(n.N / d.dfc)) * CAST(ABS(t.tf * ln(n.N / d.dfc)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS w
  FROM __tf t
  JOIN __dfreq d ON t.token = d.token AND d.dfc >= 2
  CROSS JOIN __n n
  WHERE d.dfc <= {cap_sql}
),
-- zero-weight postings (df == N) dropped: they can produce norm-0 docs
-- whose NaN cosine passes the threshold (NaN compares high both engines)
__posting AS (SELECT * FROM __posting0 WHERE w > 0),
__norms AS (
  SELECT id,
         sqrt(CAST(SUM(CAST(CASE WHEN ABS(w * w) >= 1e16 THEN CAST((w * w) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((w * w) * CAST(ABS(w * w) >= POWER(10.0, -(12+1)) AS INT) AS VARCHAR) AS DECIMAL(38,12)) AS VARCHAR) AS DOUBLE) END AS DECIMAL(38,12))) AS DOUBLE))
           AS nrm
  FROM __posting GROUP BY id
),
__dots AS (
  SELECT a.id AS da, b.id AS db, COUNT(*)::BIGINT AS n_shared_terms,
         CAST(SUM(CAST(CASE WHEN ABS(a.w * b.w) >= 1e16 THEN CAST((a.w * b.w) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((a.w * b.w) * CAST(ABS(a.w * b.w) >= POWER(10.0, -(12+1)) AS INT) AS VARCHAR) AS DECIMAL(38,12)) AS VARCHAR) AS DOUBLE) END AS DECIMAL(38,12))) AS DOUBLE)
           AS dot
  FROM __posting a JOIN __posting b
    ON a.token = b.token AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT d.da AS doc_a, d.db AS doc_b, d.n_shared_terms,
       CASE WHEN ABS(d.dot / (na.nrm * nb.nrm)) >= 1e16 THEN CAST((d.dot / (na.nrm * nb.nrm)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((d.dot / (na.nrm * nb.nrm)) * CAST(ABS(d.dot / (na.nrm * nb.nrm)) >= POWER(10.0, -(6+1)) AS INT) AS VARCHAR) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) END AS cosine
FROM __dots d
JOIN __norms na ON d.da = na.id
JOIN __norms nb ON d.db = nb.id
WHERE CASE WHEN ABS(d.dot / (na.nrm * nb.nrm)) >= 1e16 THEN CAST((d.dot / (na.nrm * nb.nrm)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((d.dot / (na.nrm * nb.nrm)) * CAST(ABS(d.dot / (na.nrm * nb.nrm)) >= POWER(10.0, -(6+1)) AS INT) AS VARCHAR) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) END >= {float(min_sim)}
ORDER BY doc_a, doc_b
"""


def _resolve_df_cap(df_cap: int | float) -> int | float:
    """An int >= 2 is an absolute document-frequency cap; a float in (0, 1)
    is a FRACTION of the corpus size resolved at plan time corpus-side
    (min 2). The fractional form is the size-independent config: a fixed
    absolute cap silently empties the posting list once the corpus grows
    past cap/expected-df docs (measured in SCALING.md's data-growth
    curve)."""
    if isinstance(df_cap, float) and not df_cap.is_integer():
        if not 0.0 < df_cap < 1.0:
            raise ValueError(f"fractional df_cap must be in (0, 1), got {df_cap}")
        return df_cap
    cap = int(df_cap)
    if cap < 2:
        raise ValueError(f"need df_cap >= 2, got {df_cap}")
    return cap


def zipf_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 500,
    round_to: int = 6,
) -> DataFrame:
    """One-row corpus Zipf audit: least-squares fit of ln(freq) against
    ln(rank) over the top-``top_n`` tokens, plus coverage. A healthy
    natural-language corpus fits slope ~ -1 (Zipf's law); a slope far from
    that (or low r2) flags templated/boilerplate or synthetic text — a
    cheap corpus-level quality gate to run before spending tokens on
    per-document scoring.

    Output ``(n_terms, total_tf, top_coverage, zipf_slope, zipf_intercept,
    zipf_r2)``. Closed-form OLS over aggregates — the whole fit is one
    groupBy-free reduction over top_n rows, so the plan is: token explode,
    one hash-agg, one top-n sort (rank boundary deterministic: freq desc,
    token asc), six scalar aggregates. No iteration, no driver math.
    """
    from pyspark.sql import Window

    tok = df.select(
        F.explode(tokens(text_col)).alias("token")
    ).where(F.col("token") != "")
    vocab = tok.groupBy("token").agg(F.count("*").cast("long").alias("tf"))
    # TakeOrdered cuts the vocabulary to top_n BEFORE the global-rank
    # window, so the single-partition window sees top_n rows, not the
    # whole vocabulary (the limit itself is a per-partition partial top-n)
    ranked = (
        vocab.orderBy(F.desc("tf"), F.asc("token"))
        .limit(top_n)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("tf"), F.asc("token"))),
        )
        .select(
            F.log(F.col("rank").cast("double")).alias("x"),
            F.log(F.col("tf").cast("double")).alias("y"),
            "tf",
        )
    )
    totals = vocab.agg(
        F.sum("tf").cast("long").alias("total_tf"),
        F.count("*").cast("long").alias("n_terms"),
    )
    fit = ranked.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum("tf").cast("long").alias("top_tf"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    return (
        fit.crossJoin(F.broadcast(totals))
        .select(
            "n_terms",
            "total_tf",
            F.round(F.col("top_tf") / F.col("total_tf"), round_to).alias(
                "top_coverage"
            ),
            F.round(cov / varx, round_to).alias("zipf_slope"),
            F.round((sy - (cov / varx) * sx) / n, round_to).alias(
                "zipf_intercept"
            ),
            F.round((cov * cov) / (varx * vary), round_to).alias("zipf_r2"),
        )
    )


def zipf_report_sql(
    table: str,
    id_col: str,
    text_col: str,
    top_n: int = 500,
    round_to: int = 6,
) -> str:
    return f"""
WITH tok AS (
  SELECT unnest({tokens_sql(text_col)}) AS token FROM {table}
), vocab AS (
  SELECT token, COUNT(*)::BIGINT AS tf FROM tok WHERE token <> '' GROUP BY token
), totals AS (
  SELECT SUM(tf)::BIGINT AS total_tf, COUNT(*)::BIGINT AS n_terms FROM vocab
), ranked AS (
  SELECT ln(ROW_NUMBER() OVER (ORDER BY tf DESC, token ASC)::DOUBLE) AS x,
         ln(tf::DOUBLE) AS y, tf
  FROM vocab
  QUALIFY ROW_NUMBER() OVER (ORDER BY tf DESC, token ASC) <= {top_n}
), fit AS (
  SELECT COUNT(*)::DOUBLE AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy,
         SUM(tf)::BIGINT AS top_tf
  FROM ranked
)
SELECT n_terms, total_tf,
       CASE WHEN ABS(top_tf / total_tf::DOUBLE) >= 1e16 THEN CAST((top_tf / total_tf::DOUBLE) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((top_tf / total_tf::DOUBLE) * CAST(ABS(top_tf / total_tf::DOUBLE) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS top_coverage,
       CASE WHEN ABS((n * sxy - sx * sy) / (n * sxx - sx * sx)) >= 1e16 THEN CAST(((n * sxy - sx * sy) / (n * sxx - sx * sx)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST(((n * sxy - sx * sy) / (n * sxx - sx * sx)) * CAST(ABS((n * sxy - sx * sy) / (n * sxx - sx * sx)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS zipf_slope,
       CASE WHEN ABS((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n) >= 1e16 THEN CAST(((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n) AS DOUBLE) ELSE CAST(CAST(CAST(CAST(((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n) * CAST(ABS((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS zipf_intercept,
       CAST(CAST(CAST(CAST(((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy))) * CAST(ABS((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy))) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS zipf_r2
FROM fit, totals
"""


def source_overlap_matrix(
    df: DataFrame,
    source_col: str,
    text_col: str,
    shingle_n: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """(source_a, source_b, grams_a, grams_b, shared, jaccard): the
    cross-source n-gram overlap matrix — distinct word-``shingle_n``-gram
    Jaccard between every source pair. The set-overlap sibling of
    ``source_divergence`` (which compares unigram DISTRIBUTIONS): high
    overlap between two "different" sources means mirrored/syndicated
    content that will defeat per-source mixing weights, and overlap with
    a benchmark-derived source is leakage. All C(n_sources, 2) pairs
    over the NON-NULL sources appear, including zero-overlap ones and
    sources whose docs are all too short to yield a gram (grams=0,
    jaccard=0.0); NULL sources are excluded — join provenance before
    auditing.

    Plan: distinct (source, gram) pairs in one hash aggregation (linear
    in corpus grams; tokens materialized behind an exchange so the
    per-shingle lambda never re-tokenizes — the SCALING.md MinHash
    pitfall), then ONE gram-keyed self-join whose output per gram
    is bounded by C(n_sources, 2) — never corpus-quadratic; the complete
    pair spine is a sources² cross of two source-cardinality aggregates
    (bounded by the source count, the funnel broadcast-base pattern)."""
    from bullet_storm_spark.functions.text import shingles_from_tokens, tokens

    par = df.sparkSession.sparkContext.defaultParallelism
    nn = df.where(F.col(source_col).isNotNull())
    toks = nn.select(
        F.col(source_col).alias("src"), tokens(text_col).alias("__toks")
    ).repartition(par)
    grams = (
        toks.select(
            "src",
            F.explode(shingles_from_tokens(F.col("__toks"), shingle_n)).alias("g"),
        )
        .distinct()
    )
    # the pair spine comes from ALL distinct (non-null) sources, not just
    # gram-producing ones — a source of only-too-short docs still appears
    per_src = (
        nn.select(F.col(source_col).alias("src"))
        .distinct()
        .join(
            grams.groupBy("src").agg(
                F.count(F.lit(1)).cast("long").alias("__ng")
            ),
            "src",
            "left",
        )
        .select("src", F.coalesce("__ng", F.lit(0)).cast("long").alias("n_grams"))
    )
    a = grams.alias("ga")
    b = grams.alias("gb")
    shared = (
        a.join(
            b,
            (F.col("ga.g") == F.col("gb.g")) & (F.col("ga.src") < F.col("gb.src")),
        )
        .groupBy(
            F.col("ga.src").alias("source_a"), F.col("gb.src").alias("source_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    pa = per_src.select(
        F.col("src").alias("source_a"), F.col("n_grams").alias("grams_a")
    )
    pb = per_src.select(
        F.col("src").alias("source_b"), F.col("n_grams").alias("grams_b")
    )
    spine = pa.crossJoin(F.broadcast(pb)).where(
        F.col("source_a") < F.col("source_b")
    )
    return (
        spine.join(shared, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "grams_a",
            "grams_b",
            F.coalesce("shared", F.lit(0)).cast("long").alias("shared"),
            F.round(
                F.when(
                    F.col("grams_a") + F.col("grams_b") > 0,
                    F.coalesce("shared", F.lit(0))
                    / (
                        F.col("grams_a")
                        + F.col("grams_b")
                        - F.coalesce("shared", F.lit(0))
                    ),
                ).otherwise(F.lit(0.0)),
                round_to,
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


def source_overlap_matrix_sql(
    table: str,
    source_col: str,
    text_col: str,
    shingle_n: int = 3,
    round_to: int = 6,
) -> str:
    from bullet_storm_spark.functions.text import shingles_sql

    sh = shingles_sql(text_col, shingle_n)
    return f"""
WITH __g AS (
  SELECT DISTINCT {source_col} AS src, g
  FROM {table}, UNNEST({sh}) AS t(g)
  WHERE {source_col} IS NOT NULL
),
__per AS (
  SELECT s.src, COALESCE(n.n_grams, 0)::BIGINT AS n_grams
  FROM (SELECT DISTINCT {source_col} AS src FROM {table}
        WHERE {source_col} IS NOT NULL) s
  LEFT JOIN (SELECT src, COUNT(*)::BIGINT AS n_grams
             FROM __g GROUP BY src) n ON s.src = n.src
),
__shared AS (
  SELECT a.src AS source_a, b.src AS source_b, COUNT(*)::BIGINT AS shared
  FROM __g a JOIN __g b ON a.g = b.g AND a.src < b.src
  GROUP BY a.src, b.src
),
__spine AS (
  SELECT pa.src AS source_a, pb.src AS source_b,
         pa.n_grams AS grams_a, pb.n_grams AS grams_b
  FROM __per pa CROSS JOIN __per pb WHERE pa.src < pb.src
)
SELECT s.source_a, s.source_b, s.grams_a, s.grams_b,
       COALESCE(h.shared, 0)::BIGINT AS shared,
       CAST(CAST(CAST(CAST((CASE WHEN s.grams_a + s.grams_b > 0
                  THEN CAST(COALESCE(h.shared, 0) AS DOUBLE)
                       / (s.grams_a + s.grams_b - COALESCE(h.shared, 0))
                  ELSE 0.0 END) * CAST(ABS(CASE WHEN s.grams_a + s.grams_b > 0
                  THEN CAST(COALESCE(h.shared, 0) AS DOUBLE)
                       / (s.grams_a + s.grams_b - COALESCE(h.shared, 0))
                  ELSE 0.0 END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS jaccard
FROM __spine s LEFT JOIN __shared h
  ON s.source_a = h.source_a AND s.source_b = h.source_b
ORDER BY s.source_a, s.source_b
"""


def heaps_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_checkpoints: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """(checkpoint, docs_le, cum_tokens, cum_distinct, heaps_beta,
    heaps_log_k, heaps_r2): vocabulary-GROWTH audit — Heaps' law
    (V = K * N^beta, natural text beta ~ 0.4-0.6) measured at
    ``n_checkpoints`` equal-width id checkpoints, with the log-log OLS
    fit repeated on every row. The companion of `zipf_report`: Zipf
    checks the frequency DISTRIBUTION, this checks whether vocabulary
    keeps growing with corpus size — templated/synthetic text saturates
    (beta -> 0) and duplicated corpora grow too slowly, both invisible
    to per-document quality scores.

    Plan: token first-occurrence = one (token -> min id) hash agg; the
    cumulative curves are checkpoint-conditional sums over that
    vocabulary-sized frame and the per-doc token counts — no running
    window over the corpus, no iteration; the OLS is closed-form over
    n_checkpoints rows (the zipf_report discipline)."""
    if n_checkpoints < 3:
        raise ValueError(f"need >= 3 checkpoints, got {n_checkpoints}")
    base = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("token")
    ).where(F.col("token") != "")
    bounds = df.agg(
        F.min(F.col(id_col)).alias("__lo"), F.max(F.col(id_col)).alias("__hi")
    )
    # checkpoint c (1-based) covers ids <= lo + c * (hi - lo + 1) / n - 1
    cps = (
        bounds.select(
            F.explode(F.sequence(F.lit(1), F.lit(int(n_checkpoints)))).alias(
                "checkpoint"
            ),
            "__lo",
            "__hi",
        )
        .select(
            "checkpoint",
            (
                F.col("__lo")
                + F.floor(
                    F.col("checkpoint")
                    * (F.col("__hi") - F.col("__lo") + 1)
                    / n_checkpoints
                )
                - 1
            ).cast("long").alias("__cut"),
        )
    )
    # one corpus tokenize feeds BOTH derived frames through a
    # (doc, token, count) hub — first-occurrence is min-of-mins and the
    # per-doc token count is the sum of per-(doc,token) counts, so both
    # regroupings are integer-exact. Without the cut each frame re-ran
    # the tokenize+explode over the corpus (guide §3.3); the hub is
    # docs × distinct-tokens-per-doc, far smaller than the token stream.
    hub = hub_checkpoint(
        base.groupBy("id", "token").agg(
            F.count(F.lit(1)).cast("long").alias("__c")
        ),
        df,
    )
    first_seen = hub.groupBy("token").agg(F.min("id").alias("__first"))
    doc_tokens = hub.groupBy("id").agg(F.sum("__c").cast("long").alias("__nt"))
    curves = (
        cps.join(
            F.broadcast(
                doc_tokens.crossJoin(F.broadcast(cps.select("checkpoint", "__cut")))
                .where(F.col("id") <= F.col("__cut"))
                .groupBy(F.col("checkpoint").alias("__cp1"))
                .agg(F.sum("__nt").cast("long").alias("cum_tokens"))
            ),
            F.col("checkpoint") == F.col("__cp1"),
        )
        .join(
            F.broadcast(
                first_seen.crossJoin(F.broadcast(cps.select("checkpoint", "__cut")))
                .where(F.col("__first") <= F.col("__cut"))
                .groupBy(F.col("checkpoint").alias("__cp2"))
                .agg(F.count(F.lit(1)).cast("long").alias("cum_distinct"))
            ),
            F.col("checkpoint") == F.col("__cp2"),
        )
        .join(
            F.broadcast(
                df.crossJoin(F.broadcast(cps.select("checkpoint", "__cut")))
                .where(F.col(id_col) <= F.col("__cut"))
                .groupBy(F.col("checkpoint").alias("__cp3"))
                .agg(F.count(F.lit(1)).cast("long").alias("docs_le"))
            ),
            F.col("checkpoint") == F.col("__cp3"),
        )
        .select("checkpoint", "docs_le", "cum_tokens", "cum_distinct")
    )
    # n_checkpoints rows feed TWO consumers (the OLS fit and the report
    # body); materialize so the curve construction — three checkpoint-
    # conditional aggregations — runs once, not twice (size-gated:
    # at a small source the re-run is cheaper than the checkpoint job)
    curves = hub_checkpoint(curves, df)
    pts = curves.select(
        "checkpoint", "docs_le", "cum_tokens", "cum_distinct",
        F.log(F.col("cum_tokens").cast("double")).alias("__x"),
        F.log(F.col("cum_distinct").cast("double")).alias("__y"),
    )
    fit = pts.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    # zero-variance guards: constant cum_distinct (fully saturated
    # vocabulary) zeroes the y-variance -> slope is exactly 0 and r2 is
    # undefined (NULL); constant x cannot happen for a non-empty corpus
    # but gets the same guard for ANSI-division safety
    varx = F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vary = F.col("__n") * F.col("__syy") - F.col("__sy") * F.col("__sy")
    cov = F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    fit = fit.select(
        F.round(
            F.when(varx != 0, cov / varx).otherwise(F.lit(None)), round_to
        ).alias("heaps_beta"),
        F.round(
            F.when(
                varx != 0,
                (F.col("__sy") - (cov / varx) * F.col("__sx")) / F.col("__n"),
            ).otherwise(F.lit(None)),
            round_to,
        ).alias("heaps_log_k"),
        F.round(
            F.when(
                (varx != 0) & (vary != 0), cov * cov / (varx * vary)
            ).otherwise(F.lit(None)),
            round_to,
        ).alias("heaps_r2"),
    )
    return pts.select(
        "checkpoint", "docs_le", "cum_tokens", "cum_distinct"
    ).crossJoin(F.broadcast(fit)).orderBy("checkpoint")


def heaps_report_sql(
    table: str,
    id_col: str,
    text_col: str,
    n_checkpoints: int = 10,
    round_to: int = 6,
) -> str:
    if n_checkpoints < 3:
        raise ValueError(f"need >= 3 checkpoints, got {n_checkpoints}")
    t = tokens_sql(text_col)
    return f"""
WITH __base AS (
  SELECT {id_col} AS id, token
  FROM {table}, UNNEST({t}) AS __t(token)
  WHERE token <> ''
),
__bounds AS (
  SELECT MIN({id_col}) AS lo, MAX({id_col}) AS hi FROM {table}
),
__cps AS (
  SELECT c AS checkpoint,
         CAST(lo + floor(c * (hi - lo + 1) / {n_checkpoints}) - 1 AS BIGINT)
           AS cut
  FROM __bounds, UNNEST(generate_series(1, {n_checkpoints})) AS __c(c)
),
__first AS (SELECT token, MIN(id) AS first_id FROM __base GROUP BY token),
__doc_tokens AS (
  SELECT id, COUNT(*)::BIGINT AS nt FROM __base GROUP BY id
),
__curves AS (
  SELECT c.checkpoint,
         (SELECT COUNT(*)::BIGINT FROM {table} WHERE {id_col} <= c.cut)
           AS docs_le,
         (SELECT COALESCE(SUM(nt), 0)::BIGINT FROM __doc_tokens
          WHERE id <= c.cut) AS cum_tokens,
         (SELECT COUNT(*)::BIGINT FROM __first WHERE first_id <= c.cut)
           AS cum_distinct
  FROM __cps c
),
__pts AS (
  SELECT *, ln(CAST(cum_tokens AS DOUBLE)) AS x,
         ln(CAST(cum_distinct AS DOUBLE)) AS y
  FROM __curves
),
__fit AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM __pts
)
SELECT p.checkpoint, p.docs_le, p.cum_tokens, p.cum_distinct,
       CAST(CAST(CAST(CAST((CASE WHEN f.n * f.sxx - f.sx * f.sx <> 0
                  THEN (f.n * f.sxy - f.sx * f.sy)
                       / (f.n * f.sxx - f.sx * f.sx) END) * CAST(ABS(CASE WHEN f.n * f.sxx - f.sx * f.sx <> 0
                  THEN (f.n * f.sxy - f.sx * f.sy)
                       / (f.n * f.sxx - f.sx * f.sx) END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS heaps_beta,
       CAST(CAST(CAST(CAST((CASE WHEN f.n * f.sxx - f.sx * f.sx <> 0
                  THEN (f.sy - ((f.n * f.sxy - f.sx * f.sy)
                                / (f.n * f.sxx - f.sx * f.sx)) * f.sx) / f.n
                  END) * CAST(ABS(CASE WHEN f.n * f.sxx - f.sx * f.sx <> 0
                  THEN (f.sy - ((f.n * f.sxy - f.sx * f.sy)
                                / (f.n * f.sxx - f.sx * f.sx)) * f.sx) / f.n
                  END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS heaps_log_k,
       CAST(CAST(CAST(CAST((CASE WHEN (f.n * f.sxx - f.sx * f.sx) <> 0
                   AND (f.n * f.syy - f.sy * f.sy) <> 0
                  THEN (f.n * f.sxy - f.sx * f.sy) * (f.n * f.sxy - f.sx * f.sy)
                       / ((f.n * f.sxx - f.sx * f.sx)
                          * (f.n * f.syy - f.sy * f.sy)) END) * CAST(ABS(CASE WHEN (f.n * f.sxx - f.sx * f.sx) <> 0
                   AND (f.n * f.syy - f.sy * f.sy) <> 0
                  THEN (f.n * f.sxy - f.sx * f.sy) * (f.n * f.sxy - f.sx * f.sy)
                       / ((f.n * f.sxx - f.sx * f.sx)
                          * (f.n * f.syy - f.sy * f.sy)) END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS heaps_r2
FROM __pts p CROSS JOIN __fit f
ORDER BY p.checkpoint
"""


# --- PMI collocations -------------------------------------------------------


def pmi_collocations(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 3,
    top_n: int = 40,
    round_to: int = 6,
) -> DataFrame:
    """Top bigram collocations by pointwise mutual information:
    ``PMI(x,y) = ln( p(x,y) / (p(x) p(y)) )`` with the pair probability
    over the bigram total B and unigram probabilities over the token
    total T — the standard collocation / multi-word-expression signal
    (Church & Hanks, CL 1990), and the statistic a tokenizer-merge or
    phrase-mining pass ranks candidates by.

    Output: ``(w1, w2, n_pair, n_left, n_right, pmi)``, pairs with
    ``n_pair >= min_count``, top ``top_n`` by (pmi DESC, w1, w2) — a
    total order, so the cut is deterministic in both engines.

    Scale shape: bigrams come from an in-array zip (codegen, no
    self-join); one (w1,w2) hash agg + one token agg; the two unigram
    joins are vocabulary-sized (broadcast under threshold); T and B ride
    a 1-row broadcast. PMI is a single ``ln`` of an all-integer ratio
    with identical parenthesization in both dialects — no accumulation
    anywhere."""
    toks = tokens(text_col)
    tok = df.select(F.explode(toks).alias("token")).where(F.col("token") != "")
    # the unigram table feeds THREE consumers (the token total and both
    # join sides) and the bigram table TWO (pair total + join base);
    # materialize each once — vocabulary-sized, not corpus-sized — so
    # the corpus tokenize+explode runs twice, not five times (guide §3.3;
    # size-gated: at a small source the extra checkpoint jobs cost more
    # than the re-derived lineages — measured 1.22 vs 1.46 s at sf0.1)
    uni = hub_checkpoint(
        tok.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("__c")),
        df,
    )
    tot = uni.agg(F.sum("__c").cast("long").alias("__T"))
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    big = hub_checkpoint(
        df.where(n >= 2)
        .select(F.explode(pairs).alias("__p"))
        .select(F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))
        .where((F.col("w1") != "") & (F.col("w2") != ""))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair")),
        df,
    )
    btot = big.agg(F.sum("n_pair").cast("long").alias("__B"))
    u1 = uni.select(F.col("token").alias("w1"), F.col("__c").alias("n_left"))
    u2 = uni.select(F.col("token").alias("w2"), F.col("__c").alias("n_right"))
    pmi = F.round(
        F.log(
            (F.col("n_pair").cast("double") * F.col("__T") * F.col("__T"))
            / (
                (F.col("__B").cast("double") * F.col("n_left"))
                * F.col("n_right")
            )
        ),
        int(round_to),
    )
    return (
        big.where(F.col("n_pair") >= int(min_count))
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .select("w1", "w2", "n_pair", "n_left", "n_right", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(int(top_n))
    )


def pmi_collocations_sql(
    table: str,
    id_col: str,
    text_col: str,
    min_count: int = 3,
    top_n: int = 40,
    round_to: int = 6,
) -> str:
    return f"""
WITH __t AS (
  SELECT {tokens_sql(text_col)} AS toks FROM {table}
), __tok AS (
  SELECT unnest(toks) AS token FROM __t
), __ne AS (SELECT token FROM __tok WHERE token <> ''),
__uni AS (
  SELECT token, COUNT(*)::BIGINT AS c FROM __ne GROUP BY token
),
__tot AS (SELECT CAST(SUM(c) AS BIGINT) AS T FROM __uni),
__bg AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM __t)
  WHERE toks[i] <> '' AND toks[i + 1] <> ''
),
__pair AS (
  SELECT w1, w2, COUNT(*)::BIGINT AS n_pair FROM __bg GROUP BY w1, w2
),
__btot AS (SELECT CAST(SUM(n_pair) AS BIGINT) AS B FROM __pair)
SELECT p.w1, p.w2, p.n_pair, u1.c AS n_left, u2.c AS n_right,
       CAST(CAST(CAST(CAST((ln((CAST(p.n_pair AS DOUBLE) * t.T * t.T)
                / ((CAST(b.B AS DOUBLE) * u1.c) * u2.c))) * CAST(ABS(ln((CAST(p.n_pair AS DOUBLE) * t.T * t.T)
                / ((CAST(b.B AS DOUBLE) * u1.c) * u2.c))) >= POWER(10.0, -({int(round_to)}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{int(round_to)})) AS VARCHAR) AS DOUBLE) AS pmi
FROM __pair p
JOIN __uni u1 ON p.w1 = u1.token
JOIN __uni u2 ON p.w2 = u2.token
CROSS JOIN __tot t CROSS JOIN __btot b
WHERE p.n_pair >= {int(min_count)}
ORDER BY pmi DESC, p.w1, p.w2
LIMIT {int(top_n)}
"""


def oov_report(
    df: DataFrame,
    source_col: str,
    id_col: str,
    text_col: str,
    top_n: int = 1000,
) -> DataFrame:
    """Per-source out-of-vocabulary audit against the corpus' top-N
    vocabulary: ``(source, total_tokens, oov_tokens, oov_token_share,
    n_types, oov_types, oov_type_share)`` ordered by source.

    The tokenizer-coverage pre-flight: a fixed vocabulary (or BPE merge
    table) trained on the corpus head covers each source unevenly — a
    source with high OOV occurrence share will fragment into many
    subword pieces (inflating its effective token cost) or map to UNK.
    Token-occurrence share and type share answer different questions
    (frequent-token coverage vs long-tail breadth), so both are
    reported. Vocabulary cut is deterministic: term_freq desc, token
    asc — the LIMIT boundary is never ambiguous (the zipf_report
    convention).

    Scale posture (100 TB): one explode pass collapses to (source,
    token) counts — vocabulary-sized per source, NOT corpus-sized; the
    top-N vocabulary is a TakeOrdered cut broadcast back; shares are
    single IEEE divisions of exact integer sums.
    """
    occ = df.select(
        F.col(source_col).alias("source"),
        F.explode(tokens(text_col)).alias("token"),
    ).where(F.col("token") != "")
    st = occ.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    # the ONE explode pass; the vocabulary cut and the flag join both
    # consume this (source, token) frame — pin it or the corpus explode
    # runs twice
    st = st.localCheckpoint()
    vocab = (
        st.groupBy("token")
        .agg(F.sum("__c").cast("long").alias("__tf"))
        .orderBy(F.desc("__tf"), "token")
        .limit(top_n)
        .select("token", F.lit(1).alias("__in"))
    )
    flagged = st.join(F.broadcast(vocab), "token", "left")
    agg = flagged.groupBy("source").agg(
        F.sum("__c").cast("long").alias("total_tokens"),
        F.sum(F.when(F.col("__in").isNull(), F.col("__c")).otherwise(0))
        .cast("long")
        .alias("oov_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("oov_types"),
    )
    return agg.select(
        "source",
        "total_tokens",
        "oov_tokens",
        (
            F.col("oov_tokens").cast("double")
            / F.col("total_tokens").cast("double")
        ).alias("oov_token_share"),
        "n_types",
        "oov_types",
        (
            F.col("oov_types").cast("double") / F.col("n_types").cast("double")
        ).alias("oov_type_share"),
    ).orderBy("source")


def oov_report_sql(
    table: str,
    source_col: str,
    id_col: str,
    text_col: str,
    top_n: int = 1000,
) -> str:
    return f"""
WITH __occ AS (
  SELECT {source_col} AS source, unnest({tokens_sql(text_col)}) AS token
  FROM {table}
),
__st AS (
  SELECT source, token, COUNT(*)::BIGINT AS c
  FROM __occ WHERE token <> '' GROUP BY source, token
),
__vocab AS (
  SELECT token FROM (
    SELECT token, SUM(c)::BIGINT AS tf FROM __st GROUP BY token
  ) ORDER BY tf DESC, token ASC LIMIT {int(top_n)}
),
__f AS (
  SELECT s.source, s.token, s.c,
         CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov
  FROM __st s LEFT JOIN __vocab v ON s.token = v.token
),
__a AS (
  SELECT source,
         SUM(c)::BIGINT AS total_tokens,
         SUM(CASE WHEN oov = 1 THEN c ELSE 0 END)::BIGINT AS oov_tokens,
         COUNT(*)::BIGINT AS n_types,
         SUM(oov)::BIGINT AS oov_types
  FROM __f GROUP BY source
)
SELECT source, total_tokens, oov_tokens,
       CAST(oov_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)
         AS oov_token_share,
       n_types, oov_types,
       CAST(oov_types AS DOUBLE) / CAST(n_types AS DOUBLE) AS oov_type_share
FROM __a
ORDER BY source
"""


def _bigram_pairs(df: DataFrame, text_col: str) -> DataFrame:
    """(w1, w2, n_pair): the shared bigram-type frame for the KN count
    table and the discount estimate (one definition — the two consumers
    must never see differently-built pair frames)."""
    toks = tokens(text_col)
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        df.where(n >= 2)
        .select(F.explode(pairs).alias("__p"))
        .select(F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))
        .where((F.col("w1") != "") & (F.col("w2") != ""))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
    )


def _bigram_sql(table: str, text_col: str) -> str:
    """CTE body: ``__big`` with (w1, w2, n_pair) — the SQL twin of
    _bigram_pairs."""
    return f"""__t AS (
  SELECT {tokens_sql(text_col)} AS toks FROM {table}
),
__big AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2,
         CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM __t, UNNEST(range(1, len(toks))) AS u(i)
  WHERE len(toks) >= 2 AND toks[i] <> '' AND toks[i + 1] <> ''
  GROUP BY w1, w2
)"""


def kn_bigram_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 50,
    round_to: int = 9,
) -> DataFrame:
    """(w1, w2, n_pair, right_types_w1, left_types_w2, pcont_w2): the
    Kneser-Ney smoothing ingredients for a bigram LM (Kneser & Ney,
    ICASSP 1995; Chen & Goodman 1999 §2.7) — raw pair counts plus the
    CONTINUATION statistics KN replaces raw unigram backoff with:
    ``right_types(w1) = N1+(w1•)`` (how many distinct words follow w1 —
    the backoff fan-out) and ``left_types(w2) = N1+(•w2)`` (how many
    distinct contexts precede w2), with
    ``pcont(w2) = N1+(•w2) / |bigram types|`` — "Francisco" is frequent
    but only ever follows "San", so its continuation probability is
    tiny; that correction IS Kneser-Ney.  These tables are what an
    n-gram LM training job exports; the scorer is a join away.

    Top ``top_n`` by (n_pair DESC, w1, w2) — a total order.  Scale:
    bigrams from the in-array zip (codegen, no self-join), one pair
    agg; both continuation tables are vocabulary-sized aggregations of
    the TYPE frame (pair-distinct), joined back vocabulary-sized; the
    type total rides a 1-row broadcast.  pcont is one exact-integer
    IEEE division."""
    # the bigram-type frame feeds FOUR consumers (rt, lt, the type
    # total, and the join base); without the cut each re-runs the whole
    # corpus tokenize+explode+pair-agg (exchange reuse never fires
    # across differently-aggregated lineages). The frame itself is
    # vocabulary²-bounded, not corpus-bounded (guide §3.3).
    big = _bigram_pairs(df, text_col).localCheckpoint()
    rt = big.groupBy("w1").agg(
        F.count(F.lit(1)).cast("long").alias("right_types_w1")
    )
    lt = big.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("left_types_w2")
    )
    types = big.agg(F.count(F.lit(1)).cast("long").alias("__ty"))
    return (
        big.join(rt, "w1")
        .join(lt, "w2")
        .crossJoin(F.broadcast(types))
        .select(
            "w1",
            "w2",
            "n_pair",
            "right_types_w1",
            "left_types_w2",
            F.round(
                F.col("left_types_w2").cast("double")
                / F.col("__ty").cast("double"),
                round_to,
            ).alias("pcont_w2"),
        )
        .orderBy(F.desc("n_pair"), "w1", "w2")
        .limit(int(top_n))
    )


def kn_bigram_counts_sql(
    table: str,
    id_col: str,
    text_col: str,
    top_n: int = 50,
    round_to: int = 9,
) -> str:
    return f"""
WITH {_bigram_sql(table, text_col)},
__rt AS (
  SELECT w1, CAST(COUNT(*) AS BIGINT) AS right_types_w1
  FROM __big GROUP BY w1
),
__lt AS (
  SELECT w2, CAST(COUNT(*) AS BIGINT) AS left_types_w2
  FROM __big GROUP BY w2
),
__ty AS (SELECT CAST(COUNT(*) AS BIGINT) AS ty FROM __big)
SELECT b.w1, b.w2, b.n_pair, r.right_types_w1, l.left_types_w2,
       CASE WHEN ABS(CAST(l.left_types_w2 AS DOUBLE) / t.ty) >= 1e16 THEN CAST((CAST(l.left_types_w2 AS DOUBLE) / t.ty) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(l.left_types_w2 AS DOUBLE) / t.ty) * CAST(ABS(CAST(l.left_types_w2 AS DOUBLE) / t.ty) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END
         AS pcont_w2
FROM __big b JOIN __rt r ON b.w1 = r.w1 JOIN __lt l ON b.w2 = l.w2
CROSS JOIN __ty t
ORDER BY b.n_pair DESC, b.w1, b.w2 LIMIT {int(top_n)}
"""


def kn_discount_summary(
    df: DataFrame,
    id_col: str,
    text_col: str,
    round_to: int = 9,
) -> DataFrame:
    """(n_types, n_tokens, n1, n2, discount): the absolute-discount
    estimate ``D = n1 / (n1 + 2·n2)`` from the count-of-counts (Ney,
    Essen & Kneser 1994) over the bigram type table — the one scalar a
    KN LM needs besides the count tables.  One count-of-counts
    aggregation over the pair frame; all integers until the final
    division."""
    big = _bigram_pairs(df, text_col).withColumnRenamed("n_pair", "__c")
    return big.agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("__c").cast("long").alias("n_tokens"),
        F.sum((F.col("__c") == 1).cast("long")).cast("long").alias("n1"),
        F.sum((F.col("__c") == 2).cast("long")).cast("long").alias("n2"),
    ).select(
        "n_types",
        "n_tokens",
        "n1",
        "n2",
        F.round(
            F.try_divide(
                F.col("n1").cast("double"),
                (F.col("n1") + F.lit(2) * F.col("n2")).cast("double"),
            ),
            round_to,
        ).alias("discount"),
    )


def kn_discount_summary_sql(
    table: str,
    id_col: str,
    text_col: str,
    round_to: int = 9,
) -> str:
    return f"""
WITH {_bigram_sql(table, text_col)}
SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(n_pair) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN n_pair = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       CAST(SUM(CASE WHEN n_pair = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       CAST(CAST(CAST(CAST((CAST(SUM(CASE WHEN n_pair = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / NULLIF(SUM(CASE WHEN n_pair = 1 THEN 1 ELSE 0 END)
                      + 2 * SUM(CASE WHEN n_pair = 2 THEN 1 ELSE 0 END), 0)) * CAST(ABS(CAST(SUM(CASE WHEN n_pair = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / NULLIF(SUM(CASE WHEN n_pair = 1 THEN 1 ELSE 0 END)
                      + 2 * SUM(CASE WHEN n_pair = 2 THEN 1 ELSE 0 END), 0)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS discount
FROM __big
"""


def term_burstiness(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 20,
    top_k: int = 40,
) -> DataFrame:
    """Top-``top_k`` burstiest terms: ``(token, doc_freq, term_freq,
    in_doc_mean, fano)`` ordered by fano desc, token asc — Church &
    Gale's observation (JNLE 1995) that content words arrive in BURSTS
    (a document that mentions a term once tends to mention it again)
    while function words arrive ~Poisson. ``fano`` is the index of
    dispersion of the per-document count INCLUDING zero-count documents
    (var/mean; 1 = Poisson, ≫1 = bursty) and ``in_doc_mean`` is
    E[c | c > 0], Church-Gale's burstiness proper.

    The keyword/topicality signal that needs no stopword list: ranking
    by fano surfaces content terms and buries function words even
    though both have huge raw frequencies — the corpus-statistics
    complement to RAKE (keywords.py) and TF-IDF (retrieval.py).

    Engine parity: with N docs, Σc and Σc² over present docs (zeros
    contribute nothing to either), fano = (N·Σc² − (Σc)²)/(N·Σc) is one
    IEEE division over DECIMAL(38,0)-exact integers. Terms below
    ``min_df`` documents are excluded (their dispersion estimate is
    noise). Deterministic LIMIT boundary: fano is a ratio of exact
    integers so ties are exact, broken by token asc.

    Scale posture: one (doc, token) collapse, one vocab-sized
    aggregation, a 1-row N broadcast, TakeOrdered top-k."""
    ex = "decimal(38,0)"
    tok = df.select(
        F.col(id_col).alias("__doc"), F.explode(tokens(text_col)).alias("token")
    ).where(F.col("token") != "")
    per_doc = tok.groupBy("__doc", "token").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    per_term = per_doc.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("doc_freq"),
        F.sum(F.col("__c").cast(ex)).cast(ex).alias("__sc"),
        F.sum(F.col("__c").cast(ex) * F.col("__c").cast(ex))
        .cast(ex)
        .alias("__scc"),
    )
    n_docs = df.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    j = per_term.where(F.col("doc_freq") >= min_df).crossJoin(
        F.broadcast(n_docs)
    )
    fano = F.round(
        F.try_divide(
            F.col("__scc").cast("string").cast("double") * F.col("__n").cast("double")
            - F.col("__sc").cast("string").cast("double")
            * F.col("__sc").cast("string").cast("double"),
            F.col("__sc").cast("string").cast("double") * F.col("__n").cast("double"),
        ),
        9,
    )
    return (
        j.select(
            "token",
            "doc_freq",
            F.col("__sc").cast("long").alias("term_freq"),
            F.round(
                F.col("__sc").cast("string").cast("double")
                / F.col("doc_freq").cast("double"),
                9,
            ).alias("in_doc_mean"),
            fano.alias("fano"),
        )
        .orderBy(F.desc("fano"), F.asc("token"))
        .limit(top_k)
    )


def term_burstiness_sql(
    table: str,
    id_col: str,
    text_col: str,
    min_df: int = 20,
    top_k: int = 40,
) -> str:
    d = "DECIMAL(38,0)"
    d2d = lambda e: f"CAST(CAST({e} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    return f"""
WITH __tok AS (
  SELECT {id_col} AS doc, UNNEST({tokens_sql(text_col)}) AS token
  FROM {table}
),
__pd AS (
  SELECT doc, token, CAST(COUNT(*) AS BIGINT) AS c
  FROM __tok WHERE token <> '' GROUP BY doc, token
),
__pt AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS doc_freq,
         CAST(SUM(CAST(c AS {d})) AS {d}) AS sc,
         CAST(SUM(CAST(c AS {d}) * CAST(c AS {d})) AS {d}) AS scc
  FROM __pd GROUP BY token
),
__n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {table})
SELECT token, doc_freq, CAST(sc AS BIGINT) AS term_freq,
       CAST(CAST(CAST(CAST(({d2d('sc')} / CAST(doc_freq AS DOUBLE)) * CAST(ABS({d2d('sc')} / CAST(doc_freq AS DOUBLE)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) AS in_doc_mean,
       CAST(CAST(CAST(CAST((({d2d('scc')} * CAST(n AS DOUBLE) - {d2d('sc')} * {d2d('sc')})
             / NULLIF({d2d('sc')} * CAST(n AS DOUBLE), 0.0)) * CAST(ABS(({d2d('scc')} * CAST(n AS DOUBLE) - {d2d('sc')} * {d2d('sc')})
             / NULLIF({d2d('sc')} * CAST(n AS DOUBLE), 0.0)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) AS fano
FROM __pt, __n
WHERE doc_freq >= {min_df}
ORDER BY fano DESC, token ASC
LIMIT {top_k}
"""


def kn_doc_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-document interpolated Kneser-Ney bigram cross-entropy:
    ``(id, n_bigrams, kn_cross_entropy)`` ordered by id — the bigram
    upgrade of ``lm_score``'s unigram CCNet signal. With D the
    count-of-counts discount (kn_discount_summary) and the continuation
    statistics of kn_bigram_counts,

        P(w2|w1) = max(c(w1w2)−D, 0)/c(w1·)
                   + (D·N1+(w1·)/c(w1·)) · (N1+(•w2)/types)

    (Chen & Goodman 1999 eq. 12, bigram case) and the score is
    −mean ln P over the document's bigrams. The corpus IS the model
    (self-scoring, the lm_score posture), so every scored bigram exists
    in the tables — no OOV branch. A document needs ≥ 2 tokens to have
    a bigram; shorter ones emit no row.

    Parity: every P is one fixed IEEE expression over exact integers
    plus the shared D double; per-bigram ln P rounds to 9dp and sums in
    DECIMAL (lm_score's order-free convention). Scale: bigrams from the
    in-array zip, vocabulary-sized model tables hash-joined back onto
    the token stream, one doc-keyed aggregation."""
    toks = tokens(text_col)
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    occ = (
        df.where(n >= 2)
        .select(F.col(id_col).alias("__doc"), F.explode(pairs).alias("__p"))
        .select("__doc", F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))
        .where((F.col("w1") != "") & (F.col("w2") != ""))
    )
    # four consumers of the bigram-type frame (ctx, lt, glob, lm's join
    # base) — materialize once instead of four corpus passes (guide §3.3;
    # size-gated: measured 1.67 vs 2.26 s at sf0.1 with the checkpoint)
    big = hub_checkpoint(_bigram_pairs(df, text_col), df)
    ctx = big.groupBy("w1").agg(
        F.sum("n_pair").cast("long").alias("__ctx"),
        F.count(F.lit(1)).cast("long").alias("__rt"),
    )
    lt = big.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("__lt"))
    glob = big.agg(
        F.count(F.lit(1)).cast("long").alias("__ty"),
        F.sum(F.when(F.col("n_pair") == 1, 1).otherwise(0))
        .cast("long")
        .alias("__n1"),
        F.sum(F.when(F.col("n_pair") == 2, 1).otherwise(0))
        .cast("long")
        .alias("__n2"),
    )
    # degenerate count-of-counts (no singleton/doubleton bigram types —
    # a small-vocab corpus at scale hits this): D = 0, i.e. plain MLE,
    # matching the twin's COALESCE; a bare `/` raises under ANSI
    d = F.coalesce(
        F.try_divide(
            F.col("__n1").cast("double"),
            (F.col("__n1") + 2 * F.col("__n2")).cast("double"),
        ),
        F.lit(0.0),
    )
    p = (
        F.greatest(F.col("n_pair").cast("double") - d, F.lit(0.0))
        / F.col("__ctx").cast("double")
        + (d * F.col("__rt").cast("double") / F.col("__ctx").cast("double"))
        * (F.col("__lt").cast("double") / F.col("__ty").cast("double"))
    )
    lm = (
        big.join(ctx, "w1")
        .join(lt, "w2")
        .crossJoin(F.broadcast(glob))
        .select("w1", "w2", F.round(F.log(p), 9).alias("__logp"))
    )
    return (
        occ.join(lm, ["w1", "w2"])
        .groupBy("__doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                -F.sum(F.col("__logp").cast("decimal(38,9)")).cast("double")
                / F.count(F.lit(1)),
                round_to,
            ).alias("kn_cross_entropy"),
        )
        .withColumnRenamed("__doc", "id")
        .orderBy("id")
    )


def kn_doc_score_sql(
    table: str,
    id_col: str,
    text_col: str,
    round_to: int = 6,
) -> str:
    return f"""
WITH {_bigram_sql(table, text_col)},
__occ AS (
  SELECT {id_col} AS doc, toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT {id_col}, {tokens_sql(text_col)} AS toks FROM {table}),
       UNNEST(range(1, len(toks))) AS u(i)
  WHERE len(toks) >= 2 AND toks[i] <> '' AND toks[i + 1] <> ''
),
__ctx AS (
  SELECT w1, CAST(SUM(n_pair) AS BIGINT) AS ctx,
         CAST(COUNT(*) AS BIGINT) AS rt
  FROM __big GROUP BY w1
),
__lt AS (
  SELECT w2, CAST(COUNT(*) AS BIGINT) AS lt FROM __big GROUP BY w2
),
__glob AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS ty,
         CAST(SUM(CASE WHEN n_pair = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN n_pair = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM __big
),
__lm AS (
  SELECT b.w1, b.w2,
         CAST(CAST(CAST(CAST((ln(
           GREATEST(CAST(b.n_pair AS DOUBLE)
                    - COALESCE(CAST(g.n1 AS DOUBLE) / NULLIF(CAST(g.n1 + 2 * g.n2 AS DOUBLE), 0.0), 0.0),
                    0.0)
           / CAST(c.ctx AS DOUBLE)
           + ((COALESCE(CAST(g.n1 AS DOUBLE) / NULLIF(CAST(g.n1 + 2 * g.n2 AS DOUBLE), 0.0), 0.0))
              * CAST(c.rt AS DOUBLE) / CAST(c.ctx AS DOUBLE))
             * (CAST(l.lt AS DOUBLE) / CAST(g.ty AS DOUBLE))
         )) * CAST(ABS(ln(
           GREATEST(CAST(b.n_pair AS DOUBLE)
                    - COALESCE(CAST(g.n1 AS DOUBLE) / NULLIF(CAST(g.n1 + 2 * g.n2 AS DOUBLE), 0.0), 0.0),
                    0.0)
           / CAST(c.ctx AS DOUBLE)
           + ((COALESCE(CAST(g.n1 AS DOUBLE) / NULLIF(CAST(g.n1 + 2 * g.n2 AS DOUBLE), 0.0), 0.0))
              * CAST(c.rt AS DOUBLE) / CAST(c.ctx AS DOUBLE))
             * (CAST(l.lt AS DOUBLE) / CAST(g.ty AS DOUBLE))
         )) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) AS logp
  FROM __big b JOIN __ctx c ON b.w1 = c.w1
  JOIN __lt l ON b.w2 = l.w2
  CROSS JOIN __glob g
)
SELECT o.doc AS id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(CAST(CAST(CAST((-CAST(SUM(CAST(m.logp AS DECIMAL(38,9))) AS DOUBLE)
             / COUNT(*)) * CAST(ABS(-CAST(SUM(CAST(m.logp AS DECIMAL(38,9))) AS DOUBLE)
             / COUNT(*)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS kn_cross_entropy
FROM __occ o JOIN __lm m ON o.w1 = m.w1 AND o.w2 = m.w2
GROUP BY o.doc ORDER BY id
"""


def vocabulary_richness(
    df: DataFrame,
    group_col: str,
    text_col: str,
    round_to: int = 9,
) -> DataFrame:
    """Per-slice lexical-richness report: ``(group, n_tokens, n_types,
    n_hapax, n_dis, hapax_ratio, yule_k, simpson_d)`` ordered by group —
    the length-robust vocabulary-diversity battery (Yule 1944; Simpson
    1949) complementing Zipf (distribution shape) and Heaps (growth):

    * ``hapax_ratio`` = V₁/V — share of once-seen types; collapses on
      templated/looped text, inflates on OCR noise;
    * ``yule_k`` = 10⁴·(Σ tf² − N)/N² — repeat-rate constant,
      approximately length-invariant (the property that makes it
      comparable across slices of very different sizes);
    * ``simpson_d`` = Σ tf(tf−1)/(N(N−1)) — probability two random
      tokens are the same type.

    Engine parity: every sum is an exact integer/DECIMAL(38,0) moment of
    the term-frequency table (tf² overflows int64 past ~3·10⁹
    occurrences of one token — routine for stopwords at 100 TB); one
    IEEE division per statistic. Scale posture: one (group, token) hash
    aggregation (map-side combined — the wordcount shape), then a
    group-sized reduction; no windows, no joins."""
    from bullet_storm_spark.operators.stats_tests import _d2d, _div

    d = "decimal(38,0)"
    tf = (
        df.select(
            F.col(group_col).alias("group"),
            F.explode(tokens(text_col)).alias("__t"),
        )
        .where(F.col("__t") != "")
        .groupBy("group", "__t")
        .agg(F.count(F.lit(1)).cast("long").alias("__tf"))
    )
    agg = tf.groupBy("group").agg(
        F.sum(F.col("__tf").cast(d)).cast(d).alias("__n"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("__tf") == 1, 1).otherwise(0)).cast("long").alias("n_hapax"),
        F.sum(F.when(F.col("__tf") == 2, 1).otherwise(0)).cast("long").alias("n_dis"),
        F.sum((F.col("__tf").cast(d) * F.col("__tf").cast(d)).cast(d))
        .cast(d)
        .alias("__sq"),
    )
    n_d = _d2d(F.col("__n"))
    return agg.select(
        "group",
        F.col("__n").cast("long").alias("n_tokens"),
        "n_types",
        "n_hapax",
        "n_dis",
        F.round(
            _div(F.col("n_hapax").cast("double"), F.col("n_types").cast("double")),
            round_to,
        ).alias("hapax_ratio"),
        F.round(
            F.lit(10_000.0) * _div(_d2d(F.col("__sq") - F.col("__n")), n_d * n_d),
            round_to,
        ).alias("yule_k"),
        F.round(
            _div(
                _d2d(F.col("__sq") - F.col("__n")),
                n_d * (n_d - F.lit(1.0)),
            ),
            round_to,
        ).alias("simpson_d"),
    ).orderBy("group")


def vocabulary_richness_sql(
    table: str,
    group_col: str,
    text_col: str,
    round_to: int = 9,
) -> str:
    from bullet_storm_spark.operators.stats_tests import _d2d_sql

    def qround(e: str) -> str:
        return (
            f"CAST(CAST(CAST(CAST(({e}) * CAST(ABS({e}) >= POWER(10.0, "
            f"-({round_to}+1)) AS INT) AS VARCHAR) AS "
            f"DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE)"
        )

    nd = _d2d_sql("n")
    sqn = _d2d_sql("sq - n")
    return f"""
WITH __tf AS (
  SELECT {group_col} AS grp, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT {group_col}, unnest({tokens_sql(text_col)}) AS token
        FROM {table})
  WHERE token <> '' GROUP BY grp, token
),
__a AS (
  SELECT grp,
         CAST(SUM(CAST(tf AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS n,
         COUNT(*)::BIGINT AS n_types,
         SUM(CASE WHEN tf = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
         SUM(CASE WHEN tf = 2 THEN 1 ELSE 0 END)::BIGINT AS n_dis,
         CAST(SUM(CAST(CAST(tf AS DECIMAL(38,0)) * CAST(tf AS DECIMAL(38,0))
                       AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sq
  FROM __tf GROUP BY grp
)
SELECT grp AS "group", CAST(n AS BIGINT) AS n_tokens, n_types, n_hapax, n_dis,
       {qround("CAST(n_hapax AS DOUBLE) / NULLIF(CAST(n_types AS DOUBLE), 0.0)")}
         AS hapax_ratio,
       {qround(f"10000.0 * (({sqn}) / NULLIF({nd} * {nd}, 0.0))")} AS yule_k,
       {qround(f"({sqn}) / NULLIF({nd} * ({nd} - 1.0), 0.0)")} AS simpson_d
FROM __a ORDER BY "group"
"""


def coverage_curve(
    df: DataFrame,
    id_col: str,
    text_col: str,
    cutoffs: list[int] = (10, 100, 1000, 10000),
    round_to: int = 9,
) -> DataFrame:
    """Vocabulary coverage curve: ``(cutoff, n_types_used, covered_tokens,
    coverage)`` — the share of ALL token occurrences covered by the top
    ``cutoff`` types (by frequency, token-text tie-break). The
    tokenizer-sizing table: "how big must the vocab be to cover 99% of
    the corpus" read directly off the curve, and the drift of that curve
    between crawls is an early tokenizer-mismatch alarm. Cutoffs beyond
    the actual vocabulary report the full vocabulary (coverage 1.0).

    Engine parity: exact integer counts; the rank and the running total
    use the fully tie-broken (count desc, token asc) order so the
    boundary type at each cutoff is identical; DECIMAL(38,0) running
    sums; one IEEE division per row. Scale: one wordcount aggregation,
    a vocabulary-sized rank (the zipf_report support-sized-window
    convention), a cutoff-sized output."""
    from bullet_storm_spark.operators.stats_tests import _d2d, _div

    d = "decimal(38,0)"
    # the wordcount frame feeds the rank window AND the totals;
    # materialize the vocab-sized frame once so the corpus tokenize runs
    # once, not twice (guide §3.3)
    tf = (
        df.select(F.explode(tokens(text_col)).alias("__t"))
        .where(F.col("__t") != "")
        .groupBy("__t")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        .localCheckpoint()
    )
    w = Window.orderBy(F.desc("__c"), F.asc("__t"))
    w_cum = w.rowsBetween(Window.unboundedPreceding, 0)
    ranked = tf.select(
        F.row_number().over(w).cast("long").alias("__r"),
        F.sum(F.col("__c").cast(d)).over(w_cum).cast(d).alias("__cum"),
    )
    totals = tf.agg(
        F.sum(F.col("__c").cast(d)).cast(d).alias("__tot"),
        F.count(F.lit(1)).cast("long").alias("__v"),
    )
    cuts = df.sparkSession.createDataFrame(
        [(int(c),) for c in cutoffs], "cutoff long"
    )
    # the boundary row for each cutoff: rank = min(cutoff, vocab size)
    j = cuts.crossJoin(F.broadcast(totals)).join(
        ranked,
        F.col("__r") == F.least(F.col("cutoff"), F.col("__v")),
    )
    return j.select(
        "cutoff",
        F.col("__r").alias("n_types_used"),
        F.col("__cum").cast("long").alias("covered_tokens"),
        F.round(_div(_d2d(F.col("__cum")), _d2d(F.col("__tot"))), round_to)
        .alias("coverage"),
    ).orderBy("cutoff")


def coverage_curve_sql(
    table: str,
    id_col: str,
    text_col: str,
    cutoffs: list[int] = (10, 100, 1000, 10000),
    round_to: int = 9,
) -> str:
    from bullet_storm_spark.operators.stats_tests import _d2d_sql, _qround_sql

    cuts = ", ".join(f"({int(c)})" for c in cutoffs)
    cov = f"{_d2d_sql('cum')} / {_d2d_sql('tot')}"
    return f"""
WITH __tf AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT unnest({tokens_sql(text_col)}) AS token FROM {table})
  WHERE token <> '' GROUP BY token
),
__r AS (
  SELECT ROW_NUMBER() OVER (ORDER BY c DESC, token ASC)::BIGINT AS r,
         CAST(SUM(CAST(c AS DECIMAL(38,0))) OVER (
             ORDER BY c DESC, token ASC ROWS UNBOUNDED PRECEDING)
           AS DECIMAL(38,0)) AS cum
  FROM __tf
),
__tot AS (
  SELECT CAST(SUM(CAST(c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS tot,
         COUNT(*)::BIGINT AS v
  FROM __tf
)
SELECT CAST(c.cutoff AS BIGINT) AS cutoff, r.r AS n_types_used,
       CAST(r.cum AS BIGINT) AS covered_tokens,
       {_qround_sql(cov, round_to)} AS coverage
FROM (VALUES {cuts}) c(cutoff), __tot t, __r r
WHERE r.r = LEAST(CAST(c.cutoff AS BIGINT), t.v)
ORDER BY cutoff
"""
