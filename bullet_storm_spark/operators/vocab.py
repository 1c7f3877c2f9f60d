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

from pyspark.sql import DataFrame, functions as F

from bullet_storm_spark.functions.text import tokens, tokens_sql


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
       ROUND(ln((1 + (SELECT COUNT(*) FROM {table}))::DOUBLE
                / (1 + doc_freq)), {round_to}) AS idf
FROM vocab
ORDER BY term_freq DESC, token
LIMIT {top_n}
"""
