"""Span-level (sub-document) duplicate removal, dual-compiled.

Whole-document dedup (operators/dedup.py) misses the dominant contamination
mode in web corpora: the same boilerplate span repeated inside otherwise
distinct documents. The standard pipeline treatment (C4 / RefinedWeb style)
removes duplicated spans and keeps the rest of the document.

Here the span unit is a fixed-width token chunk (``chunk_size`` consecutive
whitespace tokens; the last chunk may be short). Corpus-wide, the FIRST
occurrence of each distinct chunk (by ``(id, chunk_idx)`` order) survives;
every later occurrence — in other documents or repeated within one — is
dropped, and each document is reassembled from its surviving chunks in
order. Documents whose every chunk was seen before collapse to ''.

Scale shape (100 TB posture):
* chunking is a per-row expression over a materialized token array (the
  explode multiplies rows by ~n_tokens/chunk_size, not by content size^2);
* the keep/drop decision is ONE window over md5(chunk) — a single shuffle
  on a uniform short key, exactly the exact-dedup plan at chunk granularity;
* reassembly is a groupBy on the doc id — the source's natural key.
Nothing is quadratic and no driver-side state exists, so the plan survives
a 1000-executor scale-up unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from bullet_storm_spark.functions.text import tokens, tokens_sql


def span_chunk_dedup(
    df: DataFrame, id_col: str, text_col: str, chunk_size: int = 20
) -> DataFrame:
    """(id, n_chunks, n_kept, cleaned_text) after corpus-wide removal of
    duplicate token chunks (keep-first by (id, chunk_idx))."""
    c = int(chunk_size)
    spark = df.sparkSession
    base = (
        df.select(F.col(id_col).alias("__id"), tokens(text_col).alias("__toks"))
        # exchange materializes the token arrays (CollapseProject would
        # otherwise re-run the split regex once per chunk) and parallelizes
        # single-file scans
        .repartition(spark.sparkContext.defaultParallelism, F.col("__id"))
        .select(
            "__id",
            "__toks",
            F.ceil(F.size("__toks") / F.lit(c)).cast("bigint").alias("__n_chunks"),
        )
    )
    chunks = F.transform(
        F.sequence(F.lit(0).cast("bigint"), F.col("__n_chunks") - 1),
        lambda i: F.array_join(F.slice(F.col("__toks"), (i * c + 1).cast("int"), c), " "),
    )
    rows = base.select(
        "__id",
        "__n_chunks",
        F.posexplode(chunks).alias("__idx", "__chunk"),
    )
    w = Window.partitionBy(F.md5(F.col("__chunk"))).orderBy("__id", "__idx")
    kept = rows.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1)
    agg = kept.groupBy("__id").agg(
        F.count(F.lit(1)).alias("__n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__idx", "__chunk"))),
                lambda s: s["__chunk"],
            ),
            " ",
        ).alias("__cleaned"),
    )
    return (
        base.select("__id", "__n_chunks")
        .join(agg, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.col("__n_chunks").alias("n_chunks"),
            F.coalesce("__n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("__cleaned", F.lit("")).alias("cleaned_text"),
        )
        .orderBy(id_col)
    )


def span_chunk_dedup_sql(
    table: str, id_col: str, text_col: str, chunk_size: int = 20
) -> str:
    c = int(chunk_size)
    return f"""
WITH __sized AS (
  SELECT {id_col} AS __id, __toks,
         CAST(ceil(len(__toks) / {c}) AS BIGINT) AS __n_chunks
  FROM (SELECT {id_col}, {tokens_sql(text_col)} AS __toks FROM {table})
), __rows AS (
  SELECT __id, __n_chunks, __u.__idx AS __idx, __u.__chunk AS __chunk
  FROM (SELECT __id, __n_chunks,
               unnest(list_transform(range(0, __n_chunks), i ->
                 struct_pack(__idx := i,
                             __chunk := array_to_string(
                               __toks[i*{c}+1 : i*{c}+{c}], ' ')))) AS __u
        FROM __sized)
), __kept AS (
  SELECT __id, __idx, __chunk FROM (
    SELECT __id, __idx, __chunk,
           row_number() OVER (PARTITION BY md5(__chunk)
                              ORDER BY __id, __idx) AS __rn
    FROM __rows)
  WHERE __rn = 1
), __agg AS (
  SELECT __id, COUNT(*) AS __n_kept,
         string_agg(__chunk, ' ' ORDER BY __idx) AS __cleaned
  FROM __kept GROUP BY __id
)
SELECT s.__id AS {id_col}, s.__n_chunks AS n_chunks,
       COALESCE(a.__n_kept, 0) AS n_kept,
       COALESCE(a.__cleaned, '') AS cleaned_text
FROM __sized s LEFT JOIN __agg a USING (__id)
ORDER BY {id_col}
"""


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 64,
    overlap: int = 0,
) -> DataFrame:
    """(id, chunk_idx, n_tokens, chunk_text): every document exploded into
    fixed-width token windows starting every ``chunk_size - overlap``
    tokens — the pretraining/RAG chunking pass. The last window may be
    short; empty documents emit nothing. Chunk count per doc is
    ceil(max(n - overlap, 1) / step) in EXACT integer arithmetic (both
    dialects), so the window layout is engine-independent.

    Scale shape: per-row expression over a materialized token array, rows
    multiply by ~n/step (overlap is a bounded constant factor) — the same
    explode-not-quadratic posture as span_chunk_dedup; no shuffle beyond
    the materializing exchange."""
    c, ov = int(chunk_size), int(overlap)
    if not 0 <= ov < c:
        raise ValueError(f"need 0 <= overlap < chunk_size, got {ov} >= {c}")
    step = c - ov
    spark = df.sparkSession
    base = (
        # empty/whitespace docs emit nothing (tokens('') is [''] in both
        # engines, so the guard is on the trimmed text, not the array)
        df.where(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col).alias("__id"), tokens(text_col).alias("__toks"))
        .repartition(spark.sparkContext.defaultParallelism, F.col("__id"))
        .select("__id", "__toks", F.size("__toks").cast("bigint").alias("__n"))
        .select(
            "__id",
            "__toks",
            "__n",
            (
                (F.greatest(F.col("__n") - ov, F.lit(1)) + (step - 1))
                .cast("bigint") / F.lit(step)
            ).cast("bigint").alias("__n_chunks"),
        )
    )
    chunks = F.transform(
        F.sequence(F.lit(0).cast("bigint"), F.col("__n_chunks") - 1),
        lambda i: F.array_join(
            F.slice(F.col("__toks"), (i * step + 1).cast("int"), c), " "
        ),
    )
    return (
        base.select("__id", "__n", F.posexplode(chunks).alias("__idx", "__chunk"))
        .select(
            F.col("__id").alias(id_col),
            F.col("__idx").cast("int").alias("chunk_idx"),
            F.least(F.lit(c).cast("bigint"), F.col("__n") - F.col("__idx") * step)
            .alias("n_tokens"),
            F.col("__chunk").alias("chunk_text"),
        )
        .orderBy(id_col, "chunk_idx")
    )


def chunk_documents_sql(
    table: str,
    id_col: str,
    text_col: str,
    chunk_size: int = 64,
    overlap: int = 0,
) -> str:
    c, ov = int(chunk_size), int(overlap)
    if not 0 <= ov < c:
        raise ValueError(f"need 0 <= overlap < chunk_size, got {ov} >= {c}")
    step = c - ov
    return f"""
WITH __sized AS (
  SELECT {id_col} AS __id, __toks, CAST(len(__toks) AS BIGINT) AS __n,
         CAST((greatest(len(__toks) - {ov}, 1) + {step - 1}) // {step} AS BIGINT)
           AS __n_chunks
  FROM (SELECT {id_col}, {tokens_sql(text_col)} AS __toks FROM {table}
        WHERE trim({text_col}) <> '')
)
SELECT __id AS {id_col},
       CAST(__u.__idx AS INTEGER) AS chunk_idx,
       least({c}, __n - __u.__idx * {step}) AS n_tokens,
       __u.__chunk AS chunk_text
FROM (
  SELECT __id, __n,
         unnest(list_transform(range(0, __n_chunks), i ->
           struct_pack(__idx := i,
                       __chunk := array_to_string(
                         __toks[i*{step}+1 : i*{step}+{c}], ' ')))) AS __u
  FROM __sized)
ORDER BY {id_col}, chunk_idx
"""
