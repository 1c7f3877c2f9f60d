"""Benchmark decontamination: flag training documents that share n-grams
with an evaluation/benchmark set (the GPT-3/C4-style train-test overlap
check; no bullet-storm counterpart — part of the LLM-pipeline extension
surface).

A document is contaminated when the fraction of its distinct n-grams that
also appear anywhere in the benchmark set reaches ``threshold``. Exact set
semantics (no hashing approximation), so the DuckDB twin is bit-identical.

Scale posture (100 TB corpus, small benchmark set — the production shape):
the benchmark's distinct n-grams are aggregated first (tiny: eval suites
are MBs, not TBs) and BROADCAST to the corpus-side n-gram stream, so the
corpus is scanned once, never shuffled on n-grams; the only corpus-keyed
shuffle is the per-document overlap count, whose input the broadcast
semi-join has already thinned to matching n-grams only. Map-side partial
counts bound that exchange at |partitions| x |matched docs| rows. If the
benchmark side ever outgrows broadcast range, drop the broadcast() hint
and the same plan degrades gracefully to a shuffle hash join on the
n-gram key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bullet_storm_spark.functions.text import (
    shingles_from_tokens,
    shingles_sql,
    tokens,
)


def contamination(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bench_df: DataFrame,
    bench_text_col: str,
    shingle_n: int = 8,
    threshold: float = 0.2,
    round_to: int = 6,
) -> DataFrame:
    """Per-document contamination report against a benchmark corpus.

    Output: ``(id_col, total_ngrams, overlap_ngrams, contamination,
    is_contaminated)`` for every document, ordered by id. ``contamination``
    is ``overlap_ngrams / total_ngrams`` (0.0 for documents with no
    n-grams)."""
    # materialize tokens behind an exchange before shingling: a concrete
    # array column is computed once per row, where an expression-valued
    # token array is re-inlined into the per-shingle lambda (quadratic
    # regex work — the SCALING.md MinHash pitfall); the exchange also
    # parallelizes single-file scans (measured 9.2 s -> 1.4 s at sf0.1)
    par = df.sparkSession.sparkContext.defaultParallelism
    doc_tok = df.select(
        F.col(id_col).alias("__doc"), tokens(text_col).alias("__toks")
    ).repartition(par)
    doc_sh = doc_tok.select(
        "__doc",
        F.explode(shingles_from_tokens(F.col("__toks"), shingle_n)).alias("__sh"),
    )
    bench_sh = (
        bench_df.select(tokens(bench_text_col).alias("__btoks"))
        .repartition(par)
        .select(
            F.explode(shingles_from_tokens(F.col("__btoks"), shingle_n)).alias("__sh")
        )
        .distinct()
    )
    overlap = (
        doc_sh.join(F.broadcast(bench_sh), "__sh", "left_semi")
        .groupBy("__doc")
        .agg(F.count("*").cast("long").alias("overlap_ngrams"))
    )
    totals = doc_tok.select(
        F.col("__doc").alias(id_col),
        F.size(shingles_from_tokens(F.col("__toks"), shingle_n))
        .cast("long")
        .alias("total_ngrams"),
    )
    contamination_col = F.when(F.col("total_ngrams") <= 0, F.lit(0.0)).otherwise(
        F.round(
            F.coalesce(F.col("overlap_ngrams"), F.lit(0)).cast("double")
            / F.col("total_ngrams"),
            round_to,
        )
    )
    return (
        totals.join(overlap, F.col(id_col) == F.col("__doc"), "left")
        .select(
            F.col(id_col),
            F.col("total_ngrams"),
            F.coalesce(F.col("overlap_ngrams"), F.lit(0)).cast("long").alias(
                "overlap_ngrams"
            ),
            contamination_col.alias("contamination"),
            (contamination_col >= threshold).alias("is_contaminated"),
        )
        .orderBy(id_col)
    )


def contamination_sql(
    table: str,
    id_col: str,
    text_col: str,
    bench_table: str,
    bench_text_col: str,
    shingle_n: int = 8,
    threshold: float = 0.2,
    round_to: int = 6,
) -> str:
    sh = shingles_sql(text_col, shingle_n)
    bsh = shingles_sql(bench_text_col, shingle_n)
    contam = (
        f"CASE WHEN total_ngrams <= 0 THEN 0.0 "
        f"ELSE ROUND(COALESCE(overlap_ngrams, 0)::DOUBLE / total_ngrams, "
        f"{round_to}) END"
    )
    return f"""
WITH bench_sh AS (
  SELECT DISTINCT unnest({bsh}) AS sh FROM {bench_table}
), doc_sh AS (
  SELECT {id_col} AS doc, unnest({sh}) AS sh FROM {table}
), overlap AS (
  SELECT doc, COUNT(*)::BIGINT AS overlap_ngrams
  FROM doc_sh WHERE sh IN (SELECT sh FROM bench_sh)
  GROUP BY doc
), totals AS (
  SELECT {id_col}, len({sh})::BIGINT AS total_ngrams FROM {table}
)
SELECT t.{id_col},
       t.total_ngrams,
       COALESCE(o.overlap_ngrams, 0)::BIGINT AS overlap_ngrams,
       {contam} AS contamination,
       {contam} >= {threshold} AS is_contaminated
FROM totals t LEFT JOIN overlap o ON t.{id_col} = o.doc
ORDER BY t.{id_col}
"""
