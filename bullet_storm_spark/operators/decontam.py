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
        f"ELSE CAST(CAST(CAST(CAST((COALESCE(overlap_ngrams, 0)::DOUBLE "
        f"/ total_ngrams) * CAST(ABS(COALESCE(overlap_ngrams, 0)::DOUBLE "
        f"/ total_ngrams) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) "
        f"AS VARCHAR) AS DOUBLE) END"
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


def fuzzy_contamination(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bench_df: DataFrame,
    bench_id_col: str,
    bench_text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 1,
    threshold: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Near-duplicate (fuzzy) decontamination: ``(id, max_jaccard,
    contaminated)`` where max_jaccard is the highest exact shingle-set
    Jaccard between the training document and ANY benchmark document that
    collides with it in at least one MinHash band. Catches the rephrased /
    lightly-edited eval leakage that exact n-gram overlap
    (:func:`contamination`) misses once whitespace or a few tokens change.

    Plan shape — the cross-corpus reading of the incremental-dedup probe
    (`dedup.band_index` / `dedup_against_index`): the BENCHMARK side is
    banded and BROADCAST (eval suites are MBs); the corpus bands once and
    probes with one broadcast hash join on (band, band_hash); exact
    Jaccard verifies only colliding pairs; a max-aggregation on the doc id
    and a left join back to the corpus complete it. The 100 TB corpus is
    scanned once (the left join reuses the scan) and shuffled only on its
    own doc id. LSH recall caveats are measurable first via
    `dedup.lsh_recall_audit` at the same (num_hashes, bands)."""
    from bullet_storm_spark.operators.dedup import _jaccard, band_index

    corpus = band_index(df, id_col, text_col, num_hashes, bands, shingle_n)
    bench = band_index(
        bench_df, bench_id_col, bench_text_col, num_hashes, bands, shingle_n
    ).select("band", "band_hash", F.col("shingles").alias("__bsh"))
    jac = F.round(_jaccard(F.col("shingles"), F.col("__bsh")), round_to)
    hits = (
        corpus.join(F.broadcast(bench), ["band", "band_hash"])
        .select(F.col(id_col).alias("__hid"), jac.alias("__jac"))
        .groupBy("__hid")
        .agg(F.max("__jac").alias("__maxjac"))
    )
    return (
        df.select(F.col(id_col))
        .join(hits, F.col(id_col) == F.col("__hid"), "left")
        .select(
            F.col(id_col),
            F.coalesce("__maxjac", F.lit(0.0)).alias("max_jaccard"),
            (F.coalesce("__maxjac", F.lit(0.0)) >= threshold).alias("contaminated"),
        )
        .orderBy(id_col)
    )


def fuzzy_contamination_sql(
    table: str,
    id_col: str,
    text_col: str,
    bench_table: str,
    bench_id_col: str,
    bench_text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 1,
    threshold: float = 0.5,
    round_to: int = 6,
) -> str:
    from bullet_storm_spark.operators.dedup import (
        _hash_pairs_sql,
        _sig_from_pairs_sql,
    )

    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands

    def banded(src_table: str, src_id: str, src_text: str) -> str:
        hp = _hash_pairs_sql(src_text, shingle_n)
        sig = _sig_from_pairs_sql("hp", num_hashes)
        sh = shingles_sql(src_text, shingle_n)
        band_arms = ", ".join(
            f"md5(array_to_string(sig[{b * r + 1}:{b * r + r}], ''))"
            for b in range(bands)
        )
        return f"""
  SELECT id, sh, unnest(range(1, {bands + 1})) AS band,
         unnest([{band_arms}]) AS bh
  FROM (SELECT id, {sig} AS sig, sh
        FROM (SELECT {src_id} AS id, {hp} AS hp, {sh} AS sh FROM {src_table})
        WHERE len(sh) > 0)"""

    jac = (
        "len(list_intersect(c.sh, b.sh))"
        " / (len(c.sh) + len(b.sh) - len(list_intersect(c.sh, b.sh)))::DOUBLE"
    )
    return f"""
WITH __fz_corpus AS ({banded(table, id_col, text_col)}
), __fz_bench AS ({banded(bench_table, bench_id_col, bench_text_col)}
), __fz_hits AS (
  SELECT c.id AS hid, MAX(CASE WHEN ABS({jac}) >= 1e16 THEN CAST(({jac}) AS DOUBLE) ELSE CAST(CAST(CAST(CAST(({jac}) * CAST(ABS({jac}) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END) AS maxjac
  FROM __fz_corpus c JOIN __fz_bench b ON c.band = b.band AND c.bh = b.bh
  GROUP BY c.id
)
SELECT t.{id_col}, COALESCE(h.maxjac, 0.0) AS max_jaccard,
       (COALESCE(h.maxjac, 0.0) >= {threshold}) AS contaminated
FROM {table} t LEFT JOIN __fz_hits h ON t.{id_col} = h.hid
ORDER BY t.{id_col}
"""
