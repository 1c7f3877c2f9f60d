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


# ---------------------------------------------------------------------------
# Exact duplicated-substring spans (the ExactSubstr dedup class of
# Lee et al., "Deduplicating Training Data Makes Language Models Better",
# arXiv 2107.06499). The reference implementation builds a corpus-wide
# suffix array on one machine; that does not distribute. The Spark-first
# reformulation below detects the same signal at n-gram granularity: any
# token n-gram that occurs >= 2 times corpus-wide (across documents OR
# repeated within one) marks its token range as duplicated, and per
# document the covered ranges are merged into MAXIMAL spans. A true
# length-L duplicated substring (L >= ngram) is covered by L - ngram + 1
# duplicated n-grams, so the merged spans coincide with the suffix-array
# answer for every duplicate of length >= ngram; shorter duplicates are
# deliberately below the detection floor (the paper uses a 50-token floor
# for the same reason).
# ---------------------------------------------------------------------------


def duplicated_spans(
    df: DataFrame, id_col: str, text_col: str, ngram: int = 8
) -> DataFrame:
    """(id, span_start, span_end, span_len, n_dup_ngrams) — maximal token
    spans covered by corpus-duplicated ``ngram``-grams, per document.
    ``span_start``/``span_end`` are 0-based inclusive token positions.

    Physical shape (100 TB posture):
    * positional n-grams are a per-row explode over the materialized token
      array (~n rows per doc, never quadratic);
    * duplicate detection is ONE window count over md5(ngram) — a single
      shuffle on a uniform short key with no skew (any md5 value repeated
      enough to skew a partition is itself the duplication being measured);
    * span merging is two windows + one groupBy, all partitioned by the
      doc id — the source's natural key, one shuffle reused across all
      three.
    No driver-side state; the plan is the exact-dedup plan at positional
    n-gram granularity.
    """
    n = int(ngram)
    if n < 2:
        raise ValueError(f"need ngram >= 2, got {n}")
    spark = df.sparkSession
    base = (
        df.select(F.col(id_col).alias("__id"), tokens(text_col).alias("__toks"))
        .repartition(spark.sparkContext.defaultParallelism, F.col("__id"))
        .select("__id", "__toks", F.size("__toks").cast("bigint").alias("__n"))
        .where(F.col("__n") >= n)
    )
    grams = base.select(
        "__id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0).cast("bigint"), F.col("__n") - n),
                lambda i: F.md5(
                    F.array_join(F.slice(F.col("__toks"), (i + 1).cast("int"), n), " ")
                ),
            )
        ).alias("__pos", "__h"),
    )
    dup = (
        grams.withColumn(
            "__cnt", F.count(F.lit(1)).over(Window.partitionBy("__h"))
        )
        .where(F.col("__cnt") >= 2)
        .select("__id", F.col("__pos").cast("bigint").alias("__pos"))
    )
    # merge overlapping-or-adjacent covered intervals [pos, pos+n-1] into
    # maximal islands: a row starts a new island iff its start exceeds the
    # running max end of every earlier interval by more than 1
    ordered = Window.partitionBy("__id").orderBy("__pos")
    prev_end = F.max(F.col("__pos") + (n - 1)).over(
        ordered.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = dup.withColumn(
        "__new", F.when(prev_end.isNull() | (F.col("__pos") > prev_end + 1), 1).otherwise(0)
    ).withColumn("__island", F.sum("__new").over(ordered))
    return (
        islands.groupBy("__id", "__island")
        .agg(
            F.min("__pos").alias("span_start"),
            (F.max("__pos") + (n - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_dup_ngrams"),
        )
        .select(
            F.col("__id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
            "n_dup_ngrams",
        )
        .orderBy(id_col, "span_start")
    )


def duplicated_spans_sql(
    table: str, id_col: str, text_col: str, ngram: int = 8
) -> str:
    n = int(ngram)
    if n < 2:
        raise ValueError(f"need ngram >= 2, got {n}")
    return f"""
WITH __sized AS (
  SELECT {id_col} AS __id, __toks, CAST(len(__toks) AS BIGINT) AS __n
  FROM (SELECT {id_col}, {tokens_sql(text_col)} AS __toks FROM {table})
  WHERE len(__toks) >= {n}
), __grams AS (
  SELECT __id, __u.__pos AS __pos, __u.__h AS __h
  FROM (SELECT __id,
               unnest(list_transform(range(0, __n - {n} + 1), i ->
                 struct_pack(__pos := i,
                             __h := md5(array_to_string(
                               __toks[i+1 : i+{n}], ' '))))) AS __u
        FROM __sized)
), __dup AS (
  SELECT __id, CAST(__pos AS BIGINT) AS __pos FROM (
    SELECT __id, __pos, COUNT(*) OVER (PARTITION BY __h) AS __cnt
    FROM __grams)
  WHERE __cnt >= 2
), __islands AS (
  SELECT __id, __pos,
         SUM(__new) OVER (PARTITION BY __id ORDER BY __pos) AS __island
  FROM (
    SELECT __id, __pos,
           CASE WHEN __prev_end IS NULL OR __pos > __prev_end + 1
                THEN 1 ELSE 0 END AS __new
    FROM (
      SELECT __id, __pos,
             MAX(__pos + {n - 1}) OVER (
               PARTITION BY __id ORDER BY __pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS __prev_end
      FROM __dup))
)
SELECT __id AS {id_col},
       MIN(__pos) AS span_start,
       MAX(__pos) + {n - 1} AS span_end,
       MAX(__pos) + {n - 1} - MIN(__pos) + 1 AS span_len,
       COUNT(*) AS n_dup_ngrams
FROM __islands
GROUP BY __id, __island
ORDER BY {id_col}, span_start
"""


def duplicated_span_report(
    df: DataFrame, id_col: str, text_col: str, ngram: int = 8
) -> DataFrame:
    """(id, n_tokens, dup_tokens, n_spans, dup_fraction) — per-document
    roll-up of duplicated_spans() over ALL documents (docs with no
    duplicated span report 0/0/0.0). ``dup_fraction`` is rounded to 6
    decimals so the engines' float division agrees bit-for-bit. This is
    the removal-decision signal: pipelines drop documents above a
    duplicated-fraction threshold or cut the spans themselves."""
    spans = duplicated_spans(df, id_col, text_col, ngram=ngram)
    per_doc = spans.groupBy(id_col).agg(
        F.sum("span_len").alias("__dup_tokens"),
        F.count(F.lit(1)).alias("__n_spans"),
    )
    return (
        df.select(
            F.col(id_col).alias(id_col),
            F.size(tokens(text_col)).cast("bigint").alias("n_tokens"),
        )
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("__dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.coalesce("__n_spans", F.lit(0)).alias("n_spans"),
            F.round(
                F.coalesce("__dup_tokens", F.lit(0)) / F.col("n_tokens"), 6
            ).alias("dup_fraction"),
        )
        .orderBy(id_col)
    )


def duplicated_span_report_sql(
    table: str, id_col: str, text_col: str, ngram: int = 8
) -> str:
    spans = duplicated_spans_sql(table, id_col, text_col, ngram=ngram)
    return f"""
WITH __spans AS ({spans}),
__per_doc AS (
  SELECT {id_col}, SUM(span_len) AS __dup_tokens, COUNT(*) AS __n_spans
  FROM __spans GROUP BY {id_col}
)
SELECT d.{id_col},
       CAST(len({tokens_sql(text_col)}) AS BIGINT) AS n_tokens,
       CAST(COALESCE(p.__dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(COALESCE(p.__n_spans, 0) AS BIGINT) AS n_spans,
       round(COALESCE(p.__dup_tokens, 0) /
             CAST(len({tokens_sql(text_col)}) AS BIGINT), 6) AS dup_fraction
FROM {table} d LEFT JOIN __per_doc p ON d.{id_col} = p.{id_col}
ORDER BY d.{id_col}
"""


def remove_duplicated_spans(
    df: DataFrame, id_col: str, text_col: str, ngram: int = 8
) -> DataFrame:
    """(id, n_tokens, n_removed, cleaned_text): every document with its
    corpus-duplicated spans (duplicated_spans, same ``ngram`` floor) CUT
    OUT and the remainder reassembled in order. Removal drops EVERY
    occurrence of duplicated material — the C4 posture for boilerplate
    (the repeated span is noise wherever it appears); use
    span_chunk_dedup for keep-first semantics at chunk granularity.

    Physical shape: the span table explodes to covered (doc, pos) rows
    (bounded by total covered tokens, never quadratic), one left-anti
    join on (doc, pos) against the positional token table, one doc-keyed
    reassembly groupBy — all three shuffles on the doc id."""
    n = int(ngram)
    spans = duplicated_spans(df, id_col, text_col, ngram=n).select(
        F.col(id_col).alias("__id"), "span_start", "span_end"
    )
    covered = spans.select(
        "__id",
        F.explode(F.sequence(F.col("span_start"), F.col("span_end"))).alias(
            "__pos"
        ),
    )
    toks = df.select(
        F.col(id_col).alias("__id"), tokens(text_col).alias("__toks")
    ).select(
        "__id",
        F.size("__toks").cast("bigint").alias("__n"),
        F.posexplode("__toks").alias("__pos", "__tok"),
    ).select("__id", "__n", F.col("__pos").cast("bigint").alias("__pos"), "__tok")
    kept = toks.join(covered, ["__id", "__pos"], "left_anti")
    agg = kept.groupBy("__id").agg(
        F.first("__n").alias("__n"),
        F.count(F.lit(1)).alias("__kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__tok"))),
                lambda s: s["__tok"],
            ),
            " ",
        ).alias("__cleaned"),
    )
    base = df.select(
        F.col(id_col).alias("__id"),
        F.size(tokens(text_col)).cast("bigint").alias("n_tokens"),
    )
    return (
        base.join(agg.select("__id", "__kept", "__cleaned"), "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("__kept", F.lit(0))).alias("n_removed"),
            F.coalesce("__cleaned", F.lit("")).alias("cleaned_text"),
        )
        .orderBy(id_col)
    )


def remove_duplicated_spans_sql(
    table: str, id_col: str, text_col: str, ngram: int = 8
) -> str:
    n = int(ngram)
    spans = duplicated_spans_sql(table, id_col, text_col, ngram=n)
    return f"""
WITH __spans AS ({spans}),
__covered AS (
  SELECT {id_col} AS id, unnest(range(span_start, span_end + 1)) AS pos
  FROM __spans
),
__toks AS (
  SELECT {id_col} AS id, CAST(len(__t) AS BIGINT) AS n,
         unnest(__t) AS tok,
         CAST(unnest(range(0, len(__t))) AS BIGINT) AS pos
  FROM (SELECT {id_col}, {tokens_sql(text_col)} AS __t FROM {table})
),
__kept AS (
  SELECT t.id, t.n, t.pos, t.tok
  FROM __toks t ANTI JOIN __covered c ON t.id = c.id AND t.pos = c.pos
),
__agg AS (
  SELECT id, COUNT(*) AS kept,
         string_agg(tok, ' ' ORDER BY pos) AS cleaned
  FROM __kept GROUP BY id
)
SELECT b.{id_col}, b.n_tokens,
       b.n_tokens - COALESCE(a.kept, 0) AS n_removed,
       COALESCE(a.cleaned, '') AS cleaned_text
FROM (SELECT {id_col}, CAST(len({tokens_sql(text_col)}) AS BIGINT) AS n_tokens
      FROM {table}) b
LEFT JOIN __agg a ON b.{id_col} = a.id
ORDER BY b.{id_col}
"""


def novelty_scores(
    df: DataFrame, id_col: str, text_col: str, ngram: int = 3
) -> DataFrame:
    """(id, n_ngrams, n_novel, novelty): per document, how much of its
    content appears here FIRST — an n-gram is novel in the document
    holding its first corpus occurrence by (doc_id, position) order.
    ``novelty`` = n_novel / n_ngrams rounded to 6 dp (NULL for docs below
    the n-gram floor). Duplicate-heavy corpora put late copies near 0;
    dataset-ordering pipelines feed high-novelty documents first and use
    the same signal to prune crawl re-fetches.

    Physical shape: positional n-gram explode (~n rows per doc), ONE
    window over md5(ngram) for the keep-first decision (the exact-dedup
    shuffle at n-gram granularity), one doc-keyed count-aggregation."""
    n = int(ngram)
    if n < 1:
        raise ValueError(f"need ngram >= 1, got {n}")
    spark = df.sparkSession
    base = (
        df.select(F.col(id_col).alias("__id"), tokens(text_col).alias("__toks"))
        .repartition(spark.sparkContext.defaultParallelism, F.col("__id"))
        .select("__id", "__toks", F.size("__toks").cast("bigint").alias("__n"))
    )
    grams = base.where(F.col("__n") >= n).select(
        "__id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0).cast("bigint"), F.col("__n") - n),
                lambda i: F.md5(
                    F.array_join(F.slice(F.col("__toks"), (i + 1).cast("int"), n), " ")
                ),
            )
        ).alias("__pos", "__h"),
    )
    w = Window.partitionBy("__h").orderBy("__id", "__pos")
    flagged = grams.withColumn(
        "__first", (F.row_number().over(w) == 1).cast("int")
    )
    per_doc = flagged.groupBy("__id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ngrams"),
        F.sum("__first").cast("long").alias("n_novel"),
    )
    return (
        base.select("__id")
        .join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            F.when(
                F.col("n_ngrams").isNotNull(),
                F.round(F.col("n_novel") / F.col("n_ngrams"), 6),
            ).alias("novelty"),
        )
        .orderBy(id_col)
    )


def novelty_scores_sql(
    table: str, id_col: str, text_col: str, ngram: int = 3
) -> str:
    n = int(ngram)
    if n < 1:
        raise ValueError(f"need ngram >= 1, got {n}")
    return f"""
WITH __sized AS (
  SELECT {id_col} AS __id, __toks, CAST(len(__toks) AS BIGINT) AS __n
  FROM (SELECT {id_col}, {tokens_sql(text_col)} AS __toks FROM {table})
),
__grams AS (
  SELECT __id, __u.__pos AS __pos, __u.__h AS __h
  FROM (SELECT __id,
               unnest(list_transform(range(0, __n - {n} + 1), i ->
                 struct_pack(__pos := i,
                             __h := md5(array_to_string(
                               __toks[i+1 : i+{n}], ' '))))) AS __u
        FROM __sized WHERE __n >= {n})
),
__flagged AS (
  SELECT __id,
         CASE WHEN row_number() OVER (PARTITION BY __h
                                      ORDER BY __id, __pos) = 1
              THEN 1 ELSE 0 END AS __first
  FROM __grams
),
__per_doc AS (
  SELECT __id, COUNT(*)::BIGINT AS n_ngrams, SUM(__first)::BIGINT AS n_novel
  FROM __flagged GROUP BY __id
)
SELECT s.__id AS {id_col},
       COALESCE(p.n_ngrams, 0) AS n_ngrams,
       COALESCE(p.n_novel, 0) AS n_novel,
       CASE WHEN p.n_ngrams IS NOT NULL
            THEN CASE WHEN ABS(p.n_novel / p.n_ngrams) >= 1e16 THEN CAST((p.n_novel / p.n_ngrams) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((p.n_novel / p.n_ngrams) * CAST(ABS(p.n_novel / p.n_ngrams) >= POWER(10.0, -(6+1)) AS INT) AS VARCHAR) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) END END AS novelty
FROM __sized s LEFT JOIN __per_doc p ON s.__id = p.__id
ORDER BY s.__id
"""
