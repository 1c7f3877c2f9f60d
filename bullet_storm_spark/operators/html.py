"""HTML -> text extraction — the ingest step before every text pipeline.

Web-crawl corpora arrive as HTML; the first pipeline stage strips markup
to text (trafilatura/jusText slot). This module is the Spark-first
regex-pipeline version of that stage: good enough for boilerplate-free
synthetic/clean markup, and the exact plan shape (pure scan expressions,
one pass, no UDF) a smarter extractor drops into via mapInPandas if the
heuristics ever need a real DOM.

Stages (each a ``regexp_replace`` riding the scan, all in
WholeStageCodegen):

1. drop <script>/<style> ELEMENTS with their content — ``(?is)`` inline
   flags (dotall + case-insensitive) work in both Java regex and RE2;
2. strip comments ``<!-- ... -->`` (non-greedy, dotall);
3. strip every remaining tag ``<[^>]*>`` -> one space (block boundaries
   must not glue words);
4. decode the common entities — ``&amp;`` LAST, else ``&amp;lt;``
   double-decodes to ``<`` (the classic entity-order bug, pinned in
   tests);
5. collapse whitespace runs and trim.

All patterns live in the Java-regex∩RE2 subset (same discipline as
operators/pii.py), so the DuckDB twins run them verbatim.
"""

from __future__ import annotations

from bullet_storm_spark.functions.text import _WS as _TEXT_WS
from pyspark.sql import DataFrame, functions as F

# (pattern, replacement) applied in order — see module docstring
_STRIP_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]*>", " "),
]

# literal entity decodes, &amp; last
_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def _stripped(html_col: str):
    """The full strip+decode+collapse pipeline as ONE Column expression
    (shared by html_to_text and html_report so the report never needs a
    second scan or a join to learn the extracted length)."""
    col = F.col(html_col)
    for pat, repl in _STRIP_STEPS:
        col = F.regexp_replace(col, pat, repl)
    for ent, ch in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(col, _TEXT_WS, " "))


def _stripped_sql(html_col: str) -> str:
    col = html_col
    for pat, repl in _STRIP_STEPS:
        col = f"regexp_replace({col}, '{pat}', '{repl}', 'g')"
    for ent, ch in _ENTITIES:
        lit = ch.replace("'", "''")
        col = f"replace({col}, '{ent}', '{lit}')"
    return f"trim(regexp_replace({col}, '{_TEXT_WS}', ' ', 'g'))"


def html_to_text(df: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """(id, text, n_chars): markup stripped to whitespace-normalized
    text."""
    return (
        df.select(F.col(id_col).alias("id"), _stripped(html_col).alias("text"))
        .withColumn("n_chars", F.length("text").cast("long"))
        .orderBy("id")
    )


def html_to_text_sql(table: str, id_col: str, html_col: str) -> str:
    return f"""
WITH __t AS (SELECT {id_col} AS id, {_stripped_sql(html_col)} AS text
             FROM {table})
SELECT id, text, CAST(length(text) AS BIGINT) AS n_chars
FROM __t ORDER BY id
"""


def html_report(df: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """(id, n_tags, n_links, title, text_ratio): structural accounting of
    the raw markup — link density and text-to-markup ratio are the
    classic boilerplate signals (jusText), and the title feeds dedup/
    metadata. ``text_ratio`` = extracted-text chars / raw chars, rounded;
    ``title`` is the first <title> element's content ('' when absent)."""
    raw = F.col(html_col)
    # one scan: the stripped-text length is a pure expression, so the
    # ratio never needs a join back to html_to_text
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.regexp_count(raw, F.lit(r"<[A-Za-z][^>]*>"))
            .cast("long")
            .alias("n_tags"),
            F.regexp_count(raw, F.lit(r"(?i)<a\s[^>]*href"))
            .cast("long")
            .alias("n_links"),
            F.regexp_extract(raw, r"(?is)<title[^>]*>(.*?)</title>", 1).alias(
                "title"
            ),
            F.length(_stripped(html_col)).cast("long").alias("__n_chars"),
            F.length(raw).cast("long").alias("__raw_len"),
        )
        .select(
            "id",
            "n_tags",
            "n_links",
            "title",
            F.round(
                F.when(
                    F.col("__raw_len") > 0, F.col("__n_chars") / F.col("__raw_len")
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("text_ratio"),
        )
        .orderBy("id")
    )


def html_report_sql(table: str, id_col: str, html_col: str) -> str:
    return f"""
WITH __b AS (
  SELECT {id_col} AS id,
         CAST(len(regexp_extract_all({html_col}, '<[A-Za-z][^>]*>')) AS BIGINT)
           AS n_tags,
         CAST(len(regexp_extract_all({html_col}, '(?i)<a\\s[^>]*href')) AS BIGINT)
           AS n_links,
         COALESCE(regexp_extract({html_col},
                  '(?is)<title[^>]*>(.*?)</title>', 1), '') AS title,
         length({_stripped_sql(html_col)}) AS n_chars,
         length({html_col}) AS raw_len
  FROM {table}
)
SELECT id, n_tags, n_links, title,
       CAST(CAST(CAST(CAST((CASE WHEN raw_len > 0
                  THEN CAST(n_chars AS DOUBLE) / raw_len
                  ELSE 0.0 END) * CAST(ABS(CASE WHEN raw_len > 0
                  THEN CAST(n_chars AS DOUBLE) / raw_len
                  ELSE 0.0 END) >= POWER(10.0, -(6+1)) AS INT) AS VARCHAR) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS text_ratio
FROM __b ORDER BY id
"""
