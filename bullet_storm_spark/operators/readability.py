"""Readability scoring (Flesch reading ease / Flesch-Kincaid grade),
dual-compiled.

The classic curation signal for audience-level routing and quality
stratification of a training corpus (Flesch 1948; Kincaid et al. 1975 —
the formulas are public-domain US-government work). Syllables are counted
with a deterministic regex heuristic shared verbatim by both engines:

    vowel groups        ``[aeiouy]+``
    silent trailing e   ``[aeiouy][b-df-hj-np-tv-z]*e\\b``  (subtracted)
    per-doc syllables   ``max(n_words, vowel_groups - silent_e)``

``\\b`` is supported by both Java regex (Spark) and RE2 (DuckDB), and both
engines count non-overlapping matches left-to-right, so the counts are
engine-identical integers (probed; the quality.py shared-regex-syntax
rule). Sentences are ``[.!?]+`` runs, floored at 1.

Engine parity: every input to the formulas is an exact integer; the
formulas themselves are fixed-order IEEE double arithmetic (ratio, scale
by a double literal, subtract), bit-identical across engines, so scores
are emitted UNROUNDED (the stats_tests hazard-class-2 convention: rounding
exact-derived doubles is what INTRODUCES tie divergence). The per-source
rollup quantizes each doc score to DECIMAL(18,6) via the ``_q6`` text hop
and sums in DECIMAL so the aggregate is partition-order independent.

Scale posture (100 TB): the per-doc form is pure per-row expressions over
one scan — no shuffle, no UDF, whole-stage codegen end to end. The rollup
adds exactly one hash aggregation on the source key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bullet_storm_spark.functions.text import _WS, fold_lower, fold_lower_sql, tokens
from bullet_storm_spark.operators.stats_tests import _d2d, _d2d_sql, _div, _q6, _q6_sql

_VOWEL_GROUP = r"[aeiouy]+"
_SILENT_E = r"[aeiouy][b-df-hj-np-tv-z]*e\b"
_SENTENCE = r"[.!?]+"


def _counts(text_col: str):
    t = fold_lower(F.trim(F.col(text_col)))
    words = F.size(tokens(text_col)).cast("long")
    sents = F.greatest(
        F.lit(1).cast("long"), F.regexp_count(t, F.lit(_SENTENCE)).cast("long")
    )
    syl = F.greatest(
        words,
        (
            F.regexp_count(t, F.lit(_VOWEL_GROUP))
            - F.regexp_count(t, F.lit(_SILENT_E))
        ).cast("long"),
    )
    return words, sents, syl


def _scores(words, sents, syl):
    wps = _div(words.cast("double"), sents.cast("double"))
    spw = _div(syl.cast("double"), words.cast("double"))
    flesch = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    fk = F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    return flesch, fk


def readability(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document readability: ``(id, n_words, n_sentences,
    n_syllables, flesch, fk_grade)`` ordered by id. ``flesch`` is the
    Flesch reading-ease score (higher = easier, ~0..100 for normal
    prose); ``fk_grade`` the Flesch-Kincaid US grade level."""
    words, sents, syl = _counts(text_col)
    flesch, fk = _scores(F.col("n_words"), F.col("n_sentences"), F.col("n_syllables"))
    return (
        df.select(
            F.col(id_col).alias(id_col),
            words.alias("n_words"),
            sents.alias("n_sentences"),
            syl.alias("n_syllables"),
        )
        .select(
            id_col,
            "n_words",
            "n_sentences",
            "n_syllables",
            flesch.alias("flesch"),
            fk.alias("fk_grade"),
        )
        .orderBy(id_col)
    )


def readability_sql(table: str, id_col: str, text_col: str) -> str:
    t = fold_lower_sql(f"trim({text_col})")
    return f"""
WITH __w AS (
  SELECT {id_col}, {t} AS __t,
         len(string_split_regex({t}, '{_WS}'))::BIGINT AS n_words
  FROM {table}
),
__c AS (
  SELECT {id_col}, n_words,
         GREATEST(1::BIGINT, len(regexp_extract_all(__t, '{_SENTENCE}'))::BIGINT)
           AS n_sentences,
         GREATEST(n_words, (len(regexp_extract_all(__t, '{_VOWEL_GROUP}'))
           - len(regexp_extract_all(__t, '{_SILENT_E}')))::BIGINT) AS n_syllables
  FROM __w
)
SELECT {id_col}, n_words, n_sentences, n_syllables,
       206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
               - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
         AS flesch,
       0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
         + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
         - 15.59 AS fk_grade
FROM __c
ORDER BY {id_col}
"""


def readability_by_source(
    df: DataFrame, source_col: str, text_col: str
) -> DataFrame:
    """Per-source readability rollup: ``(source, n_docs, avg_flesch,
    avg_fk_grade, pct_college)`` ordered by source. ``pct_college`` is
    the share of documents scoring below Flesch 50 (the
    college-difficulty band) — the corpus-mix knob. Doc scores quantize
    to 6 dp before the DECIMAL sum (partition-order independence)."""
    words, sents, syl = _counts(text_col)
    flesch, fk = _scores(words, sents, syl)
    per = df.select(
        F.col(source_col).alias("source"),
        _q6(flesch).alias("__f6"),
        _q6(fk).alias("__k6"),
    )
    n = F.count(F.lit(1)).cast("long")
    return (
        per.groupBy("source")
        .agg(
            n.alias("n_docs"),
            (
                _div(
                    _d2d(F.sum("__f6").cast("decimal(38,6)")),
                    n.cast("double"),
                )
            ).alias("avg_flesch"),
            (
                _div(
                    _d2d(F.sum("__k6").cast("decimal(38,6)")),
                    n.cast("double"),
                )
            ).alias("avg_fk_grade"),
            _div(
                F.sum(F.when(F.col("__f6") < 50, F.lit(1)).otherwise(F.lit(0)))
                .cast("double"),
                n.cast("double"),
            ).alias("pct_college"),
        )
        .orderBy("source")
    )


def readability_by_source_sql(table: str, source_col: str, text_col: str) -> str:
    t = fold_lower_sql(f"trim({text_col})")
    return f"""
WITH __c AS (
  SELECT {source_col} AS source,
         len(string_split_regex({t}, '{_WS}'))::BIGINT AS n_words,
         GREATEST(1::BIGINT, len(regexp_extract_all({t}, '{_SENTENCE}'))::BIGINT)
           AS n_sentences,
         len(regexp_extract_all({t}, '{_VOWEL_GROUP}'))::BIGINT AS __vg,
         len(regexp_extract_all({t}, '{_SILENT_E}'))::BIGINT AS __se
  FROM {table}
),
__s AS (
  SELECT source, n_words, n_sentences,
         GREATEST(n_words, __vg - __se) AS n_syllables
  FROM __c
),
__q AS (
  SELECT source,
         {_q6_sql("206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)) - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))")} AS f6,
         {_q6_sql("0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)) + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) - 15.59")} AS k6
  FROM __s
)
SELECT source, COUNT(*)::BIGINT AS n_docs,
       {{avg_f}} / CAST(COUNT(*) AS DOUBLE) AS avg_flesch,
       {{avg_k}} / CAST(COUNT(*) AS DOUBLE) AS avg_fk_grade,
       CAST(SUM(CASE WHEN f6 < 50 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS pct_college
FROM __q
GROUP BY source
ORDER BY source
""".replace("{avg_f}", _d2d_sql("CAST(SUM(f6) AS DECIMAL(38,6))")).replace(
        "{avg_k}", _d2d_sql("CAST(SUM(k6) AS DECIMAL(38,6))")
    )
