"""RAKE keyword extraction (Rapid Automatic Keyword Extraction),
dual-compiled.

Corpus-level keyphrase mining per Rose et al., "Automatic Keyword
Extraction from Individual Documents" (Text Mining: Applications and
Theory, 2010): candidate phrases are the maximal token runs between
stopwords/punctuation; each word scores ``degree/frequency`` where
``degree`` sums the lengths of the phrases it appears in; a phrase scores
the sum of its member-word scores. Run over a whole corpus it surfaces
the domain's load-bearing multi-word terms — the cheap topic signal used
to audit a source before mixing it into training data.

Phrase extraction is pure regex shared by both engines: punctuation runs
and word-bounded stopwords (the fixed ``EN_STOPWORDS`` marker set) are
rewritten to a ``|`` delimiter, then the text splits on ``|`` and blank
fragments drop. Word scores are integer ``degree/freq`` double divisions
quantized to DECIMAL(18,6) via the ``_q6`` text hop; phrase scores are
exact DECIMAL sums of those quantized member scores (multiplicity
counted), so ranking is partition-order independent and engine-identical.

Scale posture (100 TB): two explode passes over the corpus (phrases,
then words), one vocabulary-sized aggregation for word stats, one
broadcast-sized join of phrase words to word scores, one phrase-keyed
aggregation, then a global top-k (rank-partial, k bounded). No pair
generation anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bullet_storm_spark.functions.text import _WS, fold_lower, fold_lower_sql, EN_STOPWORDS
from bullet_storm_spark.operators.stats_tests import _div, _q6, _q6_sql

_PUNCT = r"[^a-z0-9\s]+"


def _stop_pattern(stopwords: list[str]) -> str:
    return r"\b(" + "|".join(stopwords) + r")\b"


def rake_keywords(
    df: DataFrame,
    text_col: str,
    stopwords: list[str] | None = None,
    k: int = 25,
    min_occur: int = 2,
    max_words: int = 4,
) -> DataFrame:
    """Corpus top-k RAKE keyphrases: ``(phrase, n_words, n_occur,
    score)`` ordered by (score desc, phrase). ``n_occur`` counts phrase
    occurrences corpus-wide; phrases seen fewer than ``min_occur`` times
    are dropped (single-document noise), and candidate runs longer than
    ``max_words`` are discarded BEFORE any scoring (the standard RAKE
    candidate cap — without it, stopword-poor text yields degenerate
    sentence-length "phrases", and the cap is also what bounds the
    explode fan-out and the phrase-key width at scale)."""
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    if max_words < 1:
        raise ValueError(f"need max_words >= 1, got {max_words}")
    stop = list(stopwords) if stopwords is not None else list(EN_STOPWORDS)
    seg = F.regexp_replace(
        F.regexp_replace(fold_lower(F.trim(F.col(text_col))), _PUNCT, "|"),
        _stop_pattern(stop),
        "|",
    )
    phrases = (
        df.select(F.explode(F.split(seg, r"\|")).alias("__raw"))
        .select(F.trim(F.col("__raw")).alias("phrase"))
        .where(
            (F.col("phrase") != "")
            & (F.size(F.split(F.col("phrase"), _WS)) <= max_words)
        )
    )
    words = phrases.select(
        "phrase",
        F.size(F.split(F.col("phrase"), _WS)).alias("__plen"),
        F.explode(F.split(F.col("phrase"), _WS)).alias("word"),
    )
    wscore = (
        words.groupBy("word")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__freq"),
            F.sum("__plen").cast("long").alias("__deg"),
        )
        .select(
            "word",
            _q6(
                _div(F.col("__deg").cast("double"), F.col("__freq").cast("double"))
            ).alias("__w6"),
        )
    )
    # distinct phrases with occurrence counts; member words re-exploded
    # WITH multiplicity so repeated words count twice (RAKE definition)
    pstats = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occur")
    )
    pwords = pstats.select(
        "phrase",
        "n_occur",
        F.explode(F.split(F.col("phrase"), _WS)).alias("word"),
    )
    return (
        pwords.join(wscore, "word")
        .groupBy("phrase", "n_occur")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("__w6").cast("decimal(38,6)").alias("__s"),
        )
        .where(F.col("n_occur") >= min_occur)
        .select(
            "phrase",
            "n_words",
            "n_occur",
            F.col("__s").cast("string").cast("double").alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("phrase"))
        .limit(k)
    )


def rake_keywords_sql(
    table: str,
    text_col: str,
    stopwords: list[str] | None = None,
    k: int = 25,
    min_occur: int = 2,
    max_words: int = 4,
) -> str:
    stop = list(stopwords) if stopwords is not None else list(EN_STOPWORDS)
    pat = _stop_pattern(stop)
    score6 = _q6_sql("CAST(__deg AS DOUBLE) / CAST(__freq AS DOUBLE)")
    return f"""
WITH __ph AS (
  SELECT trim(p) AS phrase
  FROM (
    SELECT unnest(string_split_regex(
      regexp_replace(regexp_replace({fold_lower_sql(f"trim({text_col})")},
                     '{_PUNCT}', '|', 'g'),
      '{pat}', '|', 'g'), '\\|')) AS p
    FROM {table}
  )
  WHERE trim(p) <> ''
    AND len(string_split_regex(trim(p), '{_WS}')) <= {int(max_words)}
),
__pw AS (
  SELECT phrase, len(string_split_regex(phrase, '{_WS}'))::BIGINT AS plen,
         unnest(string_split_regex(phrase, '{_WS}')) AS word
  FROM __ph
),
__ws AS (
  SELECT word, {score6.replace("__deg", "SUM(plen)").replace("__freq", "COUNT(*)")} AS w6
  FROM __pw GROUP BY word
),
__ps AS (
  SELECT phrase, COUNT(*)::BIGINT AS n_occur FROM __ph GROUP BY phrase
),
__pm AS (
  SELECT ps.phrase, ps.n_occur,
         unnest(string_split_regex(ps.phrase, '{_WS}')) AS word
  FROM __ps ps
)
SELECT pm.phrase, COUNT(*)::BIGINT AS n_words, pm.n_occur,
       CAST(CAST(CAST(SUM(ws.w6) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE)
         AS score
FROM __pm pm JOIN __ws ws ON pm.word = ws.word
GROUP BY pm.phrase, pm.n_occur
HAVING pm.n_occur >= {int(min_occur)}
ORDER BY score DESC, pm.phrase ASC
LIMIT {int(k)}
"""
