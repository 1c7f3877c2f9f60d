"""Document-quality gating: Gopher-style rule flags and a unicode-script
profile, dual-compiled (Spark Column builders + DuckDB SQL twins).

``gopher_rules`` applies the published heuristic filter suite from Gopher
(Rae et al., "Scaling Language Models: Methods, Analysis & Insights from
Training Gopher", arXiv 2112.11446, Table A1): word-count bounds, mean
word length bounds, symbol-to-word ratio, fraction of words containing an
alphabetic character, and minimum distinct-stopword presence. Each rule is
emitted as its own measured column + boolean flag so a pipeline can grade
*why* a document failed, not only that it failed — the flags feed the
curation mix (operators/curate.py) and the sampling priors
(operators/sampling.py).

``script_profile`` counts characters per unicode script (Latin, Cyrillic,
Greek, Arabic, CJK) plus the non-ASCII ratio and an argmax dominant
script — the cheap writing-system signal used to route documents to
script-specific tokenizers and to catch mojibake (high non-ASCII with no
dominant script). Ranges use ``\\x{....}`` escapes, the one hex-codepoint
syntax Java regex (Spark) and RE2 (DuckDB) share.

Scale posture (100 TB): every output is a pure per-row column expression
over one scan — no shuffle, no UDF, whole-stage codegen end to end. The
token array is expected MATERIALIZED (behind an exchange) by the caller
for the same CollapseProject reason documented at
functions/text.py:57-65 — an expression-valued token column re-runs the
split regex inside every lambda.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F

from bullet_storm_spark.functions.text import (
    EN_STOPWORDS,
    tokens,
    tokens_sql,
    _NON_ALNUM,
)

# --- Gopher rule suite ------------------------------------------------------

# Thresholds from Gopher Table A1, with the word-count floor lowered to fit
# the synthetic corpus' ~60-word documents (the reference corpus floor is
# 50; both are caller-overridable).
GOPHER_DEFAULTS = dict(
    min_words=30,
    max_words=100_000,
    min_mean_word_len=3.0,
    max_mean_word_len=10.0,
    max_symbol_word_ratio=0.1,
    min_alpha_word_ratio=0.80,
    min_stopword_hits=2,
)


def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    round_to: int = 6,
    **overrides: float,
) -> DataFrame:
    """Per-document Gopher rule measurements + flags + the AND verdict.

    Output: ``(id, n_words, mean_word_len, symbol_word_ratio,
    alpha_word_ratio, n_stopword_kinds, ok_words, ok_word_len, ok_symbols,
    ok_alpha, ok_stopwords, passes)``. All ratios ROUND(x, round_to) so
    the DuckDB twin hash-matches; the flags compare the rounded values,
    so flag and measurement can never disagree in the output.
    """
    p = {**GOPHER_DEFAULTS, **overrides}
    spark = df.sparkSession

    toks = F.col("__toks")
    n_words = F.size(toks).cast("long")
    # integer char total / integer word count -> one double division, then
    # one round: no accumulation-order concern
    char_total = F.aggregate(
        F.transform(toks, F.length), F.lit(0).cast("long"), lambda a, t: a + t
    )
    mean_word_len = F.round(char_total / F.nullif(n_words, F.lit(0)), round_to)
    symbols = F.length(F.regexp_replace(F.col("__text"), _NON_ALNUM, ""))
    symbol_ratio = F.round(symbols / F.nullif(n_words, F.lit(0)), round_to)
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
    alpha_ratio = F.round(alpha_words / F.nullif(n_words, F.lit(0)), round_to)
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    stop_kinds = F.size(F.array_intersect(F.array_distinct(toks), stop_arr)).cast(
        "long"
    )

    measured = (
        # the exchange materializes BOTH the raw text and the token array,
        # so the per-token lambdas below read concrete columns instead of
        # re-inlined regex splits (functions/text.py:57-65)
        df.select(
            F.col(id_col).alias("__id"),
            F.col(text_col).alias("__text"),
            tokens(text_col).alias("__toks"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            F.col("__id"),
            n_words.alias("n_words"),
            mean_word_len.alias("mean_word_len"),
            symbol_ratio.alias("symbol_word_ratio"),
            alpha_ratio.alias("alpha_word_ratio"),
            stop_kinds.alias("n_stopword_kinds"),
        )
    )
    ok_words = (F.col("n_words") >= p["min_words"]) & (
        F.col("n_words") <= p["max_words"]
    )
    ok_wlen = (F.col("mean_word_len") >= p["min_mean_word_len"]) & (
        F.col("mean_word_len") <= p["max_mean_word_len"]
    )
    ok_sym = F.col("symbol_word_ratio") <= p["max_symbol_word_ratio"]
    ok_alpha = F.col("alpha_word_ratio") >= p["min_alpha_word_ratio"]
    ok_stop = F.col("n_stopword_kinds") >= p["min_stopword_hits"]
    return measured.select(
        F.col("__id").alias(id_col),
        "n_words",
        "mean_word_len",
        "symbol_word_ratio",
        "alpha_word_ratio",
        "n_stopword_kinds",
        ok_words.alias("ok_words"),
        ok_wlen.alias("ok_word_len"),
        ok_sym.alias("ok_symbols"),
        ok_alpha.alias("ok_alpha"),
        ok_stop.alias("ok_stopwords"),
        (ok_words & ok_wlen & ok_sym & ok_alpha & ok_stop).alias("passes"),
    ).orderBy(id_col)


def gopher_rules_sql(
    table: str,
    id_col: str,
    text_col: str,
    round_to: int = 6,
    **overrides: float,
) -> str:
    p = {**GOPHER_DEFAULTS, **overrides}
    stop_arr = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"
    # the token array binds ONCE in __t (the split regex would otherwise
    # re-run per use), and each ok_* flag is referenced by lateral alias in
    # `passes` so flag and verdict can never drift apart
    return f"""
WITH __t AS (
  SELECT {id_col} AS __id, {text_col} AS __text,
         {tokens_sql(text_col)} AS __toks
  FROM {table}
), __m AS (
  SELECT __id,
         len(__toks)::BIGINT AS n_words,
         CAST(CAST(CAST(CAST((list_sum(list_transform(__toks, x -> length(x)))
               / NULLIF(len(__toks), 0)::DOUBLE) * CAST(ABS(list_sum(list_transform(__toks, x -> length(x)))
               / NULLIF(len(__toks), 0)::DOUBLE) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS mean_word_len,
         CAST(CAST(CAST(CAST((length(regexp_replace(__text, '{_NON_ALNUM}', '', 'g'))
               / NULLIF(len(__toks), 0)::DOUBLE) * CAST(ABS(length(regexp_replace(__text, '{_NON_ALNUM}', '', 'g'))
               / NULLIF(len(__toks), 0)::DOUBLE) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS symbol_word_ratio,
         CAST(CAST(CAST(CAST((len(list_filter(__toks, x -> regexp_matches(x, '[a-zA-Z]')))
               / NULLIF(len(__toks), 0)::DOUBLE) * CAST(ABS(len(list_filter(__toks, x -> regexp_matches(x, '[a-zA-Z]')))
               / NULLIF(len(__toks), 0)::DOUBLE) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS alpha_word_ratio,
         len(list_intersect(list_distinct(__toks), {stop_arr}))::BIGINT
           AS n_stopword_kinds
  FROM __t
)
SELECT __id AS {id_col}, n_words, mean_word_len, symbol_word_ratio,
       alpha_word_ratio, n_stopword_kinds,
       (n_words >= {p['min_words']} AND n_words <= {p['max_words']}) AS ok_words,
       (mean_word_len >= {p['min_mean_word_len']}
        AND mean_word_len <= {p['max_mean_word_len']}) AS ok_word_len,
       (symbol_word_ratio <= {p['max_symbol_word_ratio']}) AS ok_symbols,
       (alpha_word_ratio >= {p['min_alpha_word_ratio']}) AS ok_alpha,
       (n_stopword_kinds >= {p['min_stopword_hits']}) AS ok_stopwords,
       (ok_words AND ok_word_len AND ok_symbols AND ok_alpha
        AND ok_stopwords) AS passes
FROM __m ORDER BY {id_col}
"""


# --- filter funnel ------------------------------------------------------

# Cascade order is part of the report's contract: marginal kills depend on
# it (a doc failing two rules is charged to the earlier one), solo
# failures do not.
FUNNEL_RULES = ["ok_words", "ok_word_len", "ok_symbols", "ok_alpha", "ok_stopwords"]


def filter_funnel(
    df: DataFrame,
    id_col: str,
    text_col: str,
    round_to: int = 6,
    **overrides: float,
) -> DataFrame:
    """Rule-cascade accounting over the Gopher suite: one row per rule in
    cascade order with ``(stage, rule, n_in, n_killed, n_out,
    solo_failures, marginal_kill_rate)`` — the curation-report table
    (RefinedWeb-style) that shows what each filter removes *marginally*
    (in cascade position, survivors-so-far entering) vs *solo* (docs
    failing the rule regardless of order). NULL flags count as failures,
    matching WHERE-clause drop semantics.

    One partial+final hash aggregation over the corpus into a 1-row wide
    frame, then ``inline`` explodes it to the 5 report rows driver-side of
    the exchange — no collect, no second scan; at 100 TB this is exactly
    one pass."""
    flags = gopher_rules(df, id_col, text_col, round_to, **overrides)
    aggs = [F.count(F.lit(1)).alias("__n")]
    cum = None
    for i, r in enumerate(FUNNEL_RULES, 1):
        c = F.coalesce(F.col(r), F.lit(False))
        cum = c if cum is None else (cum & c)
        aggs.append(F.sum(cum.cast("long")).alias(f"__cum{i}"))
        aggs.append(F.sum((~c).cast("long")).alias(f"__solo{i}"))
    wide = flags.agg(*aggs)
    structs = []
    for i, r in enumerate(FUNNEL_RULES, 1):
        n_in = F.col("__n") if i == 1 else F.col(f"__cum{i - 1}")
        n_out = F.col(f"__cum{i}")
        structs.append(
            F.struct(
                F.lit(i).cast("long").alias("stage"),
                F.lit(r[3:]).alias("rule"),
                n_in.alias("n_in"),
                (n_in - n_out).alias("n_killed"),
                n_out.alias("n_out"),
                F.col(f"__solo{i}").alias("solo_failures"),
                F.round(
                    (n_in - n_out) / F.nullif(n_in, F.lit(0)), round_to
                ).alias("marginal_kill_rate"),
            )
        )
    return wide.select(F.inline(F.array(*structs))).orderBy("stage")


def filter_funnel_sql(
    table: str,
    id_col: str,
    text_col: str,
    round_to: int = 6,
    **overrides: float,
) -> str:
    gopher = gopher_rules_sql(table, id_col, text_col, round_to, **overrides)
    sums, conj = [], []
    for i, r in enumerate(FUNNEL_RULES, 1):
        conj.append(f"COALESCE({r}, FALSE)")
        cum = " AND ".join(conj)
        sums.append(
            f"CAST(SUM(CASE WHEN {cum} THEN 1 ELSE 0 END) AS BIGINT) AS __cum{i}"
        )
        sums.append(
            f"CAST(SUM(CASE WHEN NOT COALESCE({r}, FALSE) THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS __solo{i}"
        )
    rows = []
    for i, r in enumerate(FUNNEL_RULES, 1):
        n_in = "__n" if i == 1 else f"__cum{i - 1}"
        rows.append(
            f"SELECT CAST({i} AS BIGINT) AS stage, '{r[3:]}' AS rule,"
            f" {n_in} AS n_in, {n_in} - __cum{i} AS n_killed,"
            f" __cum{i} AS n_out, __solo{i} AS solo_failures,"
            f" CASE WHEN ABS(({n_in} - __cum{i}) / NULLIF({n_in}, 0)) >= 1e16 THEN CAST((({n_in} - __cum{i}) / NULLIF({n_in}, 0)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((({n_in} - __cum{i}) / NULLIF({n_in}, 0)) * CAST(ABS(({n_in} - __cum{i}) / NULLIF({n_in}, 0)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END"
            f" AS marginal_kill_rate FROM __w"
        )
    body = "\nUNION ALL\n".join(rows)
    return f"""
WITH __g AS ({gopher}),
__w AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS __n,
         {", ".join(sums)}
  FROM __g
)
SELECT * FROM (
{body}
) ORDER BY stage
"""


# --- unigram self-entropy -----------------------------------------------


def token_entropy(
    df: DataFrame, id_col: str, text_col: str, round_to: int = 6
) -> DataFrame:
    """Per-document unigram self-entropy — intra-document token diversity
    (the RedPajama-v2 "unigram entropy" quality signal; Weber et al.
    2411.12372): ``H = -sum_w (c_w/n) ln(c_w/n)`` over the doc's OWN
    token counts, distinct from :func:`vocab.lm_score`'s cross-entropy
    under the corpus model. Low H flags repetitive/templated text even
    when every token is corpus-plausible.

    Output: ``(id, n_tokens, n_distinct, token_entropy, norm_entropy)``
    with ``norm_entropy = H / ln(n_distinct)`` in [0,1], NULL for
    single-token-kind docs (0/0). Docs with no nonempty tokens drop out.

    Parity + scale shape: one (doc, token) hash aggregation (the heavy
    shuffle, partial+final), a doc-partitioned window for the doc total
    (BIGINT-cast — the DuckDB HUGEINT class), per-term
    a 9-dp text-hop round of ``p ln p`` then an order-free DECIMAL(38,9) sum per doc —
    the lm_score parity pattern; the final doc aggregation reuses the
    window's hash partitioning, so there is no third exchange."""
    from pyspark.sql import Window

    tok = df.select(
        F.col(id_col).alias("__doc"), F.explode(tokens(text_col)).alias("token")
    ).where(F.col("token") != "")
    cnt = tok.groupBy("__doc", "token").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    n = F.sum("__c").over(Window.partitionBy("__doc")).cast("long")
    p = F.col("__c") / F.col("__n")
    per = cnt.withColumn("__n", n).select(
        "__doc", "__n", F.round(p * F.log(p), 9).alias("__term")
    )
    h = -F.sum(F.col("__term").cast("decimal(38,9)")).cast("double")
    return (
        per.groupBy("__doc")
        .agg(
            F.max("__n").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            h.alias("__H"),
        )
        .select(
            F.col("__doc").alias(id_col),
            "n_tokens",
            "n_distinct",
            F.round("__H", round_to).alias("token_entropy"),
            F.when(
                F.col("n_distinct") > 1,
                F.round(F.col("__H") / F.log(F.col("n_distinct")), round_to),
            ).alias("norm_entropy"),
        )
        .orderBy(id_col)
    )


def token_entropy_sql(
    table: str, id_col: str, text_col: str, round_to: int = 6
) -> str:
    return f"""
WITH tok AS (
  SELECT {id_col} AS doc, unnest({tokens_sql(text_col)}) AS token FROM {table}
), ne AS (SELECT * FROM tok WHERE token <> ''),
cnt AS (
  SELECT doc, token, COUNT(*)::BIGINT AS c FROM ne GROUP BY doc, token
),
wn AS (
  SELECT doc, c, CAST(SUM(c) OVER (PARTITION BY doc) AS BIGINT) AS n FROM cnt
),
term AS (
  SELECT doc, n, CASE WHEN ABS((c / n) * ln(c / n)) >= 1e16 THEN CAST(((c / n) * ln(c / n)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST(((c / n) * ln(c / n)) * CAST(ABS((c / n) * ln(c / n)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS term FROM wn
)
SELECT doc AS {id_col},
       MAX(n) AS n_tokens,
       COUNT(*)::BIGINT AS n_distinct,
       CASE WHEN ABS(-CAST(SUM(CAST(term AS DECIMAL(38,9))) AS DOUBLE)) >= 1e16 THEN CAST((-CAST(SUM(CAST(term AS DECIMAL(38,9))) AS DOUBLE)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((-CAST(SUM(CAST(term AS DECIMAL(38,9))) AS DOUBLE)) * CAST(ABS(-CAST(SUM(CAST(term AS DECIMAL(38,9))) AS DOUBLE)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS token_entropy,
       CASE WHEN COUNT(*) > 1
            THEN CAST(CAST(CAST(CAST((-CAST(SUM(CAST(term AS DECIMAL(38,9))) AS DOUBLE)
                       / ln(COUNT(*))) * CAST(ABS(-CAST(SUM(CAST(term AS DECIMAL(38,9))) AS DOUBLE)
                       / ln(COUNT(*))) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS norm_entropy
FROM term GROUP BY doc ORDER BY {id_col}
"""


# --- zlib compression-ratio signal ---------------------------------------


def compression_signal(
    df: DataFrame, id_col: str, text_col: str, level: int = 6, round_to: int = 6
) -> DataFrame:
    """Per-document zlib compressibility — the classic boilerplate /
    repetition detector (Gopher's repetition gate ancestor; shipped as a
    quality signal in RedPajama-v2): ``(id, n_bytes, n_zlib_bytes,
    compression_ratio)`` with ratio = raw/compressed UTF-8 bytes, so
    higher = more repetitive/templated. Natural prose lands ~2-3;
    crawl boilerplate and degenerate repetition run far higher.

    DEFLATE is not SQL-expressible, so this is a declared rows-only
    operator (exact pure-Python zlib oracle in tests, same contract as
    BPE): Arrow-batched ``mapInPandas`` — stdlib zlib over one batch of
    strings at a time, no Python round-trip per row, partition-
    preserving, no shuffle at all. At 100 TB it is a pure map stage that
    rides whatever partitioning the scan produced."""
    import zlib

    import pandas as pd

    lvl = int(level)
    rt = int(round_to)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw_n, comp_n, ratio = [], [], []
            for t in pdf["__text"]:
                b = ("" if t is None else t).encode("utf-8")
                c = zlib.compress(b, lvl)
                raw_n.append(len(b))
                comp_n.append(len(c))
                ratio.append(round(len(b) / len(c), rt))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": pd.Series(raw_n, dtype="int64"),
                    "n_zlib_bytes": pd.Series(comp_n, dtype="int64"),
                    "compression_ratio": pd.Series(ratio, dtype="float64"),
                }
            )

    out = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__text")
    ).mapInPandas(
        score,
        "id long, n_bytes long, n_zlib_bytes long, compression_ratio double",
    )
    return out.withColumnRenamed("id", id_col).orderBy(id_col)


# --- unicode script profile -------------------------------------------------

# Script ranges as hex-codepoint classes — the \\x{{..}} escape is the one
# syntax Java regex and RE2 both accept (Java's \\p{{IsLatin}} and RE2's
# \\p{{Latin}} spellings differ, so named script classes can't be shared).
SCRIPT_RANGES: dict[str, str] = {
    "latin": "A-Za-z",
    "cyrillic": r"\x{0400}-\x{04FF}",
    "greek": r"\x{0370}-\x{03FF}",
    "arabic": r"\x{0600}-\x{06FF}",
    "cjk": r"\x{4E00}-\x{9FFF}",
}
SCRIPT_ORDER = list(SCRIPT_RANGES)  # fixed argmax tie-break order
_NON_ASCII = r"[^\x{0000}-\x{007F}]"


def script_profile(
    df: DataFrame, id_col: str, text_col: str, round_to: int = 6
) -> DataFrame:
    """(id, n_latin, n_cyrillic, n_greek, n_arabic, n_cjk, non_ascii_ratio,
    dominant_script) — per-script character counts, the non-ASCII character
    fraction, and the first-max dominant script ('und' when no script char
    occurs at all). Pure row expressions; rides the scan."""
    text = F.col(text_col)
    counts = {
        name: F.regexp_count(text, F.lit(f"[{rng}]")).cast("long")
        for name, rng in SCRIPT_RANGES.items()
    }
    best = counts[SCRIPT_ORDER[0]]
    for name in SCRIPT_ORDER[1:]:
        best = F.greatest(best, counts[name])
    dominant = F.lit("und")
    for name in reversed(SCRIPT_ORDER):
        dominant = F.when(
            (counts[name] > 0) & (counts[name] == best), F.lit(name)
        ).otherwise(dominant)
    non_ascii = F.round(
        F.regexp_count(text, F.lit(_NON_ASCII))
        / F.nullif(F.length(text), F.lit(0)),
        round_to,
    )
    return df.select(
        F.col(id_col),
        *[counts[n].alias(f"n_{n}") for n in SCRIPT_ORDER],
        non_ascii.alias("non_ascii_ratio"),
        dominant.alias("dominant_script"),
    ).orderBy(id_col)


def script_profile_sql(
    table: str, id_col: str, text_col: str, round_to: int = 6
) -> str:
    # counts materialize ONCE in a CTE; `best` and the CASE arms read the
    # aliased columns (the inline form materialized each match list ~35x
    # per row)
    count_defs = ", ".join(
        f"len(regexp_extract_all({text_col}, '[{rng}]'))::BIGINT AS n_{name}"
        for name, rng in SCRIPT_RANGES.items()
    )
    best = f"greatest({', '.join(f'n_{n}' for n in SCRIPT_ORDER)})"
    whens = " ".join(
        f"WHEN n_{n} > 0 AND n_{n} = {best} THEN '{n}'" for n in SCRIPT_ORDER
    )
    cols = ", ".join(f"n_{n}" for n in SCRIPT_ORDER)
    return f"""
WITH __c AS (
  SELECT {id_col}, {count_defs},
         CAST(CAST(CAST(CAST((len(regexp_extract_all({text_col}, '{_NON_ASCII}'))
               / NULLIF(length({text_col}), 0)::DOUBLE) * CAST(ABS(len(regexp_extract_all({text_col}, '{_NON_ASCII}'))
               / NULLIF(length({text_col}), 0)::DOUBLE) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE)
           AS non_ascii_ratio
  FROM {table}
)
SELECT {id_col}, {cols}, non_ascii_ratio,
       (CASE {whens} ELSE 'und' END) AS dominant_script
FROM __c ORDER BY {id_col}
"""


# --- language-tag vs script consistency -----------------------------------

# what script a correctly-tagged document should be dominated by; langs
# outside the map get NULL expectations (consistency is then undefined,
# never a mismatch)
LANG_EXPECTED_SCRIPT: dict[str, str] = {
    "en": "latin", "de": "latin", "es": "latin", "fr": "latin",
    "pt": "latin", "it": "latin",
    "ru": "cyrillic", "el": "greek", "ar": "arabic", "zh": "cjk",
}


def script_lang_matrix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str,
    expected: dict[str, str] | None = None,
) -> DataFrame:
    """Wrong-language-tag detector: the (lang, dominant_script)
    contingency matrix with per-cell expectation and mismatch verdict —
    ``(lang, dominant_script, n_docs, expected_script, is_mismatch)``.
    A 'zh'-tagged document dominated by Latin characters (or vice versa)
    is the classic upstream lang-ID failure a curation run must catch
    before per-language sampling rates are applied.

    ``is_mismatch`` is FALSE for 'und' (no script signal) and for langs
    outside the expectation map (undefined, not wrong). Shape: the
    script profile is a scan expression; one id-keyed join carries the
    lang tag; the matrix aggregates to (langs x scripts) cells."""
    exp = expected if expected is not None else LANG_EXPECTED_SCRIPT
    prof = script_profile(df, id_col, text_col).select(
        id_col, "dominant_script"
    )
    j = df.select(id_col, F.col(lang_col).alias("lang")).join(prof, id_col)
    agg = (
        j.groupBy("lang", "dominant_script")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    exp_col: F.Column = F.lit(None).cast("string")
    for k in sorted(exp, reverse=True):
        exp_col = F.when(F.col("lang") == k, F.lit(exp[k])).otherwise(exp_col)
    mismatch = (
        (F.col("dominant_script") != "und")
        & exp_col.isNotNull()
        & (F.col("dominant_script") != exp_col)
    )
    return agg.select(
        "lang",
        "dominant_script",
        "n_docs",
        exp_col.alias("expected_script"),
        mismatch.alias("is_mismatch"),
    ).orderBy("lang", "dominant_script")


def script_lang_matrix_sql(
    table: str,
    id_col: str,
    text_col: str,
    lang_col: str,
    expected: dict[str, str] | None = None,
) -> str:
    exp = expected if expected is not None else LANG_EXPECTED_SCRIPT
    whens = " ".join(
        f"WHEN lang = '{k}' THEN '{exp[k]}'" for k in sorted(exp)
    )
    prof = script_profile_sql(table, id_col, text_col)
    return f"""
WITH __prof AS ({prof}),
__j AS (
  SELECT t.{lang_col} AS lang, p.dominant_script
  FROM {table} t JOIN __prof p ON t.{id_col} = p.{id_col}
),
__m AS (
  SELECT lang, dominant_script, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM __j GROUP BY lang, dominant_script
)
SELECT lang, dominant_script, n_docs,
       (CASE {whens} ELSE NULL END) AS expected_script,
       (dominant_script <> 'und'
        AND (CASE {whens} ELSE NULL END) IS NOT NULL
        AND dominant_script <> (CASE {whens} ELSE NULL END)) AS is_mismatch
FROM __m ORDER BY lang, dominant_script
"""


def token_fertility(
    df: DataFrame, text_col: str = "text", round_to: int = 6
) -> DataFrame:
    """(script, n_docs, chars, ws_tokens, bpe_tokens, chars_per_bpe,
    bpe_per_ws): tokenizer-fertility profile by dominant script — how
    many characters one BPE-ish token covers, and how many subword
    tokens a whitespace word fragments into, per script family. The
    budget planner's table: CJK at ~1 char/token vs Latin at ~4 means
    the same char volume costs 4x the context window, and a fertility
    shift after a tokenizer change is the regression alarm
    (cf. SentencePiece's character-coverage tuning; fertility metric as
    in Rust et al., ACL 2021 "How Good is Your Tokenizer?").

    Counts ride the scan as regexp expressions (script_profile's
    classifier, functions.text's whitespace + BPE-ish tokenizers);
    integer sums; the two ratios are one correctly-rounded IEEE
    division each (try_divide — empty scripts yield NULL, not NaN).
    One script-keyed aggregation; output ≤ |SCRIPT_ORDER|+1 rows."""
    from bullet_storm_spark.functions.text import bpe_token_count, token_count

    text = F.col(text_col)
    counts = {
        name: F.regexp_count(text, F.lit(f"[{rng}]")).cast("long")
        for name, rng in SCRIPT_RANGES.items()
    }
    best = counts[SCRIPT_ORDER[0]]
    for name in SCRIPT_ORDER[1:]:
        best = F.greatest(best, counts[name])
    dominant = F.lit("und")
    for name in reversed(SCRIPT_ORDER):
        dominant = F.when(
            (counts[name] > 0) & (counts[name] == best), F.lit(name)
        ).otherwise(dominant)
    base = df.select(
        dominant.alias("script"),
        F.length(text).cast("long").alias("__chars"),
        token_count(text_col).cast("long").alias("__ws"),
        bpe_token_count(text_col).cast("long").alias("__bpe"),
    )
    g = base.groupBy("script").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__chars").cast("long").alias("chars"),
        F.sum("__ws").cast("long").alias("ws_tokens"),
        F.sum("__bpe").cast("long").alias("bpe_tokens"),
    )
    return g.select(
        "script",
        "n_docs",
        "chars",
        "ws_tokens",
        "bpe_tokens",
        F.round(
            F.try_divide(
                F.col("chars").cast("double"),
                F.col("bpe_tokens").cast("double"),
            ),
            round_to,
        ).alias("chars_per_bpe"),
        F.round(
            F.try_divide(
                F.col("bpe_tokens").cast("double"),
                F.col("ws_tokens").cast("double"),
            ),
            round_to,
        ).alias("bpe_per_ws"),
    ).orderBy("script")


def token_fertility_sql(
    table: str, text_col: str = "text", round_to: int = 6
) -> str:
    from bullet_storm_spark.functions.text import (
        bpe_token_count_sql,
        token_count_sql,
    )

    count_defs = ", ".join(
        f"len(regexp_extract_all({text_col}, '[{rng}]'))::BIGINT AS n_{name}"
        for name, rng in SCRIPT_RANGES.items()
    )
    best = f"greatest({', '.join(f'n_{n}' for n in SCRIPT_ORDER)})"
    whens = " ".join(
        f"WHEN n_{n} > 0 AND n_{n} = {best} THEN '{n}'" for n in SCRIPT_ORDER
    )
    return f"""
WITH __c AS (
  SELECT {count_defs},
         length({text_col})::BIGINT AS chars,
         {token_count_sql(text_col)}::BIGINT AS ws,
         {bpe_token_count_sql(text_col)}::BIGINT AS bpe
  FROM {table}
),
__s AS (
  SELECT (CASE {whens} ELSE 'und' END) AS script, chars, ws, bpe FROM __c
),
__g AS (
  SELECT script, COUNT(*)::BIGINT AS n_docs, SUM(chars)::BIGINT AS chars,
         SUM(ws)::BIGINT AS ws_tokens, SUM(bpe)::BIGINT AS bpe_tokens
  FROM __s GROUP BY script
)
SELECT script, n_docs, chars, ws_tokens, bpe_tokens,
       CASE WHEN ABS(CAST(chars AS DOUBLE) / NULLIF(CAST(bpe_tokens AS DOUBLE), 0)) >= 1e16 THEN CAST((CAST(chars AS DOUBLE) / NULLIF(CAST(bpe_tokens AS DOUBLE), 0)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(chars AS DOUBLE) / NULLIF(CAST(bpe_tokens AS DOUBLE), 0)) * CAST(ABS(CAST(chars AS DOUBLE) / NULLIF(CAST(bpe_tokens AS DOUBLE), 0)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS chars_per_bpe,
       CASE WHEN ABS(CAST(bpe_tokens AS DOUBLE) / NULLIF(CAST(ws_tokens AS DOUBLE), 0)) >= 1e16 THEN CAST((CAST(bpe_tokens AS DOUBLE) / NULLIF(CAST(ws_tokens AS DOUBLE), 0)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(bpe_tokens AS DOUBLE) / NULLIF(CAST(ws_tokens AS DOUBLE), 0)) * CAST(ABS(CAST(bpe_tokens AS DOUBLE) / NULLIF(CAST(ws_tokens AS DOUBLE), 0)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS bpe_per_ws
FROM __g ORDER BY script
"""


def code_detection(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.03,
    round_to: int = 9,
) -> DataFrame:
    """Per-document code-likeness: ``(id, n_chars, n_braces, n_semis,
    n_eq, indent_lines, n_lines, code_score, is_code)`` ordered by id —
    the "is this prose or source code" router every mixed web corpus
    needs before prose-tuned quality filters throw away working code
    (or code floods a prose mix).

    The signal is pure symbol-density arithmetic — no tokenizer, no
    regex: brace/semicolon/equals counts via the length-difference
    identity (count(ch) = len(t) − len(replace(t, ch, ''))) plus the
    share of lines opening with a 2-space indent. Every count is an
    exact integer in both engines (the length-difference trick avoids
    regex-engine divergence entirely);

        code_score = (braces + semis + eq) / chars
                     + indent_lines / lines

    is one fixed IEEE expression, and ``is_code`` compares it against
    the caller-literal threshold. Empty documents report NULL
    score/flag. One scan, no shuffle beyond the final ORDER BY."""

    def cnt(ch: str):
        lit = F.lit(ch)
        return (
            F.length(F.col("__t"))
            - F.length(F.replace(F.col("__t"), lit, F.lit("")))
        ).cast("long")

    lines = F.split(F.col("__t"), "\n", -1)
    indent = F.size(F.filter(lines, lambda l: l.startswith("  "))).cast("long")
    base = df.select(
        F.col(id_col).alias("id"), F.coalesce(F.col(text_col), F.lit("")).alias("__t")
    )
    feat = base.select(
        "id",
        F.length("__t").cast("long").alias("n_chars"),
        (cnt("{") + cnt("}")).alias("n_braces"),
        cnt(";").alias("n_semis"),
        cnt("=").alias("n_eq"),
        indent.alias("indent_lines"),
        F.size(lines).cast("long").alias("n_lines"),
    )
    # try_divide, not a when()-guarded `/`: codegen subexpression
    # elimination can HOIST the division out of the n_chars > 0 branch
    # (the stats_tests CUPED incident) and double/0 RAISES under ANSI
    score = F.round(
        F.try_divide(
            (F.col("n_braces") + F.col("n_semis") + F.col("n_eq")).cast("double"),
            F.col("n_chars").cast("double"),
        )
        + F.col("indent_lines").cast("double") / F.col("n_lines").cast("double"),
        round_to,
    )
    return feat.select(
        "id",
        "n_chars",
        "n_braces",
        "n_semis",
        "n_eq",
        "indent_lines",
        "n_lines",
        F.when(F.col("n_chars") > 0, score).alias("code_score"),
        F.when(F.col("n_chars") > 0, score >= F.lit(float(threshold))).alias(
            "is_code"
        ),
    ).orderBy("id")


def code_detection_sql(
    table: str,
    id_col: str,
    text_col: str,
    threshold: float = 0.03,
    round_to: int = 9,
) -> str:
    t = f"COALESCE({text_col}, '')"

    def cnt(ch: str) -> str:
        q = ch.replace("'", "''")
        return f"(length({t}) - length(replace({t}, '{q}', '')))::BIGINT"

    score = (
        f"CAST(CAST(CAST(CAST((CAST(n_braces + n_semis + n_eq AS DOUBLE)"
        f" / CAST(n_chars AS DOUBLE)"
        f" + CAST(indent_lines AS DOUBLE) / CAST(n_lines AS DOUBLE)"
        f") * CAST(ABS(CAST(n_braces + n_semis + n_eq AS DOUBLE)"
        f" / CAST(n_chars AS DOUBLE)"
        f" + CAST(indent_lines AS DOUBLE) / CAST(n_lines AS DOUBLE)"
        f") >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE)"
    )
    return f"""
WITH __f AS (
  SELECT {id_col} AS id,
         length({t})::BIGINT AS n_chars,
         ({cnt('{')} + {cnt('}')}) AS n_braces,
         {cnt(';')} AS n_semis,
         {cnt('=')} AS n_eq,
         len(list_filter(string_split({t}, chr(10)),
                         l -> l LIKE '  %'))::BIGINT AS indent_lines,
         len(string_split({t}, chr(10)))::BIGINT AS n_lines
  FROM {table}
)
SELECT id, n_chars, n_braces, n_semis, n_eq, indent_lines, n_lines,
       CASE WHEN n_chars > 0 THEN {score} END AS code_score,
       CASE WHEN n_chars > 0
            THEN {score} >= {float(threshold)!r} END AS is_code
FROM __f ORDER BY id
"""
