"""Text-analysis primitives for training-data pipelines, dual-compiled.

Every primitive has a Spark ``Column`` builder and a DuckDB SQL twin built
from the same definition, so each derived query is oracle-checkable. All
Spark forms are built-in expressions (whole-stage codegen, no Python):
tokenization, n-gram shingles, punctuation/stopword ratios, a composite
quality score, n-gram-heuristic language ID, and content fingerprints.

These are the operators Bullet never had but a 100 TB document pipeline
needs (BASELINE.json north star); they compose with the engine's filters
and aggregations like any other expression.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# deterministic, fixed stopword marker sets for the language-ID heuristic.
# Tiny by design: language ID here is a *pipeline operator* contract (schema,
# determinism, SQL parity), not a linguistics model — swap in fastText et al.
# via the same column shape when available.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "im", "ein"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1", "zhe4", "men5"],
}
LANG_ORDER = list(LANG_MARKERS)  # fixed tie-break order

EN_STOPWORDS = LANG_MARKERS["en"]

# THE cross-engine whitespace class: exactly Java's \s set, spelled out
# because RE2 (DuckDB) excludes \x0B from \s while Java (Spark) includes
# it — a vertical tab in crawled text silently forked tokenization
# (probe-caught r10; both engines parse the explicit class identically)
_WS = r"[ \t\n\x0B\f\r]+"
# chars REMOVED to count punctuation; the whitespace set is spelled out
# for the same RE2-vs-Java \s divergence _WS documents (\x0B)
_NON_ALNUM = r"[a-zA-Z0-9 \t\n\x0B\f\r]"


# --- engine-identical case fold (r10) ----------------------------------------
# Spark (UTF8String full casing, current Unicode) and DuckDB (utf8proc)
# disagree on lower() for exactly 72 code points, found by an exhaustive
# sweep of the BMP plus every cased astral block (tests pin the sweep's
# probe set): U+0130 Turkish dotted I (Spark's full fold emits i +
# combining dot; DuckDB emits plain i), U+03A3 capital sigma (Spark
# applies the CONTEXT-SENSITIVE final form; DuckDB always emits U+03C3),
# and 70 newer-Unicode letters (Vithkuqi, Garay, Todhri, old-Polish
# Latin, ...) where the engines carry different mapping versions. The
# fold pre-translates every divergent point to Spark's lowercase form —
# each 1:1 target verified lower()-stable in BOTH engines — so
# tokenization/fingerprints are engine-identical on ANY input, not just
# the ASCII corpus. Sigma note: pre-translating removes Java's final-form
# context sensitivity; this repo's fold is defined as the
# language-independent form (always U+03C3), matching DuckDB.
_CASEFOLD_1TO1 = {
    0x03A3: 0x03C3,
    0x1C89: 0x1C8A,
    0x2C2F: 0x2C5F,
    0xA7C0: 0xA7C1,
    0xA7C7: 0xA7C8,
    0xA7C9: 0xA7CA,
    0xA7CB: 0x0264,
    0xA7CC: 0xA7CD,
    0xA7D0: 0xA7D1,
    0xA7D6: 0xA7D7,
    0xA7D8: 0xA7D9,
    0xA7DA: 0xA7DB,
    0xA7DC: 0x019B,
    0xA7F5: 0xA7F6,
    0x10570: 0x10597,
    0x10571: 0x10598,
    0x10572: 0x10599,
    0x10573: 0x1059A,
    0x10574: 0x1059B,
    0x10575: 0x1059C,
    0x10576: 0x1059D,
    0x10577: 0x1059E,
    0x10578: 0x1059F,
    0x10579: 0x105A0,
    0x1057A: 0x105A1,
    0x1057C: 0x105A3,
    0x1057D: 0x105A4,
    0x1057E: 0x105A5,
    0x1057F: 0x105A6,
    0x10580: 0x105A7,
    0x10581: 0x105A8,
    0x10582: 0x105A9,
    0x10583: 0x105AA,
    0x10584: 0x105AB,
    0x10585: 0x105AC,
    0x10586: 0x105AD,
    0x10587: 0x105AE,
    0x10588: 0x105AF,
    0x10589: 0x105B0,
    0x1058A: 0x105B1,
    0x1058C: 0x105B3,
    0x1058D: 0x105B4,
    0x1058E: 0x105B5,
    0x1058F: 0x105B6,
    0x10590: 0x105B7,
    0x10591: 0x105B8,
    0x10592: 0x105B9,
    0x10594: 0x105BB,
    0x10595: 0x105BC,
    0x10D50: 0x10D70,
    0x10D51: 0x10D71,
    0x10D52: 0x10D72,
    0x10D53: 0x10D73,
    0x10D54: 0x10D74,
    0x10D55: 0x10D75,
    0x10D56: 0x10D76,
    0x10D57: 0x10D77,
    0x10D58: 0x10D78,
    0x10D59: 0x10D79,
    0x10D5A: 0x10D7A,
    0x10D5B: 0x10D7B,
    0x10D5C: 0x10D7C,
    0x10D5D: 0x10D7D,
    0x10D5E: 0x10D7E,
    0x10D5F: 0x10D7F,
    0x10D60: 0x10D80,
    0x10D61: 0x10D81,
    0x10D62: 0x10D82,
    0x10D63: 0x10D83,
    0x10D64: 0x10D84,
    0x10D65: 0x10D85,
}
_CF_SRC = "".join(chr(c) for c in _CASEFOLD_1TO1)
_CF_DST = "".join(chr(c) for c in _CASEFOLD_1TO1.values())


def fold_lower(col: Column) -> Column:
    """lower() with the 72-point divergence table pre-applied — the ONLY
    case fold dual-compiled text operators may use."""
    return F.lower(
        F.translate(F.regexp_replace(col, "\u0130", "i\u0307"), _CF_SRC, _CF_DST)
    )


def fold_lower_sql(e: str) -> str:
    return (
        f"lower(translate(regexp_replace({e}, '\u0130', 'i\u0307', 'g'), "
        f"'{_CF_SRC}', '{_CF_DST}'))"
    )


# --- tokenization -----------------------------------------------------------

def tokens(field: str) -> Column:
    return F.split(fold_lower(F.trim(F.col(field))), _WS)


def tokens_sql(field: str) -> str:
    return f"string_split_regex({fold_lower_sql(f'trim({field})')}, '{_WS}')"


def token_count(field: str) -> Column:
    return F.size(tokens(field))


def token_count_sql(field: str) -> str:
    return f"len({tokens_sql(field)})"


# --- shingles ---------------------------------------------------------------

def shingles_from_tokens(toks: Column, n: int, distinct: bool = True) -> Column:
    """Word n-grams from an existing token-array column.

    Prefer this over shingles() when the token array is already a
    materialized column (e.g. behind an exchange): Catalyst's
    CollapseProject inlines expression-valued tokens into the per-shingle
    lambda, re-running the regex split once per shingle — quadratic work.
    A concrete column reference is computed once per row.
    """
    if n == 1:
        sh = toks
    else:
        count = F.size(toks) - (n - 1)
        sh = F.when(
            count >= 1,
            F.transform(
                F.sequence(F.lit(1), count),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(sh) if distinct else sh


def shingles(field: str, n: int, distinct: bool = True) -> Column:
    """Word n-grams as space-joined strings; n=1 -> unigram token set."""
    return shingles_from_tokens(tokens(field), n, distinct)


def shingles_sql(field: str, n: int, distinct: bool = True) -> str:
    t = tokens_sql(field)
    if n == 1:
        sh = t
    else:
        # DuckDB: range(1, len-n+2) is empty when len < n; slices are
        # 1-based inclusive, so t[i:i+n-1] is the n-token window at i
        sh = (
            f"list_transform(range(1, len({t}) - {n - 2}), "
            f"i -> array_to_string(({t})[i:i+{n - 1}], ' '))"
        )
    return f"list_distinct({sh})" if distinct else sh


# --- quality signals --------------------------------------------------------

def char_count(field: str) -> Column:
    return F.length(F.col(field))


def char_count_sql(field: str) -> str:
    return f"length({field})"


def punct_ratio(field: str) -> Column:
    """Fraction of non-alphanumeric, non-whitespace characters."""
    punct = F.length(F.regexp_replace(F.col(field), _NON_ALNUM, ""))
    return punct / F.nullif(F.length(F.col(field)), F.lit(0))


def punct_ratio_sql(field: str) -> str:
    return (
        f"length(regexp_replace({field}, '{_NON_ALNUM}', '', 'g'))"
        f" / NULLIF(length({field}), 0)::DOUBLE"
    )


def stopword_ratio(field: str, stopwords: list[str] | None = None) -> Column:
    words = stopwords or EN_STOPWORDS
    toks = tokens(field)
    lit_arr = F.array(*[F.lit(w) for w in words])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(lit_arr, t)))
    return hits / F.nullif(F.size(toks), F.lit(0))


def stopword_ratio_sql(field: str, stopwords: list[str] | None = None) -> str:
    words = stopwords or EN_STOPWORDS
    arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    t = tokens_sql(field)
    return (
        f"len(list_filter({t}, x -> list_contains({arr}, x)))"
        f" / NULLIF(len({t}), 0)::DOUBLE"
    )


def quality_score(field: str, round_to: int = 6) -> Column:
    """Composite [0,1] quality heuristic: length signal + low punctuation +
    stopword presence. Deterministic and identical across engines."""
    length_sig = F.least(token_count(field) / F.lit(50.0), F.lit(1.0))
    punct_sig = F.lit(1.0) - F.least(
        F.coalesce(punct_ratio(field), F.lit(0.0)) * 4.0, F.lit(1.0)
    )
    stop_sig = F.least(
        F.coalesce(stopword_ratio(field), F.lit(0.0)) * 5.0, F.lit(1.0)
    )
    score = length_sig * 0.4 + punct_sig * 0.3 + stop_sig * 0.3
    return F.round(score, round_to)


def quality_score_sql(field: str, round_to: int = 6) -> str:
    length_sig = f"least({token_count_sql(field)} / 50.0, 1.0)"
    punct_sig = f"(1.0 - least(COALESCE({punct_ratio_sql(field)}, 0.0) * 4.0, 1.0))"
    stop_sig = f"least(COALESCE({stopword_ratio_sql(field)}, 0.0) * 5.0, 1.0)"
    return (
        f"CAST(CAST(CAST(CAST(({length_sig} * 0.4 + {punct_sig} * 0.3 "
        f"+ {stop_sig} * 0.3) * CAST(ABS({length_sig} * 0.4 + {punct_sig} * 0.3 "
        f"+ {stop_sig} * 0.3) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) "
        f"AS VARCHAR) AS DOUBLE)"
    )


# --- repetition (within-document duplication) -------------------------------

def repetition_ratio_from_tokens(
    toks: Column, n: int = 2, round_to: int = 6
) -> Column:
    """Fraction of n-gram occurrences that are repeats of an earlier n-gram
    in the same document: ``1 - |distinct n-grams| / |n-grams|`` (a
    Gopher-style quality signal — boilerplate and looped generations score
    high). 0.0 for documents shorter than n tokens. Pure column expression,
    rides the scan."""
    all_sh = shingles_from_tokens(toks, n, distinct=False)
    total = F.size(all_sh)
    uniq = F.size(F.array_distinct(all_sh))
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        F.round(F.lit(1.0) - uniq / total.cast("double"), round_to)
    )


def repetition_ratio(field: str, n: int = 2, round_to: int = 6) -> Column:
    """Convenience form for small frames. In scans, prefer
    `repetition_ratio_from_tokens` over a token column materialized behind
    an exchange: here the token expression is re-inlined into the
    per-shingle lambda (quadratic regex work — measured 31 s vs 1.4 s at
    sf0.1 on the documents table)."""
    return repetition_ratio_from_tokens(tokens(field), n, round_to)


def repetition_ratio_sql(field: str, n: int = 2, round_to: int = 6) -> str:
    all_sh = shingles_sql(field, n, distinct=False)
    return (
        f"CASE WHEN len({all_sh}) <= 0 THEN 0.0 "
        f"ELSE CAST(CAST(CAST(CAST((1.0 - len(list_distinct({all_sh})) "
        f"/ len({all_sh})::DOUBLE) * CAST(ABS(1.0 - len(list_distinct({all_sh})) "
        f"/ len({all_sh})::DOUBLE) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END"
    )


# --- language ID ------------------------------------------------------------

def _lang_hits(field: str, lang: str) -> Column:
    toks = tokens(field)
    lit_arr = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(lit_arr, t)))


def predicted_lang(field: str) -> Column:
    """argmax over marker-word hit counts; ties resolve in LANG_ORDER; no
    hits at all -> 'und' (undetermined)."""
    hits = {lang: _lang_hits(field, lang) for lang in LANG_ORDER}
    best = hits[LANG_ORDER[0]]
    for lang in LANG_ORDER[1:]:
        best = F.greatest(best, hits[lang])
    out = F.lit("und")
    # build reversed CASE chain so the FIRST max in LANG_ORDER wins
    for lang in reversed(LANG_ORDER):
        out = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(
            out
        )
    return out


def _lang_hits_sql(field: str, lang: str) -> str:
    arr = "[" + ", ".join(f"'{w}'" for w in LANG_MARKERS[lang]) + "]"
    return f"len(list_filter({tokens_sql(field)}, x -> list_contains({arr}, x)))"


def predicted_lang_sql(field: str) -> str:
    hits = {lang: _lang_hits_sql(field, lang) for lang in LANG_ORDER}
    best = f"greatest({', '.join(hits.values())})"
    whens = " ".join(
        f"WHEN {hits[lang]} > 0 AND {hits[lang]} = {best} THEN '{lang}'"
        for lang in LANG_ORDER
    )
    return f"(CASE {whens} ELSE 'und' END)"


# --- BPE-ish tokenization ---------------------------------------------------

# GPT-2-flavored pretokenizer, simplified to be lookahead-free so it runs
# identically on Java regex (Spark) and RE2 (DuckDB): contractions, letter
# runs, digit runs, punctuation runs, whitespace runs.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def bpe_token_count(field: str) -> Column:
    """Approximate BPE token count: pretokenizer segments (the unit real
    BPE merges start from) — the standard cheap estimator for LLM token
    budgets over a corpus."""
    return F.regexp_count(F.col(field), F.lit(BPE_PATTERN))


def bpe_token_count_sql(field: str) -> str:
    # RE2 needs the same pattern; single quotes doubled for SQL literal
    pat = BPE_PATTERN.replace("'", "''")
    return f"len(regexp_extract_all({field}, '{pat}'))"


# --- PII / boilerplate scrubbing --------------------------------------------

# Redaction patterns, applied IN ORDER (earlier replacements' markers contain
# no digits, so later patterns never re-match them). Conservative syntax only
# — no lookahead/backrefs — so Java regex (Spark) and RE2 (DuckDB) agree.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{6,}[0-9]", "<PHONE>"),
]


def scrub_pii(col: Column) -> Column:
    """Sequentially redact emails, URLs, IPs, then phone-shaped digit runs.
    Order matters: each marker is digit-free, so no pattern can match text
    produced by an earlier replacement."""
    out = col
    for _, pat, marker in PII_PATTERNS:
        out = F.regexp_replace(out, pat, marker)
    return out


def scrub_pii_sql(expr: str) -> str:
    out = expr
    for _, pat, marker in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{marker}', 'g')"
    return out


def redaction_count(scrubbed: Column, kind: str) -> Column:
    """How many <KIND> markers the scrub emitted — counted on the scrubbed
    text so the number reflects what was actually replaced."""
    marker = dict((k, m) for k, _, m in PII_PATTERNS)[kind]
    # '<' and '>' are not regex metacharacters in Java regex or RE2, so the
    # marker is its own pattern
    return F.regexp_count(scrubbed, F.lit(marker))


def redaction_count_sql(scrubbed_expr: str, kind: str) -> str:
    marker = dict((k, m) for k, _, m in PII_PATTERNS)[kind]
    return f"len(regexp_extract_all({scrubbed_expr}, '{marker}'))"


# --- fingerprints -----------------------------------------------------------

def fingerprint(field: str) -> Column:
    """md5 of whitespace-normalized lowercase text — exact-dedup key."""
    normalized = F.regexp_replace(fold_lower(F.trim(F.col(field))), _WS, " ")
    return F.md5(normalized)


def fingerprint_sql(field: str) -> str:
    return (
        f"md5(regexp_replace({fold_lower_sql(f'trim({field})')},"
        f" '{_WS}', ' ', 'g'))"
    )


def rolling_fingerprint_from_norm(norm: Column, k: int = 8) -> Column:
    """Rolling fingerprint over an ALREADY-normalized (and ideally
    exchange-materialized) text column — CollapseProject re-inlines an
    expression-valued `norm` into every k-gram lambda, re-running the
    normalization regex once per gram."""
    n = F.length(norm)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.conv(
                F.substring(F.md5(F.substring(norm, i, k)), 1, 8), 16, 10
            ).cast("bigint"),
        ),
    )
    return F.array_min(grams)


def normalized_text(field: str) -> Column:
    return F.regexp_replace(fold_lower(F.trim(F.col(field))), _WS, " ")


def rolling_fingerprint(field: str, k: int = 8) -> Column:
    """Content-defined rolling fingerprint: minimum hash over all
    character k-gram hashes of the normalized text (the min-sampling step
    of winnowing). Robust to edits outside the minimizing window — two
    documents sharing their rarest k-gram collide, which is the property
    near-dup blocking wants. Returns a bigint (null when len < k).
    For bulk use, materialize normalized_text() behind an exchange and
    call rolling_fingerprint_from_norm (see that docstring)."""
    return rolling_fingerprint_from_norm(normalized_text(field), k)


def rolling_fingerprint_sql(field: str, k: int = 8) -> str:
    norm = (
        f"regexp_replace({fold_lower_sql(f'trim({field})')}, '{_WS}', ' ', 'g')"
    )
    return (
        f"list_min(list_transform(range(1, length({norm}) - {k - 2}), "
        f"i -> ('0x' || substr(md5(substr({norm}, i, {k})), 1, 8))::BIGINT))"
    )
