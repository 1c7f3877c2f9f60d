"""PII detection + redaction over a document corpus — scan expressions.

Every production LLM training pipeline runs a PII pass before release
(C4 removes lines with bad words + obvious PII; Dolma and FineWeb both
ship regex PII taggers for emails / IPs / phone numbers; see Soldaini et
al. 2402.00159 §2.3 and Penedo et al. 2406.17557 §3.5). This module is
that pass, Spark-first:

* detection is ``regexp_count`` per pattern — pure JVM scan expressions
  inside WholeStageCodegen, no UDF, no shuffle: at 100 TB the pass is
  scan-bound and embarrassingly parallel, exactly like text_stats.
* redaction is a sequential ``regexp_replace`` chain (one pass per
  pattern, most-specific first) producing a typed placeholder per kind —
  the standard irreversible masking shape (``<EMAIL>``, ``<IP>``, ...).

Pattern dialect note: patterns are written in the common subset of Java
regex (Spark) and RE2 (DuckDB oracle twins) — no lookaround, no
backreferences, ``\\b``/``\\d``/bounded quantifiers only — so the same
string runs verbatim in both engines.

Reference scope note: the reference engine (Java/Storm Bullet) has no
PII surface; this is part of the LLM-pipeline extension mandated by the
build brief (SURVEY.md §2.6).

Relationship to ``functions/text.scrub_pii``: that is the expression-
level primitive (email/URL/IP/phone masking of one column, used inside
curate pipelines). This module is the operator-level release gate on
top: per-document per-kind DETECTION counts, the masking pass with its
post-hoc placeholder accounting, and the per-source corpus summary —
plus the structured-identifier kinds (SSN, credit card) detection needs
but the generic scrubber's catch-all phone run would swallow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# (kind, pattern, placeholder) — redaction applies in this order, so the
# most specific / longest-span kinds come first (an email swallows the
# digits inside it before the phone/SSN patterns can see them). All
# patterns are valid and equivalent in Java regex AND RE2.
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "credit_card",
        r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
        "<CREDIT_CARD>",
    ),
    (
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "<SSN>",
    ),
    (
        "phone",
        r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
        "<PHONE>",
    ),
    (
        "ipv4",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "<IP>",
    ),
]


def _count_cols(text_col: str):
    """Per-pattern count columns + the total expression (shared by
    pii_report and pii_summary so the two surfaces can never diverge)."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(f"n_{kind}")
        for kind, pat, _ in PII_PATTERNS
    ]
    total = None
    for kind, _, _ in PII_PATTERNS:
        c = F.col(f"n_{kind}")
        total = c if total is None else total + c
    return counts, total


def pii_report(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_email, n_credit_card, n_ssn, n_phone, n_ipv4, n_pii,
    has_pii): per-document PII match counts, one scan.

    Counts are per-pattern over the RAW text, so a span matched by two
    patterns counts under both (detection is a screening metric);
    ``pii_redact`` is the authoritative masking pass where order
    disambiguates. ``n_pii`` is the sum; ``has_pii`` flags any hit."""
    counts, total = _count_cols(text_col)
    return (
        df.select(F.col(id_col).alias("id"), *counts)
        .withColumn("n_pii", total.cast("long"))
        .withColumn("has_pii", F.col("n_pii") > 0)
        .orderBy("id")
    )


def pii_report_sql(table: str, id_col: str, text_col: str) -> str:
    counts = ",\n       ".join(
        f"CAST(len(regexp_extract_all({text_col}, '{pat}')) AS BIGINT)"
        f" AS n_{kind}"
        for kind, pat, _ in PII_PATTERNS
    )
    total = " + ".join(f"n_{kind}" for kind, _, _ in PII_PATTERNS)
    return f"""
WITH __c AS (
  SELECT {id_col} AS id,
       {counts}
  FROM {table}
)
SELECT id, n_email, n_credit_card, n_ssn, n_phone, n_ipv4,
       CAST({total} AS BIGINT) AS n_pii,
       ({total}) > 0 AS has_pii
FROM __c ORDER BY id
"""


def pii_redact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, text, n_redacted): the corpus with every PII span replaced by
    its typed placeholder, plus the number of spans masked.

    The replace chain applies ``PII_PATTERNS`` in order, so nested spans
    resolve to the outermost kind (digits inside an email are masked as
    part of ``<EMAIL>``, never double-masked as a phone). ``n_redacted``
    is the total placeholder count in the OUTPUT — the post-masking
    ground truth, which can be less than ``pii_report.n_pii`` exactly
    when patterns overlapped."""
    red = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    out = df.select(F.col(id_col).alias("id"), red.alias("text"))
    n = None
    for _, _, repl in PII_PATTERNS:
        c = F.regexp_count(F.col("text"), F.lit(_re_escape(repl)))
        n = c if n is None else n + c
    return (
        out.withColumn("n_redacted", n.cast("long"))
        .orderBy("id")
    )


def pii_redact_sql(table: str, id_col: str, text_col: str) -> str:
    red = text_col
    for _, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    counts = " + ".join(
        f"len(regexp_extract_all(text, '{_re_escape(repl)}'))"
        for _, _, repl in PII_PATTERNS
    )
    return f"""
WITH __r AS (
  SELECT {id_col} AS id, {red} AS text FROM {table}
)
SELECT id, text, CAST({counts} AS BIGINT) AS n_redacted
FROM __r ORDER BY id
"""


def _re_escape(s: str) -> str:
    """Escape a literal placeholder for use as a regex in both dialects
    (only ``<``/``>``/letters/underscore appear — nothing regex-special —
    but keep the helper so future placeholders stay safe)."""
    out = []
    for ch in s:
        out.append("\\" + ch if ch in r".^$*+?()[]{}|\\" else ch)
    return "".join(out)


def pii_summary(df: DataFrame, id_col: str, text_col: str, by: str) -> DataFrame:
    """(group, n_docs, docs_with_pii, pii_rate, n_pii_total): corpus-level
    PII accounting per ``by`` group (e.g. source) — the release-gate
    table: which slices exceed the PII budget before masking. One scan +
    one small hash aggregation on the group key."""
    counts, total = _count_cols(text_col)
    per_doc = df.select(F.col(by).alias("grp"), *counts).withColumn(
        "n_pii", total.cast("long")
    )
    return (
        per_doc.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("n_pii") > 0).cast("long")).alias("docs_with_pii"),
            F.sum("n_pii").alias("n_pii_total"),
        )
        .select(
            "grp",
            "n_docs",
            "docs_with_pii",
            F.round(F.col("docs_with_pii") / F.col("n_docs"), 6).alias("pii_rate"),
            "n_pii_total",
        )
        .orderBy("grp")
    )


def pii_summary_sql(table: str, id_col: str, text_col: str, by: str) -> str:
    counts = " + ".join(
        f"len(regexp_extract_all({text_col}, '{pat}'))"
        for _, pat, _ in PII_PATTERNS
    )
    return f"""
WITH __d AS (
  SELECT {by} AS grp, CAST({counts} AS BIGINT) AS n_pii FROM {table}
)
SELECT grp,
       COUNT(*)::BIGINT AS n_docs,
       CAST(SUM(CASE WHEN n_pii > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_with_pii,
       CAST(CAST(CAST(CAST((CAST(SUM(CASE WHEN n_pii > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*)) * CAST(ABS(CAST(SUM(CASE WHEN n_pii > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*)) >= POWER(10.0, -(6+1)) AS INT) AS VARCHAR) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS pii_rate,
       CAST(SUM(n_pii) AS BIGINT) AS n_pii_total
FROM __d GROUP BY grp ORDER BY grp
"""
