"""URL canonicalization and crawl-level dedup, dual-compiled.

The first dedup pass of a web-crawl corpus (CCNet, C4, RefinedWeb) is by
URL, before any content hashing: normalize each URL to a canonical form,
collapse records sharing it, and audit the per-domain mix. All of it is
scan-level string expressions — Catalyst keeps the whole normalization
chain in codegen, the dedup is one hash aggregation on the canonical key,
and the domain report aggregates to domain cardinality (thousands of
rows) before its share window, so nothing here shuffles more than the
group-by requires at 100 TB.

Canonical form (applied in this order, each step a single regexp pass):

1. strip the fragment (``#...``),
2. lowercase the scheme+authority (path/query stay case-sensitive),
3. drop a ``www.`` host prefix,
4. drop explicit default ports (``https://h:443``, ``http://h:80``),
5. remove tracking query params (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``ref``) and tidy the leftover ``?``/``&`` punctuation,
6. strip trailing slashes.

Dialect notes (the reason for the step table): Spark ``regexp_replace``
is Java-regex, global by default, ``$1`` replacements; DuckDB is RE2,
first-match unless the ``'g'`` flag, ``\\1`` replacements. Lookarounds are
avoided entirely (RE2 has none); every pattern below is plain classes,
groups, alternation, and anchors, which the two engines interpret
identically.

``registered_domain`` is the last two dot-labels of the host — the usual
approximation when no public-suffix list is shipped; co.uk-style suffixes
collapse to the suffix itself, which is fine for a mix audit and
documented here rather than hidden.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Anchored to a [?&] delimiter (kept via the $1 backref) so only WHOLE
# query parameters named exactly utm_*/fbclid/... are stripped — an
# unanchored form would also hit '?href=...' (embedded 'ref='), '?pref=',
# or a path segment '/ref=x/page', silently merging or truncating
# unrelated URLs on both sides of the oracle.
_TRACKING = "([?&])(utm_[a-z0-9_]*|fbclid|gclid|msclkid|ref)=[^&#]*"

# (pattern, spark_replacement, duckdb_replacement) applied in order AFTER
# the scheme+authority lowercasing step (which is concat-based, not a
# replace, and handled separately in both compilers).
_STEPS: list[tuple[str, str, str]] = [
    ("://www\\.", "://", "://"),
    ("^(https://[^/:?#]+):443([/?#].*)?$", "$1$2", "\\1\\2"),
    ("^(http://[^/:?#]+):80([/?#].*)?$", "$1$2", "\\1\\2"),
    (_TRACKING, "$1", "\\1"),
    ("\\?&+", "?", "?"),
    ("&&+", "&", "&"),
    ("[?&]+$", "", ""),
    ("/+\\?", "?", "?"),
    ("/+$", "", ""),
]

_AUTHORITY = "^([^/?#]*://[^/?#]*)"


def normalize_url(col: Column) -> Column:
    # fragment first so the authority extraction never sees '#'
    u = F.regexp_replace(F.trim(col), "#.*$", "")
    u = F.concat(
        F.lower(F.regexp_extract(u, _AUTHORITY, 1)),
        F.regexp_replace(u, _AUTHORITY, ""),
    )
    for pat, repl, _ in _STEPS:
        u = F.regexp_replace(u, pat, repl)
    return u


def normalize_url_sql(expr: str) -> str:
    u = f"regexp_replace(trim({expr}), '#.*$', '', 'g')"
    u = (
        f"(lower(regexp_extract({u}, '{_AUTHORITY}', 1))"
        f" || regexp_replace({u}, '{_AUTHORITY}', '', 'g'))"
    )
    for pat, _, repl in _STEPS:
        u = f"regexp_replace({u}, '{pat}', '{repl}', 'g')"
    return u


def registered_domain(norm: Column) -> Column:
    host = F.regexp_extract(norm, "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
    return F.regexp_extract(host, "([^.]+\\.[^.]+)$", 1)


def registered_domain_sql(norm: str) -> str:
    host = f"regexp_extract({norm}, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1)"
    return f"regexp_extract({host}, '([^.]+\\.[^.]+)$', 1)"


def url_normalize(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """Per-record canonical URL: ``(id, url_norm, domain)``."""
    norm = normalize_url(F.col(url_col))
    return df.select(
        F.col(id_col),
        norm.alias("url_norm"),
        registered_domain(norm).alias("domain"),
    ).orderBy(id_col)


def url_normalize_sql(table: str, id_col: str, url_col: str) -> str:
    norm = normalize_url_sql(url_col)
    return f"""
SELECT {id_col}, __n AS url_norm, {registered_domain_sql('__n')} AS domain
FROM (SELECT {id_col}, {norm} AS __n FROM {table})
ORDER BY {id_col}
"""


def url_dedup_report(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """Duplicate URL groups after canonicalization: ``(url_norm, n_docs,
    canonical_id)`` for every canonical URL claimed by more than one
    record, lowest id as survivor — the URL-level first pass before any
    content-hash dedup. One hash aggregation on the canonical key."""
    return (
        df.select(F.col(id_col).alias("__id"), normalize_url(F.col(url_col)).alias("url_norm"))
        .groupBy("url_norm")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("__id").alias("canonical_id"),
        )
        .where(F.col("n_docs") > 1)
        .orderBy("url_norm")
    )


def url_dedup_report_sql(table: str, id_col: str, url_col: str) -> str:
    norm = normalize_url_sql(url_col)
    return f"""
SELECT url_norm,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(__id) AS canonical_id
FROM (SELECT {id_col} AS __id, {norm} AS url_norm FROM {table})
GROUP BY url_norm
HAVING COUNT(*) > 1
ORDER BY url_norm
"""


def url_domain_report(
    df: DataFrame, id_col: str, url_col: str, round_to: int = 6
) -> DataFrame:
    """Per-domain crawl mix: ``(domain, n_docs, n_urls, share)`` with
    ``n_urls`` the distinct canonical URLs and ``share`` the doc fraction.
    The share window runs over the already-aggregated domain frame
    (domain-cardinality rows), not the corpus."""
    norm = normalize_url(F.col(url_col))
    agg = (
        df.select(registered_domain(norm).alias("domain"), norm.alias("__n"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("__n").alias("n_urls"),
        )
    )
    from pyspark.sql import Window

    total = F.sum("n_docs").over(Window.partitionBy())
    return agg.select(
        "domain",
        "n_docs",
        "n_urls",
        F.round(F.col("n_docs") / total, round_to).alias("share"),
    ).orderBy("domain")


def url_domain_report_sql(
    table: str, id_col: str, url_col: str, round_to: int = 6
) -> str:
    norm = normalize_url_sql(url_col)
    dom = registered_domain_sql("__n")
    return f"""
WITH __u AS (SELECT {norm} AS __n FROM {table}),
__a AS (
  SELECT {dom} AS domain,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT __n) AS BIGINT) AS n_urls
  FROM __u GROUP BY 1
)
SELECT domain, n_docs, n_urls,
       CASE WHEN ABS(n_docs / CAST(SUM(n_docs) OVER () AS BIGINT)) >= 1e16 THEN CAST((n_docs / CAST(SUM(n_docs) OVER () AS BIGINT)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((n_docs / CAST(SUM(n_docs) OVER () AS BIGINT)) * CAST(ABS(n_docs / CAST(SUM(n_docs) OVER () AS BIGINT)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS share
FROM __a ORDER BY domain
"""
