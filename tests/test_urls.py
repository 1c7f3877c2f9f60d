"""URL canonicalization + crawl-level dedup: per-step normalization
semantics, DuckDB parity, and the scan-level plan contract."""

import duckdb
import pytest

from bullet_storm_spark.operators import urls as U

CASES = [
    (1, "HTTPS://WWW.Site.Example.COM:443/Articles/7/?utm_source=feed&id=7#sec"),
    (2, "https://site.example.com/Articles/7?id=7&utm_campaign=x&fbclid=abc"),
    (3, "http://Host.org:80/a/b/"),
    (4, "https://other.net/path?ref=tw&utm_medium=e"),
    (5, "  https://plain.net/x  "),
    (6, "https://a.b.co.uk/p?keep=1&gclid=z&also=2"),
    (7, "https://site.example.com/Articles/7?id=7"),  # already canonical
    # tracking-regex anchoring regressions: none of these contain a real
    # tracking param and must survive untouched
    (8, "https://site.com/p?href=https://other.com"),   # embedded 'ref='
    (9, "https://site.com/ref=x/page"),                 # path segment
    (10, "https://site.com/p?xfbclid=1&pref=dark"),     # superstring names
    (11, "https://site.com/p?utm_a=1&utm_b=2&keep=3"),  # consecutive strips
]


@pytest.fixture(scope="module")
def urls_df(spark):
    return spark.createDataFrame(CASES, "id long, url string")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", CASES)
    return con


def test_normalize_semantics(urls_df):
    out = {r.id: (r.url_norm, r.domain) for r in U.url_normalize(urls_df, "id", "url").collect()}
    # case, www, :443, tracking param, slash-before-query, fragment all fold
    assert out[1] == ("https://site.example.com/Articles/7?id=7", "example.com")
    # rows 1, 2 and 7 collapse to the same canonical URL
    assert out[1][0] == out[2][0] == out[7][0]
    assert out[3] == ("http://host.org/a/b", "host.org")     # :80 + trailing /
    assert out[4][0] == "https://other.net/path"             # query fully tracking
    assert out[5][0] == "https://plain.net/x"                # trim
    # non-tracking params survive, in original order
    assert out[6][0] == "https://a.b.co.uk/p?keep=1&also=2"
    assert out[6][1] == "co.uk"  # documented no-PSL approximation
    # anchored tracking regex: whole-param matches only
    assert out[8][0] == "https://site.com/p?href=https://other.com"
    assert out[9][0] == "https://site.com/ref=x/page"
    assert out[10][0] == "https://site.com/p?xfbclid=1&pref=dark"
    assert out[11][0] == "https://site.com/p?keep=3"


def test_normalize_duck_parity(urls_df, duck):
    s = [tuple(r) for r in U.url_normalize(urls_df, "id", "url").collect()]
    d = duck.execute(U.url_normalize_sql("t", "id", "url")).fetchall()
    assert s == [tuple(r) for r in d]


def test_dedup_report(urls_df, duck):
    s = [tuple(r) for r in U.url_dedup_report(urls_df, "id", "url").collect()]
    # exactly one dup group: rows 1/2/7, canonical survivor = min id
    assert s == [("https://site.example.com/Articles/7?id=7", 3, 1)]
    d = duck.execute(U.url_dedup_report_sql("t", "id", "url")).fetchall()
    assert s == [tuple(r) for r in d]


def test_domain_report(urls_df, duck):
    s = [tuple(r) for r in U.url_domain_report(urls_df, "id", "url").collect()]
    d = duck.execute(U.url_domain_report_sql("t", "id", "url")).fetchall()
    assert s == [tuple(r) for r in d]
    by = {r[0]: r for r in s}
    # example.com: 3 docs, 1 distinct canonical URL
    assert by["example.com"][1] == 3 and by["example.com"][2] == 1
    assert abs(sum(r[3] for r in s) - 1.0) < 1e-6


def test_normalize_is_scan_level(urls_df):
    """The normalization chain must stay in the scan stage: no Exchange
    in the pre-sort plan (orderBy excluded by projecting before sort)."""
    from pyspark.sql import functions as F

    plan = (
        urls_df.select("id", U.normalize_url(F.col("url")).alias("n"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
