"""HTML -> text extraction: strip stages, entity order, report signals."""

import duckdb

from bullet_storm_spark.operators.html import (
    html_report,
    html_report_sql,
    html_to_text,
    html_to_text_sql,
)

CASES = [
    (1, "<html><body><p>hello <b>world</b></p></body></html>", "hello world"),
    # script/style content must vanish entirely, not just the tags
    (2, "<p>keep</p><script>var x = 'drop me';</script><p>this</p>",
     "keep this"),
    (3, "<style>.c { color: red }</style>text", "text"),
    # comments, including markup inside them
    (4, "a<!-- <p>not text</p> -->b", "a b"),
    # entity decode order: &amp;lt; is the TEXT '&lt;', never '<'
    (5, "x &amp;lt; y &lt; z &amp; w", "x &lt; y < z & w"),
    (6, "&quot;quoted&quot; &#39;single&#39; a&nbsp;b", "\"quoted\" 'single' a b"),
    # tags spanning attributes; uppercase tags
    (7, '<DIV CLASS="x">up</DIV>', "up"),
    (8, "no markup at all", "no markup at all"),
]


def _df(spark):
    return spark.createDataFrame(
        [(i, h) for i, h, _ in CASES], "doc_id long, html string"
    )


def test_html_to_text_cases(spark):
    got = {r.id: r.text for r in html_to_text(_df(spark), "doc_id", "html").collect()}
    for i, _, want in CASES:
        assert got[i] == want, (i, got[i])


def test_html_to_text_duckdb_parity(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE h (doc_id BIGINT, html VARCHAR)")
    con.executemany("INSERT INTO h VALUES (?, ?)", [(i, h) for i, h, _ in CASES])
    want = con.sql(html_to_text_sql("h", "doc_id", "html")).fetchall()
    got = [
        (r.id, r.text, r.n_chars)
        for r in html_to_text(_df(spark), "doc_id", "html").collect()
    ]
    assert got == want


def test_html_report_signals(spark):
    html = (
        '<html><head><title>My Page</title></head><body>'
        '<a href="http://x.com">one</a> <a href="/rel">two</a>'
        '<p>body text</p></body></html>'
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    [r] = html_report(df, "doc_id", "html").collect()
    assert r.title == "My Page"
    assert r.n_links == 2
    assert r.n_tags == 7  # opening tags only: html head title body a a p
    assert 0 < r.text_ratio < 1
    con = duckdb.connect()
    con.execute("CREATE TABLE h (doc_id BIGINT, html VARCHAR)")
    con.execute("INSERT INTO h VALUES (1, ?)", [html])
    [want] = con.sql(html_report_sql("h", "doc_id", "html")).fetchall()
    assert (r.id, r.n_tags, r.n_links, r.title, r.text_ratio) == want


def test_html_report_no_title_no_links(spark):
    df = spark.createDataFrame([(1, "<p>plain</p>")], "doc_id long, html string")
    [r] = html_report(df, "doc_id", "html").collect()
    assert r.title == "" and r.n_links == 0
