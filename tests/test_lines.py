"""Line-level corpus dedup (CCNet/RefinedWeb boilerplate pass)."""

import duckdb

from bullet_storm_spark.operators.lines import (
    line_frequency,
    line_frequency_sql,
    remove_boilerplate_lines,
    remove_boilerplate_lines_sql,
)

HEADER = "SHARED HEADER"
DOCS = [
    (1, f"{HEADER}\nunique body one\n\nfooter one"),
    (2, f"{HEADER}\nunique body two\nfooter two"),
    (3, f"{HEADER}\nunique body three\n{HEADER}\nfooter three"),
    (4, "no header here at all"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _con():
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", DOCS)
    return con


def test_line_frequency_counts_docs_not_occurrences(spark):
    rows = {r.line: r.df_docs for r in line_frequency(_df(spark), "doc_id", "text", min_df=2).collect()}
    # doc 3 contains the header TWICE but counts once
    assert rows == {HEADER: 3}
    con = _con()
    want = dict(con.sql(line_frequency_sql("d", "doc_id", "text", 2)).fetchall())
    assert rows == want


def test_remove_boilerplate_preserves_order_and_blanks(spark):
    got = {
        r.id: r
        for r in remove_boilerplate_lines(
            _df(spark), "doc_id", "text", min_df=3
        ).collect()
    }
    assert got[1].text == "unique body one\n\nfooter one"  # blank line kept
    assert got[1].n_lines == 4 and got[1].n_removed == 1
    assert got[3].text == "unique body three\nfooter three"
    assert got[3].n_removed == 2  # both header copies dropped
    assert got[4].text == "no header here at all" and got[4].n_removed == 0
    con = _con()
    want = {
        r[0]: r
        for r in con.sql(
            remove_boilerplate_lines_sql("d", "doc_id", "text", 3)
        ).fetchall()
    }
    for i, r in got.items():
        assert (r.id, r.text, r.n_lines, r.n_removed) == want[i]


def test_all_boilerplate_doc_becomes_empty(spark):
    docs = [(i, "ONLY LINE") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = remove_boilerplate_lines(df, "doc_id", "text", min_df=5).collect()
    assert all(r.text == "" and r.n_removed == 1 for r in got)


def test_min_df_validation(spark):
    import pytest

    with pytest.raises(ValueError):
        line_frequency(_df(spark), "doc_id", "text", min_df=0)
    with pytest.raises(ValueError):
        line_frequency_sql("d", "doc_id", "text", min_df=0)
