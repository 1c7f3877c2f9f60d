"""Zipf corpus audit: oracle parity + sanity of the fit."""

import duckdb

from bullet_storm_spark.operators.vocab import zipf_report, zipf_report_sql

SF_DIR = "/root/testdata/sf0.001"


def test_zipf_report_oracle(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = zipf_report(df, "doc_id", "text", top_n=500).collect()
    assert len(got) == 1
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = con.execute(
        zipf_report_sql("documents", "doc_id", "text", top_n=500)
    ).fetchall()
    assert [tuple(r) for r in got] == [tuple(w) for w in want]


def test_zipf_slope_negative_and_r2_bounded(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    row = zipf_report(df, "doc_id", "text", top_n=500).collect()[0]
    assert row.zipf_slope < 0, "frequency must decay with rank"
    assert 0.0 <= row.zipf_r2 <= 1.0
    assert 0.0 < row.top_coverage <= 1.0
    # synthetic sf0.001 corpus has a tiny vocabulary; just require a real fit
    assert row.n_terms >= 10


def test_heaps_growing_vs_saturated_vocabulary(spark):
    import duckdb

    from bullet_storm_spark.operators.vocab import heaps_report, heaps_report_sql

    # growing: each doc introduces fresh tokens -> beta near 1
    growing = [(i, " ".join(f"w{i}_{j}" for j in range(20))) for i in range(30)]
    gdf = spark.createDataFrame(growing, "doc_id long, text string")
    g = heaps_report(gdf, "doc_id", "text", n_checkpoints=5).collect()
    assert len(g) == 5
    assert all(r.heaps_beta == g[0].heaps_beta for r in g)  # fit repeated
    assert g[0].heaps_beta > 0.9
    assert g[-1].cum_distinct == 30 * 20 and g[-1].docs_le == 30
    # monotone curves
    assert all(a.cum_tokens < b.cum_tokens for a, b in zip(g, g[1:]))
    # saturated: every doc reuses the same 5 tokens -> beta ~ 0
    flat = [(i, "a b c d e") for i in range(30)]
    fdf = spark.createDataFrame(flat, "doc_id long, text string")
    f = heaps_report(fdf, "doc_id", "text", n_checkpoints=5).collect()
    assert f[0].heaps_beta == 0.0 and f[-1].cum_distinct == 5
    assert f[0].heaps_r2 is None  # undefined on zero vocabulary variance
    # DuckDB twin parity on the growing fixture
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?,?)", growing)
    want = con.sql(heaps_report_sql("d", "doc_id", "text", 5)).fetchall()
    got = [
        (r.checkpoint, r.docs_le, r.cum_tokens, r.cum_distinct,
         r.heaps_beta, r.heaps_log_k, r.heaps_r2)
        for r in g
    ]
    assert got == want


# --- PMI collocations ----------------------------------------------------

def test_pmi_collocations_closed_form(spark):
    import math

    import duckdb
    from bullet_storm_spark.operators.vocab import (
        pmi_collocations, pmi_collocations_sql,
    )

    rows = [(0, "a b a b a b"), (1, "c"), (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = pmi_collocations(df, "doc_id", "text", min_count=2, top_n=10).collect()
    # bigrams: (a,b) x3, (b,a) x2; unigrams a=3 b=3 c=1, T=7; B=5
    by = {(r.w1, r.w2): r for r in got}
    assert set(by) == {("a", "b"), ("b", "a")}
    ab, ba = by[("a", "b")], by[("b", "a")]
    assert (ab.n_pair, ab.n_left, ab.n_right) == (3, 3, 3)
    assert ab.pmi == round(math.log(3 * 7 * 7 / (5 * 3 * 3)), 6)
    assert ba.pmi == round(math.log(2 * 7 * 7 / (5 * 3 * 3)), 6)
    assert got[0].pmi >= got[1].pmi  # ordered by pmi desc
    con = duckdb.connect()
    con.execute("CREATE TABLE pdocs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO pdocs VALUES (?,?)", rows)
    d = con.execute(
        pmi_collocations_sql("pdocs", "doc_id", "text", min_count=2, top_n=10)
    ).fetchall()
    assert [tuple(r) for r in got] == [tuple(w) for w in d]


# --- OOV coverage audit -----------------------------------------------------


def test_oov_report_semantics(spark):
    from bullet_storm_spark.operators.vocab import oov_report, oov_report_sql

    # vocab (top 2 by freq): "the" (6), "cat" (4). Source A speaks only
    # vocab; source B is half OOV by occurrence.
    rows = [
        (1, "A", "the cat the cat"),
        (2, "A", "the the cat cat"),
        (3, "B", "the zebra quokka zebra"),
        (4, "B", "the xylo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = [
        tuple(r)
        for r in oov_report(df, "source", "doc_id", "text", top_n=2).collect()
    ]
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{s}', '{t}')" for i, s, t in rows)
    con.execute(
        f"CREATE TABLE docs AS SELECT * FROM (VALUES {vals}) v(doc_id, source, text)"
    )
    want = con.execute(
        oov_report_sql("docs", "source", "doc_id", "text", top_n=2)
    ).fetchall()
    assert got == want
    by_src = {r[0]: r for r in got}
    a = by_src["A"]
    assert a[1] == 8 and a[2] == 0 and a[3] == 0.0  # fully covered
    assert a[4] == 2 and a[5] == 0
    b = by_src["B"]
    assert b[1] == 6 and b[2] == 4  # zebra x2, quokka, xylo
    assert b[3] == 4 / 6
    assert b[4] == 4 and b[5] == 3 and b[6] == 0.75


def test_oov_report_oracle_parity_real_corpus(spark):
    from bullet_storm_spark.operators.vocab import oov_report, oov_report_sql

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = [
        tuple(r)
        for r in oov_report(df, "source", "doc_id", "text", top_n=50).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = con.execute(
        oov_report_sql("documents", "source", "doc_id", "text", top_n=50)
    ).fetchall()
    assert got == [tuple(w) for w in want]
    assert all(0.0 <= r[3] <= 1.0 and 0.0 <= r[6] <= 1.0 for r in got)


# ---------------------------------------------------------------------------
# Kneser-Ney count tables
# ---------------------------------------------------------------------------

def test_kn_counts_hand_oracle(spark):
    import duckdb

    from bullet_storm_spark.operators.vocab import (
        kn_bigram_counts, kn_bigram_counts_sql,
        kn_discount_summary, kn_discount_summary_sql,
    )

    # the canonical KN example: "francisco" frequent but only ever after
    # "san"; "day" rarer as a pair but follows many contexts
    docs = [
        (1, "san francisco san francisco san francisco"),
        (2, "good day nice day rainy day san francisco"),
        (3, "one day another day"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {(r.w1, r.w2): r for r in
           kn_bigram_counts(df, "doc_id", "text", top_n=100).collect()}
    # pairs from doc1: (san,francisco)x3 + (francisco,san)x2 -> plus
    # doc2 contributes one more (san,francisco)
    assert out[("san", "francisco")].n_pair == 4
    # francisco has ONE left context (san) while day has four
    # (good, nice, rainy, another... plus 'one day'? 'one' precedes day)
    assert out[("san", "francisco")].left_types_w2 == 1
    day_rows = [r for (w1, w2), r in out.items() if w2 == "day"]
    assert day_rows and day_rows[0].left_types_w2 == 5  # good/nice/rainy/one/another
    # continuation probability: day >> francisco despite lower pair count
    assert day_rows[0].pcont_w2 > out[("san", "francisco")].pcont_w2

    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?,?)", docs)
    duck = con.execute(
        kn_bigram_counts_sql("d", "doc_id", "text", top_n=100)
    ).fetchall()
    spark_rows = [tuple(r) for r in
                  kn_bigram_counts(df, "doc_id", "text", top_n=100).collect()]
    assert spark_rows == duck

    # discount: count-of-counts over the bigram types
    s = kn_discount_summary(df, "doc_id", "text").collect()[0]
    d = con.execute(kn_discount_summary_sql("d", "doc_id", "text")).fetchall()[0]
    assert tuple(s) == d
    assert s.discount == round(s.n1 / (s.n1 + 2 * s.n2), 9)
    assert s.n_tokens == sum(len(t.split()) - 1 for _, t in docs)
