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
