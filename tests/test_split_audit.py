"""Stratified train/holdout split (operators/sampling.py) and the LSH
recall audit (operators/dedup.py): exact quotas, determinism/stability
properties, and DuckDB-twin parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.operators import dedup, sampling


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"src{i % 3}", f"doc {i} body words {' '.join(str(i * 7 % 5) for _ in range(4))}")
        for i in range(90)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_split_exact_quota_and_partition(docs):
    out = sampling.stratified_split(docs, "doc_id", "source", holdout_frac=0.2)
    rows = out.collect()
    assert len(rows) == 90  # total function: every row assigned
    per = {}
    for r in rows:
        per.setdefault(r["source"], []).append(r["split"])
    for src, splits in per.items():
        n = len(splits)
        assert splits.count("holdout") == int(n * 0.2)  # floor quota, exact
        assert splits.count("train") == n - int(n * 0.2)


def test_split_deterministic_and_stratum_stable(docs, spark):
    a = sorted(map(tuple, sampling.stratified_split(docs, "doc_id", "source").collect()))
    b = sorted(map(tuple, sampling.stratified_split(docs, "doc_id", "source").collect()))
    assert a == b
    # adding a NEW stratum leaves existing strata's assignment unchanged
    extra = spark.createDataFrame(
        [(1000 + i, "srcNEW", f"new {i}") for i in range(10)],
        "doc_id long, source string, text string",
    )
    grown = sampling.stratified_split(docs.unionByName(extra), "doc_id", "source")
    base = {r["doc_id"]: r["split"] for r in grown.collect() if r["source"] != "srcNEW"}
    assert base == {t[0]: t[2] for t in a}


def test_split_rejects_bad_frac(docs):
    with pytest.raises(ValueError):
        sampling.stratified_split(docs, "doc_id", "source", holdout_frac=1.5)


def test_split_duckdb_parity(docs):
    con = duckdb.connect()
    con.register("t", docs.toPandas())
    for builder, sql_builder in (
        (sampling.stratified_split, sampling.stratified_split_sql),
        (sampling.split_accounting, sampling.split_accounting_sql),
    ):
        srows = [tuple(r) for r in builder(docs, "doc_id", "source", 0.25).collect()]
        drows = [tuple(r) for r in con.sql(sql_builder("t", "doc_id", "source", 0.25)).fetchall()]
        assert srows == drows


def test_lsh_recall_audit_counts(docs, spark):
    """On a block where banding provably finds everything (identical
    texts), recall is 1.0; the count identity exact = found + missed
    holds always."""
    dup = spark.createDataFrame(
        [(i, "s", "alpha beta gamma delta epsilon") for i in range(6)],
        "doc_id long, source string, text string",
    )
    row = dedup.lsh_recall_audit(dup, "doc_id", "text", threshold=0.9).collect()[0]
    assert row["exact_pairs"] == 15  # 6 choose 2, all identical
    assert row["lsh_found"] == 15 and row["missed"] == 0
    assert row["recall"] == 1.0

    mixed = dedup.lsh_recall_audit(docs, "doc_id", "text", threshold=0.5).collect()[0]
    assert mixed["exact_pairs"] == mixed["lsh_found"] + mixed["missed"]
    if mixed["exact_pairs"]:
        assert 0.0 <= mixed["recall"] <= 1.0


def test_lsh_recall_audit_duckdb_parity(docs):
    con = duckdb.connect()
    con.register("t", docs.toPandas())
    srows = [
        tuple(r)
        for r in dedup.lsh_recall_audit(docs, "doc_id", "text", threshold=0.5).collect()
    ]
    drows = [
        tuple(r)
        for r in con.sql(
            dedup.lsh_recall_audit_sql("t", "doc_id", "text", threshold=0.5)
        ).fetchall()
    ]
    assert srows == drows
