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


# ---------------------------------------------------------------------------
# chunk_documents (operators/spans.py)
# ---------------------------------------------------------------------------

def test_chunk_documents_layout(spark):
    from bullet_storm_spark.operators.spans import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b c"), (3, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, "doc_id", "text", chunk_size=8, overlap=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: n=10, step=4 -> chunks at 0 and 4: [t0..t7], [t4..t9]
    d1 = by_doc[1]
    assert [r["chunk_idx"] for r in d1] == [0, 1]
    assert d1[0]["chunk_text"].split() == [f"t{i}" for i in range(8)]
    assert d1[1]["chunk_text"].split() == [f"t{i}" for i in range(4, 10)]
    assert [r["n_tokens"] for r in d1] == [8, 6]
    # doc 2: shorter than one chunk -> exactly one chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "a b c"
    # doc 3: empty -> no rows
    assert 3 not in by_doc
    # overlap reconstruction: consecutive chunks share exactly `overlap`
    assert d1[0]["chunk_text"].split()[4:] == d1[1]["chunk_text"].split()[:4]


def test_chunk_documents_rejects_bad_overlap(spark):
    from bullet_storm_spark.operators.spans import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_size=8, overlap=8)


def test_chunk_documents_duckdb_parity(spark):
    from bullet_storm_spark.operators.spans import (
        chunk_documents,
        chunk_documents_sql,
    )

    df = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(i * 3 % 17))) for i in range(25)],
        "doc_id long, text string",
    )
    con = duckdb.connect()
    con.register("t", df.toPandas())
    srows = [
        tuple(r)
        for r in chunk_documents(df, "doc_id", "text", chunk_size=6, overlap=2).collect()
    ]
    drows = [
        tuple(r)
        for r in con.sql(
            chunk_documents_sql("t", "doc_id", "text", chunk_size=6, overlap=2)
        ).fetchall()
    ]
    assert srows == drows and len(srows) > 25


@pytest.mark.parametrize("c,ov", [(6, 0), (6, 2), (8, 4), (5, 4)])
def test_chunk_documents_reconstruction_property(spark, c, ov):
    """Lossless-coverage property over varied doc lengths: dropping the
    first `overlap` tokens of every chunk after the first reconstructs
    the original token stream exactly — no token lost, none duplicated
    beyond the declared overlap."""
    from bullet_storm_spark.operators.spans import chunk_documents

    df = spark.createDataFrame(
        [(n, " ".join(f"w{n}_{j}" for j in range(n))) for n in range(0, 21)],
        "doc_id long, text string",
    )
    out = chunk_documents(df, "doc_id", "text", chunk_size=c, overlap=ov).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_text"].split())
    assert 0 not in by_doc  # empty doc emits nothing
    for n in range(1, 21):
        chunks = by_doc[n]
        rebuilt = list(chunks[0])
        for ch in chunks[1:]:
            assert ch[:ov] == rebuilt[len(rebuilt) - ov:] if ov else True
            rebuilt.extend(ch[ov:])
        assert rebuilt == [f"w{n}_{j}" for j in range(n)]


def test_embedding_outlier_report(spark):
    """Outlier audit: total function over inputs, z-flag consistent with
    the reported moments, and an injected far-away vector is flagged;
    DuckDB parity."""
    import numpy as np

    from bullet_storm_spark.operators.similarity import (
        embedding_outlier_report,
        embedding_outlier_report_sql,
    )

    rng = np.random.RandomState(5)
    vecs = rng.randn(50, 16)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vid long, emb array<double>")
    rep = embedding_outlier_report(df, "vid", "emb", n_centroids=4, dim=16, z=1.5)
    out = rep.collect()
    assert len(out) == 50
    for r in out:
        flag = r["dist"] > r["cell_mean"] + 1.5 * r["cell_std"]
        # rounded columns can sit within one quantum of the exact flag
        if abs(r["dist"] - (r["cell_mean"] + 1.5 * r["cell_std"])) > 1e-5:
            assert r["is_outlier"] == flag

    con = duckdb.connect()
    con.register("t", df.toPandas())
    srows = [tuple(r) for r in out]
    drows = [
        tuple(r)
        for r in con.sql(
            embedding_outlier_report_sql("t", "vid", "emb", n_centroids=4, dim=16, z=1.5)
        ).fetchall()
    ]
    assert srows == drows


def test_lm_score_properties_and_parity(spark):
    """Unigram LM score: a document of corpus-common tokens scores lower
    cross-entropy than one of rare tokens; values reproduce a hand
    unigram model; DuckDB parity."""
    import math

    from bullet_storm_spark.operators.vocab import lm_score, lm_score_sql

    rows = [
        (0, "common common common common"),
        (1, "common common rare1"),
        (2, "rare2 rare3 rare4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in lm_score(df, "doc_id", "text").collect()}
    assert out[0]["cross_entropy"] < out[1]["cross_entropy"] < out[2]["cross_entropy"]
    # hand model: T=10, V=5, p(common) = (6+1)/(10+5)
    p_common = 7.0 / 15.0
    assert abs(out[0]["cross_entropy"] + math.log(p_common)) < 1e-6
    assert out[0]["n_tokens"] == 4

    con = duckdb.connect()
    con.register("t", df.toPandas())
    srows = [tuple(r) for r in lm_score(df, "doc_id", "text").collect()]
    drows = [tuple(r) for r in con.sql(lm_score_sql("t", "doc_id", "text")).fetchall()]
    assert srows == drows


# --- LSH banding S-curve ---------------------------------------------------

def test_lsh_s_curve(spark):
    import duckdb
    import pytest as _pt

    from bullet_storm_spark.operators.dedup import lsh_s_curve, lsh_s_curve_sql

    got = lsh_s_curve(spark, num_hashes=64, bands=16, grid=20).collect()
    assert len(got) == 21
    by = {r.similarity: r.p_collision for r in got}
    assert by[0.0] == 0.0 and by[1.0] == 1.0
    # closed form at s = 0.5, r = 4, b = 16
    assert by[0.5] == round(1 - (1 - 0.5**4) ** 16, 6)
    # monotone nondecreasing in s
    ps = [r.p_collision for r in sorted(got, key=lambda r: r.similarity)]
    assert all(a <= b for a, b in zip(ps, ps[1:]))
    d = duckdb.connect().execute(
        lsh_s_curve_sql(num_hashes=64, bands=16, grid=20)
    ).fetchall()
    assert [tuple(r) for r in got] == [tuple(w) for w in d]
    with _pt.raises(ValueError):
        lsh_s_curve(spark, num_hashes=64, bands=15)
