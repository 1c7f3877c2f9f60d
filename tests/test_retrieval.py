"""BM25 ranked retrieval: pure-Python oracle + DuckDB twin + guards."""

import math

import duckdb
import pytest

from bullet_storm_spark.operators.retrieval import bm25_topk, bm25_topk_sql

DOCS = [
    (1, "apple banana apple"),
    (2, "banana cherry"),
    (3, "cherry cherry cherry date"),
    (4, "   "),  # tokenless: excluded from N/avgdl, never matches
]
QUERIES = [(1, "apple cherry"), (2, "banana")]


def _py_bm25(docs, queries, k1=1.2, b=0.75):
    toks = {d: t.lower().split() for d, t in docs}
    toks = {d: t for d, t in toks.items() if t}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfreq = {}
    for t in toks.values():
        for term in set(t):
            dfreq[term] = dfreq.get(term, 0) + 1
    out = {}
    for qid, qtext in queries:
        scores = {}
        nmatch = {}
        for term in dict.fromkeys(qtext.lower().split()):
            if term not in dfreq:
                continue
            idf = math.log(1 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
            for d, t in toks.items():
                tf = t.count(term)
                if tf == 0:
                    continue
                # association mirrors both engine twins: idf * (num / den)
                c = idf * (
                    tf * (k1 + 1)
                    / (tf + k1 * (1 - b + b * len(t) / avgdl))
                )
                scores[d] = scores.get(d, 0.0) + round(c, 12)
                nmatch[d] = nmatch.get(d, 0) + 1
        ranked = sorted(scores, key=lambda d: (-round(scores[d], 6), d))
        out[qid] = [
            (qid, r + 1, d, nmatch[d], round(scores[d], 6))
            for r, d in enumerate(ranked)
        ]
    return [row for qid in sorted(out) for row in out[qid]]


def test_bm25_topk_matches_python_and_duckdb(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = [tuple(r) for r in bm25_topk(df, "doc_id", "text", QUERIES, k=5).collect()]
    assert got == _py_bm25(DOCS, QUERIES)
    # d1 ranks first for "apple cherry": rare term apple dominates
    assert got[0][:3] == (1, 1, 1)
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?,?)", DOCS)
    drows = [
        tuple(r)
        for r in con.execute(
            bm25_topk_sql("d", "doc_id", "text", QUERIES, k=5)
        ).fetchall()
    ]
    assert got == drows


def test_bm25_df_cap_prunes_common_terms(spark):
    # cherry appears in 3 of 4 docs, apple in 1: df_cap=2 (and the
    # fraction 0.5 -> ceil(0.5*4)=2) must DROP cherry, changing both the
    # score and n_terms_matched for query "apple cherry"
    docs = [
        (1, "apple cherry"),
        (2, "cherry banana"),
        (3, "cherry date"),
        (4, "banana date"),
    ]
    q = [(1, "apple cherry")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    uncapped = [tuple(r) for r in bm25_topk(df, "doc_id", "text", q, k=5).collect()]
    capped = [
        tuple(r)
        for r in bm25_topk(df, "doc_id", "text", q, k=5, df_cap=2).collect()
    ]
    frac = [
        tuple(r)
        for r in bm25_topk(df, "doc_id", "text", q, k=5, df_cap=0.5).collect()
    ]
    assert capped == frac != uncapped
    # with cherry pruned only doc 1 matches, on the single term apple
    assert [(r[2], r[3]) for r in capped] == [(1, 1)]
    assert {r[2] for r in uncapped} == {1, 2, 3}
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?,?)", docs)
    for cap, want in ((None, uncapped), (2, capped), (0.5, capped)):
        drows = [
            tuple(r)
            for r in con.execute(
                bm25_topk_sql("d", "doc_id", "text", q, k=5, df_cap=cap)
            ).fetchall()
        ]
        assert want == drows


def test_bm25_validation(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, "doc_id", "text", [])
    with pytest.raises(ValueError):
        bm25_topk(df, "doc_id", "text", [(1, "   ")])
    with pytest.raises(ValueError):
        bm25_topk(df, "doc_id", "text", QUERIES, k=0)
    with pytest.raises(ValueError):
        bm25_topk_sql("d", "doc_id", "text", [])
    # SQL-injection-shaped query text is quoted, not executed
    sql = bm25_topk_sql("d", "doc_id", "text", [(1, "it's a 'test'")])
    assert "it''s" in sql
    # non-ASCII queries are rejected: Python/Java/RE2 disagree on Unicode
    # whitespace and case folding, so parity can't be guaranteed
    with pytest.raises(ValueError, match="non-ASCII"):
        bm25_topk(df, "doc_id", "text", [(1, "spark join")])
    with pytest.raises(ValueError, match="need 0 <= b <= 1"):
        bm25_topk(df, "doc_id", "text", QUERIES, b=1.5)
    with pytest.raises(ValueError, match="need k1 >= 0"):
        bm25_topk_sql("d", "doc_id", "text", QUERIES, k1=-1.0)


# --- query-by-document BM25 + hybrid sparse/dense RRF ---------------------

def test_bm25_by_doc_excludes_self_and_matches_duckdb(spark):
    from bullet_storm_spark.operators.retrieval import (
        bm25_topk_by_doc, bm25_topk_by_doc_sql,
    )

    docs = [
        (1, "apple banana"),
        (2, "apple banana cherry"),
        (3, "cherry date"),
        (4, "banana date apple"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [
        tuple(r)
        for r in bm25_topk_by_doc(df, "doc_id", "text", [1, 3], k=3).collect()
    ]
    # query 1 never retrieves itself; its tokens hit docs 2 and 4
    q1 = [r for r in got if r[0] == 1]
    assert {r[2] for r in q1} == {2, 4}
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?,?)", docs)
    drows = [
        tuple(r)
        for r in con.execute(
            bm25_topk_by_doc_sql("d", "doc_id", "text", [1, 3], k=3)
        ).fetchall()
    ]
    assert got == drows
    with pytest.raises(ValueError):
        bm25_topk_by_doc(df, "doc_id", "text", [])


def test_hybrid_rrf_fuses_lexical_and_dense(spark):
    from bullet_storm_spark.operators.retrieval import hybrid_rrf, hybrid_rrf_sql

    docs = [
        (1, "apple banana"),
        (2, "apple banana"),      # lexical twin of 1
        (3, "cherry date"),
        (4, "elderberry fig"),
    ]
    embs = [
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),          # dense-orthogonal to 1
        (3, [1.0, 0.1]),          # dense twin of 1
        (4, [0.9, 0.2]),
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    edf = spark.createDataFrame(embs, "vec_id long, embedding array<float>")
    got = [
        tuple(r)
        for r in hybrid_rrf(
            ddf, edf, "doc_id", "text", "vec_id", "embedding", [1], k=4, pool=4
        ).collect()
    ]
    # doc 2 tops lexical, doc 3 tops dense; both outrank dense-only doc 4
    by_id = {r[1]: r[3] for r in got}
    assert by_id[2] < by_id[4] and by_id[3] < by_id[4]
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?,?)", docs)
    con.execute("CREATE TABLE e (vec_id BIGINT, embedding FLOAT[])")
    con.executemany("INSERT INTO e VALUES (?,?)", embs)
    drows = [
        tuple(r)
        for r in con.execute(
            hybrid_rrf_sql(
                "d", "e", "doc_id", "text", "vec_id", "embedding", [1], k=4, pool=4
            )
        ).fetchall()
    ]
    assert got == drows
    with pytest.raises(ValueError):
        hybrid_rrf(ddf, edf, "doc_id", "text", "vec_id", "embedding", [1], k=5, pool=3)
