"""IR eval metrics: pure-Python oracle + DuckDB twin + guards."""

import math

import duckdb
import pytest

from bullet_storm_spark.operators.ranking_eval import (
    retrieval_eval,
    retrieval_eval_sql,
    term_overlap_qrels,
    term_overlap_qrels_sql,
)

# run: (query_id, rank, doc_id) — q1 hits docs 10(rel 3) at rank 1 and
# 30(rel 1) at rank 3; q2's only relevant doc sits at rank 2; q3 is
# judged but entirely missing from the run (the all-zero row case)
RUN = [
    (1, 1, 10), (1, 2, 20), (1, 3, 30),
    (2, 1, 10), (2, 2, 40),
]
QRELS = [
    (1, 10, 3), (1, 30, 1), (1, 99, 2),
    (2, 40, 1),
    (3, 77, 2),
    (1, 20, 0),  # judged-nonrelevant: ignored everywhere
]
RUN_SQL = "SELECT * FROM (VALUES " + ", ".join(
    f"({q}, {r}, {d})" for q, r, d in RUN
) + ') t(query_id, "rank", doc_id)'
QRELS_SQL = "SELECT * FROM (VALUES " + ", ".join(
    f"({q}, {d}, {r})" for q, d, r in QRELS
) + ") t(query_id, doc_id, rel)"


def _disc(rank):
    return round(1.0 / math.log2(rank + 1), 12)


def _py_eval(run, qrels, k, round_to=9):
    pos = {}
    for q, d, rel in qrels:
        if rel > 0:
            pos.setdefault(q, {})[d] = rel
    out = []
    for q in sorted(pos):
        judged = pos[q]
        ranked = [(r, d) for qq, r, d in run if qq == q and r <= k]
        hits = [(r, judged[d]) for r, d in ranked if d in judged]
        dcg = sum(((1 << rel) - 1) * _disc(r) for r, rel in hits)
        ideal = sorted(judged.values(), reverse=True)[:k]
        idcg = sum(((1 << rel) - 1) * _disc(i + 1) for i, rel in enumerate(ideal))
        first = min((r for r, _ in hits), default=None)
        out.append((
            q, len(judged), len(ranked), len(hits),
            round(len(hits) / k, round_to),
            round(len(hits) / len(judged), round_to),
            round(1.0 / first, round_to) if first else 0.0,
            round(dcg / idcg, round_to),
        ))
    return out


def test_retrieval_eval_matches_python(spark):
    run = spark.createDataFrame(RUN, "query_id long, rank long, doc_id long")
    qrels = spark.createDataFrame(QRELS, "query_id long, doc_id long, rel long")
    got = [tuple(r) for r in retrieval_eval(run, qrels, k=3).collect()]
    want = _py_eval(RUN, QRELS, k=3)
    assert len(got) == len(want) == 3
    for g, w in zip(got, want):
        assert g[:4] == w[:4]
        for gv, wv in zip(g[4:], w[4:]):
            # python oracle uses float discounts; engine uses the same
            # 12dp literals — agree to well under the 9dp output rounding
            assert gv == pytest.approx(wv, abs=2e-9)
    # q3: judged, absent from run -> all-zero metrics row
    q3 = got[2]
    assert q3 == (3, 1, 0, 0, 0.0, 0.0, 0.0, 0.0)
    # q1: perfect first hit -> rr == 1
    assert got[0][6] == 1.0


def test_retrieval_eval_matches_duckdb(spark):
    run = spark.createDataFrame(RUN, "query_id long, rank long, doc_id long")
    qrels = spark.createDataFrame(QRELS, "query_id long, doc_id long, rel long")
    got = [tuple(r) for r in retrieval_eval(run, qrels, k=3).collect()]
    oracle = duckdb.sql(retrieval_eval_sql(RUN_SQL, QRELS_SQL, k=3)).fetchall()
    assert got == [tuple(r) for r in oracle]


def test_retrieval_eval_perfect_run_ndcg_is_one(spark):
    # run ranked exactly by descending rel -> ndcg 1.0 for every query
    qrels = [(1, 10, 3), (1, 20, 2), (1, 30, 1)]
    run = [(1, 1, 10), (1, 2, 20), (1, 3, 30)]
    rdf = spark.createDataFrame(run, "query_id long, rank long, doc_id long")
    qdf = spark.createDataFrame(qrels, "query_id long, doc_id long, rel long")
    row = retrieval_eval(rdf, qdf, k=3).collect()[0]
    assert row["ndcg"] == 1.0 and row["recall_at_k"] == 1.0


def test_retrieval_eval_k_validation(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        retrieval_eval(df, df, k=0)
    with pytest.raises(ValueError):
        retrieval_eval_sql("x", "y", k=1001)


def test_term_overlap_qrels_matches_duckdb(spark):
    docs = [
        (1, "apple banana cherry"),
        (2, "apple apple"),       # 1 distinct term: below min_match=2
        (3, "banana cherry date"),
        (4, "unrelated words"),
    ]
    queries = [(1, "apple banana cherry"), (2, "date")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [
        tuple(r)
        for r in term_overlap_qrels(df, "doc_id", "text", queries).collect()
    ]
    # q1: doc1 matches 3 terms, doc3 matches 2; doc2 only 1 (dropped)
    # q2 has a single term so its floor clamps to 1: doc3 kept with rel 1
    assert got == [(1, 1, 3), (1, 3, 2), (2, 3, 1)]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in docs)
        + ") t(doc_id, text)"
    )
    oracle = con.execute(
        term_overlap_qrels_sql("docs", "doc_id", "text", queries)
    ).fetchall()
    assert got == [tuple(r) for r in oracle]


def test_term_overlap_qrels_grade_by_tf(spark):
    docs = [
        (1, "apple banana apple apple"),  # 2 distinct, 4 occurrences
        (2, "apple banana"),              # 2 distinct, 2 occurrences
        (3, "apple apple"),               # 1 distinct: dropped
    ]
    queries = [(1, "apple banana")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [
        tuple(r)
        for r in term_overlap_qrels(
            df, "doc_id", "text", queries, grade_by_tf=True, tf_cap=3
        ).collect()
    ]
    # doc1's 4 occurrences cap at 3; doc2 grades 2; doc3 fails the
    # distinct-term floor even though it has 2 occurrences
    assert got == [(1, 1, 3), (1, 2, 2)]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in docs)
        + ") t(doc_id, text)"
    )
    oracle = con.execute(
        term_overlap_qrels_sql(
            "docs", "doc_id", "text", queries, grade_by_tf=True, tf_cap=3
        )
    ).fetchall()
    assert got == [tuple(r) for r in oracle]


def test_term_overlap_qrels_validation(spark):
    with pytest.raises(ValueError):
        term_overlap_qrels_sql("t", "id", "text", [(1, "a b")], min_match=0)
    with pytest.raises(ValueError):
        term_overlap_qrels_sql(
            "t", "id", "text", [(1, "a b")], grade_by_tf=True, tf_cap=0
        )
