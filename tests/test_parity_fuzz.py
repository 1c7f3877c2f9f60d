"""Seeded multi-corpus engine-parity fuzz for the formula-heavy twins.

The oracle gate runs each dual-compiled operator against ONE fixed corpus
per scale; a float-association or rounding-boundary divergence between
the Spark plan and the DuckDB twin only surfaces if that corpus happens
to hit a boundary (the BM25 review measured ~1 in 2200 inputs for an ulp
association slip). This fuzz runs the score-formula operators over many
deterministic random corpora, multiplying the boundary samples by the
corpus count. Plain seeded loops, not hypothesis: Spark jobs make
shrinking painful and determinism matters more than minimization here.
"""

import random

import duckdb
import pytest

from bullet_storm_spark.operators.retrieval import bm25_topk, bm25_topk_sql
from bullet_storm_spark.operators.vocab import (
    lm_score,
    lm_score_sql,
    tfidf_pairs,
    tfidf_pairs_sql,
    zipf_report,
    zipf_report_sql,
)

VOCAB = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "spark", "window", "order", "data", "column",
    "join", "small", "line", "customer", "query", "big", "a", "the", "sort",
    "group", "stream", "filter", "vector",
]

SEEDS = range(8)


def _corpus(seed: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    n_docs = rng.randint(20, 60)
    # Zipfian-ish draw: low ranks heavily favoured, so doc frequencies
    # cluster near the idf/round boundaries that a uniform draw misses
    weights = [1.0 / (r + 1) for r in range(len(VOCAB))]
    docs = []
    for i in range(n_docs):
        length = rng.choice([0, 1, 3, 8, 20, 40, 80])
        words = rng.choices(VOCAB, weights=weights, k=length)
        docs.append((i, " ".join(words)))
    return docs


def _duck(docs):
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?,?)", docs)
    return con


def _spark_df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


@pytest.mark.parametrize("seed", SEEDS)
def test_bm25_parity_fuzz(spark, seed):
    docs = _corpus(seed)
    queries = [(1, "spark window agg"), (2, "the a key"), (3, "vector sort")]
    got = [
        tuple(r)
        for r in bm25_topk(
            _spark_df(spark, docs), "doc_id", "text", queries, k=7
        ).collect()
    ]
    want = [
        tuple(r)
        for r in _duck(docs)
        .execute(bm25_topk_sql("d", "doc_id", "text", queries, k=7))
        .fetchall()
    ]
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_lm_score_parity_fuzz(spark, seed):
    docs = _corpus(seed)
    got = [
        tuple(r)
        for r in lm_score(_spark_df(spark, docs), "doc_id", "text").collect()
    ]
    want = [
        tuple(r)
        for r in _duck(docs).execute(lm_score_sql("d", "doc_id", "text")).fetchall()
    ]
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_tfidf_pairs_parity_fuzz(spark, seed):
    docs = _corpus(seed)
    got = [
        tuple(r)
        for r in tfidf_pairs(
            _spark_df(spark, docs), "doc_id", "text", df_cap=30, min_sim=0.2
        ).collect()
    ]
    want = [
        tuple(r)
        for r in _duck(docs)
        .execute(tfidf_pairs_sql("d", "doc_id", "text", df_cap=30, min_sim=0.2))
        .fetchall()
    ]
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_zipf_parity_fuzz(spark, seed):
    docs = _corpus(seed)
    got = [
        tuple(r)
        for r in zipf_report(_spark_df(spark, docs), "doc_id", "text").collect()
    ]
    want = [
        tuple(r)
        for r in _duck(docs)
        .execute(zipf_report_sql("d", "doc_id", "text"))
        .fetchall()
    ]
    assert got == want
