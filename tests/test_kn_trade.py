"""Tests for the r8 sixth batch: KN bigram document scoring and the
Q7-shaped nation trade matrix."""

import math
from collections import Counter

import duckdb
import pytest

from bullet_storm_spark.operators.vocab import kn_doc_score, kn_doc_score_sql


def test_kn_doc_score_hand_oracle(spark):
    docs = [
        (0, "the cat sat on the mat"),
        (1, "the cat ran"),
        (2, "a dog sat on a log"),
        (3, "single"),  # < 2 tokens: no bigram, no row
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.id: r for r in kn_doc_score(df, "doc_id", "text").collect()}
    assert 3 not in out

    # pure-python interpolated-KN oracle
    def toks(t):
        return t.split()

    pairs = Counter()
    for _, t in docs:
        w = toks(t)
        for a, b in zip(w, w[1:]):
            pairs[(a, b)] += 1
    ctx = Counter()
    rt = Counter()
    lt = Counter()
    for (a, b), c in pairs.items():
        ctx[a] += c
        rt[a] += 1
        lt[b] += 1
    ty = len(pairs)
    n1 = sum(1 for c in pairs.values() if c == 1)
    n2 = sum(1 for c in pairs.values() if c == 2)
    d = n1 / (n1 + 2 * n2) if (n1 + 2 * n2) else 0.0

    def p(a, b):
        return max(pairs[(a, b)] - d, 0.0) / ctx[a] + (
            d * rt[a] / ctx[a]
        ) * (lt[b] / ty)

    for doc_id, t in docs[:3]:
        w = toks(t)
        lps = [round(math.log(p(a, b)), 9) for a, b in zip(w, w[1:])]
        want = round(-sum(lps) / len(lps), 6)
        assert out[doc_id].n_bigrams == len(lps)
        assert out[doc_id].kn_cross_entropy == pytest.approx(want, abs=1e-9)

    # scores are positive cross-entropies (P < 1 for every bigram here)
    assert all(r.kn_cross_entropy > 0 for r in out.values())


def test_kn_doc_score_duck_parity(spark):
    docs = [
        (0, "the cat sat on the mat"),
        (1, "the cat ran"),
        (2, "a dog sat on a log"),
        (3, ""),
        (4, "the the the"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?,?)", docs)
    sp = [tuple(r) for r in kn_doc_score(df, "doc_id", "text").collect()]
    duck = con.execute(kn_doc_score_sql("documents", "doc_id", "text")).fetchall()
    assert sp == duck


def test_trade_matrix_reconciles_with_star_schema(spark):
    import __spark_entry__ as entry_mod

    out = entry_mod.queries()["join_trade_matrix"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert out and all(r.n_items > 0 for r in out)
    # the matrix partitions ALL joinable lineitems: totals reconcile
    con = duckdb.connect()
    total = con.execute(
        "SELECT COUNT(*) FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet') l"
        " JOIN read_parquet('/root/testdata/sf0.001/orders.parquet') o"
        "   ON l.l_orderkey = o.o_orderkey"
        " JOIN read_parquet('/root/testdata/sf0.001/customer.parquet') c"
        "   ON o.o_custkey = c.c_custkey"
        " JOIN read_parquet('/root/testdata/sf0.001/supplier.parquet') s"
        "   ON l.l_suppkey = s.s_suppkey"
    ).fetchone()[0]
    assert sum(r.n_items for r in out) == total
