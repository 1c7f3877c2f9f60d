"""Tests for the r8 seventh batch: t-closeness, class-balanced
downsampling, gap/outage report, Fisher class separation."""

import hashlib
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.operators.diagnostics import gap_report, gap_report_sql
from bullet_storm_spark.operators.privacy import (
    t_closeness_audit,
    t_closeness_audit_sql,
)
from bullet_storm_spark.operators.sampling import (
    class_balance,
    class_balance_sql,
)
from bullet_storm_spark.operators.similarity import (
    fisher_separation,
    fisher_separation_sql,
)

_US_PER_HOUR = 3_600_000_000


# --- t-closeness ---------------------------------------------------------------

def test_t_closeness_hand_oracle(spark):
    # two classes over an ordinal attribute {0,1,2}:
    # class A: [0,0,1,2] -> shares (.5,.25,.25); class B: [2,2,1,0] ->
    # (.25,.25,.5); global: (.375,.25,.375)
    rows = [("A", 0), ("A", 0), ("A", 1), ("A", 2),
            ("B", 2), ("B", 2), ("B", 1), ("B", 0)]
    df = spark.createDataFrame(rows, "g string, s int")
    out = t_closeness_audit(df, [F.col("g")], F.col("s")).collect()[0]
    # cum shares: A (.5,.75,1), B (.25,.5,1), global (.375,.625,1)
    t_a = (abs(0.5 - 0.375) + abs(0.75 - 0.625) + 0.0) / 2
    t_b = (abs(0.25 - 0.375) + abs(0.5 - 0.625) + 0.0) / 2
    assert (out.classes_total, out.rows_total) == (2, 8)
    assert out.t_max == pytest.approx(max(t_a, t_b), abs=1e-9)
    assert out.t_mean == pytest.approx((t_a + t_b) / 2, abs=1e-9)
    assert out.classes_over_015 == 0  # both t = 0.125


def test_t_closeness_identical_distributions_zero(spark):
    rows = [(g, s) for g in ("A", "B") for s in (0, 1, 2)]
    df = spark.createDataFrame(rows, "g string, s int")
    out = t_closeness_audit(df, [F.col("g")], F.col("s")).collect()[0]
    assert out.t_max == 0.0 and out.t_mean == 0.0


def test_t_closeness_duck_parity(spark):
    random.seed(4)
    rows = [
        (i, i % 5, random.choice("ABMH"), round(random.uniform(-900, 9000), 2))
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, "c_custkey long, c_nationkey long, c_mktsegment string, c_acctbal double"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE customer (c_custkey BIGINT, c_nationkey BIGINT,"
        " c_mktsegment VARCHAR, c_acctbal DOUBLE)"
    )
    con.executemany("INSERT INTO customer VALUES (?,?,?,?)", rows)
    sp = [tuple(r) for r in t_closeness_audit(
        df,
        [F.col("c_mktsegment"), F.col("c_nationkey")],
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long"),
    ).collect()]
    duck = con.execute(t_closeness_audit_sql(
        "customer",
        ["c_mktsegment", "c_nationkey"],
        "CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT)",
    )).fetchall()
    assert sp == duck


# --- class balance --------------------------------------------------------------

def test_class_balance_counts_and_determinism(spark):
    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, cls string")
    out = class_balance(df, F.col("cls"), "id").collect()
    by_cls = {}
    for r in out:
        by_cls.setdefault(r["class"], []).append(r.id)
    # both classes downsampled to the minority count (10)
    assert {k: len(v) for k, v in by_cls.items()} == {"big": 10, "small": 10}
    # the kept set is the md5-rank prefix — reproduce it in python
    def frac(i):
        h = hashlib.md5(f"{i}:balance".encode()).hexdigest()
        return int(h[:8], 16) / float(1 << 32)
    want_big = sorted(sorted(range(90), key=lambda i: (frac(i), i))[:10])
    assert sorted(by_cls["big"]) == want_big
    # run twice -> identical
    again = class_balance(df, F.col("cls"), "id").collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


def test_class_balance_duck_parity(spark):
    random.seed(9)
    rows = [(i, random.choice(["en", "de", "fr"])) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, lang VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?,?)", rows)
    sp = [tuple(r) for r in class_balance(df, F.col("lang"), "doc_id").collect()]
    duck = con.execute(class_balance_sql("documents", "lang", "doc_id")).fetchall()
    assert sp == duck


# --- gap report ------------------------------------------------------------------

def test_gap_report_hand_oracle(spark):
    # key a: counts [3,0,0,2,0,1] -> zero_hours 3, gaps 2, longest 2;
    # key b: dense -> all zeros
    rows = []
    eid = 0
    for key, pattern in (("a", [3, 0, 0, 2, 0, 1]), ("b", [1, 1, 1])):
        for h, c in enumerate(pattern):
            for _ in range(c):
                rows.append((key, eid, h * _US_PER_HOUR * 1000))
                eid += 1
    df = spark.createDataFrame(rows, "event_type string, event_id long, ts_ns long")
    out = {r.key: r for r in gap_report(df).collect()}
    a = out["a"]
    assert (a.n_hours, a.zero_hours, a.n_gaps, a.longest_gap) == (6, 3, 2, 2)
    b = out["b"]
    assert (b.zero_hours, b.n_gaps, b.longest_gap) == (0, 0, 0)

    con = duckdb.connect()
    con.execute("CREATE TABLE ev (event_type VARCHAR, event_id BIGINT, ts TIMESTAMP)")
    con.executemany(
        "INSERT INTO ev VALUES (?,?,make_timestamp(?))",
        [(k, e, ns // 1000) for k, e, ns in rows],
    )
    duck = con.execute(gap_report_sql("ev")).fetchall()
    assert [tuple(r) for r in gap_report(df).collect()] == duck


# --- Fisher separation -----------------------------------------------------------

def test_fisher_hand_oracle_and_orderings(spark):
    import numpy as np

    random.seed(3)
    # well-separated labels -> bigger ratio than shuffled labels
    sep_rows, mix_rows = [], []
    for i in range(90):
        v = [round(random.gauss(2.0 * (i % 3), 1), 4) for _ in range(6)]
        sep_rows.append((i, v, i % 3))
        # (i // 3) % 3 cuts ACROSS the i % 3 mean groups (each mix class
        # holds all three means equally) — a (a*i+b) % 3 relabel would
        # just permute the same partition
        mix_rows.append((i, v, (i // 3) % 3))
    sep = spark.createDataFrame(sep_rows, "vec_id long, embedding array<float>, label int")
    out = fisher_separation(sep, "embedding", "label").collect()[0]

    V = np.array([np.array(v, dtype=np.float32).astype(np.float64) for _, v, _ in sep_rows])
    L = np.array([l for _, _, l in sep_rows])
    gm = V.mean(axis=0)
    ssb = sum(
        (L == l).sum() * float(((V[L == l].mean(axis=0) - gm) ** 2).sum())
        for l in set(L)
    )
    ssw = sum(
        float(((V[L == l] - V[L == l].mean(axis=0)) ** 2).sum()) for l in set(L)
    )
    assert out.n == 90 and out.dim == 6 and out.n_labels == 3
    assert out.ss_between == pytest.approx(ssb, rel=1e-5)
    assert out.ss_within == pytest.approx(ssw, rel=1e-5)
    mix = spark.createDataFrame(mix_rows, "vec_id long, embedding array<float>, label int")
    out_mix = fisher_separation(mix, "embedding", "label").collect()[0]
    assert out.fisher_ratio > 5 * out_mix.fisher_ratio


def test_fisher_duck_parity(spark):
    random.seed(6)
    rows = [
        (i, [round(random.gauss(0.3 * (i % 3), 1), 4) for _ in range(8)], i % 3)
        for i in range(90)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[], label INTEGER)"
    )
    con.executemany("INSERT INTO embeddings VALUES (?,?,?)", rows)
    sp = [tuple(r) for r in fisher_separation(df, "embedding", "label").collect()]
    duck = con.execute(
        fisher_separation_sql("embeddings", "embedding", "label")
    ).fetchall()
    assert sp == duck
