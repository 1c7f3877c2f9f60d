"""Privacy audits (k-anonymity / l-diversity) and the SCD Type-2
builder: hand-computed oracles, change-collapse semantics, tiebreak
determinism, and the int64 µs lattice contract."""

import duckdb
import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.operators import merge as M
from bullet_storm_spark.operators import privacy as P

# (seg, nation, bal): classes over (seg, nation) —
#   ("A", 1): 3 rows   ("A", 2): 1 row   ("B", 1): 2 rows   ("B", 2): 1 row
PRIV = [
    ("A", 1, 10.0), ("A", 1, 20.0), ("A", 1, 30.0),
    ("A", 2, 40.0),
    ("B", 1, 50.0), ("B", 1, 60.0),
    ("B", 2, 70.0),
]


@pytest.fixture(scope="module")
def priv_df(spark):
    return spark.createDataFrame(PRIV, "seg string, nat long, bal double")


def test_k_anonymity_hand_oracle(priv_df):
    out = P.k_anonymity_audit(
        priv_df, [F.col("seg"), F.col("nat")], ks=[2, 3]
    ).collect()
    by_k = {r.k: r for r in out}
    assert set(by_k) == {2, 3}
    for r in out:
        assert r.classes_total == 4 and r.rows_total == 7
    # k=2: classes of size <2 are the two singletons -> 2 rows at risk
    assert by_k[2].classes_below == 2 and by_k[2].rows_below == 2
    # k=3: sizes 1,1,2 below -> 3 classes, 4 rows
    assert by_k[3].classes_below == 3 and by_k[3].rows_below == 4
    assert by_k[3].rows_below_share == round(4 / 7, 9)


def test_l_diversity_hand_oracle(priv_df):
    # QI = nation alone; sensitive = seg:
    #   nat=1 -> {A,B} d=2 (5 rows), nat=2 -> {A,B} d=2 (2 rows)
    out = P.l_diversity_audit(
        priv_df, [F.col("nat")], F.col("seg"), l_min=3
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.distinct_sensitive == 2 and r.n_classes == 2
    assert r.n_rows == 7 and r.at_risk == 1
    # QI = (nation, seg-as-qi? no) — homogeneity case: QI = seg
    out2 = P.l_diversity_audit(
        priv_df, [F.col("seg")], F.col("nat"), l_min=2
    ).collect()
    # seg A -> nations {1,2} d=2; seg B -> {1,2} d=2 => one bucket, safe
    assert out2[0].distinct_sensitive == 2 and out2[0].at_risk == 0


def test_privacy_duck_parity(priv_df):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (seg VARCHAR, nat BIGINT, bal DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", PRIV)
    spark_rows = [
        tuple(r)
        for r in P.k_anonymity_audit(
            priv_df,
            [F.col("seg"), F.floor(F.col("bal") / F.lit(25.0)).cast("long")],
            ks=[2, 5],
        ).collect()
    ]
    duck_rows = con.execute(
        P.k_anonymity_audit_sql(
            "t", ["seg", "CAST(FLOOR(bal / 25.0) AS BIGINT)"], ks=[2, 5]
        )
    ).fetchall()
    assert spark_rows == duck_rows
    s2 = [
        tuple(r)
        for r in P.l_diversity_audit(
            priv_df, [F.col("nat")], F.col("seg"), l_min=2
        ).collect()
    ]
    d2 = con.execute(
        P.l_diversity_audit_sql("t", ["nat"], "seg", l_min=2)
    ).fetchall()
    assert s2 == d2


# SCD2: per-key change stream (key, attr, us, tb)
SCD = [
    (1, "P1", 100, 1),
    (1, "P1", 200, 2),   # echo -> collapsed
    (1, "P2", 300, 3),   # change
    (1, "P2", 400, 4),   # echo -> collapsed
    (1, "P1", 500, 5),   # change back (new version, not merged with v1)
    (2, "X", 100, 6),    # single-version key
    (3, "A", 100, 8),    # same-timestamp change: tiebreak orders 7 < 8?
    (3, "B", 100, 7),    # tb=7 comes FIRST -> B then A
]


@pytest.fixture(scope="module")
def scd_df(spark):
    return spark.createDataFrame(SCD, "k long, attr string, us long, tb long")


def test_scd2_semantics(scd_df):
    out = M.scd2_build(
        scd_df, "k", "attr", F.col("us"), "tb"
    ).collect()
    k1 = [(r.attr, r.valid_from_us, r.valid_to_us, r.version, r.is_current)
          for r in out if r.key == 1]
    FAR = 32503680000000000
    assert k1 == [
        ("P1", 100, 300, 1, 0),
        ("P2", 300, 500, 2, 0),
        ("P1", 500, FAR, 3, 1),
    ]
    k2 = [r for r in out if r.key == 2]
    assert len(k2) == 1 and k2[0].version == 1 and k2[0].is_current == 1
    # same-µs events: the tiebreak column decides the history order
    k3 = [(r.attr, r.version) for r in out if r.key == 3]
    assert k3 == [("B", 1), ("A", 2)]
    # half-open lattice: each valid_to equals the next valid_from; a
    # same-µs change (key 3) yields an EMPTY interval for the superseded
    # version — correct: it was never current for any measurable time
    for r in out:
        assert r.valid_from_us <= r.valid_to_us
        if r.key != 3:
            assert r.valid_from_us < r.valid_to_us


def test_scd2_duck_parity_and_summary(scd_df):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, attr VARCHAR, us BIGINT, tb BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", SCD)
    s = [tuple(r) for r in M.scd2_build(
        scd_df, "k", "attr", F.col("us"), "tb").collect()]
    d = con.execute(M.scd2_build_sql("t", "k", "attr", "us", "tb")).fetchall()
    assert s == d
    ssum = [tuple(r) for r in M.scd2_summary(
        scd_df, "k", "attr", F.col("us"), "tb").collect()]
    dsum = con.execute(
        M.scd2_summary_sql("t", "k", "attr", "us", "tb")
    ).fetchall()
    assert ssum == dsum
    # histogram: key 2,3 -> versions in {1? no: key3 has 2} ->
    # versions=1: key2; versions=2: key3; versions=3: key1
    as_map = {v: (nk, nc) for v, nk, nc in ssum}
    assert as_map == {1: (1, 1), 2: (1, 1), 3: (1, 1)}


def test_scd2_single_window_chain(scd_df):
    """The LAG filter and the LEAD/ROW_NUMBER finish share one
    partitioning: exactly ONE exchange in the physical plan."""
    plan = (
        M.scd2_build(scd_df, "k", "attr", F.col("us"), "tb")
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_exch = plan.count("Exchange hashpartitioning")
    assert n_exch == 1, plan


def test_scd2_transition_matrix(scd_df):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, attr VARCHAR, us BIGINT, tb BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", SCD)
    s = [tuple(r) for r in M.scd2_transition_matrix(
        scd_df, "k", "attr", F.col("us"), "tb").collect()]
    d = con.execute(
        M.scd2_transition_matrix_sql("t", "k", "attr", "us", "tb")
    ).fetchall()
    assert s == d
    # key1: P1->P2 and P2->P1; key3's same-µs change (B then A at us=100)
    # probes us=99, BEFORE the key's history starts -> dropped, so only
    # key1's two transitions appear
    assert s == [("P1", "P2", 1), ("P2", "P1", 1)]


def test_scd2_null_attr_echoes_collapse(spark):
    """Consecutive NULL attribute values are echoes and must collapse
    (review-caught: __prev IS NULL conflated 'first row' with 'previous
    attr was NULL' and split versions)."""
    rows = [
        (1, "x", 100, 1),
        (1, None, 200, 2),
        (1, None, 300, 3),   # NULL echo -> must collapse into v2
        (1, "y", 400, 4),
    ]
    df = spark.createDataFrame(rows, "k long, attr string, us long, tb long")
    out = M.scd2_build(df, "k", "attr", F.col("us"), "tb").collect()
    assert [(r.attr, r.version) for r in out] == [
        ("x", 1), (None, 2), ("y", 3),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, attr VARCHAR, us BIGINT, tb BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", rows)
    d = con.execute(M.scd2_build_sql("t", "k", "attr", "us", "tb")).fetchall()
    assert [tuple(r) for r in out] == d
    # NULL-to-NULL must never appear in the transition matrix
    tm = M.scd2_transition_matrix(df, "k", "attr", F.col("us"), "tb").collect()
    assert all(not (r.prev_attr is None and r.attr is None) for r in tm)
