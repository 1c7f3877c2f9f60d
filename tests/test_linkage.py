"""Record linkage: comparator semantics, oracle parity, blocking bound."""

import duckdb

from bullet_storm_spark.operators.linkage import (
    Comparator,
    block_size_audit,
    block_size_audit_sql,
    record_linkage_pairs,
    record_linkage_pairs_sql,
)

SF_DIR = "/root/testdata/sf0.001"


def _customer(spark):
    return spark.read.parquet(f"{SF_DIR}/customer.parquet")


_COMPS = [
    Comparator("c_name", "levenshtein", weight=2.0, scale=4.0),
    Comparator("c_acctbal", "abs_diff", weight=1.0, scale=500.0),
]
_BLOCK = ["c_nationkey", "c_mktsegment"]


def _con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM '{SF_DIR}/customer.parquet'"
    )
    return con


def test_linkage_pairs_oracle(spark):
    got = record_linkage_pairs(
        _customer(spark), "c_custkey", _BLOCK, _COMPS, threshold=1.5
    ).collect()
    want = _con().execute(
        record_linkage_pairs_sql("customer", "c_custkey", _BLOCK, _COMPS, 1.5)
    ).fetchall()
    assert [(r.id_a, r.id_b, r.score) for r in got] == [tuple(w) for w in want]
    assert len(got) > 0


def test_block_audit_oracle(spark):
    got = block_size_audit(_customer(spark), _BLOCK, top_n=20).collect()
    want = _con().execute(
        block_size_audit_sql("customer", _BLOCK, top_n=20)
    ).fetchall()
    assert [tuple(r) for r in got] == [tuple(w) for w in want]
    # the audit's purpose: pair counts are the quadratic exposure
    for r in got:
        assert r.n_pairs == r.n_records * (r.n_records - 1) // 2


def test_comparator_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha", 100.0, "B"),
            (2, "alphX", 100.0, "B"),   # lev 1 -> name sim .75*2 + bal 1.0
            (3, "zzzzz", 600.0, "B"),   # lev 5 -> 0; bal diff 500 -> 0
            (4, "alpha", 100.0, "C"),   # different block: never paired
        ],
        "id long, name string, bal double, blk string",
    )
    comps = [
        Comparator("name", "levenshtein", weight=2.0, scale=4.0),
        Comparator("bal", "abs_diff", weight=1.0, scale=500.0),
    ]
    rows = record_linkage_pairs(df, "id", ["blk"], comps, threshold=0.0).collect()
    scores = {(r.id_a, r.id_b): r.score for r in rows}
    assert scores[(1, 2)] == 2.5   # 2*(1-1/4) + 1*(1-0/500)
    assert scores[(1, 3)] == 0.0   # both comparators floored at 0
    assert (1, 4) not in scores    # blocking respected


def test_resolve_entities_oracle(spark):
    from bullet_storm_spark.operators.linkage import (
        resolve_entities,
        resolve_entities_sql,
    )

    got = resolve_entities(
        _customer(spark), "c_custkey", _BLOCK, _COMPS,
        threshold=1.5, survivor_col="c_acctbal",
    ).collect()
    want = _con().execute(
        resolve_entities_sql(
            "customer", "c_custkey", _BLOCK, _COMPS,
            threshold=1.5, survivor_col="c_acctbal",
        )
    ).fetchall()
    assert [tuple(r) for r in got] == [tuple(w) for w in want]
    # every record appears exactly once; canonicals are self-canonical
    ids = [r.c_custkey for r in got]
    assert len(ids) == len(set(ids))
    by_cluster = {}
    for r in got:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for members in by_cluster.values():
        canon = [m for m in members if m.is_canonical]
        assert len(canon) == 1
        assert all(m.canonical_id == canon[0].c_custkey for m in members)
        assert len(members) == members[0].cluster_size


def test_empty_block_on_rejected(spark):
    import pytest

    with pytest.raises(ValueError, match="block_on"):
        record_linkage_pairs(_customer(spark), "c_custkey", [], _COMPS)
    with pytest.raises(ValueError, match="block_on"):
        record_linkage_pairs_sql("customer", "c_custkey", [], _COMPS)


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking
# ---------------------------------------------------------------------------

def test_sorted_neighborhood_pairs_exact(spark):
    from pyspark.sql import functions as F

    from bullet_storm_spark.operators.linkage import (
        sorted_neighborhood_audit, sorted_neighborhood_audit_sql,
    )

    # 8 records; sort key ties broken by id; window 3 -> pairs with
    # positional distance 1..2 over the (key, id) order
    rows = [
        (1, 10, "x"), (2, 10, "y"), (3, 12, "x"), (4, 15, "x"),
        (5, 15, "y"), (6, 20, "y"), (7, 21, "x"), (8, 30, "x"),
    ]
    df = spark.createDataFrame(rows, "id long, k long, g string")
    out = sorted_neighborhood_audit(
        df, "id", F.col("k"), ["g"], window=3
    ).collect()[0]

    order = sorted(rows, key=lambda r: (r[1], r[0]))
    want_pairs = [
        (order[i], order[j])
        for i in range(len(order))
        for j in range(i + 1, min(i + 3, len(order)))
    ]
    assert out.n_records == 8
    assert out.n_pairs == len(want_pairs)
    assert out.n_agree_g == sum(a[2] == b[2] for a, b in want_pairs)

    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, k BIGINT, g VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    duck = con.execute(
        sorted_neighborhood_audit_sql("t", "id", "k", ["g"], window=3)
    ).fetchall()
    assert [tuple(out)] == duck


def test_sorted_neighborhood_no_bnlj(spark):
    """The window-of-w pair generation must be a band EQUI-join."""
    from pyspark.sql import functions as F

    from bullet_storm_spark.operators.linkage import sorted_neighborhood_audit

    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 7 % 50).alias("k"),
        (F.col("id") % 3).cast("string").alias("g"),
    )
    plan = (
        sorted_neighborhood_audit(df, "id", F.col("k"), ["g"], window=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # exactly ONE nested-loop join is allowed: the declared 1-row
    # n_records scalar broadcast; the pair generation itself must be a
    # keyed join on the band column
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "__b" in plan
    keyed = sum(plan.count(j) for j in (
        "SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
    ))
    assert keyed >= 1, plan
