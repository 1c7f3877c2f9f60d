"""Count-Min sketch (operators/cms.py): overestimate-only guarantee,
mergeability across shards, DuckDB parity, and parameter validation."""

import duckdb
import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.operators import cms

W, D = 32, 3  # deliberately narrow so collisions actually happen


@pytest.fixture(scope="module")
def keyed(spark):
    # zipf-ish: key j appears (120 - j) times
    rows = [(i, f"k{j}") for j in range(40) for i in range(120 - j)]
    return spark.createDataFrame(
        [(i, k) for i, (_, k) in enumerate(rows)], "id long, key string"
    )


@pytest.fixture(scope="module")
def duck(keyed):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, key VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", keyed.collect())
    return con


def test_sketch_mass_conservation(keyed):
    # every depth row holds the full occurrence count once
    total = keyed.count()
    cells = cms.cms_build(keyed, "key", width=W, depth=D).collect()
    per_row = {}
    for r in cells:
        per_row[r.row_idx] = per_row.get(r.row_idx, 0) + r.cnt
    assert per_row == {i: total for i in range(D)}


def test_estimate_never_underestimates(keyed):
    out = cms.cms_estimate_audit(keyed, "key", width=W, depth=D, top_n=40).collect()
    assert len(out) == 40
    for r in out:
        assert r.est_cnt >= r.exact_cnt, f"underestimate for {r.key}"
        assert r.overestimate == r.est_cnt - r.exact_cnt
    # a 32-wide sketch over 40 keys MUST collide somewhere
    assert any(r.overestimate > 0 for r in out)


def test_build_duck_parity(keyed, duck):
    s = [tuple(r) for r in cms.cms_build(keyed, "key", width=W, depth=D).collect()]
    d = duck.execute(cms.cms_build_sql("t", "key", width=W, depth=D)).fetchall()
    assert s == [tuple(r) for r in d]


def test_audit_duck_parity(keyed, duck):
    s = [
        tuple(r)
        for r in cms.cms_estimate_audit(
            keyed, "key", width=W, depth=D, top_n=15
        ).collect()
    ]
    d = duck.execute(
        cms.cms_estimate_audit_sql("t", "key", width=W, depth=D, top_n=15)
    ).fetchall()
    assert s == [tuple(r) for r in d]


def test_merge_across_shards_is_resum(spark, keyed):
    # union two shard sketches and re-sum == sketch of the union: the
    # property that lets per-day/per-shard sketches roll up without rescan
    a = keyed.where(F.col("id") % 2 == 0)
    b = keyed.where(F.col("id") % 2 == 1)
    merged = (
        cms.cms_build(a, "key", width=W, depth=D)
        .unionByName(cms.cms_build(b, "key", width=W, depth=D))
        .groupBy("row_idx", "col_idx")
        .agg(F.sum("cnt").alias("cnt"))
        .orderBy("row_idx", "col_idx")
    )
    whole = cms.cms_build(keyed, "key", width=W, depth=D)
    assert [tuple(r) for r in merged.collect()] == [tuple(r) for r in whole.collect()]


def test_param_validation(keyed):
    with pytest.raises(ValueError):
        cms.cms_build(keyed, "key", width=1, depth=3)
    with pytest.raises(ValueError):
        cms.cms_build(keyed, "key", width=64, depth=0)
