"""Bloom-filter membership index (operators/bloom.py): build/probe
semantics, the no-false-negative structural guarantee, DuckDB parity, and
the no-shuffle probe plan the 100 TB design notes promise."""

import duckdb
import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.operators import bloom

M, K = 1024, 3


@pytest.fixture(scope="module")
def keyed(spark):
    rows = [(i, f"key-{i % 120}") for i in range(200)]
    return spark.createDataFrame(rows, "id long, key string")


@pytest.fixture(scope="module")
def duck(keyed):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, key VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", keyed.collect())
    return con


def test_no_false_negatives(keyed):
    out = bloom.bloom_probe_audit(
        keyed, "id", "key", F.col("id") < 100, m_bits=M, k=K
    ).collect()
    assert len(out) == 200
    for r in out:
        if r.is_member:
            assert r.maybe_member, f"false negative at id={r.id}"
        assert r.false_positive == (r.maybe_member and not r.is_member)


def test_probe_audit_duck_parity(keyed, duck):
    s = [
        tuple(r)
        for r in bloom.bloom_probe_audit(
            keyed, "id", "key", F.col("id") < 100, m_bits=M, k=K
        ).collect()
    ]
    d = duck.execute(
        bloom.bloom_probe_audit_sql("t", "id", "key", "id < 100", m_bits=M, k=K)
    ).fetchall()
    assert s == [tuple(r) for r in d]


def test_build_duck_parity_and_density(keyed, duck):
    s = [tuple(r) for r in bloom.bloom_build(keyed, "key", m_bits=M, k=K).collect()]
    d = duck.execute(bloom.bloom_build_sql("t", "key", m_bits=M, k=K)).fetchall()
    assert s == [tuple(r) for r in d]
    # 120 distinct keys x 3 probes land <= 360 distinct bits
    n_bits = sum(bin(w & 0xFFFFFFFF).count("1") for _, w in s)
    assert 0 < n_bits <= 120 * K
    # every stored word is a positive 32-bit value (no sign-bit traffic)
    assert all(0 < w < (1 << 32) for _, w in s)


def test_tiny_filter_has_false_positives_never_negatives(spark):
    # saturate a deliberately undersized filter: fp rate must rise, the
    # no-false-negative guarantee must not budge
    rows = [(i, f"k{i}") for i in range(400)]
    df = spark.createDataFrame(rows, "id long, key string")
    out = bloom.bloom_probe_audit(
        df, "id", "key", F.col("id") < 200, m_bits=256, k=2
    ).collect()
    assert all(r.maybe_member for r in out if r.is_member)
    assert any(r.false_positive for r in out)


def test_probe_plan_is_join_free(keyed):
    # the hot path (maybe_member alone) must compile to a pure scan:
    # no Exchange, no Join anywhere in the physical plan
    words = bloom.bloom_words(keyed.where(F.col("id") < 100), "key", m_bits=M, k=K)
    probe = keyed.select(
        "id", bloom.bloom_maybe_member(F.col("key"), words, M, K).alias("m")
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_param_validation(keyed):
    with pytest.raises(ValueError):
        bloom.bloom_build(keyed, "key", m_bits=100, k=3)  # not a word multiple
    with pytest.raises(ValueError):
        bloom.bloom_build(keyed, "key", m_bits=1024, k=0)
    with pytest.raises(ValueError):
        bloom.bloom_maybe_member(F.col("key"), [0] * 3, 1024, 3)  # wrong length
