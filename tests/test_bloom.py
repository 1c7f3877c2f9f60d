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


def test_semijoin_reduction_preserves_join_result(spark):
    # the bloom prefilter admits a superset of joining rows (never fewer),
    # so the join result is IDENTICAL while the shuffle input shrinks
    import __spark_entry__ as em
    from bullet_storm_spark.operators import bloom as B
    from bullet_storm_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    out = em.queries()["join_bloom_prefiltered"](spark, sf).collect()

    customer = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    build = customer.where(F.col("c_nationkey") == 7).select("c_custkey", "c_name")
    plain = (
        orders.join(build, orders.o_custkey == build.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double"), 2
            ).alias("revenue"),
        )
        .orderBy("c_custkey")
        .collect()
    )
    assert [tuple(r) for r in out] == [tuple(r) for r in plain]

    # and the prefilter genuinely reduces the fact side pre-shuffle
    words = B.bloom_words(
        build.select(F.col("c_custkey").cast("string").alias("k")),
        "k", m_bits=4096, k=4,
    )
    kept = orders.where(
        B.bloom_maybe_member(F.col("o_custkey").cast("string"), words, 4096, 4)
    ).count()
    total = orders.count()
    joining = orders.join(build, orders.o_custkey == build.c_custkey).count()
    assert joining <= kept < total
