"""Salted aggregation must equal the plain plan on skewed data."""

from pyspark.sql import functions as F

from bullet_storm_spark.operators.skew import salted_group_agg
from bullet_storm_spark.plans.query import GroupOperation, GroupOpType


def test_salted_equals_plain_on_skewed_keys(spark):
    # hot key: 'hot' holds 90% of rows
    rows = [("hot", float(i)) for i in range(9000)] + [
        (f"k{i % 50}", float(i)) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "k string, v double").repartition(8)
    ops = [
        GroupOperation(GroupOpType.COUNT, None, "cnt"),
        GroupOperation(GroupOpType.SUM, "v", "s", exact_decimal=True),
        GroupOperation(GroupOpType.MIN, "v", "mn"),
        GroupOperation(GroupOpType.MAX, "v", "mx"),
        GroupOperation(GroupOpType.AVG, "v", "av", round_to=6),
    ]
    salted = {r.k: tuple(r)[1:] for r in salted_group_agg(df, ["k"], ops).collect()}
    plain = {
        r.k: tuple(r)[1:]
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("v").cast("decimal(38,6)")).cast("double").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.round(
                F.sum(F.col("v").cast("decimal(38,6)")).cast("double") / F.count("v"),
                6,
            ).alias("av"),
        )
        .collect()
    }
    assert salted == plain
    assert salted["hot"][0] == 9000


def test_salted_join_equals_plain_inner(spark):
    # hot key 0 holds 80% of left rows
    left = spark.createDataFrame(
        [(0, i) for i in range(4000)] + [(i % 97 + 1, i) for i in range(1000)],
        "k long, lv long",
    ).repartition(8)
    right = spark.createDataFrame(
        [(i, i * 10) for i in range(100)], "k long, rv long"
    )
    from bullet_storm_spark.operators.skew import salted_join

    got = sorted(
        tuple(r) for r in salted_join(left, right, "k", salt_buckets=8).collect()
    )
    want = sorted(tuple(r) for r in left.join(right, "k").collect())
    assert got == want


def test_salted_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, 1), (999, 2)], "k long, lv long")
    right = spark.createDataFrame([(1, 10)], "k long, rv long")
    from bullet_storm_spark.operators.skew import salted_join

    got = sorted(
        tuple(r) for r in salted_join(left, right, "k", how="left").collect()
    )
    want = sorted(tuple(r) for r in left.join(right, "k", "left").collect())
    assert got == want


def test_salted_join_duplicate_right_keys_and_empty_right(spark):
    from bullet_storm_spark.operators.skew import salted_join

    left = spark.createDataFrame([(1, 10), (1, 11), (2, 20)], "k long, lv long")
    right_dup = spark.createDataFrame([(1, 100), (1, 101)], "k long, rv long")
    got = sorted(tuple(r) for r in salted_join(left, right_dup, "k").collect())
    want = sorted(tuple(r) for r in left.join(right_dup, "k").collect())
    assert got == want  # each left row meets each matching right row once
    empty = right_dup.limit(0)
    assert salted_join(left, empty, "k").count() == 0
    assert salted_join(left, empty, "k", how="left").count() == 3


def test_salted_join_rejects_reserved_salt_column(spark):
    import pytest

    from bullet_storm_spark.operators.skew import salted_join

    left = spark.createDataFrame([(1, 0)], "k long, __salt long")
    right = spark.createDataFrame([(1, 2)], "k long, rv long")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(left, right, "k")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(right, left, "k")


# --- key-skew profile --------------------------------------------------

def test_key_skew_profile_uniform_and_skewed(spark):
    import duckdb
    from bullet_storm_spark.operators.skew import (
        key_skew_profile, key_skew_profile_sql,
    )

    uniform = [(k, i) for k in ("a", "b") for i in range(2)]
    skewed = [("a", i) for i in range(9)] + [("b", 0)]
    for rows, want_gini, want_top1 in (
        (uniform, 0.0, 0.5),
        (skewed, 0.4, 0.9),
    ):
        df = spark.createDataFrame(rows, "k string, v long")
        got = key_skew_profile(df, ["k"]).collect()[0]
        assert got.gini == want_gini and got.top1_share == want_top1
        assert got.n_rows == len(rows) and got.n_keys == 2
        con = duckdb.connect()
        con.execute("CREATE TABLE t (k VARCHAR, v BIGINT)")
        con.executemany("INSERT INTO t VALUES (?,?)", rows)
        d = con.execute(key_skew_profile_sql("t", ["k"])).fetchall()
        assert tuple(got) == tuple(d[0])


def test_key_skew_profile_topn_cut(spark):
    """topn_share cuts at the top_n hottest keys under the shared
    deterministic tie-break."""
    from bullet_storm_spark.operators.skew import key_skew_profile

    rows = [(f"k{i}", j) for i in range(5) for j in range(i + 1)]
    df = spark.createDataFrame(rows, "k string, v long")
    got = key_skew_profile(df, ["k"], top_n=2).collect()[0]
    # counts 1..5 over 15 rows; top-2 = 5 + 4
    assert got.topn_share == round(9 / 15, 6)
    assert got.max_count == 5
