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
