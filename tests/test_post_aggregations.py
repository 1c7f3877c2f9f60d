"""Post-aggregation coverage: HAVING / COMPUTATION / CULLING / ORDER BY in
both compiled programs (bullet-core post-aggregation surface)."""

import duckdb

from bullet_storm_spark import (
    Computation,
    Culling,
    Field,
    GroupBy,
    GroupOperation,
    GroupOpType,
    Having,
    OrderBy,
    Query,
    compile_query,
    oracle_sql_for,
)
from bullet_storm_spark.plans.expressions import SqlExpression, gt


def test_having_computation_culling_order(spark):
    rows = [(i % 5, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "k int, v double")
    q = Query(
        source="t",
        aggregation=GroupBy(
            fields={"k": ""},
            operations=[
                GroupOperation(GroupOpType.COUNT, None, "cnt"),
                GroupOperation(GroupOpType.SUM, "v", "s", exact_decimal=True),
            ],
        ),
        post_aggregations=[
            Having(gt("cnt", 0)),
            Computation([Field("avg_v", SqlExpression("s / cnt"))]),
            Culling(["s"]),
            OrderBy([("k", True)]),
        ],
    )
    out = compile_query(q)(df)
    assert out.columns == ["k", "cnt", "avg_v"]  # 's' culled, avg_v appended
    spark_rows = [tuple(r) for r in out.collect()]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (k int, v double)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck_rows = con.sql(oracle_sql_for(q)).fetchall()
    assert spark_rows == duck_rows
    assert spark_rows[0][0] == 0 and len(spark_rows) == 5


def test_having_filters_groups(spark):
    df = spark.createDataFrame([("a",)] * 10 + [("b",)] * 2, "k string")
    q = Query(
        aggregation=GroupBy(
            fields={"k": ""},
            operations=[GroupOperation(GroupOpType.COUNT, None, "cnt")],
        ),
        post_aggregations=[Having(gt("cnt", 5))],
    )
    out = compile_query(q)(df).collect()
    assert [(r.k, r.cnt) for r in out] == [("a", 10)]
