"""Property-based dual-compilation testing: random expression trees and
queries must produce identical results from the Spark plan and the
generated DuckDB oracle SQL. This is the adversarial version of the
driver's correctness gate (and what the reference's hand-picked operator
tests never had — SURVEY.md §5)."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from bullet_storm_spark import (
    CountDistinct,
    GroupBy,
    GroupOperation,
    GroupOpType,
    OrderBy,
    Query,
    Raw,
    TopK,
    compile_query,
    oracle_sql_for,
)
from bullet_storm_spark.plans.expressions import (
    Operation,
    UnaryExpression,
    eq,
    gt,
    isin,
    lt,
    neq,
)

ROWS = [
    (i % 7, ["a", "b", "c", None][i % 4], float(i) * 1.5 - 20, i)
    for i in range(200)
]
SCHEMA = "k int, s string, v double, n int"


@pytest.fixture(scope="module")
def data(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INTEGER, s VARCHAR, v DOUBLE, n INTEGER)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", ROWS)
    return df, con


int_lit = st.integers(min_value=-5, max_value=10)
str_lit = st.sampled_from(["a", "b", "c", "zz"])

leaf_pred = st.one_of(
    st.builds(lambda x: eq("k", x), int_lit),
    st.builds(lambda x: gt("k", x), int_lit),
    st.builds(lambda x: lt("n", x), st.integers(0, 200)),
    st.builds(lambda x: eq("s", x), str_lit),
    st.builds(lambda x: neq("s", x), str_lit),
    st.builds(lambda a, b: isin("s", a, b), str_lit, str_lit),
    st.builds(lambda x: gt("v", float(x)), int_lit),
)

predicate = st.recursive(
    leaf_pred,
    lambda children: st.one_of(
        st.builds(lambda a, b: a & b, children, children),
        st.builds(lambda a, b: a | b, children, children),
        st.builds(lambda a: UnaryExpression(a, Operation.NOT), children),
    ),
    max_leaves=6,
)

group_ops = st.lists(
    st.sampled_from(
        [
            GroupOperation(GroupOpType.COUNT, None, "cnt"),
            GroupOperation(GroupOpType.SUM, "n", "sum_n"),
            GroupOperation(GroupOpType.SUM, "v", "sum_v", exact_decimal=True),
            GroupOperation(GroupOpType.MIN, "n", "min_n"),
            GroupOperation(GroupOpType.MAX, "v", "max_v"),
            GroupOperation(GroupOpType.AVG, "v", "avg_v", exact_decimal=True),
            GroupOperation(GroupOpType.COUNT_FIELD, "s", "cnt_s"),
            GroupOperation(GroupOpType.VAR_POP, "v", "var_v", exact_decimal=True, round_to=6),
            GroupOperation(GroupOpType.PERCENTILE, "v", "p50_v", round_to=6, p=0.5),
            GroupOperation(GroupOpType.PERCENTILE, "n", "p90_n", round_to=6, p=0.9),
        ]
    ),
    min_size=1,
    max_size=4,
    unique_by=lambda op: op.alias,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def check(q, data):
    df, con = data
    spark_rows = sorted(
        tuple(str(x) for x in r) for r in compile_query(q)(df).collect()
    )
    duck_rows = sorted(
        tuple(str(x) for x in r) for r in con.sql(oracle_sql_for(q, "t")).fetchall()
    )
    assert spark_rows == duck_rows


@SETTINGS
@given(pred=predicate, ops=group_ops, key=st.sampled_from(["k", "s"]))
def test_grouped_queries_match_oracle(data, pred, ops, key):
    q = Query(
        source="t",
        filter=pred,
        aggregation=GroupBy(fields={key: "g"}, operations=ops),
    )
    check(q, data)


@SETTINGS
@given(pred=predicate, ops=group_ops)
def test_group_all_matches_oracle(data, pred, ops):
    q = Query(
        source="t",
        filter=pred,
        aggregation=GroupBy(fields={}, operations=ops, size=1),
    )
    check(q, data)


@SETTINGS
@given(pred=predicate, limit=st.integers(1, 50))
def test_raw_ordered_matches_oracle(data, pred, limit):
    q = Query(
        source="t",
        filter=pred,
        aggregation=Raw(size=limit),
        post_aggregations=[OrderBy([("n", True)])],  # n unique -> total order
    )
    check(q, data)


@SETTINGS
@given(pred=predicate, k=st.integers(1, 10), fields=st.sampled_from([["s"], ["k"], ["s", "k"]]))
def test_top_k_matches_oracle(data, pred, k, fields):
    q = Query(
        source="t",
        filter=pred,
        aggregation=TopK(size=k, name="cnt", fields={f: "" for f in fields}),
    )
    check(q, data)


@SETTINGS
@given(pred=predicate, fields=st.sampled_from([["k"], ["s"], ["k", "s"]]))
def test_count_distinct_matches_oracle(data, pred, fields):
    q = Query(
        source="t",
        filter=pred,
        aggregation=CountDistinct(fields=fields, name="cd"),
    )
    check(q, data)
