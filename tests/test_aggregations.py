"""Aggregation operator tests with exact expected outputs, mirroring the
reference's operator-exactness style (SURVEY.md §5): group count 10, merge
1..5 -> 15, 256 distinct -> 256, PMF bins with exact counts/probabilities,
top-k rows with counts."""

import pytest

from bullet_storm_spark import (
    CountDistinct,
    Distribution,
    DistributionType,
    GroupAll,
    GroupBy,
    GroupOperation,
    GroupOpType,
    OrderBy,
    Projection,
    Query,
    Raw,
    TopK,
    compile_query,
)
from bullet_storm_spark.plans.expressions import eq, fld, gt


def run(q, df):
    return compile_query(q)(df)


# --- RAW (JoinBoltTest.java:340-351,644-660) -------------------------------

def test_raw_limit_truncates_excess(spark):
    df = spark.range(500).selectExpr("id", "id % 7 AS m")
    q = Query(filter=gt("id", 99), aggregation=Raw(size=25))
    out = run(q, df)
    assert out.count() == 25


def test_raw_with_order_is_deterministic(spark):
    df = spark.range(100).selectExpr("id", "cast(id % 10 as string) AS k")
    q = Query(
        aggregation=Raw(size=5),
        post_aggregations=[OrderBy([("id", False)])],
    )
    out = [r.id for r in run(q, df).collect()]
    assert out == [99, 98, 97, 96, 95]


# --- GROUP ALL (FilterBoltTest.java:651-676, JoinBoltTest.java:663-693) ----

def test_group_all_count_with_filter(spark):
    # 10 matching records -> cnt == 10 exactly
    df = spark.createDataFrame(
        [(str(i % 2),) for i in range(20)], "timestamp string"
    )
    q = Query(
        filter=eq("timestamp", "1"),
        aggregation=GroupAll(GroupOperation(GroupOpType.COUNT, None, "cnt")),
    )
    rows = run(q, df).collect()
    assert len(rows) == 1 and rows[0].cnt == 10


def test_group_all_full_metric_set(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 6)], "v double")
    q = Query(
        aggregation=GroupAll(
            GroupOperation(GroupOpType.COUNT, None, "cnt"),
            GroupOperation(GroupOpType.SUM, "v", "s"),
            GroupOperation(GroupOpType.MIN, "v", "mn"),
            GroupOperation(GroupOpType.MAX, "v", "mx"),
            GroupOperation(GroupOpType.AVG, "v", "av"),
        )
    )
    r = run(q, df).collect()[0]
    # merge semantics: counts 1..5 summed -> 15 (JoinBoltTest.java:672-677)
    assert (r.cnt, r.s, r.mn, r.mx, r.av) == (5, 15.0, 1.0, 5.0, 3.0)


def test_group_all_empty_input_still_emits_one_row(spark):
    df = spark.createDataFrame([(1.0,)], "v double").where("v > 99")
    q = Query(
        aggregation=GroupAll(
            GroupOperation(GroupOpType.COUNT, None, "cnt"),
            GroupOperation(GroupOpType.SUM, "v", "s"),
        )
    )
    r = run(q, df).collect()
    assert len(r) == 1 and r[0].cnt == 0 and r[0].s is None


# --- GROUP BY (JoinBoltTest.java:737-786) ----------------------------------

def test_group_by_aliased_keys_and_metrics(spark):
    # 256 records, fieldA = i % 16, fieldB = i // 16 -> 16 groups,
    # each cnt=16 and sumB = 0+1+...+15 = 120
    rows = [(i % 16, i // 16) for i in range(256)]
    df = spark.createDataFrame(rows, "fieldA int, fieldB int")
    q = Query(
        aggregation=GroupBy(
            fields={"fieldA": "A"},
            operations=[
                GroupOperation(GroupOpType.COUNT, None, "cnt"),
                GroupOperation(GroupOpType.SUM, "fieldB", "sumB"),
            ],
        )
    )
    out = run(q, df)
    assert out.columns == ["A", "cnt", "sumB"]
    rows = out.collect()
    assert len(rows) == 16
    assert all(r.cnt == 16 and r.sumB == 120 for r in rows)


def test_group_by_partial_merge_associativity(spark):
    # two independently-aggregated halves must equal the whole
    # (JoinBoltTest.java:696-735 analogue; Catalyst's partial/final agg is
    # exercised by splitting the input across partitions)
    df = spark.range(1000).selectExpr("id % 8 AS k", "id AS v").repartition(7)
    q = Query(
        aggregation=GroupBy(
            fields={"k": ""},
            operations=[GroupOperation(GroupOpType.SUM, "v", "s")],
        )
    )
    merged = {(r.k, r.s) for r in run(q, df).collect()}
    expected = {
        (k, sum(i for i in range(1000) if i % 8 == k)) for k in range(8)
    }
    assert merged == expected


# --- COUNT DISTINCT (FilterBoltTest.java:680-710) --------------------------

def test_count_distinct_exact_256(spark):
    df = spark.createDataFrame([(i % 256,) for i in range(1024)], "field int")
    q = Query(aggregation=CountDistinct(fields=["field"], name="count"))
    r = run(q, df).collect()
    assert len(r) == 1 and r[0]["count"] == 256


def test_count_distinct_overlapping_halves_merge(spark):
    # halves 0..255 and 128..383 -> 384 distinct (JoinBoltTest.java:701-707
    # merge analogue, partitioned input)
    df = spark.createDataFrame(
        [(i,) for i in range(256)] + [(i,) for i in range(128, 384)], "field int"
    ).repartition(4)
    q = Query(aggregation=CountDistinct(fields=["field"], name="count"))
    assert run(q, df).collect()[0]["count"] == 384


def test_count_distinct_approx_within_rsd(spark):
    df = spark.range(10000).selectExpr("id AS field")
    q = Query(aggregation=CountDistinct(fields=["field"], name="count", exact=False))
    got = run(q, df).collect()[0]["count"]
    assert abs(got - 10000) / 10000 < 0.15


# --- DISTRIBUTION (FilterBoltTest.java:740-786) ----------------------------

@pytest.fixture(scope="module")
def uniform_0_100(spark):
    # field = 0..100 inclusive, uniform — FilterBoltTest.java:750-752
    return spark.createDataFrame([(float(i),) for i in range(101)], "field double")


def test_distribution_pmf_exact_bins(uniform_0_100):
    q = Query(
        aggregation=Distribution(
            field="field",
            dist_type=DistributionType.PMF,
            points=[0.0, 50.0, 100.0],
        )
    )
    rows = run(q, uniform_0_100).collect()
    got = {r.range: (r["count"], r.probability) for r in rows}
    # counts 0/50/50/1, probabilities /101 — FilterBoltTest.java:770-786
    assert got == {
        "(-inf, 0.0)": (0, 0.0),
        "[0.0, 50.0)": (50, round(50 / 101, 6)),
        "[50.0, 100.0)": (50, round(50 / 101, 6)),
        "[100.0, +inf)": (1, round(1 / 101, 6)),
    }


def test_distribution_cdf(uniform_0_100):
    q = Query(
        aggregation=Distribution(
            field="field",
            dist_type=DistributionType.CDF,
            points=[0.0, 50.0, 100.0],
        )
    )
    rows = run(q, uniform_0_100).collect()
    got = {r.range: (r["count"], r.probability) for r in rows}
    assert got == {
        "(-inf, 0.0)": (0, 0.0),
        "(-inf, 50.0)": (50, round(50 / 101, 6)),
        "(-inf, 100.0)": (100, round(100 / 101, 6)),
        "(-inf, +inf)": (101, 1.0),
    }


def test_distribution_quantile(uniform_0_100):
    q = Query(
        aggregation=Distribution(
            field="field",
            dist_type=DistributionType.QUANTILE,
            points=[0.0, 0.25, 0.5, 1.0],
        )
    )
    rows = run(q, uniform_0_100).collect()
    got = {r.quantile: r.value for r in rows}
    assert got == {0.0: 0.0, 0.25: 25.0, 0.5: 50.0, 1.0: 100.0}


# --- TOP K (FilterBoltTest.java:788-832, JoinBoltTest.java:846-893) --------

def test_top_k_with_nulls_and_aliases(spark):
    # A: value '0' x7, '3' x3, '1','2' x1; B always NULL -> "null"
    rows = [("0", None)] * 7 + [("3", None)] * 3 + [("1", None), ("2", None)]
    df = spark.createDataFrame(rows, "A string, B string")
    q = Query(
        aggregation=TopK(size=2, name="cnt", fields={"A": "", "B": "foo"})
    )
    out = run(q, df)
    assert out.columns == ["A", "foo", "cnt"]
    rows = [(r.A, r.foo, r.cnt) for r in out.collect()]
    assert rows == [("0", "null", 7), ("3", "null", 3)]


def test_top_k_threshold(spark):
    rows = [("a",)] * 10 + [("b",)] * 6 + [("c",)] * 2
    df = spark.createDataFrame(rows, "A string")
    q = Query(aggregation=TopK(size=5, threshold=5, name="cnt", fields={"A": ""}))
    out = [(r.A, r.cnt) for r in run(q, df).collect()]
    assert out == [("a", 10), ("b", 6)]  # 'c' below threshold 5


# --- oracle SQL generation sanity ------------------------------------------

def test_oracle_sql_matches_spark_on_duckdb(spark):
    """End-to-end dual-compilation check on a GROUP BY query: run the Spark
    plan and the generated DuckDB SQL on identical data, compare results."""
    import duckdb

    from bullet_storm_spark import oracle_sql_for

    rows = [(i % 4, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "k int, v double")
    q = Query(
        source="t",
        filter=gt("v", 9.0),
        aggregation=GroupBy(
            fields={"k": "key"},
            operations=[
                GroupOperation(GroupOpType.COUNT, None, "cnt"),
                GroupOperation(GroupOpType.SUM, "v", "s", exact_decimal=True),
                GroupOperation(GroupOpType.AVG, "v", "a", exact_decimal=True, round_to=6),
            ],
        ),
        post_aggregations=[OrderBy([("key", True)])],
    )
    spark_rows = [tuple(r) for r in run(q, df).collect()]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (k int, v double)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck_rows = con.sql(oracle_sql_for(q)).fetchall()
    assert spark_rows == duck_rows


# --- PERCENTILE (batch-only group extension) --------------------------------

def test_group_percentile_exact_interpolation(spark):
    import duckdb
    from bullet_storm_spark import oracle_sql_for

    rows = [(1, float(v)) for v in (1, 2, 3, 10)] + [(2, 5.0)]
    df = spark.createDataFrame(rows, "k int, v double")
    q = Query(
        source="t",
        aggregation=GroupBy(
            fields={"k": "key"},
            operations=[
                GroupOperation(GroupOpType.PERCENTILE, "v", "p50", round_to=6, p=0.5),
                GroupOperation(GroupOpType.PERCENTILE, "v", "p75", round_to=6, p=0.75),
            ],
        ),
        post_aggregations=[OrderBy([("key", True)])],
    )
    got = [tuple(r) for r in run(q, df).collect()]
    # k=1: sorted [1,2,3,10]; p50 at rank 1.5 -> 2.5; p75 at rank 2.25 -> 4.75
    assert got == [(1, 2.5, 4.75), (2, 5.0, 5.0)]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (k int, v double)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    assert got == con.sql(oracle_sql_for(q)).fetchall()


def test_group_percentile_rejects_bad_p(spark):
    df = spark.createDataFrame([(1, 1.0)], "k int, v double")
    q = Query(
        source="t",
        aggregation=GroupBy(
            fields={"k": "key"},
            operations=[GroupOperation(GroupOpType.PERCENTILE, "v", "bad", p=1.5)],
        ),
    )
    with pytest.raises(ValueError):
        run(q, df).collect()


def test_group_percentile_is_batch_only_in_streaming():
    from bullet_storm_spark.streaming.state import GroupState

    agg = GroupBy(
        fields={"k": "key"},
        operations=[GroupOperation(GroupOpType.PERCENTILE, "v", "p50", p=0.5)],
    )
    with pytest.raises(ValueError, match="batch-only"):
        GroupState(agg)


def test_hll_daily_rollup_error_envelope(spark):
    from pyspark.sql import functions as F

    from bullet_storm_spark.operators.sketches import hll_daily_rollup
    from bullet_storm_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    out = {r.day: r.est_distinct for r in hll_daily_rollup(ev, "user_id").collect()}
    exact_days = {
        r.day: r.c
        for r in ev.select(
            F.expr("(ts_ns div 1000) div 86400000000").alias("day"), "user_id"
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("c"))
        .collect()
    }
    exact_total = ev.select("user_id").distinct().count()
    # lgConfigK=12 HLL: rsd ~1.6%; allow 5% slack per day and on the union
    for day, exact in exact_days.items():
        assert abs(out[day] - exact) <= max(2, 0.05 * exact), (day, out[day], exact)
    assert abs(out[-1] - exact_total) <= max(2, 0.05 * exact_total)
    # the union row merges summaries only — it must cover every day
    assert set(out) == set(exact_days) | {-1}


def test_hll_audience_overlap_error_envelope(spark):
    """Inclusion-exclusion overlap on HLL sketches: estimates within the
    lgConfigK=12 envelope (~1.6% RSE -> 5% assertion head-room) of the
    exact set algebra on a constructed overlap."""
    from pyspark.sql import functions as F

    from bullet_storm_spark.operators.sketches import hll_audience_overlap

    # A = users 0..9999, B = 5000..14999 -> |A∩B| = 5000, |A∪B| = 15000
    df = spark.range(10_000).select(
        F.col("id").alias("user_id"), F.lit("A").alias("seg")
    ).unionByName(
        spark.range(5_000, 15_000).select(
            F.col("id").alias("user_id"), F.lit("B").alias("seg")
        )
    )
    r = hll_audience_overlap(df, "user_id", "seg").collect()
    assert len(r) == 1
    row = r[0]
    assert (row.slice_a, row.slice_b) == ("A", "B")
    for est, exact in (
        (row.est_a, 10_000), (row.est_b, 10_000),
        (row.est_union, 15_000), (row.est_intersect, 5_000),
    ):
        assert abs(est - exact) / exact < 0.05, (est, exact)
    assert abs(row.jaccard_est - 5_000 / 15_000) < 0.02
    # estimates are deterministic: a second run returns identical rows
    r2 = hll_audience_overlap(df, "user_id", "seg").collect()
    assert [tuple(x) for x in r] == [tuple(x) for x in r2]
