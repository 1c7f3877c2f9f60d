"""Table profiling (Deequ-style per-column metrics)."""

import datetime as dt

import pytest

from bullet_storm_spark.operators.profile import profile_table


def test_profile_metrics_and_typed_extremes(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, "alpha", 2.5, t0, ["x"]),
        (2, "beta", -1.0, t0 + dt.timedelta(days=1), []),
        (3, None, 2.5, None, None),
        (None, "alpha", None, t0, ["y"]),
    ]
    df = spark.createDataFrame(
        rows, "k long, s string, v double, ts timestamp, arr array<string>"
    )
    prof = {r.column: r for r in profile_table(df).collect()}
    assert set(prof) == {"k", "s", "v", "ts", "arr"}
    k = prof["k"]
    assert (k.n_rows, k.n_nulls, k.null_rate) == (4, 1, 0.25)
    assert k.n_distinct == 3 and k.num_min == 1.0 and k.num_max == 3.0
    assert k.str_min is None and k.str_max is None
    s = prof["s"]
    assert s.n_distinct == 2 and s.str_min == "alpha" and s.str_max == "beta"
    assert s.num_min is None
    v = prof["v"]
    assert v.n_distinct == 2 and v.num_min == -1.0 and v.num_max == 2.5
    ts = prof["ts"]
    assert ts.n_nulls == 1
    assert ts.num_min == float(int(t0.timestamp() * 1_000_000))
    arr = prof["arr"]  # complex type: completeness only
    assert arr.n_nulls == 1 and arr.n_distinct is None
    assert arr.num_min is None and arr.str_min is None


def test_profile_column_subset_and_validation(spark):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    assert [r.column for r in profile_table(df, columns=["s"]).collect()] == ["s"]
    with pytest.raises(ValueError):
        profile_table(df, columns=["missing"])


def test_profile_approx_distinct_path(spark):
    df = spark.createDataFrame([(i % 100,) for i in range(1000)], "k long")
    [r] = profile_table(df, exact_distinct=False).collect()
    # HLL++ estimate within its documented rsd of the true 100
    assert abs(r.n_distinct - 100) <= 5


def test_expectations_verdicts(spark):
    import duckdb

    from bullet_storm_spark.operators.profile import (
        check_expectations,
        check_expectations_sql,
    )

    rows = [(1, "a", 5.0), (2, "b", 50.0), (3, "a", None), (None, "c", 7.0)]
    df = spark.createDataFrame(rows, "k long, s string, v double")
    rules = [
        ("not_null", "k", 0.3),        # 1/4 nulls <= 0.3 -> pass
        ("not_null", "v", 0.1),        # 1/4 > 0.1 -> fail
        ("unique", "k", ),             # 3 distinct + 1 null == 4 -> pass
        ("unique", "s", ),             # 3 distinct + 0 null != 4 -> fail
        ("min_at_least", "v", 0.0),    # min 5.0 >= 0 -> pass
        ("max_at_most", "v", 10.0),    # max 50 -> fail
        ("distinct_at_least", "s", 3.0),
        ("distinct_at_most", "s", 2.0),  # 3 > 2 -> fail
    ]
    got = {r.rule_idx: r for r in check_expectations(df, rules).collect()}
    verdicts = [got[i].passed for i in range(len(rules))]
    assert verdicts == [True, False, True, False, True, False, True, False]
    assert got[1].observed == 0.25 and got[1].threshold == 0.1
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, s VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    want = con.sql(check_expectations_sql("t", rules)).fetchall()
    spark_rows = [
        (r.rule_idx, r.kind, r.column, r.observed, r.threshold, r.passed)
        for _, r in sorted(got.items())
    ]
    assert spark_rows == want


def test_expectations_validation(spark):
    import pytest

    from bullet_storm_spark.operators.profile import check_expectations

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        check_expectations(df, [])
    with pytest.raises(ValueError):
        check_expectations(df, [("bogus_kind", "k")])
    with pytest.raises(ValueError):
        check_expectations(df, [("not_null", "k")])  # missing param


def test_referential_check_orphans_and_nulls(spark):
    import duckdb

    from bullet_storm_spark.operators.profile import (
        referential_check,
        referential_check_sql,
    )

    parent = [(1,), (2,), (3,)]
    child = [(10, 1), (11, 1), (12, 2), (13, 99), (14, None), (15, 98)]
    p = spark.createDataFrame(parent, "pk long")
    c = spark.createDataFrame(child, "id long, fk long")
    [r] = referential_check(c, p, "fk", "pk").collect()
    assert r.n_child == 6 and r.fk_nulls == 1
    assert r.n_orphans == 2  # fks 99, 98
    assert r.orphan_rate == round(2 / 5, 6)
    assert r.n_parent == 3 and r.pk_is_unique
    con = duckdb.connect()
    con.execute("CREATE TABLE p (pk BIGINT)")
    con.execute("CREATE TABLE c (id BIGINT, fk BIGINT)")
    con.executemany("INSERT INTO p VALUES (?)", parent)
    con.executemany("INSERT INTO c VALUES (?,?)", child)
    [want] = con.sql(referential_check_sql("c", "p", "fk", "pk")).fetchall()
    assert (r.n_child, r.fk_nulls, r.n_orphans, r.orphan_rate,
            r.n_parent, r.pk_is_unique) == want


def test_referential_check_nonunique_parent_key(spark):
    from bullet_storm_spark.operators.profile import referential_check

    p = spark.createDataFrame([(1,), (1,), (2,)], "pk long")
    c = spark.createDataFrame([(10, 1)], "id long, fk long")
    [r] = referential_check(c, p, "fk", "pk").collect()
    assert not r.pk_is_unique and r.n_parent == 3 and r.n_orphans == 0


# ---------------------------------------------------------------------------
# Functional dependencies
# ---------------------------------------------------------------------------

def test_functional_deps_semantics(spark):
    import duckdb

    from bullet_storm_spark.operators.profile import (
        functional_deps, functional_deps_sql,
    )

    rows = [
        (1, "a", 10.0),
        (2, "a", 10.0),
        (3, "b", 20.0),
        (3, "b", 30.0),       # k=3 maps v -> {20, 30}: violates id->v
        (4, "c", None),
        (4, "c", 40.0),       # NULL-vs-value conflict IS a violation
        (None, "d", 50.0),    # NULL determinant: excluded entirely
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = {
        (r.determinant, r.dependent): r
        for r in functional_deps(
            df, [("id", "g"), ("id", "v"), ("g", "id")]
        ).collect()
    }
    r = out[("id", "g")]
    assert (r.n_keys, r.n_violating, r.max_dependents, r.holds) == (4, 0, 1, 1)
    r = out[("id", "v")]
    # keys 3 (two values) and 4 (NULL + value) violate
    assert (r.n_keys, r.n_violating, r.max_dependents, r.holds) == (4, 2, 2, 0)
    r = out[("g", "id")]
    # 'a' maps to ids {1, 2}: one violating key of four ('d' has only a
    # NULL id — one "value", no conflict)
    assert (r.n_keys, r.n_violating, r.max_dependents, r.holds) == (4, 1, 2, 0)

    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, g VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    duck = con.execute(
        functional_deps_sql("t", [("id", "g"), ("id", "v"), ("g", "id")])
    ).fetchall()
    spark_rows = [
        tuple(r)
        for r in functional_deps(
            df, [("id", "g"), ("id", "v"), ("g", "id")]
        ).collect()
    ]
    assert spark_rows == duck


def test_json_key_profile_semantics(spark):
    import duckdb

    from bullet_storm_spark.operators.profile import (
        json_key_profile, json_key_profile_sql,
    )

    rows = [
        ('{"a": 1, "b": null}',),
        ('{"a": 2}',),
        ('{"b": 3, "c": {"x": 1}}',),
        (None,),                       # NULL json: denominator only
    ]
    df = spark.createDataFrame(rows, "j string")
    out = {r.key: r for r in json_key_profile(df, "j").collect()}
    assert out["a"].n_present == 2 and out["a"].n_json_null == 0
    assert out["b"].n_present == 2 and out["b"].n_json_null == 1
    assert out["c"].n_present == 1 and out["c"].n_json_null == 0
    # share over ALL rows incl. the NULL-json one
    assert out["a"].share_present == 0.5

    con = duckdb.connect()
    con.execute("CREATE TABLE t (j VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    duck = con.execute(
        json_key_profile_sql("(SELECT j FROM t)", "j")
    ).fetchall()
    assert [tuple(r) for r in json_key_profile(df, "j").collect()] == duck
