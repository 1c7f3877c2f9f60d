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
