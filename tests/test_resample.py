"""Time-spine resampling + LOCF gap-fill (operators/resample.py).

Hand-built frame with known gaps pins bucket densification, zero-fill,
carry-forward, and the gap run-length report; the DuckDB-twin test proves
dialect parity on the same rows (the entry-level gate re-proves it on the
driver tables).
"""

import datetime as dt

import duckdb
import pytest

from bullet_storm_spark.operators.resample import (
    gap_report,
    gap_report_sql,
    resample_locf,
    resample_locf_sql,
)


def _ts(day, hour):
    return dt.datetime(2024, 1, day, hour, 30, 0)


@pytest.fixture(scope="module")
def frame(spark):
    # key "a": hours 0,1,_,_,4 (two-gap run); key "b": hours 2,_,4
    rows = [
        ("a", _ts(1, 0), 10.0),
        ("a", _ts(1, 0), 20.0),  # two obs in one bucket -> n=2, sum=30
        ("a", _ts(1, 1), 5.0),
        ("a", _ts(1, 4), 7.0),
        ("b", _ts(1, 2), 1.0),
        ("b", _ts(1, 4), 2.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp_ntz, v double")


def test_resample_locf_dense_grid(frame):
    out = resample_locf(frame, "k", "ts", "v", unit="hour").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["key"], []).append(r)
    # key a: 5 slots (hour 0..4), gaps at 2 and 3
    a = by_key["a"]
    assert [r["bucket"].hour for r in a] == [0, 1, 2, 3, 4]
    assert [r["n"] for r in a] == [2, 1, 0, 0, 1]
    assert [r["filled"] for r in a] == [False, False, True, True, False]
    assert [r["v_sum"] for r in a] == [30.0, 5.0, None, None, 7.0]
    # LOCF carries 5.0 across both gap rows
    assert [r["v_locf"] for r in a] == [30.0, 5.0, 5.0, 5.0, 7.0]
    # key b: 3 slots, one gap
    b = by_key["b"]
    assert [r["n"] for r in b] == [1, 0, 1]
    assert [r["v_locf"] for r in b] == [1.0, 1.0, 2.0]


def test_gap_report_run_lengths(frame):
    rep = {r["key"]: r for r in gap_report(frame, "k", "ts", "v", unit="hour").collect()}
    assert rep["a"]["slots"] == 5
    assert rep["a"]["observed"] == 3
    assert rep["a"]["gaps"] == 2
    assert rep["a"]["longest_gap"] == 2  # hours 2-3 are one run
    assert rep["b"]["slots"] == 3
    assert rep["b"]["gaps"] == 1
    assert rep["b"]["longest_gap"] == 1


def test_resample_rejects_unknown_unit(frame):
    with pytest.raises(ValueError):
        resample_locf(frame, "k", "ts", "v", unit="fortnight")


def _duckdb_rows(frame, sql):
    con = duckdb.connect()
    con.register("t", frame.toPandas())
    return [tuple(r) for r in con.sql(sql).fetchall()]


def test_duckdb_twin_parity(frame):
    for builder, sql_builder in (
        (resample_locf, resample_locf_sql),
        (gap_report, gap_report_sql),
    ):
        spark_rows = [tuple(r) for r in builder(frame, "k", "ts", "v", unit="hour").collect()]
        duck_rows = _duckdb_rows(frame, sql_builder("t", "k", "ts", "v", unit="hour"))
        assert spark_rows == duck_rows
