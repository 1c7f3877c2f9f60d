"""Rolling stats / z-score monitor: pure-Python oracle + DuckDB twin."""

import math
import random

import duckdb
import pytest

from bullet_storm_spark.operators.rolling import (
    rolling_outliers,
    rolling_outliers_sql,
    rolling_stats,
    rolling_stats_sql,
)

ROWS = [
    # key a: stable around 10 with one spike at seq 6
    ("a", 1, 10.0), ("a", 2, 10.5), ("a", 3, 9.5), ("a", 4, 10.2),
    ("a", 5, 9.8), ("a", 6, 50.0), ("a", 7, 10.1),
    # key b: too short for a preceding frame of 2
    ("b", 1, 1.0), ("b", 2, 2.0),
]


def _py_rolling(rows, window_rows=4):
    out = []
    bykey = {}
    for k, seq, v in sorted(rows):
        bykey.setdefault(k, []).append((seq, v))
    for k, pts in sorted(bykey.items()):
        vals = [v for _, v in pts]
        for i, (seq, v) in enumerate(pts):
            cur = vals[max(0, i - window_rows + 1): i + 1]
            prev = vals[max(0, i - window_rows): i]
            n = len(cur)
            mean = sum(cur) / n
            std = (
                math.sqrt(
                    (sum(x * x for x in cur) - sum(cur) ** 2 / n) / (n - 1)
                )
                if n >= 2
                else None
            )
            z = None
            if len(prev) >= 2:
                mp = sum(prev) / len(prev)
                vp = (sum(x * x for x in prev) - sum(prev) ** 2 / len(prev)) / (
                    len(prev) - 1
                )
                if vp > 0:
                    z = (v - mp) / math.sqrt(vp)
            out.append((k, seq, n, mean, std, z))
    return out


def test_rolling_stats_matches_python(spark):
    df = spark.createDataFrame(ROWS, "k string, seq long, value double")
    got = sorted(
        (r["k"], r["seq"], r["roll_n"], r["roll_mean"], r["roll_std"], r["roll_z"])
        for r in rolling_stats(df, ["k"], ["seq"], "value", window_rows=4).collect()
    )
    want = _py_rolling(ROWS)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        for gv, wv in zip(g[3:], w[3:]):
            if wv is None:
                assert gv is None
            else:
                assert gv == pytest.approx(wv, abs=1e-9)


def test_rolling_outliers_flags_spike_and_matches_duckdb(spark):
    df = spark.createDataFrame(ROWS, "k string, seq long, value double")
    got = [
        tuple(r)
        for r in rolling_outliers(
            df, ["k"], ["seq"], "value", window_rows=4, z_threshold=3.0
        ).collect()
    ]
    # only the spike at (a, 6) breaches 3 trailing sigmas
    assert [(g[0], g[1]) for g in got] == [("a", 6)]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"('{k}', {s}, {v})" for k, s, v in ROWS)
        + ") v(k, seq, value)"
    )
    oracle = con.execute(
        rolling_outliers_sql(
            "t", ["k"], ["seq"], "value", window_rows=4, z_threshold=3.0
        )
    ).fetchall()
    assert got == [tuple(r) for r in oracle]


def test_rolling_parity_fuzz(spark):
    rng = random.Random(7)
    rows = [
        (
            rng.choice(["x", "y"]),
            i,
            rng.choice(
                [round(rng.uniform(-5, 5), 1), rng.uniform(-1e5, 1e5), 0.0]
            ),
        )
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "k string, seq long, value double")
    got = [
        tuple(r)
        for r in rolling_outliers(
            df, ["k"], ["seq"], "value", window_rows=8, z_threshold=1.5
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"('{k}', {s}, {v!r})" for k, s, v in rows)
        + ") v(k, seq, value)"
    )
    oracle = con.execute(
        rolling_outliers_sql(
            "t", ["k"], ["seq"], "value", window_rows=8, z_threshold=1.5
        )
    ).fetchall()
    assert got == [tuple(r) for r in oracle]
    assert len(got) > 3  # the fuzz frame actually produces flags


def test_rolling_validation(spark):
    df = spark.createDataFrame([(1, 1.0)], "seq long, value double")
    with pytest.raises(ValueError):
        rolling_stats(df, [], ["seq"], "value")
    with pytest.raises(ValueError):
        rolling_stats(df, ["seq"], [], "value")
    with pytest.raises(ValueError):
        rolling_stats_sql("t", ["k"], ["seq"], "value", window_rows=1)
    with pytest.raises(ValueError):
        rolling_outliers_sql("t", ["k"], ["seq"], "value", z_threshold=0)
