"""Trend analytics: pure-Python OLS/decay oracles + DuckDB twins."""

import duckdb
import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.operators.trend import (
    _DYADIC,
    decayed_top_items,
    decayed_top_items_sql,
    groupwise_ols,
    groupwise_ols_sql,
)

OLS_ROWS = [
    # key a: clean positive trend y = 2x + 1 with one outlier
    ("a", 0.0, 1.0), ("a", 1.0, 3.0), ("a", 2.0, 5.0),
    ("a", 3.0, 7.5), ("a", 4.0, 9.0),
    # key b: flat-ish noise
    ("b", 0.0, 4.0), ("b", 1.0, 3.5), ("b", 2.0, 4.2), ("b", 3.0, 3.9),
    # key c: single point -> NULL stats
    ("c", 5.0, 5.0),
    # key d: zero x-variance -> NULL stats
    ("d", 2.0, 1.0), ("d", 2.0, 9.0),
]


def _py_ols(rows, center=True):
    keys = sorted({k for k, _, _ in rows})
    xmin = min(x for _, x, _ in rows) if center else 0.0
    out = []
    for key in keys:
        pts = [(x - xmin, y) for k, x, y in rows if k == key]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = n * sum(x * y for x, y in pts) - sx * sy
        sxx = n * sum(x * x for x, _ in pts) - sx * sx
        syy = n * sum(y * y for _, y in pts) - sy * sy
        if n < 2 or sxx <= 0:
            out.append((key, n, None, None, None))
            continue
        slope = sxy / sxx
        intercept = (sy - slope * sx) / n
        r2 = (sxy * sxy) / (sxx * syy) if syy > 0 else None
        out.append((key, n, slope, intercept, r2))
    return out


def test_groupwise_ols_matches_python_and_duckdb(spark):
    df = spark.createDataFrame(OLS_ROWS, "k string, x double, y double")
    got = [tuple(r) for r in groupwise_ols(df, ["k"], "x", "y").collect()]
    want = _py_ols(OLS_ROWS)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:2] == w[:2]
        for gv, wv in zip(g[2:], w[2:]):
            if wv is None:
                assert gv is None
            else:
                assert gv == pytest.approx(wv, abs=1e-9)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"('{k}', {x}, {y})" for k, x, y in OLS_ROWS)
        + ") v(k, x, y)"
    )
    oracle = con.execute(groupwise_ols_sql("t", ["k"], "x", "y")).fetchall()
    assert got == [tuple(r) for r in oracle]


def test_groupwise_ols_slope_shift_invariant(spark):
    df = spark.createDataFrame(OLS_ROWS, "k string, x double, y double")
    centered = groupwise_ols(df, ["k"], "x", "y", center_x=True).collect()
    raw = groupwise_ols(df, ["k"], "x", "y", center_x=False).collect()
    for c, r in zip(centered, raw):
        if c["slope"] is not None:
            assert c["slope"] == pytest.approx(r["slope"], abs=1e-9)
            assert c["r2"] == pytest.approx(r["r2"], abs=1e-9)


def test_groupwise_ols_validation(spark):
    df = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
    with pytest.raises(ValueError):
        groupwise_ols(df, [], "x", "y")
    with pytest.raises(ValueError):
        groupwise_ols_sql("t", [], "x", "y")


def test_dyadic_table_is_exact():
    for k, s in enumerate(_DYADIC):
        assert float(s) == 2.0 ** -k


def test_decayed_top_items_matches_python_and_duckdb(spark):
    # half-life 100us; tmax = 1000. ages: item A fresh x3 (3.0), item B
    # fresh x1 + ancient x5 clamped to 2^-12 (~1.0012), item C one
    # half-life old x4 (2.0) — decayed order A > C > B while raw counts
    # say B is the biggest
    rows = [
        ("A", 1000), ("A", 950), ("A", 920),
        ("B", 1000), ("B", 1), ("B", 2), ("B", 3), ("B", 4), ("B", 5),
        ("C", 900), ("C", 890), ("C", 880), ("C", 870),
    ]
    df = spark.createDataFrame(rows, "item string, ts long")
    got = [
        tuple(r)
        for r in decayed_top_items(df, "item", "ts", halflife_us=100, k=3).collect()
    ]

    def weight(ts):
        k = min((1000 - ts) // 100, 12)
        return 2.0 ** -k

    want = {}
    for item, ts in rows:
        n, wsum = want.get(item, (0, 0.0))
        want[item] = (n + 1, wsum + weight(ts))
    ranked = sorted(want.items(), key=lambda kv: (-kv[1][1], kv[0]))
    expect = [
        (i + 1, item, pytest.approx(wsum, abs=1e-12), n)
        for i, (item, (n, wsum)) in enumerate(ranked)
    ]
    assert [(g[0], g[1], g[2], g[3]) for g in got] == expect
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"('{i}', {ts})" for i, ts in rows)
        + ") v(item, ts)"
    )
    oracle = con.execute(
        decayed_top_items_sql("t", "item", "ts", halflife_us=100, k=3)
    ).fetchall()
    assert got == [tuple(r) for r in oracle]
    # fresh trio beats the mid-decay quartet beats the one-fresh-plus-
    # ancient pile: decay actually reorders vs raw counts
    assert [g[1] for g in got] == ["A", "C", "B"]
    raw_counts = {i: n for i, (n, _) in want.items()}
    assert max(raw_counts, key=raw_counts.get) == "B"  # raw would say B


def test_decayed_top_items_validation(spark):
    df = spark.createDataFrame([("a", 1)], "item string, ts long")
    with pytest.raises(ValueError):
        decayed_top_items(df, "item", "ts", halflife_us=0)
    with pytest.raises(ValueError):
        decayed_top_items_sql("t", "item", "ts", halflife_us=10, k=0)


# ---------------------------------------------------------------------------
# Theil-Sen robust trend
# ---------------------------------------------------------------------------

_H = 3_600_000_000  # µs per hour
# key 'up': hours 0..5 counts [1,2,3,4,5,100]-ish via repetition; the
# 100-burst hour drags OLS hard but barely moves the pairwise-slope
# median. key 'gap': hours 0,1,3 (hour 2 EMPTY -> densified to 0).
TS_EVENTS = (
    [("up", h, c) for h, c in enumerate([1, 2, 3, 4, 5, 40])]
    + [("gap", 0, 2), ("gap", 1, 3), ("gap", 3, 4)]
)


def _ts_df(spark):
    rows = []
    eid = 0
    for key, hour, cnt in TS_EVENTS:
        for _ in range(cnt):
            rows.append((key, eid, hour * _H * 1000))  # ts_ns
            eid += 1
    return spark.createDataFrame(
        rows, "event_type string, event_id long, ts_ns long"
    )


def _py_theil_sen(series):
    import statistics

    xs = sorted(series)
    x0 = xs[0][0]
    pts = [(x - x0, y) for x, y in series]
    slopes = [
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(pts)
        for (x2, y2) in pts[i + 1:]
        if x2 > x1
    ]
    slope = round(statistics.median(slopes), 9)
    intercept = round(statistics.median([y - slope * x for x, y in pts]), 9)
    return len(pts), len(slopes), slope, intercept


def test_theil_sen_matches_python_oracle(spark):
    from bullet_storm_spark.operators.trend import theil_sen_trend

    out = {r.key: r for r in theil_sen_trend(_ts_df(spark)).collect()}
    up = _py_theil_sen([(h, c) for k, h, c in TS_EVENTS if k == "up"])
    assert (
        out["up"].n_hours, out["up"].n_pairs, out["up"].slope,
        out["up"].intercept,
    ) == up
    # the burst hour must NOT drag the slope to the OLS fit: the
    # pairwise median stays near the underlying +1/hour trend
    assert out["up"].slope < 5.0
    # densified gap: hour 2 becomes y=0, so n_hours=4 (0..3)
    gap = _py_theil_sen([(0, 2), (1, 3), (2, 0), (3, 4)])
    assert (
        out["gap"].n_hours, out["gap"].n_pairs, out["gap"].slope,
        out["gap"].intercept,
    ) == gap


def test_theil_sen_duck_parity(spark, tmp_path):
    from bullet_storm_spark.operators.trend import (
        theil_sen_trend, theil_sen_trend_sql,
    )

    df = _ts_df(spark)
    p = str(tmp_path / "ev.parquet")
    # DuckDB twin reads ts as TIMESTAMP: materialize the same events
    df.select(
        "event_type", "event_id",
        F.timestamp_micros(F.expr("ts_ns div 1000")).alias("ts"),
    ).write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{p}/*.parquet'")
    s = [tuple(r) for r in theil_sen_trend(df).collect()]
    d = con.execute(theil_sen_trend_sql("events")).fetchall()
    assert s == d


def test_mann_kendall_hand_oracle(spark):
    from bullet_storm_spark.operators.trend import mann_kendall, mann_kendall_sql

    # key 'up': strictly increasing counts 1..6 -> S = C(6,2) = 15, no
    # ties -> var = 6*5*17/18; key 'tied': [2,2,2,2] all equal -> S=0,
    # fully tied -> var 0 -> z pinned 0
    series = {"up": [1, 2, 3, 4, 5, 6], "tied": [2, 2, 2, 2]}
    rows = []
    eid = 0
    for key, ys in series.items():
        for h, c in enumerate(ys):
            for _ in range(c):
                rows.append((key, eid, h * 3_600_000_000 * 1000))
                eid += 1
    df = spark.createDataFrame(rows, "event_type string, event_id long, ts_ns long")
    out = {r.key: r for r in mann_kendall(df).collect()}
    up = out["up"]
    assert up.s_stat == 15 and up.n_hours == 6
    assert up.var_s == round((6 * 5 * 17) / 18.0, 9)
    assert up.z == round(14 / (up.var_s ** 0.5), 9)
    t = out["tied"]
    assert t.s_stat == 0 and t.var_s == 0.0 and t.z == 0.0

    # DuckDB parity on the same corpus
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE ev (event_type VARCHAR, event_id BIGINT, ts TIMESTAMP)")
    con.executemany(
        "INSERT INTO ev VALUES (?, ?, make_timestamp(?))",
        [(k, e, ns // 1000) for k, e, ns in rows],
    )
    duck = con.execute(mann_kendall_sql("ev")).fetchall()
    assert [tuple(r) for r in mann_kendall(df).collect()] == duck
