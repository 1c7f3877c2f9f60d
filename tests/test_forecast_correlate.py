"""Seasonal-naive forecast backtest + one-pass correlation matrix:
pure-Python oracles + DuckDB twins + parity fuzz."""

import math
import random

import duckdb
import pytest

from bullet_storm_spark.operators.correlate import (
    correlation_matrix,
    correlation_matrix_sql,
)
from bullet_storm_spark.operators.forecast import (
    seasonal_naive_eval,
    seasonal_naive_eval_sql,
)

_US_H = 3_600_000_000


def _duck(setup_sql, query):
    con = duckdb.connect()
    con.execute(setup_sql)
    return con.execute(query).fetchall()


# --- forecast ---------------------------------------------------------------


def _events(spark, cells):
    rows = [(t, h * _US_H * 1000) for t, h in cells]
    return spark.createDataFrame(rows, "event_type string, ts_ns long")


def _events_sql(cells):
    vals = ", ".join(f"('{t}', make_timestamp({h * _US_H}))" for t, h in cells)
    return f"CREATE TABLE events AS SELECT * FROM (VALUES {vals}) v(event_type, ts)"


def _py_eval(cells, period):
    """Pure-Python seasonal-naive backtest over densified hourly counts."""
    by_type = {}
    for t, h in cells:
        by_type.setdefault(t, []).append(h)
    out = {}
    for t, hs in by_type.items():
        h0, h1 = min(hs), max(hs)
        cnt = {h: 0 for h in range(h0, h1 + 1)}
        for h in hs:
            cnt[h] += 1
        rows = [
            (cnt[h], cnt[h - period], cnt[h - 1])
            for h in range(h0 + period, h1 + 1)
        ]
        if not rows:
            continue
        n = len(rows)
        sae = sum(abs(a - fs) for a, fs, _ in rows)
        sse = sum((a - fs) ** 2 for a, fs, _ in rows)
        sa1 = sum(abs(a - f1) for a, _, f1 in rows)
        ssm = sum(
            round(2.0 * abs(a - fs) / (a + fs), 6) if a + fs > 0 else 0.0
            for a, fs, _ in rows
        )
        mae_s, mae_1 = sae / n, sa1 / n
        out[t] = (
            n,
            mae_s,
            math.sqrt(sse / n),
            mae_1,
            (mae_s / mae_1) if mae_1 != 0 else None,
            ssm / n,
        )
    return out


def test_forecast_eval_matches_python_and_duckdb(spark):
    # type "a": exact period-3 cycle (2,0,1 repeating) -> seasonal error 0;
    # type "b": trending, seasonal-naive worse than naive-1
    cells = []
    for cyc in range(4):
        base = cyc * 3
        cells += [("a", base), ("a", base)]  # hour base: 2 events
        cells += [("a", base + 2)]  # hour base+2: 1 event
    cells += [("b", h) for h in range(8) for _ in range(h + 1)]
    got = [
        tuple(r)
        for r in seasonal_naive_eval(_events(spark, cells), period=3).collect()
    ]
    oracle = _duck(
        _events_sql(cells), seasonal_naive_eval_sql("events", period=3)
    )
    assert got == oracle
    py = _py_eval(cells, 3)
    for row in got:
        t, n, mae_s, rmse_s, mae_1, mase, smape = row
        pn, pmae_s, prmse, pmae_1, pmase, psmape = py[t]
        assert n == pn
        assert mae_s == pytest.approx(pmae_s)
        assert rmse_s == pytest.approx(prmse)
        assert mae_1 == pytest.approx(pmae_1)
        if pmase is None:
            assert mase is None
        else:
            assert mase == pytest.approx(pmase)
        assert smape == pytest.approx(psmape, abs=1e-6)
    a = dict((r[0], r) for r in got)["a"]
    assert a[2] == 0.0 and a[5] == 0.0  # perfect seasonal forecast


def test_forecast_eval_constant_series_null_mase(spark):
    cells = [("c", h) for h in range(6)]  # 1 event every hour
    got = seasonal_naive_eval(_events(spark, cells), period=2).collect()
    oracle = _duck(
        _events_sql(cells), seasonal_naive_eval_sql("events", period=2)
    )
    assert [tuple(r) for r in got] == oracle
    assert got[0]["mae_naive"] == 0.0 and got[0]["mase"] is None


@pytest.mark.parametrize("seed", range(3))
def test_forecast_parity_fuzz(spark, seed):
    rng = random.Random(8400 + seed)
    cells = [
        (rng.choice(["a", "b"]), rng.randint(0, 60))
        for _ in range(rng.randint(20, 150))
    ]
    period = rng.choice([2, 5, 24])
    got = [
        tuple(r)
        for r in seasonal_naive_eval(
            _events(spark, cells), period=period
        ).collect()
    ]
    oracle = _duck(
        _events_sql(cells), seasonal_naive_eval_sql("events", period=period)
    )
    assert got == oracle


# --- correlation matrix -----------------------------------------------------


def _num_df(spark, rows):
    return spark.createDataFrame(rows, "x double, y double, z double")


def _num_sql(rows):
    vals = ", ".join(
        "(" + ", ".join("NULL" if v is None else repr(v) for v in r) + ")"
        for r in rows
    )
    return f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) v(x, y, z)"


def _py_corr(rows, i, j):
    xs = [round(r[i], 6) for r in rows if None not in r]
    ys = [round(r[j], 6) for r in rows if None not in r]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    qx = sum(v * v for v in xs)
    qy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    den = math.sqrt(max(n * qx - sx * sx, 0.0) * max(n * qy - sy * sy, 0.0))
    return (n * sxy - sx * sy) / den if den else None


def test_correlation_matrix_matches_python_and_duckdb(spark):
    rng = random.Random(42)
    rows = []
    for _ in range(60):
        x = rng.uniform(-5, 5)
        rows.append((x, 2.0 * x + rng.uniform(-0.5, 0.5), rng.uniform(0, 9)))
    got = [
        tuple(r)
        for r in correlation_matrix(_num_df(spark, rows), ["x", "y", "z"]).collect()
    ]
    oracle = _duck(
        _num_sql(rows), correlation_matrix_sql("t", ["x", "y", "z"])
    )
    assert got == oracle
    by_pair = {(r[0], r[1]): r for r in got}
    assert by_pair[("x", "y")][3] == pytest.approx(_py_corr(rows, 0, 1), abs=1e-9)
    assert by_pair[("x", "y")][3] > 0.95  # strongly correlated by design
    assert abs(by_pair[("x", "z")][3]) < 0.5  # independent noise


def test_correlation_matrix_null_rows_and_zero_variance(spark):
    rows = [
        (1.0, 1.0, 3.0),
        (2.0, 4.0, 3.0),
        (3.0, 9.0, 3.0),
        (None, 5.0, 1.0),  # listwise-dropped
    ]
    got = [
        tuple(r)
        for r in correlation_matrix(_num_df(spark, rows), ["x", "y", "z"]).collect()
    ]
    oracle = _duck(_num_sql(rows), correlation_matrix_sql("t", ["x", "y", "z"]))
    assert got == oracle
    by_pair = {(r[0], r[1]): r for r in got}
    assert by_pair[("x", "y")][2] == 3  # null row excluded everywhere
    assert by_pair[("x", "z")][3] is None  # zero-variance z -> NULL
    assert by_pair[("y", "z")][3] is None


def test_correlation_matrix_exact_decimal_path(spark):
    from decimal import Decimal

    rng = random.Random(77)
    raw = [
        (
            Decimal(rng.randint(100, 5000)) / 100,
            Decimal(rng.randint(-9000, 9000)) / 100,
            Decimal(rng.randint(0, 100)) / 100,
        )
        for _ in range(50)
    ]
    df = spark.createDataFrame(
        raw, "x decimal(12,2), y decimal(12,2), z decimal(12,2)"
    )
    vals = ", ".join(
        f"({r[0]}::DECIMAL(12,2), {r[1]}::DECIMAL(12,2), {r[2]}::DECIMAL(12,2))"
        for r in raw
    )
    setup = f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) v(x, y, z)"
    got = [
        tuple(r)
        for r in correlation_matrix(
            df, ["x", "y", "z"], exact_decimal=True
        ).collect()
    ]
    oracle = _duck(
        setup, correlation_matrix_sql("t", ["x", "y", "z"], exact_decimal=True)
    )
    assert got == oracle
    # and the fast path agrees with the text-hop path (both exact here)
    slow = [
        tuple(r)
        for r in correlation_matrix(df, ["x", "y", "z"]).collect()
    ]
    assert got == slow


@pytest.mark.parametrize("seed", range(3))
def test_correlation_parity_fuzz(spark, seed):
    rng = random.Random(9100 + seed)
    rows = [
        (
            rng.uniform(-1e4, 1e4),
            rng.uniform(-1e4, 1e4),
            rng.choice([None, rng.uniform(-10, 10)]),
        )
        for _ in range(rng.randint(5, 80))
    ]
    if not any(None not in r for r in rows):
        rows.append((1.0, 2.0, 3.0))
    got = [
        tuple(r)
        for r in correlation_matrix(_num_df(spark, rows), ["x", "y", "z"]).collect()
    ]
    oracle = _duck(_num_sql(rows), correlation_matrix_sql("t", ["x", "y", "z"]))
    assert got == oracle


# --- spearman ---------------------------------------------------------------

from bullet_storm_spark.operators.correlate import spearman, spearman_sql


def _py_spearman(pairs):
    """Pure-Python Spearman with tie midranks (Pearson on midranks)."""
    pairs = [(x, y) for x, y in pairs if x is not None and y is not None]
    n = len(pairs)

    def midranks(vals):
        order = {}
        for v in vals:
            order[v] = order.get(v, 0) + 1
        ranks, cum = {}, 0
        for v in sorted(order):
            c = order[v]
            ranks[v] = cum + (c + 1) / 2
            cum += c
        return ranks

    rx = midranks([p[0] for p in pairs])
    ry = midranks([p[1] for p in pairs])
    xs = [rx[p[0]] for p in pairs]
    ys = [ry[p[1]] for p in pairs]
    sx, sy = sum(xs), sum(ys)
    qx = sum(v * v for v in xs)
    qy = sum(v * v for v in ys)
    pxy = sum(a * b for a, b in zip(xs, ys))
    den = math.sqrt(
        max(n * qx - sx * sx, 0.0) * max(n * qy - sy * sy, 0.0)
    )
    return (n * pxy - sx * sy) / den if den else None


def _pair_df(spark, pairs):
    return spark.createDataFrame(pairs, "x double, y double")


def _pair_sql(pairs):
    vals = ", ".join(
        "(" + ", ".join("NULL" if v is None else repr(v) for v in p) + ")"
        for p in pairs
    )
    return f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) v(x, y)"


def test_spearman_monotonic_and_ties(spark):
    # monotonic but non-linear: rho = 1 exactly, Pearson would not be
    pairs = [(float(i), float(i**3)) for i in range(1, 12)]
    got = spearman(_pair_df(spark, pairs), "x", "y").collect()[0]
    oracle = _duck(_pair_sql(pairs), spearman_sql("t", "x", "y"))[0]
    assert tuple(got) == oracle
    assert got["rho"] == pytest.approx(1.0)
    # heavy ties
    pairs = [(1.0, 2.0), (1.0, 2.0), (2.0, 2.0), (2.0, 5.0), (3.0, 5.0)]
    got = spearman(_pair_df(spark, pairs), "x", "y").collect()[0]
    oracle = _duck(_pair_sql(pairs), spearman_sql("t", "x", "y"))[0]
    assert tuple(got) == oracle
    assert got["rho"] == pytest.approx(_py_spearman(pairs))


def test_spearman_nulls_and_constant(spark):
    pairs = [(1.0, 4.0), (2.0, None), (None, 1.0), (3.0, 4.0), (4.0, 4.0)]
    got = spearman(_pair_df(spark, pairs), "x", "y").collect()[0]
    oracle = _duck(_pair_sql(pairs), spearman_sql("t", "x", "y"))[0]
    assert tuple(got) == oracle
    assert got["n"] == 3
    assert got["rho"] is None  # constant y -> zero variance -> NULL


@pytest.mark.parametrize("seed", range(3))
def test_spearman_parity_fuzz(spark, seed):
    rng = random.Random(6200 + seed)
    pairs = [
        (
            float(rng.randint(0, 20)),
            rng.choice([None, float(rng.randint(-10, 10))]),
        )
        for _ in range(rng.randint(10, 120))
    ]
    pairs.append((1.0, 1.0))
    pairs.append((2.0, 3.0))
    got = spearman(_pair_df(spark, pairs), "x", "y").collect()[0]
    oracle = _duck(_pair_sql(pairs), spearman_sql("t", "x", "y"))[0]
    assert tuple(got) == oracle
    ref = _py_spearman(pairs)
    if ref is None:
        assert got["rho"] is None
    else:
        assert got["rho"] == pytest.approx(ref, abs=1e-9)


# --- percentile rank --------------------------------------------------------

from bullet_storm_spark.operators.correlate import (
    percentile_rank,
    percentile_rank_sql,
)


def test_percentile_rank_semantics_and_ties(spark):
    rows = [
        ("s", 1, 10.0),
        ("s", 2, 20.0),
        ("s", 3, 20.0),  # tie shares midrank (2+3)/2 = 2.5 -> 0.625
        ("s", 4, 30.0),
        ("t", 5, 99.0),  # singleton key: midrank 1 of 1 -> 1.0
    ]
    df = spark.createDataFrame(rows, "k string, id long, v double")
    got = [tuple(r) for r in percentile_rank(df, "k", "id", "v").collect()]
    con = duckdb.connect()
    vals = ", ".join(f"('{k}', {i}, {v})" for k, i, v in rows)
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) x(k, id, v)")
    want = con.execute(percentile_rank_sql("t", "k", "id", "v")).fetchall()
    assert got == want
    pr = {r[0]: r[3] for r in got}
    assert pr[1] == 0.25 and pr[4] == 1.0
    assert pr[2] == pr[3] == 0.625
    assert pr[5] == 1.0


@pytest.mark.parametrize("seed", range(2))
def test_percentile_rank_parity_fuzz(spark, seed):
    rng = random.Random(5500 + seed)
    rows = [
        (
            rng.choice(["a", "b"]),
            i,
            rng.choice([None, float(rng.randint(0, 15))]),
        )
        for i in range(rng.randint(10, 150))
    ]
    df = spark.createDataFrame(rows, "k string, id long, v double")
    got = [tuple(r) for r in percentile_rank(df, "k", "id", "v").collect()]
    con = duckdb.connect()
    vals = ", ".join(
        f"('{k}', {i}, {'NULL' if v is None else v})" for k, i, v in rows
    )
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) x(k, id, v)")
    want = con.execute(percentile_rank_sql("t", "k", "id", "v")).fetchall()
    assert got == want
    # rank sanity: per key, values sort identically to pct_rank, and the
    # max pct_rank is n_max_tie-adjusted <= 1 with top value at <= 1.0
    for r in got:
        assert 0.0 < r[3] <= 1.0


# ---------------------------------------------------------------------------
# Holt linear smoothing
# ---------------------------------------------------------------------------

def test_holt_linear_python_twin_and_trend_tracking(spark):
    from bullet_storm_spark.operators.forecast import holt_linear

    # linear ramp 10, 20, 30, ... -> Holt's trend must converge toward
    # the true slope (10/hour) and one-step errors must shrink
    rows = []
    eid = 0
    for h in range(12):
        for _ in range(10 * (h + 1)):
            rows.append(("ramp", eid, h * 3_600_000_000 * 1000))
            eid += 1
    df = spark.createDataFrame(rows, "event_type string, event_id long, ts_ns long")
    out = holt_linear(df).collect()
    assert [r.hour for r in out] == list(range(12))
    assert out[0].forecast is None and out[0].trend == 0.0

    # python twin with the same truncating integer recursion
    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    S = 10**9
    an, ad, bn, bd = 1, 5, 1, 10
    lvl = trd = None
    for r in out:
        xi = r.cnt * S
        if lvl is None:
            lvl, trd, fc = xi, 0, None
        else:
            fc = lvl + trd
            prev = lvl
            lvl = tdiv(2 * (an * xi + (ad - an) * (lvl + trd)) + ad, 2 * ad)
            trd = tdiv(2 * (bn * (lvl - prev) + (bd - bn) * trd) + bd, 2 * bd)
        assert abs(r.level - lvl / S) < 1e-9
        assert abs(r.trend - trd / S) < 1e-9
    # trend learned upward
    assert out[-1].trend > 3.0
    # declining series drives the trend NEGATIVE: the truncation-vs-
    # floor divergence regression case
    rows2 = []
    eid = 0
    for h in range(10):
        for _ in range(100 - 10 * h):
            rows2.append(("down", eid, h * 3_600_000_000 * 1000))
            eid += 1
    df2 = spark.createDataFrame(rows2, "event_type string, event_id long, ts_ns long")
    out2 = holt_linear(df2).collect()
    assert out2[-1].trend < 0

    import duckdb

    from bullet_storm_spark.operators.forecast import holt_linear_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE ev (event_type VARCHAR, event_id BIGINT, ts TIMESTAMP)")
    con.executemany(
        "INSERT INTO ev VALUES (?, ?, make_timestamp(?))",
        [(k, e, ns // 1000) for k, e, ns in rows2],
    )
    duck = con.execute(holt_linear_sql("ev")).fetchall()
    assert [tuple(r) for r in out2] == duck
