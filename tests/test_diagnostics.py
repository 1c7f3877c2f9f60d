"""Tests for the r8 second batch: series diagnostics (ACF/Ljung-Box,
runs test, Grubbs, Pettitt), Kendall tau-b, McNemar, post-stratified
ATE, anisotropy audit, hard negatives, and source HHI — pure-Python
hand oracles plus DuckDB twin parity on the same rows."""

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.operators.concentration import hhi, hhi_sql
from bullet_storm_spark.operators.correlate import (
    kendall_tau_hourly,
    kendall_tau_hourly_sql,
)
from bullet_storm_spark.operators.diagnostics import (
    acf,
    acf_sql,
    grubbs,
    grubbs_sql,
    pettitt,
    pettitt_sql,
    runs_test,
    runs_test_sql,
)
from bullet_storm_spark.operators.experiment import (
    poststrat_ate,
    poststrat_ate_sql,
)
from bullet_storm_spark.operators.similarity import (
    anisotropy_audit,
    anisotropy_audit_sql,
    hard_negatives,
    hard_negatives_sql,
)
from bullet_storm_spark.operators.stats_tests import mcnemar, mcnemar_sql

_US_PER_HOUR = 3_600_000_000

# hourly count series per key: 'a' is irregular, 'tied' is constant
# (zero variance -> excluded from acf/grubbs), 'step' has a level shift
_SERIES = {
    "a": [3, 1, 4, 1, 5, 9, 2, 6, 5, 3],
    "tied": [2, 2, 2, 2],
    "step": [1, 1, 1, 1, 6, 6, 6, 6],
}


@pytest.fixture(scope="module")
def series_df(spark):
    rows = []
    eid = 0
    for key, ys in _SERIES.items():
        for h, c in enumerate(ys):
            for _ in range(c):
                rows.append((key, eid, h * _US_PER_HOUR * 1000))
                eid += 1
    return spark.createDataFrame(
        rows, "event_type string, event_id long, ts_ns long"
    )


@pytest.fixture(scope="module")
def series_duck(series_df):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev (event_type VARCHAR, event_id BIGINT, ts TIMESTAMP)"
    )
    con.executemany(
        "INSERT INTO ev VALUES (?, ?, make_timestamp(?))",
        [(k, e, ns // 1000) for k, e, ns in series_df.collect()],
    )
    return con


# --- ACF + Ljung-Box --------------------------------------------------------

def test_acf_hand_oracle(series_df):
    out = {(r.key, r.lag): r for r in acf(series_df, max_lag=3).collect()}
    ys = _SERIES["a"]
    n = len(ys)
    m = sum(ys) / n
    den = sum((y - m) ** 2 for y in ys)
    q = 0.0
    for k in (1, 2, 3):
        r_k = round(
            sum((ys[t] - m) * (ys[t + k] - m) for t in range(n - k)) / den, 9
        )
        row = out[("a", k)]
        assert row.r == r_k and row.n_hours == n
        q += r_k * r_k / (n - k)
        assert row.q_lb == round(n * (n + 2) * q, 9)
    # zero-variance key excluded entirely
    assert not any(k == "tied" for k, _ in out)


def test_acf_duck_parity(series_df, series_duck):
    sp = [tuple(r) for r in acf(series_df, max_lag=4).collect()]
    duck = series_duck.execute(acf_sql("ev", max_lag=4)).fetchall()
    assert sp == duck


# --- runs test ---------------------------------------------------------------

def test_runs_test_hand_oracle(series_df):
    out = {r.key: r for r in runs_test(series_df).collect()}
    # key 'a': median of [3,1,4,1,5,9,2,6,5,3] -> sorted [1,1,2,3,3,4,5,5,6,9],
    # med2 = 3+4 = 7; signs of 2y-7: [-,-,+,-,+,+,-,+,+,-] -> 7 runs
    a = out["a"]
    assert (a.n_pos, a.n_neg, a.runs) == (5, 5, 7)
    n1, n2, r = 5, 5, 7
    nn = n1 + n2
    mu = 2 * n1 * n2 / nn + 1
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - nn) / (nn * nn * (nn - 1))
    )
    assert a.z == round((r - mu) / math.sqrt(var), 9)
    # all-tied key: every cell equals the median -> all cells dropped ->
    # the key emits no row at all (same in the SQL twin)
    assert "tied" not in out


def test_runs_test_duck_parity(series_df, series_duck):
    sp = [tuple(r) for r in runs_test(series_df).collect()]
    duck = series_duck.execute(runs_test_sql("ev")).fetchall()
    assert sp == duck


# --- Grubbs ------------------------------------------------------------------

def test_grubbs_hand_oracle(series_df):
    out = {r.key: r for r in grubbs(series_df).collect()}
    ys = _SERIES["a"]
    n = len(ys)
    m = sum(ys) / n
    s = math.sqrt(sum((y - m) ** 2 for y in ys) / (n - 1))
    g = max(abs(y - m) for y in ys) / s
    a = out["a"]
    assert a.peak_hour == 5 and a.peak_cnt == 9  # the 9-count hour
    assert a.g_stat == pytest.approx(g, abs=2e-9)
    assert "tied" not in out  # zero variance excluded


def test_grubbs_tie_breaks_to_earliest_hour(spark):
    # counts [5,1,1,5]: both hour 0 and hour 3 deviate by 2 -> earliest wins
    rows = []
    eid = 0
    for h, c in enumerate([5, 1, 1, 5]):
        for _ in range(c):
            rows.append(("k", eid, h * _US_PER_HOUR * 1000))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, ts_ns long"
    )
    row = grubbs(df).collect()[0]
    assert row.peak_hour == 0 and row.peak_cnt == 5


def test_grubbs_duck_parity(series_df, series_duck):
    sp = [tuple(r) for r in grubbs(series_df).collect()]
    duck = series_duck.execute(grubbs_sql("ev")).fetchall()
    assert sp == duck


# --- Pettitt -----------------------------------------------------------------

def test_pettitt_hand_oracle(series_df):
    out = {r.key: r for r in pettitt(series_df).collect()}
    # brute-force U_t for the step series
    ys = _SERIES["step"]
    n = len(ys)
    sgn = lambda x: (x > 0) - (x < 0)  # noqa: E731
    best_k, best_t = -1, None
    for t in range(1, n):
        u = sum(
            sgn(ys[i] - ys[j]) for i in range(t) for j in range(t, n)
        )
        if abs(u) > best_k:
            best_k, best_t = abs(u), t - 1  # t_hat = last hour of segment 1
    srow = out["step"]
    assert srow.u_abs_max == best_k == 16  # 4*4 pairs all -1 at the break
    assert srow.t_hat == best_t == 3
    assert srow.stat == round(6 * best_k**2 / (n**3 + n**2), 9)
    # constant series: U_t = 0 everywhere, stat 0 (row still emitted)
    assert out["tied"].u_abs_max == 0 and out["tied"].stat == 0.0


def test_pettitt_duck_parity(series_df, series_duck):
    sp = [tuple(r) for r in pettitt(series_df).collect()]
    duck = series_duck.execute(pettitt_sql("ev")).fetchall()
    assert sp == duck


# --- Kendall tau-b -----------------------------------------------------------

@pytest.fixture(scope="module")
def valued_events(spark):
    random.seed(11)
    rows = []
    for eid in range(300):
        et = random.choice(["x", "y"])
        h = random.randrange(12)
        val = round(random.uniform(0, 50), 3)
        rows.append(
            (eid, eid % 20, et, val,
             h * _US_PER_HOUR * 1000 + random.randrange(_US_PER_HOUR) * 1000)
        )
    return spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, value double, ts_ns long",
    )


@pytest.fixture(scope="module")
def valued_duck(valued_events):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev (event_id BIGINT, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE, ts TIMESTAMP)"
    )
    con.executemany(
        "INSERT INTO ev VALUES (?,?,?,?,make_timestamp(?))",
        [(a, b, c, d, ns // 1000) for a, b, c, d, ns in valued_events.collect()],
    )
    return con


def test_kendall_hand_oracle(valued_events):
    out = {r.key: r for r in kendall_tau_hourly(valued_events).collect()}
    # rebuild the hourly series in python (q6 value sums)
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0.0])
    for eid, uid, et, val, ns in valued_events.collect():
        h = (ns // 1000) // _US_PER_HOUR
        cells[(et, h)][0] += 1
        cells[(et, h)][1] += round(val, 6)
    for key in ("x", "y"):
        hours = sorted(h for k, h in cells if k == key)
        lo, hi = hours[0], hours[-1]
        xs, ys = [], []
        for h in range(lo, hi + 1):
            c, v = cells.get((key, h), [0, 0.0])
            xs.append(c)
            ys.append(round(v, 6))
        n = len(xs)
        c = d = tx = ty = 0
        for i in range(n):
            for j in range(i + 1, n):
                sx = (xs[j] > xs[i]) - (xs[j] < xs[i])
                sy = (ys[j] > ys[i]) - (ys[j] < ys[i])
                if sx * sy > 0:
                    c += 1
                elif sx * sy < 0:
                    d += 1
                if sx == 0:
                    tx += 1
                if sy == 0:
                    ty += 1
        n0 = n * (n - 1) // 2
        tau = (c - d) / math.sqrt((n0 - tx) * (n0 - ty))
        row = out[key]
        assert (row.concordant, row.discordant) == (c, d)
        assert row.tau_b == round(tau, 9)


def test_kendall_duck_parity(valued_events, valued_duck):
    sp = [tuple(r) for r in kendall_tau_hourly(valued_events).collect()]
    duck = valued_duck.execute(kendall_tau_hourly_sql("ev")).fetchall()
    assert sp == duck


def test_kendall_constant_series_null_tau(spark):
    # constant count AND constant value mass -> every pair tied -> NULL
    rows = [("k", i, 100.0, i * _US_PER_HOUR * 1000) for i in range(4)]
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, value double, ts_ns long"
    )
    row = kendall_tau_hourly(df).collect()[0]
    assert row.tau_b is None and row.concordant == 0


# --- McNemar -----------------------------------------------------------------

def test_mcnemar_hand_oracle(spark):
    # a-only b=7, b-only c=3 -> chi2_cc = (|7-3|-1)^2/10 = 0.9
    rows = (
        [(1, 1)] * 5 + [(1, 0)] * 7 + [(0, 1)] * 3 + [(0, 0)] * 4
    )
    df = spark.createDataFrame(rows, "a int, b int")
    row = mcnemar(df, F.col("a") == 1, F.col("b") == 1).collect()[0]
    assert (row.n, row.n_both, row.n_a_only, row.n_b_only, row.n_neither) == (
        19, 5, 7, 3, 4,
    )
    assert row.chi2_cc == 0.9

    con = duckdb.connect()
    con.execute("CREATE TABLE t (a INTEGER, b INTEGER)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    duck = con.execute(mcnemar_sql("t", "a = 1", "b = 1")).fetchall()
    assert [tuple(r) for r in mcnemar(
        df, F.col("a") == 1, F.col("b") == 1
    ).collect()] == duck


def test_mcnemar_clamp_and_degenerate(spark):
    # |b-c| = 1 -> continuity clamp gives 0, not 1/(b+c)
    df = spark.createDataFrame(
        [(1, 0), (0, 1), (0, 1)], "a int, b int"
    )
    assert mcnemar(df, F.col("a") == 1, F.col("b") == 1).collect()[0].chi2_cc == 0.0
    # no discordant pairs -> NULL
    df2 = spark.createDataFrame([(1, 1), (0, 0)], "a int, b int")
    assert mcnemar(df2, F.col("a") == 1, F.col("b") == 1).collect()[0].chi2_cc is None


# --- post-stratified ATE -----------------------------------------------------

def test_poststrat_hand_oracle(spark):
    # 2 strata, constant within-arm values -> ATE is the weighted diff
    # stratum 0: 4 treated @ 10, 2 control @ 4  (diff 6, w 6/10)
    # stratum 1: 2 treated @ 8,  2 control @ 2  (diff 6, w 4/10)
    rows = []
    for v, t, s, k in (
        (10.0, 1, 0, 4), (4.0, 0, 0, 2), (8.0, 1, 1, 2), (2.0, 0, 1, 2),
    ):
        rows += [(s, t, v + 0.5 * i) for i in range(k)]
    df = spark.createDataFrame(rows, "s int, t int, v double")
    row = poststrat_ate(df, F.col("s"), F.col("t") == 1, "v").collect()[0]
    assert (row.n, row.n_strata) == (10, 2)
    # python oracle
    strata = {}
    for s, t, v in rows:
        strata.setdefault(s, {0: [], 1: []})[t].append(v)
    nk = sum(len(a[0]) + len(a[1]) for a in strata.values())
    ate = se2 = 0.0
    for s in sorted(strata):
        a = strata[s]
        nt, nc = len(a[1]), len(a[0])
        mt, mc = sum(a[1]) / nt, sum(a[0]) / nc
        vt = sum((x - mt) ** 2 for x in a[1]) / (nt - 1)
        vc = sum((x - mc) ** 2 for x in a[0]) / (nc - 1)
        w = (nt + nc) / nk
        ate += w * (mt - mc)
        se2 += w * w * (vt / nt + vc / nc)
    assert row.ate == pytest.approx(ate, abs=2e-9)
    assert row.se == pytest.approx(math.sqrt(se2), abs=2e-9)

    con = duckdb.connect()
    con.execute("CREATE TABLE t (s INTEGER, t INTEGER, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    duck = con.execute(poststrat_ate_sql("t", "s", "t = 1", "v")).fetchall()
    assert [tuple(r) for r in poststrat_ate(
        df, F.col("s"), F.col("t") == 1, "v"
    ).collect()] == duck


def test_poststrat_confounded_design_is_empty(spark):
    # stratum == treatment -> every stratum single-armed -> no output row
    rows = [(0, 0, 1.0), (0, 0, 2.0), (1, 1, 3.0), (1, 1, 4.0)]
    df = spark.createDataFrame(rows, "s int, t int, v double")
    assert poststrat_ate(df, F.col("s"), F.col("t") == 1, "v").count() == 0


def test_poststrat_duck_parity(valued_events, valued_duck):
    sp = [tuple(r) for r in poststrat_ate(
        valued_events,
        F.pmod(F.col("user_id"), F.lit(3)),
        F.pmod(F.expr("user_id div 3"), F.lit(2)) == 0,
        "value",
    ).collect()]
    duck = valued_duck.execute(poststrat_ate_sql(
        "ev", "user_id % 3", "(user_id // 3) % 2 = 0", "value"
    )).fetchall()
    assert sp == duck


# --- anisotropy + hard negatives --------------------------------------------

@pytest.fixture(scope="module")
def emb(spark):
    random.seed(3)
    rows = [
        (i, [round(random.gauss(0.3, 1), 4) for _ in range(8)], i % 3)
        for i in range(60)
    ]
    rows.append((60, [0.0] * 8, 0))  # zero vector: excluded from audit
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


@pytest.fixture(scope="module")
def emb_duck(emb):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[], label INTEGER)"
    )
    con.executemany(
        "INSERT INTO embeddings VALUES (?,?,?)",
        [(r.vec_id, r.embedding, r.label) for r in emb.collect()],
    )
    return con


def test_anisotropy_hand_oracle(emb):
    import numpy as np

    row = anisotropy_audit(emb, "embedding").collect()[0]
    V = np.array(
        [r.embedding for r in emb.collect() if any(r.embedding)],
        dtype=np.float64,
    )
    norms = np.linalg.norm(V, axis=1)
    U = V / norms[:, None]
    n = len(U)
    assert row.n == n == 60  # zero vector excluded
    # exact all-pairs mean cosine via brute force
    brute = sum(
        float(U[i] @ U[j]) for i in range(n) for j in range(n) if i != j
    ) / (n * (n - 1))
    assert row.avg_pairwise_cos == pytest.approx(brute, abs=1e-6)
    assert row.mean_norm == pytest.approx(float(norms.mean()), abs=1e-6)


def test_anisotropy_duck_parity(emb, emb_duck):
    sp = [tuple(r) for r in anisotropy_audit(emb, "embedding").collect()]
    duck = emb_duck.execute(
        anisotropy_audit_sql("embeddings", "embedding")
    ).fetchall()
    assert sp == duck


def test_hard_negatives_band_and_parity(emb, emb_duck):
    out = hard_negatives(
        emb, "vec_id", "embedding", F.col("vec_id") < 3, 0.2, 0.8, k=4
    )
    rows = out.collect()
    assert rows and all(0.2 <= r.cos < 0.8 for r in rows)
    # ranks are 1..k contiguous per query, cosine descending
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert all(
            rs[i].cos >= rs[i + 1].cos for i in range(len(rs) - 1)
        )
    duck = emb_duck.execute(hard_negatives_sql(
        "embeddings", "vec_id", "embedding", "id < 3", 0.2, 0.8, k=4
    )).fetchall()
    assert [tuple(r) for r in rows] == duck


# --- HHI ---------------------------------------------------------------------

def test_hhi_hand_oracle(spark):
    # masses: a=6 (3+3), b=2, c=2 -> hhi = (36+4+4)/100 = 0.44
    rows = [
        (0, "w w w", "a"), (1, "w w w", "a"),
        (2, "w w", "b"), (3, "w w", "c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    row = hhi(df, "source", "text").collect()[0]
    assert (row.n_sources, row.total_tokens) == (3, 10)
    assert row.hhi == 0.44
    assert row.effective_sources == round(1 / 0.44, 9)

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?,?,?)", rows)
    duck = con.execute(hhi_sql("documents", "source", "text")).fetchall()
    assert [tuple(r) for r in hhi(df, "source", "text").collect()] == duck


def test_hhi_single_source_is_one(spark):
    df = spark.createDataFrame(
        [(0, "a b c", "only"), (1, "d e", "only")],
        "doc_id long, text string, source string",
    )
    row = hhi(df, "source", "text").collect()[0]
    assert row.hhi == 1.0 and row.effective_sources == 1.0


def test_diagnostics_randomized_python_oracle(spark):
    """25 random integer series (mixed lengths, ties, constants) in ONE
    DataFrame; every per-key output of acf/runs/grubbs/pettitt must
    match a pure-Python reference — the randomized sweep behind the
    single hand-oracle cases."""
    rng = random.Random(20260816)
    series = {}
    for i in range(25):
        n = rng.choice([2, 3, 5, 8, 13, 24])
        if i % 7 == 0:
            vals = [rng.randrange(0, 3)] * n  # heavy-tie / constant
        else:
            vals = [rng.randrange(0, 12) for _ in range(n)]
        series[f"k{i:02d}"] = vals
    rows = []
    eid = 0
    for key, ys in series.items():
        for h, c in enumerate(ys):
            for _ in range(c):
                rows.append((key, eid, h * _US_PER_HOUR * 1000))
                eid += 1
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, ts_ns long"
    )
    # keys whose every hour is 0 events never materialize (no rows);
    # keys collapse to their observed-hour span — rebuild that spine
    spans = {}
    for key, ys in series.items():
        hours = [h for h, c in enumerate(ys) if c > 0]
        if not hours:
            continue
        lo, hi = min(hours), max(hours)
        spans[key] = ys[lo : hi + 1]

    # --- acf ---
    got = {}
    for r in acf(df, max_lag=4).collect():
        got.setdefault(r.key, {})[r.lag] = (r.n_hours, r.r, r.q_lb)
    for key, ys in spans.items():
        n = len(ys)
        m = sum(ys) / n
        den = sum((y - m) ** 2 for y in ys)
        if den == 0:
            assert key not in got
            continue
        q = 0.0
        for k in range(1, min(4, n - 1) + 1):
            rk = round(
                sum((ys[t] - m) * (ys[t + k] - m) for t in range(n - k)) / den,
                9,
            )
            q += rk * rk / (n - k)
            assert got[key][k] == (n, rk, round(n * (n + 2) * q, 9)), key

    # --- runs test ---
    got = {r.key: r for r in runs_test(df).collect()}
    for key, ys in spans.items():
        n = len(ys)
        s = sorted(ys)
        med2 = s[(n + 1) // 2 - 1] + s[n // 2]
        signs = [1 if 2 * y > med2 else -1 for y in ys if 2 * y != med2]
        if not signs:
            assert key not in got, key
            continue
        runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        n1 = sum(1 for x in signs if x > 0)
        n2 = len(signs) - n1
        row = got[key]
        assert (row.n_pos, row.n_neg, row.runs) == (n1, n2, runs), key
        nn = n1 + n2
        var = (
            2 * n1 * n2 * (2 * n1 * n2 - nn) / (nn * nn * (nn - 1))
            if nn > 1
            else 0
        )
        if n1 and n2 and var > 0:
            mu = 2 * n1 * n2 / nn + 1
            assert row.z == round((runs - mu) / math.sqrt(var), 9), key
        else:
            assert row.z is None, key

    # --- grubbs ---
    got = {r.key: r for r in grubbs(df).collect()}
    for key, ys in spans.items():
        n = len(ys)
        m = sum(ys) / n
        ss = sum((y - m) ** 2 for y in ys)
        if n < 3 or ss == 0:
            assert key not in got, key
            continue
        s = math.sqrt(ss / (n - 1))
        g = max(abs(y - m) for y in ys) / s
        assert got[key].g_stat == pytest.approx(g, abs=2e-9), key

    # --- pettitt ---
    got = {r.key: r for r in pettitt(df).collect()}
    sgn = lambda x: (x > 0) - (x < 0)  # noqa: E731
    for key, ys in spans.items():
        n = len(ys)
        if n < 2:
            assert key not in got, key
            continue
        best_k, best_t = -1, None
        for t in range(1, n):
            u = sum(
                sgn(ys[i] - ys[j]) for i in range(t) for j in range(t, n)
            )
            if abs(u) > best_k:
                best_k, best_t = abs(u), t - 1
        row = got[key]
        assert row.u_abs_max == best_k, key
        assert row.stat == round(6 * best_k**2 / (n**3 + n**2), 9), key
