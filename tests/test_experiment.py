"""DiD / trimmed means / MDE planning: pure-Python oracles + DuckDB
twins + guards."""

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.operators.experiment import (
    Z_ALPHA_975,
    Z_POWER_80,
    did,
    did_sql,
    mde_planning,
    mde_planning_sql,
    trimmed_means,
    trimmed_means_sql,
)


def _duck(setup_sql, query):
    con = duckdb.connect()
    con.execute(setup_sql)
    return con.execute(query).fetchall()


def _rows_sql(rows, cols):
    vals = ", ".join(
        "(" + ", ".join(repr(v) for v in r) + ")" for r in rows
    )
    return f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) v({cols})"


# --- DiD --------------------------------------------------------------------

DID_ROWS = (
    [(0, 0, 10.0 + i) for i in range(5)]       # control, pre: mean 12
    + [(0, 1, 11.0 + i) for i in range(5)]     # control, post: mean 13 (+1)
    + [(1, 0, 20.0 + i) for i in range(5)]     # treated, pre: mean 22
    + [(1, 1, 24.0 + i) for i in range(5)]     # treated, post: mean 26 (+4)
)


def _py_cell(rows, g, p):
    xs = [round(v, 6) for gg, pp, v in rows if gg == g and pp == p]
    n = len(xs)
    m = sum(xs) / n
    var = sum((x - m) ** 2 for x in xs) / (n - 1)
    return n, m, var


def test_did_matches_python_and_duckdb(spark):
    df = spark.createDataFrame(DID_ROWS, "g int, p int, value double")
    got = tuple(
        did(df, "value", F.col("g") == 1, F.col("p") == 1).collect()[0]
    )
    cells = {f"{g}{p}": _py_cell(DID_ROWS, g, p) for g in (0, 1) for p in (0, 1)}
    est = (cells["11"][1] - cells["10"][1]) - (cells["01"][1] - cells["00"][1])
    se = math.sqrt(sum(v / n for n, _, v in cells.values()))
    assert got[:4] == (5, 5, 5, 5)
    assert got[8] == pytest.approx(est) == pytest.approx(3.0)
    assert got[9] == pytest.approx(se, abs=1e-9)
    assert got[10] == pytest.approx(est / se, abs=1e-9)
    oracle = _duck(
        _rows_sql(DID_ROWS, "g, p, value"),
        did_sql("t", "value", "g = 1", "p = 1"),
    )
    assert got == oracle[0]


def test_did_null_on_thin_cells(spark):
    rows = [(0, 0, 1.0), (0, 1, 2.0), (1, 0, 3.0), (1, 1, 4.0)]
    df = spark.createDataFrame(rows, "g int, p int, value double")
    got = did(df, "value", F.col("g") == 1, F.col("p") == 1).collect()[0]
    assert got["did"] is None and got["se_did"] is None and got["z"] is None
    oracle = _duck(
        _rows_sql(rows, "g, p, value"), did_sql("t", "value", "g = 1", "p = 1")
    )
    assert tuple(got) == oracle[0]


# --- trimmed means ----------------------------------------------------------


def _py_qcont(xs, q):
    xs = sorted(xs)
    h = (len(xs) - 1) * q
    lo = int(math.floor(h))
    hi = min(lo + 1, len(xs) - 1)
    return xs[lo] + (h - lo) * (xs[hi] - xs[lo])


def test_trimmed_means_matches_python_and_duckdb(spark):
    rows = [("k", float(v)) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000]]
    df = spark.createDataFrame(rows, "key string, value double")
    got = tuple(trimmed_means(df, "key", "value", alpha=0.1).collect()[0])
    xs = [v for _, v in rows]
    lo = round(_py_qcont(xs, 0.1), 9)
    hi = round(_py_qcont(xs, 0.9), 9)
    kept = [x for x in xs if lo <= x <= hi]
    wins = [min(max(x, lo), hi) for x in xs]
    assert got[0] == "k" and got[1] == 10
    assert got[2] == len(xs) - len(kept)
    assert got[3] == pytest.approx(lo) and got[4] == pytest.approx(hi)
    assert got[5] == pytest.approx(round(sum(kept) / len(kept), 6))
    assert got[6] == pytest.approx(round(sum(round(w, 6) for w in wins) / 10, 6))
    # the whale moved the raw mean to 104.5; robust estimates stay near 5
    assert got[5] < 10 and got[6] < got[5] + 100
    oracle = _duck(
        _rows_sql(rows, "key, value"),
        trimmed_means_sql("t", "key", "value", alpha=0.1),
    )
    assert got == oracle[0]


def test_trimmed_means_validation(spark):
    df = spark.createDataFrame([("k", 1.0)], "key string, value double")
    with pytest.raises(ValueError):
        trimmed_means(df, "key", "value", alpha=0.5)
    with pytest.raises(ValueError):
        trimmed_means_sql("t", "key", "value", alpha=-0.1)


# --- MDE --------------------------------------------------------------------


def test_mde_matches_python_and_duckdb(spark):
    rows = [("c", float(10 + (i * 7) % 13)) for i in range(40)] + [
        ("x", 999.0)
    ] * 5
    df = spark.createDataFrame(rows, "arm string, value double")
    got = tuple(mde_planning(df, "value", F.col("arm") == "c").collect()[0])
    xs = [round(v, 6) for a, v in rows if a == "c"]
    n = len(xs)
    m = sum(xs) / n
    var = sum((x - m) ** 2 for x in xs) / (n - 1)
    mde = (Z_ALPHA_975 + Z_POWER_80) * math.sqrt(var) * math.sqrt(2 / n)
    assert got[0] == 40
    assert got[1] == pytest.approx(m, abs=1e-9)
    assert got[2] == pytest.approx(math.sqrt(var), abs=1e-9)
    assert got[3] == pytest.approx(mde, abs=1e-9)
    assert got[4] == pytest.approx(mde / m, abs=1e-9)
    oracle = _duck(
        _rows_sql(rows, "arm, value"), mde_planning_sql("t", "value", "arm = 'c'")
    )
    assert got == oracle[0]


def test_mde_degenerate_null(spark):
    df = spark.createDataFrame(
        [("c", 5.0), ("c", 5.0)], "arm string, value double"
    )
    got = mde_planning(df, "value", F.col("arm") == "c").collect()[0]
    assert got["sd"] is None and got["mde_abs"] is None  # zero variance


# --- cross-engine fuzz ------------------------------------------------------


@pytest.mark.parametrize("seed", range(4))
def test_experiment_parity_fuzz(spark, seed):
    rng = random.Random(7500 + seed)
    n = rng.randint(8, 80)
    rows = [
        (
            rng.randint(0, 1),
            rng.randint(0, 1),
            rng.choice(
                [round(rng.uniform(-1e5, 1e5), 2), round(rng.random(), 6), 0.0]
            ),
        )
        for _ in range(n)
    ]
    df = spark.createDataFrame(rows, "g int, p int, value double")
    got = [tuple(r) for r in did(df, "value", F.col("g") == 1, F.col("p") == 1).collect()]
    oracle = _duck(
        _rows_sql(rows, "g, p, value"), did_sql("t", "value", "g = 1", "p = 1")
    )
    assert got == oracle

    got = [
        tuple(r)
        for r in trimmed_means(df, "g", "value", alpha=0.25).collect()
    ]
    oracle = _duck(
        _rows_sql(rows, "g, p, value"),
        trimmed_means_sql("t", "g", "value", alpha=0.25),
    )
    assert got == oracle

    got = [
        tuple(r) for r in mde_planning(df, "value", F.col("g") == 0).collect()
    ]
    oracle = _duck(
        _rows_sql(rows, "g, p, value"), mde_planning_sql("t", "value", "g = 0")
    )
    assert got == oracle


# ---------------------------------------------------------------------------
# Split-conformal thresholds
# ---------------------------------------------------------------------------

def test_conformal_thresholds_hand_oracle(spark):
    import math
    import random

    from bullet_storm_spark.operators.experiment import (
        conformal_thresholds, conformal_thresholds_sql,
    )

    rng = random.Random(7)
    rows = [("g1", rng.randint(0, 50)) for _ in range(137)] + [
        ("g2", rng.randint(0, 9)) for _ in range(4)  # tiny group: clamp
    ]
    df = spark.createDataFrame(rows, "src string, v long")
    out = conformal_thresholds(df, "src", F.col("v"), alphas=[0.1, 0.01])
    got = {(r.grp, r.alpha_permille): r for r in out.collect()}
    for (g, a_pm), r in got.items():
        vals = sorted(v for s, v in rows if s == g)
        n = len(vals)
        rank = min(math.ceil((n + 1) * (1000 - a_pm) / 1000), n)
        assert r.n == n and r.rank == rank
        assert r.threshold == vals[rank - 1]
        # finite-sample guarantee on the calibration set itself
        assert sum(v <= r.threshold for v in vals) >= rank
    # tiny group at alpha=0.01: rank would be 5 of n=4 -> clamped
    assert got[("g2", 10)].rank == 4

    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t (src VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    duck = con.execute(
        conformal_thresholds_sql("t", "src", "v", alphas=[0.1, 0.01])
    ).fetchall()
    spark_rows = [tuple(r) for r in out.collect()]
    assert spark_rows == duck


# ---------------------------------------------------------------------------
# Uplift deciles / Qini
# ---------------------------------------------------------------------------

def test_uplift_deciles_hand_oracle(spark):
    from bullet_storm_spark.operators.experiment import (
        uplift_deciles, uplift_deciles_sql,
    )

    # synthetic events: 40 users, each with one 'click' carrying the
    # score value, some with a purchase; arms come from the md5 draw
    rows = []
    for u in range(40):
        rows.append((u, "click", float(u)))          # score = u
        if u % 3 == 0:
            rows.append((u, "purchase", 1.0))
    df = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    out = uplift_deciles(df).collect()
    assert [r.decile for r in out] == list(range(10))
    # every user lands in exactly one decile; 40 users / 10 cuts = 4 each
    assert all(r.n_t + r.n_c == 4 for r in out)
    # responders: ceil(40/3)=14 users with purchases, split across arms
    assert sum(r.resp_t + r.resp_c for r in out) == 14
    # Qini at the last decile reduces to total_resp_t - total_resp_c *
    # (N_t/N_c): verify against python
    nt = sum(r.n_t for r in out); nc = sum(r.n_c for r in out)
    rt = sum(r.resp_t for r in out); rc = sum(r.resp_c for r in out)
    assert out[-1].qini_cum == round(rt - rc * (nt / nc), 9)

    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev (user_id BIGINT, event_type VARCHAR, value DOUBLE)"
    )
    con.executemany("INSERT INTO ev VALUES (?,?,?)", rows)
    duck = con.execute(uplift_deciles_sql("ev")).fetchall()
    assert [tuple(r) for r in out] == duck


# ---------------------------------------------------------------------------
# Covariate balance (SMD)
# ---------------------------------------------------------------------------

def test_covariate_balance_hand_oracle(spark):
    import statistics

    import duckdb

    from bullet_storm_spark.operators.experiment import (
        covariate_balance, covariate_balance_sql,
    )

    rows = [
        # (arm, x, y): arm 1 shifted on x, matched on y
        (1, 10.0, 5.0), (1, 12.0, 6.0), (1, 14.0, 4.0), (1, 16.0, 5.0),
        (0, 6.0, 5.5), (0, 7.0, 4.5), (0, 8.0, 5.0), (0, 9.0, 5.0),
    ]
    df = spark.createDataFrame(rows, "t long, x double, y double")
    out = {
        r.covariate: r
        for r in covariate_balance(
            df, F.col("t") == 1, {"x": F.col("x"), "y": F.col("y")}
        ).collect()
    }

    def smd(vals_t, vals_c):
        mt, mc = statistics.mean(vals_t), statistics.mean(vals_c)
        vt, vc = statistics.variance(vals_t), statistics.variance(vals_c)
        return (mt - mc) / ((vt + vc) / 2) ** 0.5

    want_x = smd([r[1] for r in rows if r[0] == 1],
                 [r[1] for r in rows if r[0] == 0])
    assert out["x"].smd == pytest.approx(want_x, abs=1e-9)
    assert out["x"].flag == 1          # strongly imbalanced
    assert abs(out["y"].smd) < 0.1 and out["y"].flag == 0
    assert out["x"].n_t == 4 and out["x"].n_c == 4

    con = duckdb.connect()
    con.execute("CREATE TABLE t (t BIGINT, x DOUBLE, y DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    duck = con.execute(
        covariate_balance_sql("t", "t = 1", {"x": "x", "y": "y"})
    ).fetchall()
    spark_rows = [
        tuple(r)
        for r in covariate_balance(
            df, F.col("t") == 1, {"x": F.col("x"), "y": F.col("y")}
        ).collect()
    ]
    assert spark_rows == duck


def test_covariate_balance_constant_covariate(spark):
    """A constant covariate has zero pooled variance: SMD NULL (not a
    DuckDB sqrt crash, not a Spark NaN)."""
    from bullet_storm_spark.operators.experiment import covariate_balance

    rows = [(1, 5.0), (1, 5.0), (0, 5.0), (0, 5.0)]
    df = spark.createDataFrame(rows, "t long, x double")
    out = covariate_balance(df, F.col("t") == 1, {"x": F.col("x")}).collect()
    assert out[0].smd is None and out[0].flag is None or out[0].flag == 0


def test_fdr_bh_hand_oracle(spark):
    import duckdb

    from bullet_storm_spark.operators.experiment import fdr_bh, fdr_bh_sql

    # classic BH example (alpha=0.05): p = .01, .02, .03, .04, .20 over
    # m=5 -> thresholds .01,.02,.03,.04,.05 -> k*=4, reject first four
    rows = [
        ("t1", 1, 100), ("t2", 2, 100), ("t3", 3, 100),
        ("t4", 4, 100), ("t5", 20, 100),
    ]
    df = spark.createDataFrame(rows, "test string, k long, d long")
    out = fdr_bh(df, "test", "k", "d", alpha_permille=50).collect()
    got = {r.test: r for r in out}
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]
    assert all(got[t].rejected for t in ("t1", "t2", "t3", "t4"))
    assert not got["t5"].rejected
    assert got["t1"].m == 5
    assert got["t1"].bh_threshold == round(4 * 0.05 / 5, 9)

    con = duckdb.connect()
    con.execute("CREATE TABLE t (test VARCHAR, k BIGINT, d BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    duck = con.execute(
        fdr_bh_sql("SELECT * FROM t", "test", "k", "d", alpha_permille=50)
    ).fetchall()
    assert [tuple(r) for r in out] == duck

    # boundary exactness: p = 2/40 vs i*alpha/m = 2*0.05/4 = 1/40 at
    # rank 2 -> 0.025 <= 0.025 holds EXACTLY (cross-multiplied ints,
    # no IEEE wobble): 2*1000*4 = 8000 <= 2*50*40 = 4000? No: 8000 >
    # 4000 -> NOT rejected. Hand-check the integer comparison.
    rows2 = [("a", 1, 100), ("b", 2, 40), ("c", 30, 100), ("d", 35, 100)]
    df2 = spark.createDataFrame(rows2, "test string, k long, d long")
    out2 = {r.test: r for r in fdr_bh(
        df2, "test", "k", "d", alpha_permille=50).collect()}
    # ranks: a(.01)=1, b(.05)=2, c(.30)=3, d(.35)=4
    # a: 1*1000*4=4000 <= 1*50*100=5000 -> holds
    # b: 2*1000*4=8000 <= 2*50*40=4000 -> fails
    # k* = 1 -> only a rejected
    assert out2["a"].rejected and not out2["b"].rejected

    # nothing passes -> kstar NULL -> rejected all False, threshold NULL
    rows3 = [("x", 90, 100), ("y", 95, 100)]
    df3 = spark.createDataFrame(rows3, "test string, k long, d long")
    out3 = fdr_bh(df3, "test", "k", "d", alpha_permille=50).collect()
    assert all(not r.rejected for r in out3)
    assert all(r.bh_threshold is None for r in out3)


def test_empirical_hourly_pvalues_hand_oracle(spark):
    import duckdb

    from bullet_storm_spark.operators.experiment import (
        empirical_hourly_pvalues,
        empirical_hourly_pvalues_sql,
    )

    US_H = 3_600_000_000
    US_D = 86_400_000_000
    # 3 days, one key, hour 0 only: counts 2, 1 on prior days; 5 on the
    # last day -> obs=5, ge=0, p=1/3. Hour 1 silent everywhere -> obs=0,
    # every prior day >= 0 -> p = 3/3.
    def mk(day, hod, n):
        base = day * US_D + hod * US_H
        return [(base * 1000 + i, "k") for i in range(n)]

    rows = mk(0, 0, 2) + mk(1, 0, 1) + mk(2, 0, 5)
    df = spark.createDataFrame(rows, "ts_ns long, event_type string")
    out = {
        (r.key, r.hour_of_day): r
        for r in empirical_hourly_pvalues(df, "event_type").collect()
    }
    assert len(out) == 24
    r0 = out[("k", 0)]
    assert (r0.obs_cnt, r0.ge_days, r0.null_days) == (5, 0, 2)
    assert (r0.p_num, r0.p_den) == (1, 3)
    r1 = out[("k", 1)]
    assert (r1.obs_cnt, r1.p_num, r1.p_den) == (0, 3, 3)

    # DuckDB twin parity on a timestamp table (epoch µs = ts_ns/1000)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (ts TIMESTAMP, event_type VARCHAR)")
    con.executemany(
        "INSERT INTO t SELECT make_timestamp(?), ?",
        [(ns // 1000, k) for ns, k in rows],
    )
    duck = con.execute(
        "SELECT * FROM ("
        + empirical_hourly_pvalues_sql("t", "event_type")
        + ") ORDER BY test"
    ).fetchall()
    got = sorted(
        tuple(r)
        for r in empirical_hourly_pvalues(df, "event_type").collect()
    )
    assert got == sorted(tuple(r) for r in duck)


def test_policy_replay_hand_oracle(spark):
    import duckdb

    from bullet_storm_spark.operators.experiment import (
        policy_replay,
        policy_replay_sql,
    )
    from pyspark.sql import functions as F

    # one slice; arm A mean 10 in train, arm B mean 1 -> policy = A;
    # test rows: A rewards (20, 30) matched, B reward 5 ignored in the
    # replay mean but in the logging baseline
    rows = [
        (0, "A", 10.0, 0),
        (0, "A", 10.0, 1),
        (0, "B", 1.0, 2),
        # boundary = lo + ((hi-lo)*500) div 1000 = 0 + 3500 div 1000 = 3
        # -> train = µs < 3 (3 rows), test = µs >= 3 (5 rows)
        (0, "B", 1.0, 3),
        (0, "A", 20.0, 4),
        (0, "A", 30.0, 5),
        (0, "B", 5.0, 6),
        (0, "B", 5.0, 7),
    ]
    df = spark.createDataFrame(
        [(s, a, r, us * 1000) for s, a, r, us in rows],
        "s long, a string, r double, ts_ns long",
    )
    out = policy_replay(df, "s", "a", "r", train_permille=500).collect()
    assert len(out) == 1
    r0 = out[0]
    assert r0.policy_arm == "A"
    assert (r0.n_train, r0.n_test, r0.n_matched) == (3, 5, 2)
    assert r0.replay_mean == 25.0
    assert r0.logging_mean == round((1 + 20 + 30 + 5 + 5) / 5, 9)

    con = duckdb.connect()
    con.execute("CREATE TABLE t (s BIGINT, a VARCHAR, r DOUBLE, ts TIMESTAMP)")
    con.executemany(
        "INSERT INTO t SELECT ?, ?, ?, make_timestamp(?)",
        [(s, a, r, us) for s, a, r, us in rows],
    )
    duck = con.execute(
        policy_replay_sql("t", "s", "a", "r", train_permille=500)
    ).fetchall()
    assert [tuple(r) for r in out] == duck

    # tie on train means -> lexicographically smaller arm wins
    rows2 = [
        (0, "Z", 5.0, 0), (0, "B", 5.0, 1),
        (0, "Z", 7.0, 4), (0, "B", 9.0, 5),
    ]
    df2 = spark.createDataFrame(
        [(s, a, r, us * 1000) for s, a, r, us in rows2],
        "s long, a string, r double, ts_ns long",
    )
    assert policy_replay(df2, "s", "a", "r").collect()[0].policy_arm == "B"


def test_sequential_ab_hand_oracle(spark):
    import duckdb
    import math as _math
    from pyspark.sql import functions as F

    from bullet_storm_spark.operators.experiment import (
        sequential_ab, sequential_ab_sql,
    )

    # 4 looks over µs 0..39 (10 µs each); treatment converts hard in
    # look 3 so the OBF-ish boundary crosses at look 3, stays decided
    rows = []
    us = 0
    for look in range(4):
        for i in range(10):
            t = i % 2 == 0
            y = look >= 2 and t  # treatment converts 100% from look 3 on
            rows.append((t, y, us * 1000))
            us += 1
    df = spark.createDataFrame(rows, "t boolean, y boolean, ts_ns long")
    bounds = [3.0, 2.5, 2.0, 1.8]
    out = sequential_ab(
        df, F.col("t"), F.col("y"), boundaries=bounds
    ).collect()

    # pure-Python oracle
    cum = {"nt": 0, "st": 0, "nc": 0, "sc": 0}
    exp = []
    decided = False
    for k in range(4):
        seg = rows[k * 10:(k + 1) * 10]
        cum["nt"] += sum(1 for t, y, _ in seg if t)
        cum["st"] += sum(1 for t, y, _ in seg if t and y)
        cum["nc"] += sum(1 for t, y, _ in seg if not t)
        cum["sc"] += sum(1 for t, y, _ in seg if not t and y)
        pa = cum["st"] / cum["nt"]
        pb = cum["sc"] / cum["nc"]
        pp = (cum["st"] + cum["sc"]) / (cum["nt"] + cum["nc"])
        se2 = pp * (1 - pp) * (1 / cum["nt"] + 1 / cum["nc"])
        z = round((pa - pb) / _math.sqrt(se2), 9) if se2 > 0 else None
        crossed = z is not None and abs(z) >= bounds[k]
        decided = decided or crossed
        exp.append((k + 1, cum["nt"], cum["st"], cum["nc"], cum["sc"],
                    z, bounds[k], crossed, decided))
    assert [tuple(r) for r in out] == exp
    assert any(r.crossed for r in out)
    # decided stays latched after the first crossing
    first = next(r.look for r in out if r.crossed)
    assert all(r.decided for r in out if r.look >= first)

    con = duckdb.connect()
    con.execute("CREATE TABLE t (t BOOLEAN, y BOOLEAN, ts TIMESTAMP)")
    con.executemany(
        "INSERT INTO t SELECT ?, ?, make_timestamp(?)",
        [(t, y, ns // 1000) for t, y, ns in rows],
    )
    duck = con.execute(
        sequential_ab_sql("t", "t", "y", boundaries=bounds)
    ).fetchall()
    assert [tuple(r) for r in out] == duck
