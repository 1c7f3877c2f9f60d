"""Seeded engine-parity fuzz for the statistics/trend family.

Same rationale as test_parity_fuzz: the oracle gate exercises each twin
against one fixed corpus; the r6 hazard classes (decimal scale
reduction, decimal ties under ROUND, DuckDB's int64 multiply fast path,
ANSI divide-by-zero hoisting) are all *boundary* phenomena that only
fire on particular magnitudes and tie patterns. Each fuzz case draws a
deterministic random frame designed to hit those boundaries — exact
short decimals (tie-prone), large summed magnitudes (overflow-prone),
heavy ties (midrank-prone), degenerate slices (zero-variance /
single-class) — and asserts bitwise tuple equality between the Spark
plan and the DuckDB twin.
"""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.operators.stats_tests import (
    auc_rank_sum,
    auc_rank_sum_sql,
    calibration_summary,
    calibration_summary_sql,
    chi2_independence,
    chi2_independence_sql,
    cohens_kappa,
    cohens_kappa_sql,
    cuped_ttest,
    cuped_ttest_sql,
    two_proportion_z,
    two_proportion_z_sql,
    welch_t,
    welch_t_sql,
)
from bullet_storm_spark.operators.trend import (
    decayed_top_items,
    decayed_top_items_sql,
    groupwise_ols,
    groupwise_ols_sql,
)

SEEDS = range(6)


def _values(rng, n):
    """Mix of tie-prone short decimals, large magnitudes, negatives."""
    pool = [
        lambda: round(rng.uniform(-5, 5), 1),          # short decimals: ties
        lambda: round(rng.uniform(-2000, 2000), 6),    # full 6dp
        lambda: float(rng.randint(-3, 3)),             # integer ties
        lambda: rng.uniform(-1e5, 1e5),                # large magnitudes
        # 7-digit values ending in 5: EXACT (18,6) quantization ties,
        # where the direct double->decimal cast diverges across engines
        # (the _q6 text-hop class) -- float() of the literal gives the
        # nearest double whose shortest repr is the tie text
        lambda: float(f"{rng.randint(-9999, 9999)}.{rng.randint(0, 999999):06d}5"),
    ]
    return [rng.choice(pool)() for _ in range(n)]


def _duck(con_sql, query):
    con = duckdb.connect()
    con.execute(con_sql)
    return con.execute(query).fetchall()


def _rows_sql(rows, cols):
    vals = ", ".join(
        "(" + ", ".join("NULL" if v is None else repr(v) for v in r) + ")"
        for r in rows
    )
    return f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) v({cols})"


@pytest.mark.parametrize("seed", SEEDS)
def test_welch_auc_z_parity_fuzz(spark, seed):
    rng = random.Random(1000 + seed)
    n = rng.randint(6, 80)
    rows = [
        (v, rng.choice(["a", "b", "c"]), rng.randint(0, 1))
        for v in _values(rng, n)
    ]
    df = spark.createDataFrame(rows, "value double, arm string, ok int")
    setup = _rows_sql(rows, "value, arm, ok")

    got = welch_t(df, "value", F.col("arm") == "a", F.col("arm") == "b")
    oracle = _duck(setup, welch_t_sql("t", "value", "arm = 'a'", "arm = 'b'"))
    assert [tuple(r) for r in got.collect()] == oracle

    got = auc_rank_sum(df, "value", F.col("ok") == 1)
    oracle = _duck(setup, auc_rank_sum_sql("t", "value", "ok = 1"))
    assert [tuple(r) for r in got.collect()] == oracle

    got = two_proportion_z(
        df, F.col("ok") == 1, F.col("arm") == "a", F.col("arm") == "b"
    )
    oracle = _duck(
        setup, two_proportion_z_sql("t", "ok = 1", "arm = 'a'", "arm = 'b'")
    )
    assert [tuple(r) for r in got.collect()] == oracle


@pytest.mark.parametrize("seed", SEEDS)
def test_kappa_chi2_parity_fuzz(spark, seed):
    rng = random.Random(2000 + seed)
    n = rng.randint(4, 60)
    cats = ["u", "v", "w"][: rng.randint(1, 3)]
    rows = [(rng.choice(cats), rng.choice(cats)) for _ in range(n)]
    df = spark.createDataFrame(rows, "a string, b string")
    setup = _rows_sql(rows, "a, b")

    got = cohens_kappa(df, F.col("a"), F.col("b"))
    oracle = _duck(setup, cohens_kappa_sql("t", "a", "b"))
    assert [tuple(r) for r in got.collect()] == oracle

    got = chi2_independence(df, F.col("a"), F.col("b"))
    oracle = _duck(setup, chi2_independence_sql("t", "a", "b"))
    assert [tuple(r) for r in got.collect()] == oracle


@pytest.mark.parametrize("seed", SEEDS)
def test_calibration_cuped_parity_fuzz(spark, seed):
    rng = random.Random(3000 + seed)
    n = rng.randint(5, 70)
    # probs drawn from short decimals to maximize decimal-tie exposure;
    # include exact 0.0/1.0 and out-of-range rows (must be excluded)
    probs = [
        rng.choice(
            [0.0, 1.0, 0.5, round(rng.random(), 2), round(rng.random(), 6), 1.5]
        )
        for _ in range(n)
    ]
    rows = [
        (p, rng.randint(0, 1), v, rng.choice(["a", "b"]))
        for p, v in zip(probs, _values(rng, n))
    ]
    df = spark.createDataFrame(rows, "p double, y int, x double, arm string")
    setup = _rows_sql(rows, "p, y, x, arm")

    got = calibration_summary(df, "p", F.col("y") == 1)
    oracle = _duck(setup, calibration_summary_sql("t", "p", "y = 1"))
    assert [tuple(r) for r in got.collect()] == oracle

    # CUPED: x covariate vs p*10 metric (correlated by construction
    # would be nicer, but parity needs adversarial inputs, not realism);
    # large summed magnitudes in _values probe the int64 multiply path
    got = cuped_ttest(df, "x", "p", F.col("arm") == "a", F.col("arm") == "b")
    oracle = _duck(
        setup, cuped_ttest_sql("t", "x", "p", "arm = 'a'", "arm = 'b'")
    )
    assert [tuple(r) for r in got.collect()] == oracle


@pytest.mark.parametrize("seed", SEEDS)
def test_trend_parity_fuzz(spark, seed):
    rng = random.Random(4000 + seed)
    n = rng.randint(5, 60)
    rows = [
        (
            rng.choice(["k1", "k2"]),
            float(rng.randint(0, 500)),
            v,
            rng.choice(["A", "B", "C", "D"]),
            rng.randint(0, 100_000),
        )
        for v in _values(rng, n)
    ]
    df = spark.createDataFrame(
        rows, "k string, x double, y double, item string, ts long"
    )
    setup = _rows_sql(rows, "k, x, y, item, ts")

    got = groupwise_ols(df, ["k"], "x", "y")
    oracle = _duck(setup, groupwise_ols_sql("t", ["k"], "x", "y"))
    assert [tuple(r) for r in got.collect()] == oracle

    got = decayed_top_items(df, "item", "ts", halflife_us=5_000, k=4)
    oracle = _duck(
        setup, decayed_top_items_sql("t", "item", "ts", halflife_us=5_000, k=4)
    )
    assert [tuple(r) for r in got.collect()] == oracle


from bullet_storm_spark.operators.stats_tests import (  # noqa: E402
    bootstrap_mean_ci,
    bootstrap_mean_ci_sql,
)


@pytest.mark.parametrize("seed", SEEDS)
def test_bootstrap_parity_fuzz(spark, seed):
    rng = random.Random(5000 + seed)
    n = rng.randint(3, 50)  # tiny n exercises the dropped-replicate ranks
    rows = [(i, v) for i, v in enumerate(_values(rng, n))]
    df = spark.createDataFrame(rows, "id long, value double")
    setup = _rows_sql(rows, "id, value")
    got = bootstrap_mean_ci(df, "id", "value", b=40, alpha=0.1)
    oracle = _duck(
        setup, bootstrap_mean_ci_sql("t", "id", "value", b=40, alpha=0.1)
    )
    assert [tuple(r) for r in got.collect()] == oracle


@pytest.mark.parametrize("seed", SEEDS)
def test_r8_second_half_parity_fuzz(spark, seed):
    """Seeded boundary fuzz for the r8 second-half scan-shaped
    statistics: McNemar, post-stratified ATE, EB shrinkage, ICC,
    partial correlation, CvM drift — tie-prone values, degenerate
    strata/classes, zero-variance slices."""
    from bullet_storm_spark.operators.anomaly import cvm_drift, cvm_drift_sql
    from bullet_storm_spark.operators.correlate import (
        partial_correlation,
        partial_correlation_sql,
    )
    from bullet_storm_spark.operators.experiment import (
        eb_shrunk_rates,
        eb_shrunk_rates_sql,
        icc_design_effect,
        icc_design_effect_sql,
        poststrat_ate,
        poststrat_ate_sql,
    )
    from bullet_storm_spark.operators.stats_tests import mcnemar, mcnemar_sql

    rng = random.Random(7000 + seed)
    n = rng.randint(8, 120)
    n_strata = rng.choice([1, 2, 3, 5])
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                i % n_strata,
                rng.randint(0, 1),
                _values(rng, 1)[0],
                rng.randint(0, 1),
                rng.randint(0, 1),
            )
        )
    df = spark.createDataFrame(rows, "id long, s int, t int, v double, a int, b int")
    setup = _rows_sql(rows, "id, s, t, v, a, b")

    sp = [tuple(r) for r in mcnemar(df, F.col("a") == 1, F.col("b") == 1).collect()]
    assert sp == _duck(setup, mcnemar_sql("t", "a = 1", "b = 1"))

    sp = [tuple(r) for r in poststrat_ate(
        df, F.col("s"), F.col("t") == 1, "v"
    ).collect()]
    assert sp == _duck(setup, poststrat_ate_sql("t", "s", "t = 1", "v"))

    sp = [tuple(r) for r in eb_shrunk_rates(
        df, F.col("s"), F.col("a") == 1
    ).collect()]
    assert sp == _duck(setup, eb_shrunk_rates_sql("t", "s", "a = 1"))

    sp = [tuple(r) for r in icc_design_effect(df, "s", "v").collect()]
    assert sp == _duck(setup, icc_design_effect_sql("t", "s", "v"))

    sp = [tuple(r) for r in partial_correlation(
        df, "v", "a", "b"
    ).collect()]
    assert sp == _duck(setup, partial_correlation_sql("t", "v", "a", "b"))

    sp = [tuple(r) for r in cvm_drift(
        df, "v", F.col("t") == 1, F.col("t") == 0
    ).collect()]
    assert sp == _duck(setup, cvm_drift_sql("t", "v", "t = 1", "t = 0"))


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.slow
def test_r9_parity_fuzz(spark, seed):
    """Seeded boundary fuzz for the r9 additions: vocabulary richness
    (tie-heavy tiny vocabularies), waterfill (budgets at the all-capped /
    none-capped boundaries), Lorenz curve (heavy actor ties), and the
    survival pair (Nelson-Aalen, log-rank) on synthetic timestamp
    frames. Bitwise tuple equality against the DuckDB twins."""
    from bullet_storm_spark.operators.concentration import (
        lorenz_curve,
        lorenz_curve_sql,
    )
    from bullet_storm_spark.operators.sampling import (
        token_waterfill,
        token_waterfill_sql,
    )
    from bullet_storm_spark.operators.survival import (
        logrank_test,
        logrank_test_sql,
        nelson_aalen,
        nelson_aalen_sql,
    )
    from bullet_storm_spark.operators.vocab import (
        vocabulary_richness,
        vocabulary_richness_sql,
    )

    rng = random.Random(8100 + seed)

    # --- richness + waterfill on one documents-shaped frame
    vocab = [f"w{i}" for i in range(rng.randint(2, 8))]
    docs = [
        (
            rng.choice(["s1", "s2", "s3"]),
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40))),
        )
        for _ in range(rng.randint(3, 60))
    ]
    ddf = spark.createDataFrame(docs, "source string, text string")
    setup = _rows_sql(docs, "source, text")
    sp = [tuple(r) for r in vocabulary_richness(ddf, "source", "text").collect()]
    assert sp == _duck(setup, vocabulary_richness_sql("t", "source", "text"))

    total = sum(len(t.split()) for _, t in docs)
    for budget in (0, 1, total, 2 * total, 4 * total, 8 * total + 1):
        sp = [
            tuple(r)
            for r in token_waterfill(
                ddf, "source", "text", budget_tokens=budget, max_epochs=2.0
            ).collect()
        ]
        assert sp == _duck(
            setup,
            token_waterfill_sql(
                "t", "source", "text", budget_tokens=budget, max_epochs=2.0
            ),
        ), f"budget={budget}"

    # --- Lorenz on a heavy-tie actor frame
    ev = []
    for u in range(rng.randint(2, 30)):
        ev += [(u,)] * rng.choice([1, 1, 1, 2, 5, 40])
    edf = spark.createDataFrame(ev, "user_id long")
    setup = _rows_sql(ev, "user_id")
    sp = [tuple(r) for r in lorenz_curve(edf, "user_id").collect()]
    assert sp == _duck(setup, lorenz_curve_sql("t", "user_id"))

    # --- survival pair on a synthetic timestamp frame: Spark reads
    # ts_ns (the load_table convention), the twin reads epoch_us(ts)
    n_users = rng.randint(4, 40)
    rows = []
    for u in range(n_users):
        first = rng.randint(0, 50)
        span = rng.choice([0, 0, 1, 3, 10, 30])
        for h in (first, first + span):
            us = h * 3_600_000_000 + rng.randint(0, 3_599_000_000)
            rows.append((u, us))
    sdf = spark.createDataFrame(
        [(u, us * 1000) for u, us in rows], "user_id long, ts_ns long"
    )
    vals = ", ".join(f"({u}, make_timestamp({us}))" for u, us in rows)
    setup = f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) v(user_id, ts)"
    sp = [tuple(r) for r in nelson_aalen(sdf, censor_gap_units=5).collect()]
    assert sp == _duck(setup, nelson_aalen_sql("t", censor_gap_units=5))

    from bullet_storm_spark.operators.sampling import (
        hash_fraction,
        hash_fraction_sql,
    )

    sp = [
        tuple(r)
        for r in logrank_test(
            sdf,
            hash_fraction("user_id", "fz") < 0.5,
            censor_gap_units=5,
        ).collect()
    ]
    assert sp == _duck(
        setup,
        logrank_test_sql(
            "t", f"{hash_fraction_sql('user_id', 'fz')} < 0.5",
            censor_gap_units=5,
        ),
    )

    # --- r9 second batch (VERDICT r9 item 8): entropy rate, stickiness,
    # Fano — on one events-shaped frame with tie-heavy chains (few event
    # types, few users, clustered hours: the boundary zones are
    # single-state processes, single-day corpora, zero-variance spines)
    from bullet_storm_spark.operators.behavior import (
        entropy_rate,
        entropy_rate_sql,
        stickiness_report,
        stickiness_report_sql,
    )
    from bullet_storm_spark.operators.diagnostics import (
        fano_report,
        fano_report_sql,
    )

    types = ["view", "click", "buy"][: rng.randint(1, 3)]
    ev_rows = []
    eid = 0
    for u in range(rng.randint(1, 12)):
        for _ in range(rng.randint(1, 25)):
            us = rng.randint(0, rng.choice([1, 24, 24 * 14])) * 3_600_000_000
            us += rng.randint(0, 3_599_000_000)
            ev_rows.append((u, eid, rng.choice(types), us))
            eid += 1
    evdf = spark.createDataFrame(
        [(u, e, t, us * 1000) for u, e, t, us in ev_rows],
        "user_id long, event_id long, event_type string, ts_ns long",
    )
    vals = ", ".join(
        f"({u}, {e}, '{t}', make_timestamp({us}))" for u, e, t, us in ev_rows
    )
    setup = (
        f"CREATE TABLE t AS SELECT * FROM (VALUES {vals})"
        " v(user_id, event_id, event_type, ts)"
    )
    sp = [tuple(r) for r in entropy_rate(evdf).collect()]
    assert sp == _duck(setup, entropy_rate_sql("t"))
    wd = rng.choice([1, 2, 7])
    sp = [tuple(r) for r in stickiness_report(evdf, window_days=wd).collect()]
    assert sp == _duck(setup, stickiness_report_sql("t", window_days=wd))
    sp = [tuple(r) for r in fano_report(evdf).collect()]
    assert sp == _duck(setup, fano_report_sql("t"))


@pytest.mark.parametrize("seed", range(3))
def test_partial_correlation_collinear_clamp(spark, seed):
    """ADVICE r8: a conditioning correlation at exactly ±1 (or 1 + an FP
    ulp) must yield the documented NULL in BOTH engines — before the
    clamp, the DuckDB twin raised on sqrt(negative) while Spark returned
    NaN. Exact collinear confounders hit the boundary by construction."""
    from bullet_storm_spark.operators.correlate import (
        partial_correlation,
        partial_correlation_sql,
    )

    rng = random.Random(9200 + seed)
    n = rng.randint(5, 40)
    rows = []
    for i in range(n):
        v = _values(rng, 1)[0]
        # z EXACTLY collinear with x -> r_xz = 1 up to FP; y noisy
        rows.append((i, v, 2.0 * v + 1.0, rng.uniform(-5, 5)))
    df = spark.createDataFrame(rows, "id long, x double, z double, y double")
    setup = _rows_sql(rows, "id, x, z, y")
    sp = [
        tuple(r)
        for r in partial_correlation(df, "x", "y", "z").collect()
    ]
    # the contract: BOTH engines survive (pre-clamp the DuckDB twin
    # raised on sqrt(negative) whenever FP pushed r_xz an ulp past 1)
    # and agree bitwise. The EMITTED r_xz rounds to 1.0 while the
    # internal unrounded value sits an ulp below, so r_xy_z is usually a
    # tiny well-defined number, identically in both engines — the
    # documented NULL fires only at the exact pole.
    oracle = _duck(setup, partial_correlation_sql("t", "x", "y", "z"))
    assert sp == oracle
    assert abs(sp[0][2]) >= 0.999999  # the fixture really is collinear


@pytest.mark.parametrize("seed", range(3))
def test_qround_hop_matches_spark_round_fuzz(spark, seed):
    """Direct certification of SCALING.md hazards #7/#8: the guarded
    text hop the oracle uses for every final round must equal Spark's
    F.round(double, n) bit-for-bit — including short-decimal ties (where
    DuckDB's float-arithmetic ROUND diverges build-dependently) and the
    sub-10^-(n+1) zone (where DuckDB 1.0 mis-parses scientific-notation
    text into DECIMAL)."""
    from bullet_storm_spark.operators.stats_tests import _qround_sql

    rng = random.Random(9900 + seed)
    vals = []
    for _ in range(300):
        kind = rng.random()
        if kind < 0.3:  # short-decimal ties at the 10th digit
            vals.append(float(f"{rng.randint(-99, 99)}."
                              f"{rng.randint(0, 999999999):09d}5"))
        elif kind < 0.6:  # the broken sci-notation zone
            vals.append((10 ** rng.uniform(-20, -9)) * rng.uniform(-10, 10))
        elif kind < 0.7:  # the DECIMAL(38,d) overflow zone (ADVICE r9:
            # the 1e16 bypass must return x unchanged, not raise)
            vals.append(rng.uniform(-1, 1) * 10 ** rng.uniform(16, 60))
        else:  # general magnitudes
            vals.append(rng.uniform(-1, 1) * 10 ** rng.uniform(-8, 6))
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v double")
    digits = rng.choice([2, 6, 9])
    got = {
        r.id: r.r
        for r in df.select("id", F.round("v", digits).alias("r")).collect()
    }
    con = duckdb.connect()
    con.execute(_rows_sql(rows, "id, v"))
    want = dict(
        con.execute(
            f"SELECT id, {_qround_sql('v', digits)} FROM t"
        ).fetchall()
    )
    diverged = {
        i: (got[i], want[i], vals[i]) for i in got if got[i] != want[i]
    }
    assert not diverged, f"digits={digits}: {list(diverged.items())[:4]}"
