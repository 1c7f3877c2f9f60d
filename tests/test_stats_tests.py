"""Statistical tests: pure-Python oracles + DuckDB twins + guards."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.operators.stats_tests import (
    auc_rank_sum,
    auc_rank_sum_sql,
    cohens_kappa,
    cohens_kappa_sql,
    two_proportion_z,
    two_proportion_z_sql,
    welch_t,
    welch_t_sql,
)

# (score, label) with deliberate ties: score 2.0 appears in both classes
AUC_ROWS = [
    (0.1, 0), (0.5, 0), (2.0, 0), (3.0, 0),
    (2.0, 1), (4.0, 1), (5.0, 1),
]


def _py_auc(rows):
    # midrank Mann-Whitney
    scores = sorted(r[0] for r in rows)
    ranks = {}
    i = 0
    while i < len(scores):
        j = i
        while j < len(scores) and scores[j] == scores[i]:
            j += 1
        ranks[scores[i]] = (i + 1 + j) / 2  # average of ranks i+1..j
        i = j
    pos = [r[0] for r in rows if r[1] == 1]
    neg = [r[0] for r in rows if r[1] == 0]
    rs = sum(ranks[s] for s in pos)
    return (rs - len(pos) * (len(pos) + 1) / 2) / (len(pos) * len(neg))


def _duck(rows_sql, query):
    con = duckdb.connect()
    con.execute(rows_sql)
    return con.execute(query).fetchall()


def test_auc_matches_python_and_duckdb(spark):
    df = spark.createDataFrame(AUC_ROWS, "score double, label int")
    row = auc_rank_sum(df, "score", F.col("label") == 1).collect()[0]
    assert (row["n_pos"], row["n_neg"]) == (3, 4)
    assert row["auc"] == pytest.approx(_py_auc(AUC_ROWS), abs=1e-9)
    oracle = _duck(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({s}, {l})" for s, l in AUC_ROWS)
        + ") v(score, label)",
        auc_rank_sum_sql("t", "score", "label = 1"),
    )
    assert tuple(row) == oracle[0]


def test_auc_perfect_separation(spark):
    rows = [(float(i), 1 if i >= 5 else 0) for i in range(10)]
    df = spark.createDataFrame(rows, "score double, label int")
    assert auc_rank_sum(df, "score", F.col("label") == 1).collect()[0][
        "auc"
    ] == 1.0


def test_auc_degenerate_single_class(spark):
    df = spark.createDataFrame([(1.0, 1), (2.0, 1)], "score double, label int")
    row = auc_rank_sum(df, "score", F.col("label") == 1).collect()[0]
    assert row["auc"] is None and row["n_neg"] == 0


WELCH_A = [1.1, 2.3, 2.9, 4.2, 5.0]
WELCH_B = [2.0, 3.5, 4.1, 6.6, 7.2, 8.0]


def _py_welch(a, b):
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    dof = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    return ma, mb, t, dof


def test_welch_matches_python_and_duckdb(spark):
    rows = [(v, "a") for v in WELCH_A] + [(v, "b") for v in WELCH_B]
    df = spark.createDataFrame(rows, "value double, arm string")
    got = welch_t(
        df, "value", F.col("arm") == "a", F.col("arm") == "b"
    ).collect()[0]
    ma, mb, t, dof = _py_welch(WELCH_A, WELCH_B)
    assert (got["n_a"], got["n_b"]) == (5, 6)
    assert got["mean_a"] == pytest.approx(ma, abs=1e-8)
    assert got["t_stat"] == pytest.approx(t, abs=1e-8)
    assert got["dof"] == pytest.approx(dof, abs=1e-8)
    oracle = _duck(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({v}, '{a}')" for v, a in rows)
        + ") v(value, arm)",
        welch_t_sql("t", "value", "arm = 'a'", "arm = 'b'"),
    )
    assert tuple(got) == oracle[0]


def test_welch_small_arm_is_null(spark):
    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "b"), (3.0, "b")], "value double, arm string"
    )
    got = welch_t(
        df, "value", F.col("arm") == "a", F.col("arm") == "b"
    ).collect()[0]
    assert got["t_stat"] is None and got["dof"] is None
    assert got["mean_a"] == 1.0  # means still reported


def test_two_proportion_z_matches_python_and_duckdb(spark):
    # arm a: 30/100 success; arm b: 45/120
    rows = [(i, "a", 1 if i < 30 else 0) for i in range(100)] + [
        (i, "b", 1 if i < 45 else 0) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "i long, arm string, ok int")
    got = two_proportion_z(
        df, F.col("ok") == 1, F.col("arm") == "a", F.col("arm") == "b"
    ).collect()[0]
    pa, pb = 30 / 100, 45 / 120
    pp = 75 / 220
    z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1 / 100 + 1 / 120))
    assert (got["n_a"], got["s_a"], got["n_b"], got["s_b"]) == (100, 30, 120, 45)
    assert got["z_stat"] == pytest.approx(z, abs=1e-9)
    oracle = _duck(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{a}', {o})" for i, a, o in rows)
        + ") v(i, arm, ok)",
        two_proportion_z_sql("t", "ok = 1", "arm = 'a'", "arm = 'b'"),
    )
    assert tuple(got) == oracle[0]


def test_two_proportion_z_degenerate_pool(spark):
    # every row succeeds -> pooled rate 1 -> z undefined
    df = spark.createDataFrame(
        [(1, "a"), (1, "b")], "ok int, arm string"
    )
    got = two_proportion_z(
        df, F.col("ok") == 1, F.col("arm") == "a", F.col("arm") == "b"
    ).collect()[0]
    assert got["z_stat"] is None and got["p_a"] == 1.0


KAPPA_ROWS = [
    ("k", "k"), ("k", "k"), ("k", "k"), ("k", "d"),
    ("d", "d"), ("d", "d"), ("d", "k"), ("d", "d"),
]


def _py_kappa(rows):
    n = len(rows)
    po = sum(1 for a, b in rows if a == b) / n
    cats = {c for r in rows for c in r}
    pe = sum(
        (sum(1 for a, _ in rows if a == c) / n)
        * (sum(1 for _, b in rows if b == c) / n)
        for c in cats
    )
    return (po - pe) / (1 - pe)


def test_kappa_matches_python_and_duckdb(spark):
    df = spark.createDataFrame(KAPPA_ROWS, "a string, b string")
    got = cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
    assert got["n"] == 8 and got["agree"] == 6
    assert got["kappa"] == pytest.approx(_py_kappa(KAPPA_ROWS), abs=1e-9)
    oracle = _duck(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"('{a}', '{b}')" for a, b in KAPPA_ROWS)
        + ") v(a, b)",
        cohens_kappa_sql("t", "a", "b"),
    )
    assert tuple(got) == oracle[0]


def test_kappa_perfect_agreement_and_null_exclusion(spark):
    rows = [("x", "x"), ("y", "y"), ("x", None)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
    assert got["n"] == 2 and got["agree"] == 2 and got["kappa"] == 1.0


def test_kappa_disjoint_categories_chance_zero(spark):
    # raters never emit the same category: pe joins to empty -> pe 0,
    # po 0 -> kappa 0 (not NULL, not crash)
    rows = [("x", "y"), ("x", "y")]
    df = spark.createDataFrame(rows, "a string, b string")
    got = cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
    assert got["pe"] == 0.0 and got["kappa"] == 0.0


# --- calibration -----------------------------------------------------------

from bullet_storm_spark.operators.stats_tests import (  # noqa: E402
    _POIS1_CDF,
    bootstrap_mean_ci,
    bootstrap_mean_ci_sql,
    calibration_bins,
    calibration_bins_sql,
    calibration_summary,
    calibration_summary_sql,
)

# (prob, label): bin 0 holds {0.05->0, 0.15->?} with 10 bins: 0.05 in bin 0,
# 0.15 bin 1 ... deliberately include p=1.0 (clamps into the last bin)
CAL_ROWS = [
    (0.05, 0), (0.08, 0), (0.12, 0), (0.95, 1), (0.90, 1),
    (0.55, 1), (0.52, 0), (1.00, 1), (0.35, 0), (0.38, 1),
]


def _py_cal(rows, bins=10):
    out = {}
    for p, y in rows:
        b = min(int(p * bins), bins - 1)
        n, sp, pos = out.get(b, (0, 0.0, 0))
        out[b] = (n + 1, sp + p, pos + y)
    res = []
    for b in sorted(out):
        n, sp, pos = out[b]
        conf, acc = sp / n, pos / n
        res.append((b, n, conf, acc, abs(acc - conf)))
    return res


def _rows_approx(got, want):
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:2] == w[:2]
        for gv, wv in zip(g[2:], w[2:]):
            assert gv == pytest.approx(wv, abs=1e-12)


def test_calibration_bins_matches_python_and_duckdb(spark):
    df = spark.createDataFrame(CAL_ROWS, "p double, y int")
    got = [
        tuple(r)
        for r in calibration_bins(df, "p", F.col("y") == 1).collect()
    ]
    _rows_approx(got, _py_cal(CAL_ROWS))
    oracle = _duck(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({p}, {y})" for p, y in CAL_ROWS)
        + ") v(p, y)",
        calibration_bins_sql("t", "p", "y = 1"),
    )
    assert got == [tuple(r) for r in oracle]


def test_calibration_summary_matches_python_and_duckdb(spark):
    df = spark.createDataFrame(CAL_ROWS, "p double, y int")
    got = tuple(calibration_summary(df, "p", F.col("y") == 1).collect()[0])
    bins = _py_cal(CAL_ROWS)
    n = sum(b[1] for b in bins)
    ece = sum(b[1] * b[4] for b in bins) / n
    mce = max(b[4] for b in bins)
    brier = sum((p - y) ** 2 for p, y in CAL_ROWS) / len(CAL_ROWS)
    assert got[0] == n
    assert got[1] == pytest.approx(ece, abs=1e-8)
    assert got[2] == pytest.approx(mce, abs=1e-8)
    assert got[3] == pytest.approx(brier, abs=1e-8)
    oracle = _duck(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({p}, {y})" for p, y in CAL_ROWS)
        + ") v(p, y)",
        calibration_summary_sql("t", "p", "y = 1"),
    )
    assert got == oracle[0]


def test_calibration_out_of_range_rows_excluded(spark):
    rows = CAL_ROWS + [(1.5, 1), (-0.2, 0)]
    df = spark.createDataFrame(rows, "p double, y int")
    got = [tuple(r) for r in calibration_bins(df, "p", F.col("y") == 1).collect()]
    _rows_approx(got, _py_cal(CAL_ROWS))  # invalid probs dropped, not clamped


def test_calibration_bins_validation(spark):
    with pytest.raises(ValueError):
        calibration_bins_sql("t", "p", "y = 1", bins=1)


# --- bootstrap -------------------------------------------------------------


def test_poisson_cdf_literals_mean_near_one():
    # sanity on the inverse-CDF table itself: E[k] over a fine uniform
    # grid must sit near 1 (Poisson(1) mean), and the table must be
    # strictly increasing
    assert all(b > a for a, b in zip(_POIS1_CDF, _POIS1_CDF[1:]))
    grid = [(i + 0.5) / 10000 for i in range(10000)]
    def inv(u):
        for k, c in enumerate(_POIS1_CDF):
            if u < c:
                return k
        return 8
    mean = sum(inv(u) for u in grid) / len(grid)
    assert mean == pytest.approx(1.0, abs=0.01)


def test_bootstrap_ci_matches_duckdb_and_brackets_mean(spark):
    rows = [(i, float(10 + (i * 7) % 13)) for i in range(120)]
    df = spark.createDataFrame(rows, "id long, value double")
    got = tuple(
        bootstrap_mean_ci(df, "id", "value", b=80, alpha=0.1).collect()[0]
    )
    oracle = _duck(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {v})" for i, v in rows)
        + ") v(id, value)",
        bootstrap_mean_ci_sql("t", "id", "value", b=80, alpha=0.1),
    )
    assert got == oracle[0]
    n, b, est, lo, hi = got
    assert (n, b) == (120, 80)
    assert lo <= est <= hi          # CI brackets the point estimate
    assert hi - lo < 2.0            # and is tight for n=120, sd~3.7


def test_bootstrap_is_deterministic_and_salt_sensitive(spark):
    rows = [(i, float(i % 7)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, value double")
    a1 = tuple(bootstrap_mean_ci(df, "id", "value", b=40).collect()[0])
    a2 = tuple(bootstrap_mean_ci(df, "id", "value", b=40).collect()[0])
    assert a1 == a2                  # same salt -> same CI, always
    b1 = tuple(
        bootstrap_mean_ci(df, "id", "value", b=40, salt="other").collect()[0]
    )
    assert (a1[3], a1[4]) != (b1[3], b1[4])  # different salt -> new draw


def test_bootstrap_validation(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, value double")
    with pytest.raises(ValueError):
        bootstrap_mean_ci(df, "id", "value", b=1)
    with pytest.raises(ValueError):
        bootstrap_mean_ci(df, "id", "value", b=10, alpha=0.05)  # 2m > b
    with pytest.raises(ValueError):
        bootstrap_mean_ci_sql("t", "id", "value", b=100, alpha=1.5)


# --- chi2 / Cramér's V / experiment readout ---------------------------------

from bullet_storm_spark.operators.stats_tests import (  # noqa: E402
    chi2_independence,
    chi2_independence_sql,
    experiment_readout,
    experiment_readout_sql,
)

CHI_ROWS = [
    ("x", "u"), ("x", "u"), ("x", "v"), ("x", "u"),
    ("y", "v"), ("y", "v"), ("y", "u"), ("y", "v"), ("y", "v"),
    ("z", "u"), ("z", "v"), ("z", "u"),
]


def _py_chi2(rows):
    n = len(rows)
    from collections import Counter
    cells = Counter(rows)
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    chi2 = 0.0
    for (a, b), o in cells.items():
        e = ra[a] * cb[b] / n
        chi2 += (o - e) ** 2 / e
    r, c = len(ra), len(cb)
    v = math.sqrt(chi2 / (n * (min(r, c) - 1)))
    return n, r, c, (r - 1) * (c - 1), chi2, v


def test_chi2_matches_python_and_duckdb(spark):
    df = spark.createDataFrame(CHI_ROWS, "a string, b string")
    got = tuple(chi2_independence(df, F.col("a"), F.col("b")).collect()[0])
    n, r, c, dof, chi2, v = _py_chi2(CHI_ROWS)
    assert got[:4] == (n, r, c, dof)
    assert got[4] == pytest.approx(chi2, abs=1e-8)
    assert got[5] == pytest.approx(v, abs=1e-8)
    oracle = _duck(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"('{a}', '{b}')" for a, b in CHI_ROWS)
        + ") v(a, b)",
        chi2_independence_sql("t", "a", "b"),
    )
    assert got == oracle[0]


def test_chi2_exactly_independent_clamps_to_zero(spark):
    """Exactly-independent table (contingency [[1,2],[2,4]]): the 12-dp
    per-cell quantization can push Σ o²/(rc) a hair below 1, making
    n·(Σ−1) ≈ −3e-12. Unclamped, Spark emitted a negative chi2 with a
    NaN cramers_v while the DuckDB twin crashed outright on
    sqrt(negative) — the ADVICE r6 finding. Both sides must now report
    exactly 0."""
    rows = (
        [("x", "u")] * 1 + [("x", "v")] * 2 + [("y", "u")] * 2 + [("y", "v")] * 4
    )
    df = spark.createDataFrame(rows, "a string, b string")
    got = tuple(chi2_independence(df, F.col("a"), F.col("b")).collect()[0])
    assert got[:4] == (9, 2, 2, 1)
    assert got[4] == 0.0 and got[5] == 0.0
    oracle = _duck(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"('{a}', '{b}')" for a, b in rows)
        + ") v(a, b)",
        chi2_independence_sql("t", "a", "b"),
    )
    assert got == oracle[0]


def test_chi2_constant_column_null_stats(spark):
    df = spark.createDataFrame(
        [("x", "u"), ("x", "v")], "a string, b string"
    )
    got = chi2_independence(df, F.col("a"), F.col("b")).collect()[0]
    assert got["dof"] == 0 and got["chi2"] is None and got["cramers_v"] is None


def test_experiment_readout_matches_duckdb(spark):
    rows = (
        [("control", 1)] * 40 + [("control", 0)] * 60
        + [("t1", 1)] * 55 + [("t1", 0)] * 45
        + [("t2", 1)] * 42 + [("t2", 0)] * 58
    )
    df = spark.createDataFrame(rows, "variant string, ok int")
    got = [
        tuple(r)
        for r in experiment_readout(
            df, "variant", F.col("ok") == 1, "control"
        ).collect()
    ]
    oracle = _duck(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"('{v}', {o})" for v, o in rows)
        + ") v(variant, ok)",
        experiment_readout_sql("t", "variant", "ok = 1", "control"),
    )
    assert got == [tuple(r) for r in oracle]
    byv = {r[0]: r for r in got}
    assert byv["control"][4] is None and byv["control"][5] is None
    assert byv["t1"][4] == pytest.approx(0.15)
    assert byv["t1"][5] > 2.0          # 55% vs 40% on n=100: clearly significant
    assert abs(byv["t2"][5]) < 1.0     # 42% vs 40%: noise


def test_experiment_readout_missing_control_keeps_rows(spark):
    rows = [("t1", 1), ("t1", 0), ("t2", 1)]
    df = spark.createDataFrame(rows, "variant string, ok int")
    got = experiment_readout(df, "variant", F.col("ok") == 1, "nope").collect()
    assert len(got) == 2
    assert all(r["lift"] is None and r["z_vs_control"] is None for r in got)


# --- CUPED -------------------------------------------------------------------

from bullet_storm_spark.operators.stats_tests import (  # noqa: E402
    cuped_ttest,
    cuped_ttest_sql,
)

# unit rows: (x pre-metric, y metric, arm). y correlates strongly with x,
# arm b gets a +0.5 true lift on top
CUPED_ROWS = [
    (1.0, 2.1, "a"), (2.0, 4.2, "a"), (3.0, 5.9, "a"), (4.0, 8.1, "a"),
    (5.0, 9.8, "a"), (6.0, 12.2, "a"),
    (1.0, 2.6, "b"), (2.0, 4.6, "b"), (3.0, 6.4, "b"), (4.0, 8.6, "b"),
    (5.0, 10.4, "b"), (6.0, 12.6, "b"),
]


def _py_cuped(rows):
    xs = [r[0] for r in rows]
    ys = [r[1] for r in rows]
    n = len(rows)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y, _ in rows)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    vxy, vxx, vyy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    theta = vxy / vxx
    xbar = sx / n
    out = {}
    for arm in ("a", "b"):
        pts = [(x, y) for x, y, a in rows if a == arm]
        adj = [y - theta * (x - xbar) for x, y in pts]
        na = len(adj)
        m = sum(adj) / na
        v = sum((z - m) ** 2 for z in adj) / (na - 1)
        out[arm] = (na, m, v)
    na, ma, va = out["a"]
    nb, mb, vb = out["b"]
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    dof = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    rho2 = vxy * vxy / (vxx * vyy)
    return theta, ma, mb, t, dof, rho2


def test_cuped_matches_python_and_duckdb(spark):
    df = spark.createDataFrame(CUPED_ROWS, "x double, y double, arm string")
    got = cuped_ttest(
        df, "x", "y", F.col("arm") == "a", F.col("arm") == "b"
    ).collect()[0]
    theta, ma, mb, t, dof, rho2 = _py_cuped(CUPED_ROWS)
    assert (got["n_a"], got["n_b"]) == (6, 6)
    assert got["theta"] == pytest.approx(theta, abs=1e-9)
    assert got["mean_a_adj"] == pytest.approx(ma, abs=1e-9)
    assert got["t_adj"] == pytest.approx(t, abs=1e-7)
    assert got["dof_adj"] == pytest.approx(dof, abs=1e-6)
    assert got["var_reduction"] == pytest.approx(rho2, abs=1e-9)
    # the covariate removes almost all variance in this construction
    assert got["var_reduction"] > 0.95
    oracle = _duck(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({x}, {y}, '{a}')" for x, y, a in CUPED_ROWS)
        + ") v(x, y, arm)",
        cuped_ttest_sql("t", "x", "y", "arm = 'a'", "arm = 'b'"),
    )
    assert tuple(got) == oracle[0]


def test_cuped_beats_raw_welch_on_correlated_covariate(spark):
    df = spark.createDataFrame(CUPED_ROWS, "x double, y double, arm string")
    raw = welch_t(
        df, "y", F.col("arm") == "a", F.col("arm") == "b"
    ).collect()[0]
    adj = cuped_ttest(
        df, "x", "y", F.col("arm") == "a", F.col("arm") == "b"
    ).collect()[0]
    # same true lift, much less variance -> much larger |t|
    assert abs(adj["t_adj"]) > 3 * abs(raw["t_stat"])


def test_cuped_degenerate_constant_covariate(spark):
    rows = [(1.0, 2.0, "a"), (1.0, 3.0, "a"), (1.0, 4.0, "b"), (1.0, 5.0, "b")]
    df = spark.createDataFrame(rows, "x double, y double, arm string")
    got = cuped_ttest(
        df, "x", "y", F.col("arm") == "a", F.col("arm") == "b"
    ).collect()[0]
    assert got["theta"] is None and got["t_adj"] is None


# --- Benford ----------------------------------------------------------------

from bullet_storm_spark.operators.stats_tests import (  # noqa: E402
    _BENFORD_P,
    benford_audit,
    benford_audit_sql,
)


def test_benford_expected_table():
    assert sum(_BENFORD_P) == pytest.approx(1.0, abs=1e-9)
    assert _BENFORD_P[0] == pytest.approx(0.30103, abs=1e-5)


def test_benford_matches_python_and_duckdb(spark):
    # mix of magnitudes incl. scientific-notation reprs, negatives,
    # zeros and NULLs (excluded), and an absent digit (9)
    vals = [1.0, 12.5, 0.013, 150.0, 1e-7, -2.5, 25.0, 0.00033, 4.2,
            55.5, 6e8, 0.07, 812.0, None, 0.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [tuple(r) for r in benford_audit(df, "v").collect()]
    import collections
    # repr() is Python's SHORTEST round-trip text — the same convention
    # both engines use (a %.17g format would print 1e-7 as 9.99...e-08
    # and miscount the first digit)
    first = collections.Counter(
        next(c for c in repr(abs(v)) if c in "123456789")
        for v in vals if v not in (None, 0.0)
    )
    n_total = sum(first.values())
    assert [g[0] for g in got] == list(range(1, 10))
    for g in got:
        d, n, freq, exp, dev = g
        assert n == first.get(str(d), 0)
        assert freq == pytest.approx(n / n_total, abs=1e-12)
        assert exp == _BENFORD_P[d - 1]
        assert dev == pytest.approx(freq - exp, abs=1e-12)
    assert got[8][1] == 0  # digit 9 absent -> explicit zero row
    oracle = _duck(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({v!r}::DOUBLE)" if v is not None else "(NULL::DOUBLE)"
                    for v in vals)
        + ") v(v)",
        benford_audit_sql("t", "v"),
    )
    assert got == [tuple(r) for r in oracle]


# --- mutual information -----------------------------------------------------

from bullet_storm_spark.operators.stats_tests import (  # noqa: E402
    mutual_information,
    mutual_information_sql,
)


def _py_mi(pairs):
    """Pure-Python MI/entropies in nats (unquantized reference)."""
    pairs = [p for p in pairs if None not in p]
    n = len(pairs)
    from collections import Counter

    cab, ca, cb = Counter(pairs), Counter(p[0] for p in pairs), Counter(
        p[1] for p in pairs
    )
    mi = sum(
        (o / n) * math.log(n * o / (ca[a] * cb[b]))
        for (a, b), o in cab.items()
    )
    ha = -sum((c / n) * math.log(c / n) for c in ca.values())
    hb = -sum((c / n) * math.log(c / n) for c in cb.values())
    return max(mi, 0.0), ha, hb


def _mi_setup(pairs):
    vals = ", ".join(
        "("
        + ", ".join("NULL" if v is None else f"'{v}'" for v in p)
        + ")"
        for p in pairs
    )
    return f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) v(a, b)"


def test_mi_dependent_independent_and_constant(spark):
    # perfectly dependent: MI = H(A) = H(B), NMI = 1
    dep = [("x", "1")] * 5 + [("y", "2")] * 5 + [("z", "3")] * 2
    df = spark.createDataFrame(dep, "a string, b string")
    got = tuple(mutual_information(df, F.col("a"), F.col("b")).collect()[0])
    want = _duck(_mi_setup(dep), mutual_information_sql("t", "a", "b"))[0]
    assert got == want
    mi, ha, hb = _py_mi(dep)
    assert got[3] == pytest.approx(mi, abs=1e-8)
    assert got[6] == pytest.approx(1.0, abs=1e-8)
    # exactly independent 2x2: MI quantizes to ~0, clamped at >= 0
    ind = (
        [("x", "1")] * 1 + [("x", "2")] * 2 + [("y", "1")] * 2 + [("y", "2")] * 4
    )
    df = spark.createDataFrame(ind, "a string, b string")
    got = tuple(mutual_information(df, F.col("a"), F.col("b")).collect()[0])
    want = _duck(_mi_setup(ind), mutual_information_sql("t", "a", "b"))[0]
    assert got == want
    assert got[3] == pytest.approx(0.0, abs=1e-8) and got[3] >= 0.0
    # constant column: H = 0 pinned exactly, NMI NULL
    const = [("x", "1"), ("x", "2"), ("x", "2")]
    df = spark.createDataFrame(const, "a string, b string")
    got = tuple(mutual_information(df, F.col("a"), F.col("b")).collect()[0])
    want = _duck(_mi_setup(const), mutual_information_sql("t", "a", "b"))[0]
    assert got == want
    assert got[1] == 1 and got[4] == 0.0 and got[6] is None


@pytest.mark.parametrize("seed", range(3))
def test_mi_parity_fuzz(spark, seed):
    import random

    rng = random.Random(7700 + seed)
    pairs = [
        (
            rng.choice(["a", "b", "c", None]),
            rng.choice(["1", "2", "3", "4", None]),
        )
        for _ in range(rng.randint(10, 200))
    ]
    pairs += [("a", "1"), ("b", "2")]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = tuple(mutual_information(df, F.col("a"), F.col("b")).collect()[0])
    want = _duck(_mi_setup(pairs), mutual_information_sql("t", "a", "b"))[0]
    assert got == want
    mi, ha, hb = _py_mi(pairs)
    assert got[3] == pytest.approx(mi, abs=1e-7)
    assert got[4] == pytest.approx(ha, abs=1e-7)
    assert got[5] == pytest.approx(hb, abs=1e-7)


# ---------------------------------------------------------------------------
# Krippendorff's alpha
# ---------------------------------------------------------------------------

def _py_krippendorff(ratings):
    """Exact nominal alpha via fractions over the long (unit, value)
    frame — the coincidence-matrix textbook formula."""
    from collections import Counter, defaultdict
    from fractions import Fraction

    by_unit = defaultdict(list)
    for u, v in ratings:
        if v is not None:
            by_unit[u].append(v)
    units = {u: vs for u, vs in by_unit.items() if len(vs) >= 2}
    if not units:
        return None
    A = Fraction(0)
    margins = Counter()
    n = 0
    for vs in units.values():
        m = len(vs)
        cnt = Counter(vs)
        A += Fraction(m * m - sum(c * c for c in cnt.values()), m - 1)
        margins.update(cnt)
        n += m
    B = n * n - sum(c * c for c in margins.values())
    if B == 0:
        return None
    return float(1 - Fraction(n - 1) * A / B)


def test_krippendorff_alpha_hand_cases(spark):
    from bullet_storm_spark.operators.stats_tests import krippendorff_alpha

    # mixed raters-per-unit incl. a singleton unit (dropped) and a NULL
    ratings = [
        (1, "a"), (1, "a"), (1, "b"),
        (2, "b"), (2, "b"),
        (3, "a"), (3, "a"), (3, "a"),
        (4, "c"),               # single rating: drops
        (5, "a"), (5, None),    # NULL rating drops -> unit 5 drops too
        (6, "b"), (6, "c"), (6, "c"),
    ]
    df = spark.createDataFrame(ratings, "u long, v string")
    out = krippendorff_alpha(df, "u", "v", max_raters=3).collect()[0]
    want = _py_krippendorff(ratings)
    assert out.alpha == pytest.approx(want, abs=1e-9)
    assert out.n_units == 4 and out.n_ratings == 11
    # perfect agreement across raters -> alpha == 1 exactly
    perfect = [(u, "x") for u in (1, 1, 2, 2)] + [(3, "y"), (3, "y")]
    p = krippendorff_alpha(
        spark.createDataFrame(perfect, "u long, v string"), "u", "v"
    ).collect()[0]
    assert p.alpha == 1.0
    # constant single category everywhere -> de_num = 0 -> NULL
    const = [(1, "x"), (1, "x"), (2, "x"), (2, "x")]
    c = krippendorff_alpha(
        spark.createDataFrame(const, "u long, v string"), "u", "v"
    ).collect()[0]
    assert c.alpha is None


def test_krippendorff_duck_parity(spark):
    import duckdb

    from bullet_storm_spark.operators.stats_tests import (
        krippendorff_alpha, krippendorff_alpha_sql,
    )

    import random
    rng = random.Random(99)
    ratings = []
    for u in range(60):
        for r in range(rng.randint(1, 5)):
            ratings.append((u, rng.choice("abc")))
    df = spark.createDataFrame(ratings, "u long, v string")
    s = [tuple(r) for r in krippendorff_alpha(df, "u", "v").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (u BIGINT, v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", ratings)
    d = con.execute(krippendorff_alpha_sql("t", "u", "v")).fetchall()
    assert s == d
    assert s[0][5] == pytest.approx(_py_krippendorff(ratings), abs=1e-9)


def test_krippendorff_rejects_units_beyond_max_raters(spark):
    """A unit with more ratings than max_raters must FAIL LOUDLY in both
    engines — the lcm scaling silently truncates past it (review-caught)."""
    import duckdb

    from bullet_storm_spark.operators.stats_tests import (
        krippendorff_alpha, krippendorff_alpha_sql,
    )

    ratings = [(1, "a")] * 4 + [(2, "b"), (2, "a")]
    df = spark.createDataFrame(ratings, "u long, v string")
    with pytest.raises(Exception, match="max_raters"):
        krippendorff_alpha(df, "u", "v", max_raters=3).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (u BIGINT, v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", ratings)
    with pytest.raises(Exception, match="max_raters"):
        con.execute(krippendorff_alpha_sql("t", "u", "v", max_raters=3))
    # and the same data passes at an honest max_raters
    ok = krippendorff_alpha(df, "u", "v", max_raters=4).collect()
    assert ok[0].n_units == 2


def test_wilson_intervals_hand_oracle(spark):
    import duckdb
    from pyspark.sql import functions as F

    from bullet_storm_spark.operators.stats_tests import (
        wilson_intervals, wilson_intervals_sql,
    )

    rows = (
        [("a", 1)] * 7 + [("a", 0)] * 3     # 7/10
        + [("b", 1)] * 0 + [("b", 0)] * 5   # 0/5: Wald collapses, Wilson not
        + [("c", 1)] * 4                    # 4/4
    )
    df = spark.createDataFrame(rows, "g string, y long")
    out = {r.grp: r for r in wilson_intervals(
        df, "g", F.col("y") == 1).collect()}

    def wilson(k, n, z=1.959963984540054):
        p = k / n
        zz = z * z
        denom = 1.0 + zz / n
        center = (p + zz / (2.0 * n)) / denom
        half = z * ((p * (1 - p) / n + zz / (4.0 * n * n)) ** 0.5) / denom
        return round(center - half, 9), round(center + half, 9)

    lo, hi = wilson(7, 10)
    assert (out["a"].lo, out["a"].hi) == (lo, hi)
    assert 0.0 < out["a"].lo < 0.7 < out["a"].hi < 1.0
    # degenerate groups stay inside [0, 1] with NONZERO width
    assert out["b"].lo == 0.0 or out["b"].lo > 0.0
    assert out["b"].hi > 0.0 and out["b"].rate == 0.0
    assert out["c"].lo < 1.0 and out["c"].hi <= 1.0000000001

    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    duck = con.execute(wilson_intervals_sql("t", "g", "y = 1")).fetchall()
    assert [tuple(r) for r in wilson_intervals(
        df, "g", F.col("y") == 1).collect()] == duck


def test_newcombe_diff_hand_oracle(spark):
    import duckdb
    from pyspark.sql import functions as F

    from bullet_storm_spark.operators.stats_tests import (
        newcombe_diff, newcombe_diff_sql,
    )

    rows = (
        [("a", 1, 1)] * 8 + [("a", 1, 0)] * 2      # treated 8/10
        + [("a", 0, 1)] * 5 + [("a", 0, 0)] * 5    # control 5/10
        + [("b", 1, 1)] * 3                         # b: control arm EMPTY
    )
    df = spark.createDataFrame(rows, "g string, t long, y long")
    out = {r.grp: r for r in newcombe_diff(
        df, "g", F.col("t") == 1, F.col("y") == 1).collect()}

    def wilson(k, n, z=1.959963984540054):
        p = k / n; zz = z * z
        denom = 1.0 + zz / n
        c = (p + zz / (2.0 * n)) / denom
        h = z * ((p * (1 - p) / n + zz / (4.0 * n * n)) ** 0.5) / denom
        return p, c - h, c + h

    p1, l1, u1 = wilson(8, 10)
    p2, l2, u2 = wilson(5, 10)
    d = p1 - p2
    lo = d - ((p1 - l1) ** 2 + (u2 - p2) ** 2) ** 0.5
    hi = d + ((u1 - p1) ** 2 + (p2 - l2) ** 2) ** 0.5
    a = out["a"]
    assert (a.diff, a.lo, a.hi) == (round(d, 9), round(lo, 9), round(hi, 9))
    assert a.lo < a.diff < a.hi and -1.0 <= a.lo and a.hi <= 1.0
    # empty control arm: NULLs, not Inf/crash
    b = out["b"]
    assert b.n_c == 0 and b.diff is None and b.lo is None and b.hi is None

    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, t BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    duck = con.execute(
        newcombe_diff_sql("t", "g", "t = 1", "y = 1")
    ).fetchall()
    assert [tuple(r) for r in newcombe_diff(
        df, "g", F.col("t") == 1, F.col("y") == 1).collect()] == duck


def test_mann_whitney_hand_oracle(spark):
    import duckdb
    from pyspark.sql import functions as F

    from bullet_storm_spark.operators.stats_tests import (
        mann_whitney_u, mann_whitney_u_sql,
    )

    # ties across and within arms; arm A stochastically larger
    rows = (
        [("A", 3.0), ("A", 5.0), ("A", 5.0), ("A", 8.0), ("A", 9.0)]
        + [("B", 1.0), ("B", 2.0), ("B", 3.0), ("B", 5.0)]
        + [("C", 99.0)]  # matches neither predicate: excluded
    )
    df = spark.createDataFrame(rows, "arm string, v double")
    out = mann_whitney_u(
        df, "v", F.col("arm") == "A", F.col("arm") == "B"
    ).collect()[0]

    # pure-Python midrank oracle
    vals = sorted(v for a, v in rows if a in ("A", "B"))
    ranks = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        ranks[vals[i]] = (i + 1 + j) / 2
        i = j
    a_vals = [v for a, v in rows if a == "A"]
    b_vals = [v for a, v in rows if a == "B"]
    n1, n2 = len(a_vals), len(b_vals)
    r1 = sum(ranks[v] for v in a_vals)
    u1 = r1 - n1 * (n1 + 1) / 2
    nn = n1 + n2
    from collections import Counter
    tie_sum = sum(t ** 3 - t for t in Counter(vals).values())
    var = n1 * n2 / 12.0 * ((nn + 1.0) - tie_sum / (nn * (nn - 1.0)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var)
    assert (out.n_a, out.n_b) == (n1, n2)
    assert out.u2_a == 2 * u1
    assert out.z == round(z, 9)

    con = duckdb.connect()
    con.execute("CREATE TABLE t (arm VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    duck = con.execute(
        mann_whitney_u_sql("t", "v", "arm = 'A'", "arm = 'B'")
    ).fetchall()
    assert [tuple(r) for r in mann_whitney_u(
        df, "v", F.col("arm") == "A", F.col("arm") == "B"
    ).collect()] == duck

    # degenerate: every value tied -> zero variance -> NULL z
    df2 = spark.createDataFrame(
        [("A", 1.0), ("A", 1.0), ("B", 1.0)], "arm string, v double"
    )
    out2 = mann_whitney_u(
        df2, "v", F.col("arm") == "A", F.col("arm") == "B"
    ).collect()[0]
    assert out2.z is None


def test_fleiss_kappa_hand_oracle(spark):
    import duckdb

    from bullet_storm_spark.operators.stats_tests import (
        fleiss_kappa, fleiss_kappa_sql,
    )

    # Fleiss 1971-style panel: 6 units x 3 raters, 3 categories
    panel = {
        1: ["a", "a", "a"],
        2: ["a", "a", "b"],
        3: ["b", "b", "c"],
        4: ["c", "c", "c"],
        5: ["a", "b", "c"],
        6: ["b", "b", "b"],
    }
    rows = [(u, v) for u, vs in panel.items() for v in vs]
    df = spark.createDataFrame(rows, "u long, v string")
    out = fleiss_kappa(df, "u", "v", n_raters=3).collect()[0]

    # pure-Python oracle
    from collections import Counter
    n, m = len(panel), 3
    cats = sorted({v for vs in panel.values() for v in vs})
    a_sum = sum(
        sum(c * c for c in Counter(vs).values()) for vs in panel.values()
    )
    big_m = n * m
    margins = Counter(v for vs in panel.values() for v in vs)
    s = sum(c * c for c in margins.values())
    p_bar = (a_sum - big_m) / (big_m * (m - 1))
    p_e = s / (big_m * big_m)
    kappa = (p_bar - p_e) / (1 - p_e)
    assert (out.n_units, out.n_raters, out.n_categories) == (n, m, len(cats))
    assert out.p_bar == round(p_bar, 9)
    assert out.p_e == round(p_e, 9)
    assert out.kappa == round(kappa, 9)

    con = duckdb.connect()
    con.execute("CREATE TABLE t (u BIGINT, v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    duck = con.execute(fleiss_kappa_sql("t", "u", "v", n_raters=3)).fetchall()
    assert [tuple(r) for r in fleiss_kappa(
        df, "u", "v", n_raters=3).collect()] == duck

    # ragged panel must FAIL loudly, not skew
    df_bad = spark.createDataFrame(rows + [(1, "a")], "u long, v string")
    with pytest.raises(Exception):
        fleiss_kappa(df_bad, "u", "v", n_raters=3).collect()

    # all ratings one category: kappa undefined -> NULL
    df_one = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (2, "a")], "u long, v string"
    )
    out_one = fleiss_kappa(df_one, "u", "v", n_raters=2).collect()[0]
    assert out_one.kappa is None


def test_cochran_armitage_hand_oracle(spark):
    import duckdb
    from pyspark.sql import functions as F

    from bullet_storm_spark.operators.stats_tests import (
        cochran_armitage, cochran_armitage_sql,
    )

    # rising rate across doses 0/1/2: 1/10, 4/10, 7/10
    rows = (
        [(0, 1)] * 1 + [(0, 0)] * 9
        + [(1, 1)] * 4 + [(1, 0)] * 6
        + [(2, 1)] * 7 + [(2, 0)] * 3
    )
    df = spark.createDataFrame(rows, "w long, y long")
    out = cochran_armitage(df, F.col("w"), F.col("y") == 1).collect()[0]

    # pure-Python oracle (cleared-integer form, same association)
    from collections import defaultdict
    lev = defaultdict(lambda: [0, 0])
    for w, y in rows:
        lev[w][0] += 1
        lev[w][1] += y
    n = sum(v[0] for v in lev.values())
    r = sum(v[1] for v in lev.values())
    swn = sum(w * v[0] for w, v in lev.items())
    swr = sum(w * v[1] for w, v in lev.items())
    sw2n = sum(w * w * v[0] for w, v in lev.items())
    num = n * swr - r * swn
    z = (
        num * math.sqrt(n)
        / (math.sqrt(r * (n - r)) * math.sqrt(n * sw2n - swn * swn))
    )
    assert (out.n, out.r, out.n_levels) == (n, r, len(lev))
    assert out.z == round(z, 9)
    assert out.z > 2.0  # clearly rising trend

    con = duckdb.connect()
    con.execute("CREATE TABLE t (w BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    duck = con.execute(cochran_armitage_sql("t", "w", "y = 1")).fetchall()
    assert [tuple(r2) for r2 in cochran_armitage(
        df, F.col("w"), F.col("y") == 1).collect()] == duck

    # degenerate: single dose level -> no variance -> NULL z
    df2 = spark.createDataFrame([(1, 1), (1, 0)], "w long, y long")
    assert cochran_armitage(
        df2, F.col("w"), F.col("y") == 1).collect()[0].z is None


def test_brown_forsythe_hand_oracle(spark):
    import duckdb

    from bullet_storm_spark.operators.stats_tests import (
        brown_forsythe, brown_forsythe_sql,
    )

    # g1 tight around 10, g2 wide around 10: location equal, spread not
    rows = (
        [("g1", v) for v in (9.5, 10.0, 10.0, 10.5)]
        + [("g2", v) for v in (2.0, 6.0, 14.0, 18.0)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    out = brown_forsythe(df, "g", "v").collect()[0]

    # pure-Python oracle on the same 6dp lattice
    import statistics
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    z = {
        g: [round(abs(v - round(statistics.median(vs), 9)), 6) for v in vs]
        for g, vs in groups.items()
    }
    n = sum(len(vs) for vs in z.values())
    k = len(z)
    means = {g: round(sum(vs) / len(vs), 6) for g, vs in z.items()}
    grand = round(sum(sum(vs) for vs in z.values()) / n, 6)
    ssb = sum(len(vs) * (means[g] - grand) ** 2 for g, vs in z.items())
    ssw = sum(
        (x - means[g]) ** 2 for g, vs in z.items() for x in vs
    )
    f = (ssb * (n - k)) / (ssw * (k - 1))
    assert (out.n, out.n_groups) == (n, k)
    assert abs(out.ssb - ssb) < 1e-9
    assert abs(out.ssw - ssw) < 1e-9
    assert abs(out.f_stat - f) < 1e-6
    assert out.f_stat > 3.0  # spread clearly differs

    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    duck = con.execute(brown_forsythe_sql("t", "g", "v")).fetchall()
    assert [tuple(r) for r in brown_forsythe(df, "g", "v").collect()] == duck

    # one group: F undefined -> NULL
    df1 = spark.createDataFrame(
        [("g1", 1.0), ("g1", 2.0)], "g string, v double"
    )
    assert brown_forsythe(df1, "g", "v").collect()[0].f_stat is None


def test_auc_delong_hand_oracle(spark):
    import duckdb
    from pyspark.sql import functions as F

    from bullet_storm_spark.operators.stats_tests import (
        auc_delong, auc_rank_sum, auc_delong_sql,
    )

    rows = AUC_ROWS  # ties across classes at score 2.0
    df = spark.createDataFrame(rows, "s double, y long")
    out = auc_delong(df, "s", F.col("y") == 1).collect()[0]

    # point estimate must equal the rank-sum AUC exactly
    ref = auc_rank_sum(df, "s", F.col("y") == 1).collect()[0]
    assert out.auc == ref.auc
    assert (out.n_pos, out.n_neg) == (ref.n_pos, ref.n_neg)

    # pure-Python DeLong oracle via placement values
    pos = sorted(r[0] for r in rows if r[1] == 1)
    neg = sorted(r[0] for r in rows if r[1] == 0)
    n1, n2 = len(pos), len(neg)
    p = [
        (sum(1 for v in neg if v < s) + 0.5 * sum(1 for v in neg if v == s))
        / n2
        for s in pos
    ]
    q = [
        (sum(1 for v in pos if v > s) + 0.5 * sum(1 for v in pos if v == s))
        / n1
        for s in neg
    ]
    auc = sum(p) / n1
    # mean of q is ALSO the AUC (placements of positives above each
    # negative), not 1-AUC — the classic DeLong orientation slip
    s10 = sum((x - auc) ** 2 for x in p) / (n1 - 1)
    s01 = sum((x - auc) ** 2 for x in q) / (n2 - 1)
    se = math.sqrt(s10 / n1 + s01 / n2)
    assert out.auc == round(auc, 9)
    assert abs(out.se - se) < 1e-9
    assert out.lo <= out.auc <= out.hi
    assert 0.0 <= out.lo and out.hi <= 1.0

    con = duckdb.connect()
    con.execute("CREATE TABLE t (s DOUBLE, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    duck = con.execute(auc_delong_sql("t", "s", "y = 1")).fetchall()
    assert [tuple(r) for r in auc_delong(
        df, "s", F.col("y") == 1).collect()] == duck

    # single positive: SE undefined -> NULLs, AUC still defined
    df1 = spark.createDataFrame(
        [(1.0, 1), (0.5, 0), (0.2, 0)], "s double, y long"
    )
    o1 = auc_delong(df1, "s", F.col("y") == 1).collect()[0]
    assert o1.auc == 1.0 and o1.se is None and o1.lo is None
