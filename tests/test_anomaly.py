"""CUSUM changepoint detection (operators/anomaly.py) and priority
sampling (sampling.priority_sample): semantics, structural guarantees,
DuckDB parity."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.operators import anomaly, sampling

HOUR = 3_600_000_000


def _mk_events(spark, rows):
    # rows: (event_id, key, us)
    df = spark.createDataFrame(
        [(e, k, us * 1000) for (e, k, us) in rows],
        "event_id long, event_type string, ts_ns long",
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev (event_id BIGINT, event_type VARCHAR, ts TIMESTAMP)"
    )
    con.executemany(
        "INSERT INTO ev VALUES (?,?,make_timestamp(?))",
        [(e, k, us) for (e, k, us) in rows],
    )
    return df, con


@pytest.fixture(scope="module")
def shifted(spark):
    # key 'a': 20 hours at 2 events/hour, then 10 hours at 9 events/hour —
    # a clean level shift the detector must flag in the back half
    rows = []
    eid = 0
    for h in range(30):
        n = 2 if h < 20 else 9
        for i in range(n):
            rows.append((eid, "a", h * HOUR + i * 60_000_000))
            eid += 1
    # key 'b': steady 3/hour, never flags
    for h in range(30):
        for i in range(3):
            rows.append((eid, "b", h * HOUR + i * 60_000_000))
            eid += 1
    return _mk_events(spark, [(e, k, us) for (e, k, us) in rows])


def test_cusum_flags_level_shift_only(shifted):
    df, _ = shifted
    out = anomaly.volume_cusum(df, slack_k=0.5, threshold_h=4.0).collect()
    a = [r for r in out if r.event_type == "a"]
    b = [r for r in out if r.event_type == "b"]
    assert any(r.flag for r in a), "shift not detected"
    # the POSITIVE side fires only in the shifted (high) regime; any
    # earlier flag must come from the negative side correctly marking the
    # long low-opening stretch as below the full-series mean
    pos_flags = [r.hour for r in a if r.flag and r.cusum_pos > r.cusum_neg]
    assert pos_flags and min(pos_flags) >= 20
    for r in a:
        if r.flag and r.hour < 20:
            assert r.cusum_neg > r.cusum_pos
    assert not any(r.flag for r in b), "false alarm on the steady series"
    # cusum statistics are non-negative by construction
    assert all(r.cusum_pos >= 0 and r.cusum_neg >= 0 for r in out)


def _assert_matches_recursion(out_rows):
    # the window formulation must equal the textbook recursion exactly,
    # BOTH sides (S0 = 0 start: running min clamped with zero)
    out = sorted(out_rows, key=lambda r: r.hour)
    counts = [r.cnt for r in out]
    n = len(counts)
    mu = round(sum(counts) / n, 9)
    sd = round(
        math.sqrt(sum(c * c for c in counts) / n - (sum(counts) / n) ** 2), 9
    )
    sp = sn = 0.0
    for r, c in zip(out, counts):
        sp = max(0.0, sp + (c - mu - 0.5 * sd))
        sn = max(0.0, sn + (-(c - mu) - 0.5 * sd))
        assert r.cusum_pos == pytest.approx(sp, abs=1e-6)
        assert r.cusum_neg == pytest.approx(sn, abs=1e-6)


def test_cusum_matches_sequential_reference(shifted):
    df, _ = shifted
    out = [r for r in anomaly.volume_cusum(df).collect() if r.event_type == "a"]
    _assert_matches_recursion(out)


def test_cusum_shift_first_matches_reference(spark):
    # series OPENS in the anomalous (high) regime — prefix cumsum is
    # positive from t=1, the case the unclamped closed form understated
    # (round-4 ADVICE): 10 hours at 9/hour then 20 hours at 2/hour
    rows = []
    eid = 0
    for h in range(30):
        n = 9 if h < 10 else 2
        for i in range(n):
            rows.append((eid, "a", h * HOUR + i * 60_000_000))
            eid += 1
    df, con = _mk_events(spark, rows)
    out = anomaly.volume_cusum(df).collect()
    _assert_matches_recursion(out)
    # the opening high regime itself must flag on the positive side
    assert any(r.flag and r.hour < 10 for r in out)
    # parity still holds with the clamp in both dialects
    d = con.execute(anomaly.volume_cusum_sql("ev")).fetchall()
    assert [tuple(r) for r in sorted(out, key=lambda r: r.hour)] == [
        tuple(r) for r in d
    ]


def test_cusum_outage_hours_densified(spark):
    # hours 10-14 have NO events at all: the dense per-key grid must emit
    # cnt=0 rows there and the negative side must flag the outage
    rows = []
    eid = 0
    for h in range(20):
        if 10 <= h < 15:
            continue
        for i in range(5):
            rows.append((eid, "a", h * HOUR + i * 60_000_000))
            eid += 1
    df, con = _mk_events(spark, rows)
    out = sorted(anomaly.volume_cusum(df).collect(), key=lambda r: r.hour)
    assert [r.hour for r in out] == list(range(20))
    assert all(r.cnt == 0 for r in out if 10 <= r.hour < 15)
    assert any(r.flag and 10 <= r.hour < 15 for r in out), "outage not flagged"
    _assert_matches_recursion(out)
    d = con.execute(anomaly.volume_cusum_sql("ev")).fetchall()
    assert [tuple(r) for r in out] == [tuple(r) for r in d]


def test_cusum_duck_parity(shifted):
    df, con = shifted
    s = [tuple(r) for r in anomaly.volume_cusum(df).collect()]
    d = con.execute(anomaly.volume_cusum_sql("ev")).fetchall()
    assert s == [tuple(r) for r in d]


def test_cusum_knob_validation(shifted):
    df, _ = shifted
    with pytest.raises(ValueError):
        anomaly.volume_cusum(df, slack_k=0.123)
    with pytest.raises(ValueError):
        anomaly.volume_cusum_sql("ev", threshold_h=-1.0)


# --- priority sampling ------------------------------------------------------


@pytest.fixture(scope="module")
def weighted_docs(spark):
    rows = [(i, float(1 + i % 7)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    con = duckdb.connect()
    con.execute("CREATE TABLE wd (doc_id BIGINT, w DOUBLE)")
    con.executemany("INSERT INTO wd VALUES (?,?)", rows)
    return df, con


def test_priority_sample_exact_k_and_reproducible(weighted_docs):
    df, _ = weighted_docs
    a = sampling.priority_sample(df, "doc_id", F.col("w"), k=40).collect()
    b = sampling.priority_sample(
        df.repartition(7), "doc_id", F.col("w"), k=40
    ).collect()
    assert len(a) == 40
    # partitioning-independent: identical sample under a different layout
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # different salt -> different sample
    c = sampling.priority_sample(df, "doc_id", F.col("w"), k=40, salt="other")
    assert {r.doc_id for r in a} != {r.doc_id for r in c.collect()}


def test_priority_sample_weight_bias(spark):
    # weight-7 rows must be sampled far more often than weight-1 rows
    rows = [(i, 7.0 if i < 500 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = sampling.priority_sample(df, "doc_id", F.col("w"), k=200).collect()
    heavy = sum(1 for r in got if r.doc_id < 500)
    assert heavy > 140  # expectation ~ 175/200; 140 is a loose floor


def test_priority_sample_excludes_nonpositive(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 2.0)], "doc_id long, w double"
    )
    got = sampling.priority_sample(df, "doc_id", F.col("w"), k=10).collect()
    assert [r.doc_id for r in got] == [3]


def test_priority_sample_duck_parity(weighted_docs):
    df, con = weighted_docs
    s = [
        tuple(r)
        for r in sampling.priority_sample(df, "doc_id", F.col("w"), k=25).collect()
    ]
    d = con.execute(
        sampling.priority_sample_sql("wd", "doc_id", "w", k=25)
    ).fetchall()
    assert s == [tuple(r) for r in d]


# --- RRF fusion (similarity.rrf_fusion) -------------------------------------


def test_rrf_fusion_semantics_and_parity(spark):
    import random

    from bullet_storm_spark.operators import similarity

    rng = random.Random(7)
    dim = 8
    rows = [
        (i, [round(rng.uniform(-1, 1), 4) for _ in range(dim)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.rrf_fusion(
        df, "vec_id", "embedding", F.col("vec_id") < 4, k=5, pool=10, dim=dim
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3}
    for q, lst in by_q.items():
        assert [r.rank for r in lst] == [1, 2, 3, 4, 5]
        # scores non-increasing, all positive, bounded by 2/(c+1)
        scores = [r.rrf for r in lst]
        assert scores == sorted(scores, reverse=True)
        assert all(0 < s <= 2 / 61 + 1e-12 for s in scores)
        # a neighbor ranked 1 by BOTH rankers gets the max possible score
    # parity
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE emb (id BIGINT, embedding DOUBLE[])")
    con.executemany("INSERT INTO emb VALUES (?,?)", rows)
    d = con.execute(
        similarity.rrf_fusion_sql(
            "emb", "id", "embedding", "id < 4", k=5, pool=10, dim=dim
        )
    ).fetchall()
    assert [tuple(r) for r in out] == [tuple(r) for r in d]


def test_rrf_fusion_surfaces_union_of_rankers(spark):
    from bullet_storm_spark.operators import similarity

    # two clusters: LSH buckets will separate them, so the bucketed ranker
    # misses cross-cluster neighbors the exact ranker sees — the fused
    # list must still contain the exact ranker's head
    rows = [(i, [1.0, 0.0] + [0.0] * 6) for i in range(5)]
    rows += [(i + 5, [-1.0, 0.0] + [0.0] * 6) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.rrf_fusion(
        df, "vec_id", "embedding", F.col("vec_id") == 0, k=8, pool=9, dim=8
    ).collect()
    ids = {r.neighbor_id for r in out}
    assert {1, 2, 3, 4} <= ids  # same-cluster neighbors present


def test_rrf_fusion_validation(spark):
    from bullet_storm_spark.operators import similarity

    df = spark.createDataFrame([(0, [0.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        similarity.rrf_fusion(df, "vec_id", "embedding", F.col("vec_id") < 1, k=9, pool=5)


# --- two-sample KS drift (anomaly.ks_drift) ---------------------------------


def test_ks_identical_slices_zero(spark):
    from bullet_storm_spark.operators import anomaly

    rows = [(i, float(i % 10), (i // 10) % 2) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v double, g int")
    out = anomaly.ks_drift(df, "v", F.col("g") == 0, F.col("g") == 1).collect()[0]
    # both slices carry the identical distribution -> D = 0
    assert out.ks_num == 0 and out.ks_d == 0.0
    assert out.n_a == 100 and out.n_b == 100


def test_ks_disjoint_slices_one(spark):
    from bullet_storm_spark.operators import anomaly

    rows = [(i, float(i), 0) for i in range(50)]
    rows += [(50 + i, float(100 + i), 1) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, v double, g int")
    out = anomaly.ks_drift(df, "v", F.col("g") == 0, F.col("g") == 1).collect()[0]
    # disjoint supports -> D = 1 exactly, attained at the end of slice A
    assert out.ks_num == out.ks_den
    assert out.ks_d == 1.0
    assert out.at_value == 49.0


def test_ks_matches_scipy_style_reference(spark):
    from bullet_storm_spark.operators import anomaly

    import random

    rng = random.Random(3)
    a = [round(rng.gauss(0, 1), 3) for _ in range(150)]
    b = [round(rng.gauss(0.5, 1), 3) for _ in range(120)]
    rows = [(i, v, 0) for i, v in enumerate(a)]
    rows += [(1000 + i, v, 1) for i, v in enumerate(b)]
    df = spark.createDataFrame(rows, "id long, v double, g int")
    out = anomaly.ks_drift(df, "v", F.col("g") == 0, F.col("g") == 1).collect()[0]
    # pure-python exact reference on the merged support
    support = sorted(set(a) | set(b))
    best = 0
    for x in support:
        ca = sum(1 for v in a if v <= x)
        cb = sum(1 for v in b if v <= x)
        best = max(best, abs(ca * len(b) - cb * len(a)))
    assert out.ks_num == best
    assert out.ks_d == best / (len(a) * len(b))


def test_ks_duck_parity(spark):
    from bullet_storm_spark.operators import anomaly

    rows = [(i, float((i * 7) % 23), i % 3) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v double, g int")
    con = duckdb.connect()
    con.execute("CREATE TABLE kd (id BIGINT, v DOUBLE, g INTEGER)")
    con.executemany("INSERT INTO kd VALUES (?,?,?)", rows)
    s = [
        tuple(r)
        for r in anomaly.ks_drift(df, "v", F.col("g") == 0, F.col("g") != 0).collect()
    ]
    d = con.execute(anomaly.ks_drift_sql("kd", "v", "g = 0", "g <> 0")).fetchall()
    assert s == [tuple(r) for r in d]


def test_robust_outliers_flags_extremes(spark):
    # key a: tight cluster around 10 with two wild points; key b: constant
    rows = (
        [(i, "a", 10.0 + (i % 5) * 0.1) for i in range(20)]
        + [(100, "a", 500.0), (101, "a", -500.0)]
        + [(200 + i, "b", 7.0) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    from bullet_storm_spark.operators.anomaly import robust_outliers

    got = {r.key: r for r in robust_outliers(df, "event_type", "value").collect()}
    a = got["a"]
    assert a.n == 22 and a.n_outliers == 2  # only the two wild points
    assert abs(a.med - 10.2) < 0.2
    b = got["b"]
    # MAD = 0 on a constant series: no deviation -> no outliers
    assert b.n_outliers == 0 and b.mad == 0.0
    assert b.outlier_rate == 0.0


def test_robust_outliers_duckdb_parity_fixture(spark):
    import duckdb

    rows = [(i, ["x", "y"][i % 2], float((i * 37) % 100) / 7.0) for i in range(200)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    from bullet_storm_spark.operators.anomaly import (
        robust_outliers,
        robust_outliers_sql,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE ev (event_id BIGINT, event_type VARCHAR, value DOUBLE)")
    con.executemany("INSERT INTO ev VALUES (?,?,?)", rows)
    want = sorted(con.sql(robust_outliers_sql("ev", "event_type", "value")).fetchall())
    got = sorted(
        (r.key, r.n, r.med, r.mad, r.n_outliers, r.outlier_rate)
        for r in robust_outliers(df, "event_type", "value").collect()
    )
    assert got == want


def test_chi2_drift_identical_slices_zero(spark):
    from pyspark.sql import functions as F

    from bullet_storm_spark.operators.anomaly import chi2_drift

    # slices with IDENTICAL category distributions -> chi2 == 0
    rows = [(i, ["a", "b", "c"][i % 3], i % 2) for i in range(600)]
    df = spark.createDataFrame(rows, "id long, cat string, grp int")
    [r] = chi2_drift(df, "cat", F.col("grp") == 0, F.col("grp") == 1).collect()
    assert r.n_a == 300 and r.n_b == 300 and r.n_cats == 3
    assert r.chi2 == 0.0


def test_chi2_drift_detects_shift_and_matches_duckdb(spark):
    import duckdb
    from pyspark.sql import functions as F

    from bullet_storm_spark.operators.anomaly import chi2_drift, chi2_drift_sql

    # slice B heavily over-represents category 'z'; 'w' absent from A
    rows = (
        [(i, "x", 0) for i in range(100)] + [(100 + i, "y", 0) for i in range(100)]
        + [(200 + i, "x", 1) for i in range(20)]
        + [(220 + i, "z", 1) for i in range(160)]
        + [(380 + i, "w", 1) for i in range(20)]
    )
    df = spark.createDataFrame(rows, "id long, cat string, grp int")
    [r] = chi2_drift(df, "cat", F.col("grp") == 0, F.col("grp") == 1).collect()
    assert r.chi2 > 100  # massive shift
    assert r.n_cats == 4  # 'w' and 'z' kept with obs=0 on the A side
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, cat VARCHAR, grp INT)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    [want] = con.sql(chi2_drift_sql("t", "cat", "grp = 0", "grp = 1")).fetchall()
    assert (r.n_a, r.n_b, r.n_cats, r.chi2) == want


def test_psi_drift_shifted_distribution(spark):
    import duckdb
    from pyspark.sql import functions as F

    from bullet_storm_spark.operators.anomaly import psi_drift, psi_drift_sql

    # A uniform over [0,100); B shifted to [50,150) incl. out-of-range mass
    rows = [(i, float(i % 100), 0) for i in range(1000)] + [
        (10000 + i, 50.0 + (i % 100), 1) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "id long, v double, grp int")
    out = psi_drift(
        df, "v", F.col("grp") == 0, F.col("grp") == 1, lo=0.0, hi=100.0, n_bins=10
    ).collect()
    assert len(out) == 10
    psi = out[0].psi
    assert all(r.psi == psi for r in out)
    assert psi > 0.25  # "shifted" by the standard rule of thumb
    # clamped top bin holds B's out-of-range mass
    assert out[-1].p_b > out[-1].p_a
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, v DOUBLE, grp INT)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    want = con.sql(
        psi_drift_sql("t", "v", "grp = 0", "grp = 1", 0.0, 100.0, 10)
    ).fetchall()
    got = [(r.bin, r.p_a, r.p_b, r.psi_term, r.psi) for r in out]
    assert got == want


def test_psi_drift_identical_slices_near_zero(spark):
    from pyspark.sql import functions as F

    from bullet_storm_spark.operators.anomaly import psi_drift

    rows = [(i, float(i % 80), i % 2) for i in range(800)]
    df = spark.createDataFrame(rows, "id long, v double, grp int")
    out = psi_drift(
        df, "v", F.col("grp") == 0, F.col("grp") == 1, lo=0.0, hi=100.0, n_bins=10
    ).collect()
    assert out[0].psi < 0.01


def test_centroid_drift_identical_and_shifted(spark):
    import duckdb
    from pyspark.sql import functions as F

    from bullet_storm_spark.operators.anomaly import (
        centroid_drift,
        centroid_drift_sql,
    )

    # slices with IDENTICAL vector sets -> cos 1.0, l2 0.0
    vecs = [[1.0, 2.0, 3.0], [4.0, 0.0, -1.0], [0.5, 0.5, 0.5]]
    rows = [(i * 2 + g, v, g) for i, v in enumerate(vecs) for g in (0, 1)]
    df = spark.createDataFrame(rows, "id long, embedding array<double>, grp int")
    [r] = centroid_drift(
        df, "embedding", F.col("grp") == 0, F.col("grp") == 1
    ).collect()
    assert r.n_a == 3 and r.n_b == 3
    assert r.cos_centroids == 1.0 and r.l2_centroids == 0.0
    # orthogonal-shifted slice B -> cosine far below 1
    rows2 = [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0), (3, [0.0, 1.0], 1)]
    df2 = spark.createDataFrame(rows2, "id long, embedding array<double>, grp int")
    [r2] = centroid_drift(
        df2, "embedding", F.col("grp") == 0, F.col("grp") == 1
    ).collect()
    assert r2.cos_centroids == 0.0
    assert abs(r2.l2_centroids - round(2 ** 0.5, 6)) < 1e-12
    # DuckDB twin parity on the first fixture
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, embedding DOUBLE[], grp INT)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    [want] = con.sql(
        centroid_drift_sql("t", "embedding", "grp = 0", "grp = 1")
    ).fetchall()
    assert (r.n_a, r.n_b, r.cos_centroids, r.l2_centroids) == want


# --- EWMA control chart -----------------------------------------------------


def _py_ewma(rows, ln=1, ld=5, L=3.0):
    """Pure-Python EWMA reference: integer fixed-point recursion +
    asymptotic limits."""
    S = 10**9
    by_key = {}
    for _, k, us in rows:
        by_key.setdefault(k, []).append(us // 3_600_000_000)
    out = {}
    for k, hs in by_key.items():
        h0, h1 = min(hs), max(hs)
        cnt = {h: 0 for h in range(h0, h1 + 1)}
        for h in hs:
            cnt[h] += 1
        xs = [cnt[h] for h in range(h0, h1 + 1)]
        n = len(xs)
        mu = round(sum(xs) / n, 9)
        sd = round(
            math.sqrt(sum(x * x for x in xs) / n - (sum(xs) / n) ** 2), 9
        )
        lam = ln / ld
        width = L * sd * math.sqrt(lam / (2.0 - lam))
        z, zs = None, []
        for x in xs:
            xi = x * S
            z = xi if z is None else (2 * (ln * xi + (ld - ln) * z) + ld) // (
                2 * ld
            )
            zs.append(z)
        for h, x, z in zip(range(h0, h1 + 1), xs, zs):
            ew = float(z) / S
            out[(k, h)] = (
                x,
                ew,
                mu,
                sd,
                mu + width,
                mu - width,
                ew > mu + width or ew < mu - width,
            )
    return out


def test_ewma_flags_level_shift_and_matches_python(shifted):
    df, con = shifted
    got = [tuple(r) for r in anomaly.ewma_monitor(df).collect()]
    oracle = con.execute(anomaly.ewma_monitor_sql("ev")).fetchall()
    assert got == oracle
    # rebuild rows from the fixture definition
    rows = []
    for h in range(30):
        for i in range(2 if h < 20 else 9):
            rows.append((0, "a", h * HOUR + i * 60_000_000))
    for h in range(30):
        for i in range(3):
            rows.append((0, "b", h * HOUR + i * 60_000_000))
    ref = _py_ewma(rows)
    for k, hour, cnt, ewma, mu, sd, ucl, lcl, outside in got:
        rx, rew, rmu, rsd, rucl, rlcl, rout = ref[(k, hour)]
        assert cnt == rx
        assert ewma == pytest.approx(rew, abs=1e-12)
        assert mu == pytest.approx(rmu)
        assert sd == pytest.approx(rsd)
        assert outside == rout
    # the shifted key flags in the back half; the steady key never does
    a_out = [r[1] for r in got if r[0] == "a" and r[8]]
    b_out = [r[1] for r in got if r[0] == "b" and r[8]]
    assert a_out and min(a_out) >= 20
    assert b_out == []


def test_ewma_constant_series_inside(spark):
    rows = [(i, "c", h * 3_600_000_000 + i) for h in range(8) for i in range(4)]
    df, con = _mk_events(spark, rows)
    got = [tuple(r) for r in anomaly.ewma_monitor(df).collect()]
    oracle = con.execute(anomaly.ewma_monitor_sql("ev")).fetchall()
    assert got == oracle
    assert all(not r[8] for r in got)  # sd=0, ewma==mu: never outside
    assert all(r[3] == 4.0 for r in got)


def test_ewma_knob_validation(spark):
    df, _ = _mk_events(spark, [(0, "a", 0)])
    with pytest.raises(ValueError):
        anomaly.ewma_monitor(df, lam_num=5, lam_den=5)
    with pytest.raises(ValueError):
        anomaly.ewma_monitor_sql("ev", lam_num=0, lam_den=4)
    with pytest.raises(ValueError):
        anomaly.ewma_monitor(df, limit_l=3.001)


@pytest.mark.parametrize("seed", range(3))
def test_ewma_parity_fuzz(spark, seed):
    import random

    rng = random.Random(5150 + seed)
    rows = [
        (i, rng.choice(["a", "b"]), rng.randint(0, 80) * 3_600_000_000 + i)
        for i in range(rng.randint(30, 200))
    ]
    df, con = _mk_events(spark, rows)
    ln, ld = rng.choice([(1, 5), (1, 10), (3, 10)])
    got = [
        tuple(r)
        for r in anomaly.ewma_monitor(df, lam_num=ln, lam_den=ld).collect()
    ]
    oracle = con.execute(
        anomaly.ewma_monitor_sql("ev", lam_num=ln, lam_den=ld)
    ).fetchall()
    assert got == oracle
    ref = _py_ewma(rows, ln=ln, ld=ld)
    for k, hour, cnt, ewma, mu, sd, ucl, lcl, outside in got:
        assert ewma == pytest.approx(ref[(k, hour)][1], abs=1e-12)
        assert outside == ref[(k, hour)][6]


# --- binary-segmentation changepoint ---------------------------------------


def _py_binseg(rows):
    """Pure-Python AMOC reference over densified hourly counts."""
    import math as _m

    by_key = {}
    for _, k, us in rows:
        by_key.setdefault(k, []).append(us // 3_600_000_000)
    out = {}
    for k, hs in by_key.items():
        h0, h1 = min(hs), max(hs)
        cnt = {h: 0 for h in range(h0, h1 + 1)}
        for h in hs:
            cnt[h] += 1
        xs = [cnt[h] for h in range(h0, h1 + 1)]
        n = len(xs)
        if n < 2:
            continue
        best = None
        s = 0
        tot = sum(xs)
        for t in range(1, n):
            s += xs[t - 1]
            m1 = s / t
            m2 = (tot - s) / (n - t)
            stat = _m.sqrt(t * (n - t) / n) * abs(m1 - m2)
            if best is None or stat > best[0]:
                best = (stat, h0 + t - 1, m1, m2)
        out[k] = (n, best[1], best[0], best[2], best[3])
    return out


def test_binseg_finds_level_shift(shifted):
    df, con = shifted
    got = [tuple(r) for r in anomaly.binseg_changepoint(df).collect()]
    oracle = con.execute(anomaly.binseg_changepoint_sql("ev")).fetchall()
    assert got == oracle
    ref = _py_binseg(
        [(0, "a", h * HOUR + i * 60_000_000) for h in range(30) for i in range(2 if h < 20 else 9)]
        + [(0, "b", h * HOUR + i * 60_000_000) for h in range(30) for i in range(3)]
    )
    by_key = {r[0]: r for r in got}
    # key a: shift between hour 19 and 20 -> split at hour 19
    assert by_key["a"][2] == 19
    assert by_key["a"][4] == pytest.approx(2.0)  # mean_pre
    assert by_key["a"][5] == pytest.approx(9.0)  # mean_post
    for k, (n, split, stat, m1, m2) in ref.items():
        r = by_key[k]
        assert (r[1], r[2]) == (n, split)
        assert r[3] == pytest.approx(stat, abs=1e-12)


def test_binseg_single_hour_key_omitted(spark):
    rows = [(0, "solo", 100), (1, "pair", 0), (2, "pair", HOUR)]
    df, con = _mk_events(spark, rows)
    got = [tuple(r) for r in anomaly.binseg_changepoint(df).collect()]
    oracle = con.execute(anomaly.binseg_changepoint_sql("ev")).fetchall()
    assert got == oracle
    assert [r[0] for r in got] == ["pair"]


@pytest.mark.parametrize("seed", range(3))
def test_binseg_parity_fuzz(spark, seed):
    import random

    rng = random.Random(9900 + seed)
    rows = [
        (i, rng.choice(["a", "b"]), rng.randint(0, 100) * HOUR + i)
        for i in range(rng.randint(10, 150))
    ]
    df, con = _mk_events(spark, rows)
    got = [tuple(r) for r in anomaly.binseg_changepoint(df).collect()]
    oracle = con.execute(anomaly.binseg_changepoint_sql("ev")).fetchall()
    assert got == oracle
    ref = _py_binseg(rows)
    for k, n, split, stat, m1, m2 in got:
        rn, rsplit, rstat, rm1, rm2 = ref[k]
        assert (n, split) == (rn, rsplit)
        assert stat == pytest.approx(rstat, abs=1e-12)


# --- centroid matrix --------------------------------------------------------


def _mk_vecs(spark, rows):
    # rows: (vec_id, label, [floats])
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE emb (vec_id BIGINT, label VARCHAR, embedding DOUBLE[])"
    )
    con.executemany("INSERT INTO emb VALUES (?,?,?)", rows)
    return df, con


def test_centroid_matrix_semantics_and_parity(spark):
    # labels a,b share a centroid direction; c is orthogonal
    rows = [
        (1, "a", [1.0, 0.0]),
        (2, "a", [0.9, 0.1]),
        (3, "b", [1.0, 0.05]),
        (4, "b", [0.95, 0.0]),
        (5, "c", [0.0, 1.0]),
        (6, "c", [0.0, 0.9]),
    ]
    df, con = _mk_vecs(spark, rows)
    got = [tuple(r) for r in anomaly.centroid_matrix(df, "label", "embedding").collect()]
    want = con.execute(
        anomaly.centroid_matrix_sql("emb", "label", "embedding")
    ).fetchall()
    assert got == want
    by_pair = {(r[0], r[1]): r[4] for r in got}
    assert by_pair[("a", "b")] > 0.99
    assert abs(by_pair[("a", "c")]) < 0.2
    assert {(r[0], r[1]) for r in got} == {("a", "b"), ("a", "c"), ("b", "c")}
    assert all(r[2] == 2 and r[3] == 2 for r in got)


@pytest.mark.parametrize("seed", range(3))
def test_centroid_matrix_parity_fuzz(spark, seed):
    import random

    rng = random.Random(8800 + seed)
    dims = rng.choice([3, 8])
    rows = [
        (
            i,
            rng.choice(["a", "b", "c", "d"]),
            [rng.uniform(-2, 2) for _ in range(dims)],
        )
        for i in range(rng.randint(8, 120))
    ]
    df, con = _mk_vecs(spark, rows)
    got = [tuple(r) for r in anomaly.centroid_matrix(df, "label", "embedding").collect()]
    want = con.execute(
        anomaly.centroid_matrix_sql("emb", "label", "embedding")
    ).fetchall()
    assert got == want


def test_cvm_drift_hand_oracle_and_parity(spark):
    import duckdb
    from pyspark.sql import functions as F

    from bullet_storm_spark.operators.anomaly import cvm_drift, cvm_drift_sql

    # slice A: [1,2,2,3]; slice B: [2,3,3,4] — hand ECDF evaluation
    rows = [(0, v) for v in (1.0, 2.0, 2.0, 3.0)] + [
        (1, v) for v in (2.0, 3.0, 3.0, 4.0)
    ]
    df = spark.createDataFrame(rows, "g int, value double")
    out = cvm_drift(
        df, "value", F.col("g") == 0, F.col("g") == 1
    ).collect()[0]
    n = m = 4
    a = [1.0, 2.0, 2.0, 3.0]
    b = [2.0, 3.0, 3.0, 4.0]
    pooled = sorted(a + b)
    t = sum(
        (sum(1 for x in a if x <= v) / n - sum(1 for x in b if x <= v) / m)
        ** 2
        for v in pooled
    ) * n * m / (n + m) ** 2
    assert (out.n_a, out.n_b) == (4, 4)
    assert out.cvm_t == pytest.approx(t, abs=1e-9)

    con = duckdb.connect()
    con.execute("CREATE TABLE t (g INTEGER, value DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    duck = con.execute(
        cvm_drift_sql("t", "value", "g = 0", "g = 1")
    ).fetchall()
    assert [tuple(r) for r in cvm_drift(
        df, "value", F.col("g") == 0, F.col("g") == 1
    ).collect()] == duck

    # identical slices -> zero discrepancy
    df2 = spark.createDataFrame(
        [(g, float(v)) for g in (0, 1) for v in (1, 2, 3)], "g int, value double"
    )
    assert cvm_drift(
        df2, "value", F.col("g") == 0, F.col("g") == 1
    ).collect()[0].cvm_t == 0.0
