"""Tests for the r8 third batch: permutation test, empirical-Bayes
shrinkage, Church-Gale term burstiness, cluster-label NMI — pure-Python
hand oracles plus DuckDB twin parity."""

import hashlib
import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.operators.experiment import (
    eb_shrunk_rates,
    eb_shrunk_rates_sql,
    permutation_test,
    permutation_test_sql,
)
from bullet_storm_spark.operators.similarity import (
    cluster_label_nmi,
    cluster_label_nmi_sql,
    seeded_centroids,
)
from bullet_storm_spark.operators.vocab import (
    term_burstiness,
    term_burstiness_sql,
)


@pytest.fixture(scope="module")
def ev(spark):
    random.seed(5)
    rows = [
        (eid, eid % 37, round(random.uniform(0, 100), 3))
        for eid in range(600)
    ]
    return spark.createDataFrame(rows, "event_id long, user_id long, value double")


@pytest.fixture(scope="module")
def ev_duck(ev):
    con = duckdb.connect()
    con.execute("CREATE TABLE ev (event_id BIGINT, user_id BIGINT, value DOUBLE)")
    con.executemany("INSERT INTO ev VALUES (?,?,?)", ev.collect())
    return con


# --- permutation test --------------------------------------------------------

def test_permutation_hand_oracle(ev):
    out = permutation_test(
        ev, "user_id", F.col("user_id") % 2 == 0, "value",
        n_perm=50, salt="perm",
    ).collect()[0]
    rows = [(r.user_id, round(r.value, 6)) for r in ev.collect()]
    # python replica: per-user sums, md5-derived assignments
    users = {}
    for uid, v in rows:
        s, c = users.get(uid, (0.0, 0))
        users[uid] = (s + v, c + 1)

    def mean_diff(assign):
        st = sum(s for u, (s, c) in users.items() if assign(u))
        nt = sum(c for u, (s, c) in users.items() if assign(u))
        sc = sum(s for u, (s, c) in users.items() if not assign(u))
        nc = sum(c for u, (s, c) in users.items() if not assign(u))
        if nt == 0 or nc == 0:
            return None
        return st / nt - sc / nc

    d_obs = mean_diff(lambda u: u % 2 == 0)
    n_ge = 0
    for k in range(1, 51):
        def a(u, k=k):
            h = hashlib.md5(f"{u}:perm:{k}".encode()).hexdigest()
            return int(h[:8], 16) / float(1 << 32) < 0.5
        dk = mean_diff(a)
        if dk is not None and abs(dk) >= abs(d_obs):
            n_ge += 1
    assert out.n_units == 37 and out.n_perm == 50
    assert out.d_obs == pytest.approx(d_obs, abs=1e-6)
    assert out.n_ge == n_ge
    assert (out.p_num, out.p_den) == (1 + n_ge, 51)
    assert out.p == round((1 + n_ge) / 51, 9)


def test_permutation_duck_parity(ev, ev_duck):
    sp = [tuple(r) for r in permutation_test(
        ev, "user_id", F.col("user_id") % 2 == 0, "value", n_perm=40
    ).collect()]
    duck = ev_duck.execute(permutation_test_sql(
        "ev", "user_id", "user_id % 2 = 0", "value", n_perm=40
    )).fetchall()
    assert sp == duck


def test_permutation_null_is_uniformish(ev):
    # treatment independent of value -> p should not be extreme
    out = permutation_test(
        ev, "user_id", F.col("user_id") % 2 == 0, "value", n_perm=100
    ).collect()[0]
    assert out.p > 0.01


# --- empirical-Bayes shrinkage -----------------------------------------------

def test_eb_hand_oracle(spark):
    # three cohorts with known rates; check the moment fit end-to-end
    rows = []
    for item, (s, n) in enumerate(((3, 10), (5, 10), (9, 10))):
        rows += [(item, 1)] * s + [(item, 0)] * (n - s)
    df = spark.createDataFrame(rows, "item int, y int")
    out = {r.item: r for r in eb_shrunk_rates(
        df, F.col("item"), F.col("y") == 1
    ).collect()}
    ps = [0.3, 0.5, 0.9]
    m = sum(ps) / 3
    v = sum((p - m) ** 2 for p in ps) / 2
    ab = m * (1 - m) / v - 1
    alpha = m * ab
    for item, (s, n) in enumerate(((3, 10), (5, 10), (9, 10))):
        r = out[item]
        assert (r.n_trials, r.n_success) == (n, s)
        assert r.alpha == pytest.approx(alpha, abs=1e-6)
        assert r.shrunk_rate == pytest.approx((s + alpha) / (n + ab), abs=1e-6)
        # shrinkage pulls toward the prior mean, never past it
        lo, hi = sorted((s / n, m))
        assert lo - 1e-9 <= r.shrunk_rate <= hi + 1e-9


def test_eb_degenerate_identical_rates(spark):
    # zero between-item variance -> prior fit degenerates -> NULL shrunk
    rows = [(0, 1), (0, 0), (1, 1), (1, 0)]
    df = spark.createDataFrame(rows, "item int, y int")
    for r in eb_shrunk_rates(df, F.col("item"), F.col("y") == 1).collect():
        assert r.alpha is None and r.shrunk_rate is None
        assert r.rate == 0.5


def test_eb_duck_parity(ev, ev_duck):
    sp = [tuple(r) for r in eb_shrunk_rates(
        ev, F.pmod(F.col("user_id"), F.lit(10)), F.col("value") >= 50.0
    ).collect()]
    duck = ev_duck.execute(eb_shrunk_rates_sql(
        "ev", "user_id % 10", "value >= 50.0"
    )).fetchall()
    assert sp == duck


# --- term burstiness ----------------------------------------------------------

def test_burstiness_hand_oracle(spark):
    # 'spark' appears 4x in one doc (bursty); 'the' once per doc (flat)
    rows = [
        (0, "spark spark spark spark the"),
        (1, "the words here"),
        (2, "the other words"),
        (3, "the more words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.token: r for r in term_burstiness(
        df, "doc_id", "text", min_df=1, top_k=10
    ).collect()}
    n = 4
    # spark: counts [4,0,0,0] -> mean 1, var = (16/4 - 1) = 3 -> fano 3
    s = out["spark"]
    assert (s.doc_freq, s.term_freq) == (1, 4)
    assert s.in_doc_mean == 4.0
    assert s.fano == round((n * 16 - 16) / (n * 4), 9) == 3.0
    # the: counts [1,1,1,1] -> var 0 -> fano 0
    t = out["the"]
    assert (t.doc_freq, t.term_freq) == (4, 4) and t.fano == 0.0
    # burstiness ranks content over function words
    assert s.fano > t.fano


def test_burstiness_duck_parity(spark):
    random.seed(9)
    rows = [
        (i, " ".join(random.choices(
            ["alpha", "beta", "gamma", "delta", "the", "of"], k=30
        )))
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?,?)", rows)
    sp = [tuple(r) for r in term_burstiness(
        df, "doc_id", "text", min_df=5, top_k=10
    ).collect()]
    duck = con.execute(term_burstiness_sql(
        "documents", "doc_id", "text", min_df=5, top_k=10
    )).fetchall()
    assert sp == duck


# --- cluster-label NMI ---------------------------------------------------------

@pytest.fixture(scope="module")
def emb(spark):
    random.seed(3)
    rows = [
        (i, [round(random.gauss(0.1 * (i % 3), 1), 4) for _ in range(8)], i % 3)
        for i in range(80)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_nmi_hand_oracle(emb):
    import numpy as np

    row = cluster_label_nmi(emb, "embedding", "label", n_centroids=4, dim=8).collect()[0]
    cents = np.array(seeded_centroids(8, 4))
    data = [(np.array(r.embedding, dtype=np.float64), r.label) for r in emb.collect()]
    # same argmax-dot assignment (ties impossible on random data)
    from collections import Counter
    joint = Counter()
    for v, l in data:
        c = int(np.argmax(cents @ v))
        joint[(c, l)] += 1
    n = sum(joint.values())

    def ent(counts):
        # replicate the 9dp-rounded per-cell terms
        return sum(round(-(c / n) * math.log(c / n), 9) for c in counts)

    hc = ent(Counter(c for (c, l), k in joint.items() for _ in range(k)).values())
    hl = ent(Counter(l for (c, l), k in joint.items() for _ in range(k)).values())
    hj = ent(joint.values())
    mi = hc + hl - hj
    assert row.n == n == 80
    assert row.h_cluster == pytest.approx(hc, abs=1e-6)
    assert row.h_label == pytest.approx(hl, abs=1e-6)
    assert row.mi == pytest.approx(mi, abs=1e-6)
    assert row.nmi == pytest.approx(2 * mi / (hc + hl), abs=1e-6)
    assert 0.0 - 1e-9 <= row.nmi <= 1.0 + 1e-9


def test_nmi_single_label_is_null(spark):
    random.seed(4)
    rows = [(i, [round(random.gauss(0, 1), 4) for _ in range(8)], 7) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    row = cluster_label_nmi(df, "embedding", "label", n_centroids=4, dim=8).collect()[0]
    assert row.n_labels == 1 and row.h_label == 0.0 and row.nmi is None


def test_nmi_duck_parity(emb):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[], label INTEGER)"
    )
    con.executemany(
        "INSERT INTO embeddings VALUES (?,?,?)",
        [(r.vec_id, r.embedding, r.label) for r in emb.collect()],
    )
    sp = [tuple(r) for r in cluster_label_nmi(
        emb, "embedding", "label", n_centroids=4, dim=8
    ).collect()]
    duck = con.execute(cluster_label_nmi_sql(
        "embeddings", "embedding", "label", n_centroids=4, dim=8
    )).fetchall()
    assert sp == duck
