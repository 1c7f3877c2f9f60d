"""Tests for the r8 fourth batch: WAV loudness triage, ICC/design
effect, partial correlation, LSH cosine histogram, JSON key drift."""

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.operators.correlate import (
    partial_correlation,
    partial_correlation_sql,
)
from bullet_storm_spark.operators.experiment import (
    icc_design_effect,
    icc_design_effect_sql,
)
from bullet_storm_spark.operators.multimodal import (
    _wav_samples,
    decode_wav_loudness,
    synthesize_wav,
    wav_loudness_sql,
)
from bullet_storm_spark.operators.profile import (
    json_key_drift,
    json_key_drift_sql,
)
from bullet_storm_spark.operators.similarity import (
    cosine_histogram,
    cosine_histogram_sql,
)


# --- WAV loudness -------------------------------------------------------------

def test_wav_loudness_hand_oracle(spark):
    df = spark.createDataFrame([(7, "x")], "doc_id long, text string")
    row = decode_wav_loudness(synthesize_wav(df, "doc_id")).collect()[0]
    s = _wav_samples(7).astype("int64")
    n = len(s)
    assert row.n_samples == n
    assert row.rms == round(math.sqrt(float((s * s).sum()) / n), 9)
    assert row.dc_offset == round(float(s.sum()) / n, 9)
    # synthetic waveform peaks at 1001 < 32000: no clipping by design
    assert row.clip_rate == 0.0 and row.decode_ok


def test_wav_loudness_clip_threshold(spark):
    # lower the threshold below the waveform peak -> clipping appears
    df = spark.createDataFrame([(7, "x")], "doc_id long, text string")
    row = decode_wav_loudness(
        synthesize_wav(df, "doc_id"), clip_threshold=900
    ).collect()[0]
    s = abs(_wav_samples(7).astype("int64"))
    assert row.clip_rate == round(float((s >= 900).sum()) / len(s), 9)
    assert row.clip_rate > 0


def test_wav_loudness_duck_parity(spark):
    df = spark.createDataFrame(
        [(i, "x") for i in range(40)], "doc_id long, text string"
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?,?)", [(i, "x") for i in range(40)]
    )
    sp = [tuple(r) for r in decode_wav_loudness(
        synthesize_wav(df, "doc_id")
    ).collect()]
    duck = con.execute(wav_loudness_sql("documents", "doc_id")).fetchall()
    assert sp == duck


def test_wav_loudness_bad_payload_flagged(spark):
    bad = spark.createDataFrame(
        [(1, bytearray(b"not a wav"))], "id long, payload binary"
    )
    row = decode_wav_loudness(bad).collect()[0]
    assert not row.decode_ok and row.rms is None and row.n_samples == 0


# --- ICC / design effect --------------------------------------------------------

def test_icc_hand_oracle(spark):
    # 3 clusters with distinct means -> strong ICC
    rows = []
    for g, mu in ((0, 10.0), (1, 20.0), (2, 30.0)):
        rows += [(g, mu + d) for d in (-1.0, 0.0, 1.0)]
    df = spark.createDataFrame(rows, "g int, v double")
    out = icc_design_effect(df, "g", "v").collect()[0]
    n, k = 9, 3
    grand = sum(v for _, v in rows) / n
    ssb = sum(
        3 * (sum(v for g2, v in rows if g2 == g) / 3 - grand) ** 2
        for g in (0, 1, 2)
    )
    ssw = sum(
        (v - sum(v2 for g2, v2 in rows if g2 == g) / 3) ** 2
        for g, v in rows
    )
    msb, msw = ssb / (k - 1), ssw / (n - k)
    n0 = (n - (3 * 9) / n) / (k - 1)
    icc = (msb - msw) / (msb + (n0 - 1) * msw)
    assert (out.n, out.k) == (n, k)
    assert out.msb == pytest.approx(msb, abs=1e-6)
    assert out.msw == pytest.approx(msw, abs=1e-6)
    assert out.icc == pytest.approx(icc, abs=1e-6)
    assert out.deff == pytest.approx(1 + (n / k - 1) * icc, abs=1e-6)


def test_icc_no_cluster_structure_floors_at_zero(spark):
    # identical clusters -> MSB < MSW possible; ICC floored at 0
    rows = [(g, float(v)) for g in range(4) for v in (1, 9)]
    df = spark.createDataFrame(rows, "g int, v double")
    out = icc_design_effect(df, "g", "v").collect()[0]
    assert out.icc == 0.0 and out.deff == 1.0


def test_icc_duck_parity(spark):
    random.seed(8)
    rows = [(i % 13, round(random.uniform(0, 50), 3)) for i in range(300)]
    df = spark.createDataFrame(rows, "g int, v double")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g INTEGER, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    sp = [tuple(r) for r in icc_design_effect(df, "g", "v").collect()]
    duck = con.execute(icc_design_effect_sql("t", "g", "v")).fetchall()
    assert sp == duck


# --- partial correlation --------------------------------------------------------

def test_partial_correlation_hand_oracle(spark):
    # x and y both driven by z plus independent noise: r_xy inflated,
    # r_xy.z should collapse toward the true (zero) direct effect
    random.seed(2)
    rows = []
    for _ in range(500):
        z = random.uniform(0, 10)
        rows.append(
            (round(z + random.gauss(0, 1), 4),
             round(z + random.gauss(0, 1), 4),
             round(z, 4))
        )
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = partial_correlation(df, "x", "y", "z").collect()[0]

    def corr(a, b):
        n = len(a)
        sa, sb = sum(a), sum(b)
        return (n * sum(x * y for x, y in zip(a, b)) - sa * sb) / math.sqrt(
            (n * sum(x * x for x in a) - sa * sa)
            * (n * sum(x * x for x in b) - sb * sb)
        )

    xs = [r[0] for r in rows]
    ys = [r[1] for r in rows]
    zs = [r[2] for r in rows]
    rxy, rxz, ryz = corr(xs, ys), corr(xs, zs), corr(ys, zs)
    expected = (rxy - rxz * ryz) / math.sqrt(
        (1 - rxz**2) * (1 - ryz**2)
    )
    assert out.r_xy == pytest.approx(rxy, abs=1e-6)
    assert out.r_xy_z == pytest.approx(expected, abs=1e-6)
    # the confound is removed: partial far below the marginal
    assert abs(out.r_xy_z) < abs(out.r_xy) / 2


def test_partial_correlation_degenerate_null(spark):
    # x IS z -> r_xz = 1 -> denominator 0 -> NULL partial
    rows = [(float(i), float(i % 7), float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = partial_correlation(df, "x", "y", "z").collect()[0]
    assert out.r_xz == 1.0 and out.r_xy_z is None


def test_partial_correlation_duck_parity(spark):
    random.seed(6)
    rows = [
        (round(random.uniform(0, 10), 3), round(random.uniform(0, 10), 3),
         round(random.uniform(0, 10), 3))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE, y DOUBLE, z DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    sp = [tuple(r) for r in partial_correlation(df, "x", "y", "z").collect()]
    duck = con.execute(partial_correlation_sql("t", "x", "y", "z")).fetchall()
    assert sp == duck


# --- cosine histogram -------------------------------------------------------------

def test_cosine_histogram_properties_and_parity(spark):
    random.seed(3)
    rows = [
        (i, [round(random.gauss(0.2, 1), 4) for _ in range(8)], 0)
        for i in range(150)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = cosine_histogram(df, "vec_id", "embedding", nbits=3, dim=8).collect()
    assert out  # buckets produce candidate pairs
    # shares sum to 1, bins are valid lower edges in [-1, 0.9]
    assert sum(r.share for r in out) == pytest.approx(1.0, abs=1e-6)
    assert all(-1.0 <= r.bin_lo <= 0.9 for r in out)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[], label INTEGER)"
    )
    con.executemany("INSERT INTO embeddings VALUES (?,?,?)", rows)
    duck = con.execute(cosine_histogram_sql(
        "embeddings", "vec_id", "embedding", nbits=3, dim=8
    )).fetchall()
    assert [tuple(r) for r in out] == duck


def test_cosine_histogram_per_bucket_cap(spark):
    # the 100 TB path (r10): hash-elected <= cap rows per bucket bound
    # the pair stage at buckets x C(cap,2) pairs regardless of corpus
    # size; the election is a pure (id, salt) function so any run /
    # partitioning / engine elects the same rows (bit-identical output,
    # pinned against the DuckDB twin), and shares still sum to 1
    random.seed(7)
    rows = [
        (i, [round(random.gauss(0.0, 1), 4) for _ in range(8)], 0)
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    cap = 12
    out = cosine_histogram(
        df, "vec_id", "embedding", nbits=3, dim=8, per_bucket_cap=cap
    ).collect()
    total = sum(r.n_pairs for r in out)
    assert 0 < total <= 8 * cap * (cap - 1) // 2  # 2^3 buckets x C(cap,2)
    full = sum(
        r.n_pairs
        for r in cosine_histogram(df, "vec_id", "embedding", nbits=3, dim=8).collect()
    )
    assert total < full  # the cap actually sampled
    assert sum(r.share for r in out) == pytest.approx(1.0, abs=1e-6)
    # repartitioned input elects the same rows -> identical histogram
    out2 = cosine_histogram(
        df.repartition(13), "vec_id", "embedding", nbits=3, dim=8,
        per_bucket_cap=cap,
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[], label INTEGER)"
    )
    con.executemany("INSERT INTO embeddings VALUES (?,?,?)", rows)
    duck = con.execute(cosine_histogram_sql(
        "embeddings", "vec_id", "embedding", nbits=3, dim=8, per_bucket_cap=cap
    )).fetchall()
    assert [tuple(r) for r in out] == duck


def test_cosine_histogram_identical_vectors_top_bin(spark):
    # identical vectors -> cos 1.0 -> clamped into the top bin (0.9)
    rows = [(i, [1.0, 2.0, 3.0, 4.0], 0) for i in range(5)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = cosine_histogram(df, "vec_id", "embedding", nbits=2, dim=4).collect()
    assert len(out) == 1 and out[0].bin_lo == 0.9
    assert out[0].n_pairs == 10 and out[0].share == 1.0


# --- JSON key drift ----------------------------------------------------------------

def test_json_key_drift_hand_oracle(spark):
    import json as J

    rows = []
    for i in range(200):
        d = {"a": 1}
        if i >= 100:
            d["b"] = 2          # key appears only in slice B
        if i < 100 and i % 2 == 0:
            d["c"] = 3          # key shrinks to nothing in B
        rows.append((i, J.dumps(d)))
    df = spark.createDataFrame(rows, "event_id long, props string")
    out = {r.key: r for r in json_key_drift(
        df, "props", F.col("event_id") >= 100
    ).collect()}
    assert out["a"].share_a == 1.0 and out["a"].share_b == 1.0
    assert out["a"].delta == 0.0
    assert out["b"].n_a == 0 and out["b"].share_b == 1.0 and out["b"].delta == 1.0
    assert out["c"].share_a == 0.5 and out["c"].n_b == 0 and out["c"].delta == -0.5

    con = duckdb.connect()
    con.execute("CREATE TABLE t (event_id BIGINT, props VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    duck = con.execute(json_key_drift_sql(
        "t", "props", "event_id >= 100"
    )).fetchall()
    assert [tuple(r) for r in json_key_drift(
        df, "props", F.col("event_id") >= 100
    ).collect()] == duck


def test_json_key_drift_null_json_in_denominator(spark):
    rows = [(0, '{"a": 1}'), (1, None), (2, '{"a": 1}'), (3, None)]
    df = spark.createDataFrame(rows, "event_id long, props string")
    out = json_key_drift(df, "props", F.col("event_id") >= 2).collect()
    # slice sizes are 2 and 2 (NULL JSON counted); 'a' present once each
    assert out[0].share_a == 0.5 and out[0].share_b == 0.5
