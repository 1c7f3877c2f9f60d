"""Winnowing fingerprints: guarantee + determinism + oracle parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_fingerprints_sql,
    winnow_neardup_pairs,
    winnow_neardup_pairs_sql,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_winnow_guarantee_shared_substring(spark):
    # two docs sharing a >= w+k-1 char substring must share a fingerprint
    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, "PREFIX one " + shared + " SUFFIX alpha"),
        (2, "totally different opening text " + shared + " closing words"),
        (3, "no overlap here at all just unrelated content entirely"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    fps = winnow_fingerprints(df, "id", "text", k=8, w=16).collect()
    by_id = {}
    for r in fps:
        by_id.setdefault(r.id, set()).add(r.fp)
    assert by_id[1] & by_id[2], "shared substring must share a fingerprint"


def test_winnow_density_bound(spark):
    # selected fingerprints are a small fraction of all grams
    df = _docs(spark).limit(50)
    n_fp = winnow_fingerprints(df, "doc_id", "text", k=8, w=16).count()
    total_chars = df.agg(F.sum(F.length("text"))).collect()[0][0]
    # winnowing expectation is ~2/(w+1) of gram count; allow 2x slack
    assert n_fp < total_chars * 2 * 2 / 17


def test_winnow_fingerprints_oracle(spark):
    got = winnow_fingerprints(
        _docs(spark), "doc_id", "text", k=8, w=16
    ).collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = con.execute(
        winnow_fingerprints_sql("documents", "doc_id", "text", k=8, w=16)
    ).fetchall()
    assert [(r.id, r.fp) for r in got] == [(a, b) for a, b in want]


def test_winnow_pairs_oracle(spark):
    got = winnow_neardup_pairs(
        _docs(spark), "doc_id", "text", k=8, w=16, min_shared=2
    ).collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = con.execute(
        winnow_neardup_pairs_sql("documents", "doc_id", "text", k=8, w=16, min_shared=2)
    ).fetchall()
    assert [(r.id_a, r.id_b, r.shared) for r in got] == [tuple(w) for w in want]


def test_winnow_short_doc_no_rows(spark):
    df = spark.createDataFrame([(1, "tiny")], "id long, text string")
    assert winnow_fingerprints(df, "id", "text", k=8, w=16).count() == 0


def test_winnow_guarantee_planted_overlaps_batch(spark):
    """Property-style batch check: 40 random doc pairs with a planted
    shared substring of exactly w+k-1 chars must each share >= 1
    fingerprint (the winnowing guarantee, Schleimer'03 Thm 1)."""
    import random

    rng = random.Random(42)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    k, w = 8, 16
    rows = []
    for i in range(40):
        shared = "".join(rng.choice(alpha) for _ in range(w + k - 1))
        pre_a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 80)))
        suf_a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 80)))
        pre_b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 80)))
        suf_b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 80)))
        rows.append((2 * i, pre_a + shared + suf_a))
        rows.append((2 * i + 1, pre_b + shared + suf_b))
    df = spark.createDataFrame(rows, "id long, text string")
    fps = winnow_fingerprints(df, "id", "text", k=k, w=w).collect()
    by_id = {}
    for r in fps:
        by_id.setdefault(r.id, set()).add(r.fp)
    misses = [
        i for i in range(40)
        if not (by_id.get(2 * i, set()) & by_id.get(2 * i + 1, set()))
    ]
    assert not misses, f"guarantee violated for planted pairs: {misses}"


def test_max_chars_bounds_state_and_keeps_parity(spark):
    import random

    rng = random.Random(7)
    # non-repetitive tail so the uncapped run has strictly more distinct fps
    long_doc = "x" * 50 + "".join(
        rng.choice("abcdefghij ") for _ in range(800)
    )
    df = spark.createDataFrame([(1, long_doc)], "id long, text string")
    capped = winnow_fingerprints(df, "id", "text", k=8, w=16, max_chars=100)
    full = winnow_fingerprints(df, "id", "text", k=8, w=16)
    n_capped, n_full = capped.count(), full.count()
    assert 0 < n_capped < n_full  # prefix-only fingerprints, state bounded
    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT 1::BIGINT AS id, ? AS text", [long_doc])
    want = con.execute(
        winnow_fingerprints_sql("d", "id", "text", k=8, w=16, max_chars=100)
    ).fetchall()
    assert [(r.id, r.fp) for r in capped.collect()] == [tuple(w) for w in want]


def test_winnow_recall_audit_oracle(spark):
    from bullet_storm_spark.operators.winnow import (
        winnow_recall_audit,
        winnow_recall_audit_sql,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").where(
        F.col("doc_id") < 80
    )
    got = winnow_recall_audit(docs, "doc_id", "text", min_shared=2).collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = con.execute(
        winnow_recall_audit_sql(
            "(SELECT * FROM documents WHERE doc_id < 80)", "doc_id", "text",
            min_shared=2,
        )
    ).fetchall()
    assert [tuple(r) for r in got] == [tuple(w) for w in want]
    row = got[0]
    assert row.exact_pairs == row.winnow_found + row.missed
    assert 0.0 <= row.recall <= 1.0


def test_winnow_containment_finds_excerpt(spark):
    from bullet_storm_spark.operators.winnow import winnow_containment_pairs

    body = ("the quick brown fox jumps over the lazy dog again and again "
            "while the cat watches from the warm windowsill nearby ") * 4
    rows = [
        (1, body),
        (2, body[:90]),  # whole-prefix excerpt: contained, not similar
        (3, "completely different content with other words entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.id_a, r.id_b, r.containment)
        for r in winnow_containment_pairs(
            df, "doc_id", "text", k=8, w=16, min_shared=2, threshold=0.8
        ).collect()
    ]
    assert len(got) == 1 and got[0][:2] == (1, 2) and got[0][2] >= 0.8
