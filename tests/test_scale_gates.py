"""The r11 scale gates: unrolled fixed-dim vector forms and hub
checkpoints engage only past a size threshold (optimizer plan stats,
env-tunable), and BOTH branches of every gated operator produce
identical results.

Rationale (OPTIMIZATION_r11.md batch 10): the unrolled chains trade
per-row interpreted cost for a large expression tree whose per-task
deserialization and per-action planning dominate small inputs (measured
2-3x bench regressions at sf0.1); hub localCheckpoints trade N lineage
re-runs for an extra job + barrier that likewise loses below the
threshold. The gates pick per frame; results cannot depend on the
branch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.functions import vectors as V
from bullet_storm_spark.operators.common import hub_checkpoint


@pytest.fixture()
def vec_df(spark):
    import random

    rng = random.Random(7)
    dim = 8
    rows = [
        (i, [round(rng.uniform(-1, 1), 3) for _ in range(dim)])
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "id long, v array<double>"), dim


def _force(monkeypatch, name, value):
    monkeypatch.setenv(name, str(value))


def test_prefer_fixed_gates_on_size(spark, monkeypatch, vec_df):
    # parquet-backed frame: footer stats say it is tiny -> HOF branch
    pq = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    monkeypatch.delenv("SPARK_GRAFT_UNROLL_MIN_BYTES", raising=False)
    assert V.prefer_fixed(pq) is False
    # threshold 0 -> unrolled branch
    _force(monkeypatch, "SPARK_GRAFT_UNROLL_MIN_BYTES", 0)
    assert V.prefer_fixed(pq) is True
    # in-memory frame: stats unavailable (Long.MaxValue) -> assume big,
    # the production posture
    df, _ = vec_df
    monkeypatch.delenv("SPARK_GRAFT_UNROLL_MIN_BYTES", raising=False)
    assert V.prefer_fixed(df) is True


def test_hub_checkpoint_gates_on_source_size(spark, monkeypatch):
    pq = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    hub = pq.groupBy("vec_id").count()
    monkeypatch.delenv("SPARK_GRAFT_HUB_MIN_BYTES", raising=False)
    out = hub_checkpoint(hub, pq)
    assert out is hub  # tiny parquet source: no checkpoint
    _force(monkeypatch, "SPARK_GRAFT_HUB_MIN_BYTES", 0)
    out = hub_checkpoint(hub, pq)
    assert out is not hub  # checkpointed frame
    n = pq.count()
    assert sum(r["count"] for r in out.collect()) == n


def _collect_both(monkeypatch, build):
    """Collect the same operator output under both gate branches."""
    rows = {}
    for label, thresh in (("hof", 1 << 62), ("fixed", 0)):
        _force(monkeypatch, "SPARK_GRAFT_UNROLL_MIN_BYTES", thresh)
        _force(monkeypatch, "SPARK_GRAFT_HUB_MIN_BYTES", thresh)
        rows[label] = sorted(map(repr, (tuple(r) for r in build().collect())))
    return rows


def test_lsh_bucketed_neighbors_branches_identical(
    spark, monkeypatch, vec_df
):
    from bullet_storm_spark.operators.similarity import (
        lsh_bucketed_neighbors,
    )

    df, dim = vec_df
    rows = _collect_both(
        monkeypatch,
        lambda: lsh_bucketed_neighbors(
            df, "id", "v", F.col("id") < 5, k=3, nbits=3, dim=dim
        ),
    )
    assert rows["hof"] == rows["fixed"]
    assert len(rows["hof"]) > 0


def test_cosine_histogram_branches_identical(spark, monkeypatch, vec_df):
    from bullet_storm_spark.operators.similarity import cosine_histogram

    df, dim = vec_df
    for cap in (None, 4):
        rows = _collect_both(
            monkeypatch,
            lambda: cosine_histogram(
                df, "id", "v", nbits=3, dim=dim, per_bucket_cap=cap
            ),
        )
        assert rows["hof"] == rows["fixed"]
        assert len(rows["hof"]) > 0


def test_embedding_neardup_pairs_branches_identical(
    spark, monkeypatch, vec_df
):
    from bullet_storm_spark.operators.dedup import embedding_neardup_pairs_lsh

    df, dim = vec_df
    rows = _collect_both(
        monkeypatch,
        lambda: embedding_neardup_pairs_lsh(
            df, "id", "v", threshold=0.5, nbits=3, ntables=2, dim=dim
        ),
    )
    assert rows["hof"] == rows["fixed"]


def test_bm25_and_series_hub_branches_identical(spark, monkeypatch):
    from bullet_storm_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [
            (i, f"shared tokens alpha beta doc{i % 3} gamma delta " * 3)
            for i in range(30)
        ],
        "doc_id long, text string",
    )
    rows = {}
    for label, thresh in (("off", 1 << 62), ("on", 0)):
        _force(monkeypatch, "SPARK_GRAFT_HUB_MIN_BYTES", thresh)
        out = bm25_topk(docs, "doc_id", "text", [(1, "alpha beta")], k=5)
        rows[label] = sorted(map(repr, (tuple(r) for r in out.collect())))
    assert rows["off"] == rows["on"]
    assert len(rows["off"]) > 0
