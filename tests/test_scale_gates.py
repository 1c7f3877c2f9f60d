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
    # in-memory (LogicalRDD-backed) frame: stats().sizeInBytes() succeeds
    # and returns defaultSizeInBytes = Long.MaxValue -> assume big, the
    # production posture (it does NOT raise)
    df, _ = vec_df
    monkeypatch.delenv("SPARK_GRAFT_UNROLL_MIN_BYTES", raising=False)
    assert V.prefer_fixed(df) is True
    # ... which means a threshold must exceed Long.MaxValue to force the
    # HOF branch on an in-memory frame (the _collect_both contract below)
    _force(monkeypatch, "SPARK_GRAFT_UNROLL_MIN_BYTES", 1 << 64)
    assert V.prefer_fixed(df) is False


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


def _collect_both(monkeypatch, build, df=None):
    """Collect the same operator output under both gate branches.

    The "hof" threshold must exceed Long.MaxValue (2^63-1): in-memory
    createDataFrame frames report defaultSizeInBytes = Long.MaxValue, so
    a 1 << 62 threshold would still take the unrolled branch and the
    comparison would be vacuous (both labels running the same code). The
    gate comparison is Python-side, so unbounded ints work. When ``df``
    is passed, assert the two settings really take different branches."""
    rows = {}
    for label, thresh in (("hof", 1 << 64), ("fixed", 0)):
        _force(monkeypatch, "SPARK_GRAFT_UNROLL_MIN_BYTES", thresh)
        _force(monkeypatch, "SPARK_GRAFT_HUB_MIN_BYTES", thresh)
        if df is not None:
            assert V.prefer_fixed(df) is (label == "fixed")
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
        df=df,
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
            df=df,
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
        df=df,
    )
    assert rows["hof"] == rows["fixed"]


@pytest.fixture()
def ragged_vec_df(spark):
    """Vectors whose lengths straddle the declared dim (the ae25be8 bug
    class: a fixed-form caller promising dim=N over shorter/longer rows
    must still match the HOF branch bit-for-bit)."""
    import random

    rng = random.Random(23)
    dim = 8
    rows = []
    for i in range(48):
        n = dim + rng.choice([-2, -1, 0, 0, 1, 2])
        rows.append((i, [round(rng.uniform(-1, 1), 3) for _ in range(n)]))
    return spark.createDataFrame(rows, "id long, v array<double>"), dim


def test_short_vector_fuzz_lsh_bucketed(spark, monkeypatch, ragged_vec_df):
    from bullet_storm_spark.operators.similarity import (
        lsh_bucketed_neighbors,
    )

    df, dim = ragged_vec_df
    rows = _collect_both(
        monkeypatch,
        lambda: lsh_bucketed_neighbors(
            df, "id", "v", F.col("id") < 6, k=3, nbits=3, dim=dim
        ),
        df=df,
    )
    assert rows["hof"] == rows["fixed"]


def test_short_vector_fuzz_brute_force_and_hard_negatives(
    spark, monkeypatch, ragged_vec_df
):
    from bullet_storm_spark.operators.similarity import (
        brute_force_neighbors,
        hard_negatives,
    )

    df, dim = ragged_vec_df
    rows = _collect_both(
        monkeypatch,
        lambda: brute_force_neighbors(
            df, "id", "v", F.col("id") < 6, k=3, dim=dim
        ),
        df=df,
    )
    assert rows["hof"] == rows["fixed"]
    rows = _collect_both(
        monkeypatch,
        lambda: hard_negatives(
            df, "id", "v", F.col("id") < 4, lo=-0.5, hi=0.8, k=3, dim=dim
        ),
        df=df,
    )
    assert rows["hof"] == rows["fixed"]


def test_short_vector_fuzz_ivf_frozen(spark, monkeypatch, ragged_vec_df):
    from bullet_storm_spark.operators.similarity import ivf_neighbors_frozen

    df, dim = ragged_vec_df
    rows = _collect_both(
        monkeypatch,
        lambda: ivf_neighbors_frozen(
            df, "id", "v", F.col("id") < 6, k=3, nprobe=2, n_centroids=4,
            dim=dim,
        ),
        df=df,
    )
    assert rows["hof"] == rows["fixed"]


def test_short_vector_fuzz_neardup_and_quantized(
    spark, monkeypatch, ragged_vec_df
):
    from bullet_storm_spark.operators.dedup import embedding_neardup_pairs_lsh
    from bullet_storm_spark.operators.quantize import (
        quantized_neardup_pairs_lsh,
    )

    df, dim = ragged_vec_df
    rows = _collect_both(
        monkeypatch,
        lambda: embedding_neardup_pairs_lsh(
            df, "id", "v", threshold=0.3, nbits=3, ntables=2, dim=dim
        ),
        df=df,
    )
    assert rows["hof"] == rows["fixed"]
    # the quantized verify stage is an int64 matmul over UNIFORM-length
    # int8 vectors (np.vstack) — ragged input fails LOUDLY and
    # identically in both gate branches (fail-fast beats a silently
    # truncated verify; the pair_budget posture). Assert the parity.
    import pytest as _pytest

    from pyspark.errors.exceptions.captured import PythonException

    for thresh in (1 << 64, 0):
        _force(monkeypatch, "SPARK_GRAFT_UNROLL_MIN_BYTES", thresh)
        _force(monkeypatch, "SPARK_GRAFT_HUB_MIN_BYTES", thresh)
        with _pytest.raises(PythonException, match="dimensions|match"):
            quantized_neardup_pairs_lsh(
                df, "id", "v", threshold=0.3, nbits=3, ntables=2, dim=dim
            ).collect()
    # and on uniform-length input the branches are value-identical
    uni = df.sparkSession.createDataFrame(
        [(i, [round(0.07 * ((i * 13 + j * 7) % 29 - 14), 3) for j in range(dim)])
         for i in range(40)],
        "id long, v array<double>",
    )
    rows = _collect_both(
        monkeypatch,
        lambda: quantized_neardup_pairs_lsh(
            uni, "id", "v", threshold=0.3, nbits=3, ntables=2, dim=dim
        ),
        df=uni,
    )
    assert rows["hof"] == rows["fixed"]


def test_short_vector_fuzz_semantic_dedup(spark, monkeypatch, ragged_vec_df):
    from bullet_storm_spark.operators.semdedup import semantic_dedup

    df, dim = ragged_vec_df
    # centroids shorter AND longer than the data rows — the exact
    # ae25be8 incident shape (dim is derived from the centroids)
    for clen in (dim - 2, dim, dim + 1):
        cents = [
            [round(0.1 * (j + 1) * (c + 1), 3) for j in range(clen)]
            for c in range(3)
        ]
        rows = _collect_both(
            monkeypatch,
            lambda: semantic_dedup(df, "id", "v", centroids=cents),
            df=df,
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
    # 1 << 64 > Long.MaxValue: an in-memory frame's defaultSizeInBytes
    # stat is Long.MaxValue, so a 1 << 62 "off" threshold would still
    # checkpoint and the branch comparison would be vacuous
    for label, thresh in (("off", 1 << 64), ("on", 0)):
        _force(monkeypatch, "SPARK_GRAFT_HUB_MIN_BYTES", thresh)
        # prove the two settings really take different branches on this
        # in-memory frame (identity: gate-off returns the frame itself)
        probe = docs.limit(1)
        gated = hub_checkpoint(probe, docs)
        assert (gated is probe) == (label == "off")
        out = bm25_topk(docs, "doc_id", "text", [(1, "alpha beta")], k=5)
        rows[label] = sorted(map(repr, (tuple(r) for r in out.collect())))
    assert rows["off"] == rows["on"]
    assert len(rows["off"]) > 0


def test_arrow_spread_threshold_is_separate_and_higher(monkeypatch):
    # r12: the Arrow/BLAS matmul paths spread far later than the SQL
    # pair-compute paths (numpy does ~100x the work per second, so the
    # spreading exchange overtakes its parallelism gain only on much
    # larger inputs — measured at the sf10 weak-scaling point). Pin the
    # split: a separate env knob, defaulting well above the SQL spread.
    import importlib

    import bullet_storm_spark.operators.similarity as sim

    assert sim._ARROW_SPREAD_MIN_BYTES > sim._SPREAD_MIN_BYTES
    monkeypatch.setenv("SPARK_GRAFT_ARROW_SPREAD_MIN_BYTES", "123")
    importlib.reload(sim)
    try:
        assert sim._ARROW_SPREAD_MIN_BYTES == 123
    finally:
        monkeypatch.delenv("SPARK_GRAFT_ARROW_SPREAD_MIN_BYTES")
        importlib.reload(sim)
