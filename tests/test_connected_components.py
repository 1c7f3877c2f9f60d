"""Connected components over dedup pair graphs: min-label propagation +
pointer jumping must produce component-min labels — transitively, not just
pairwise — and converge in O(log n) rounds on chains."""

import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.operators import dedup


def _cc(spark, edges, **kw):
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = dedup.connected_components(pairs, **kw).collect()
    return {r["node"]: r["cluster"] for r in rows}


def test_transitive_chain_collapses_to_min(spark):
    # A~B, B~C, C~D but no direct A~C/A~D: pairwise loser-removal cannot
    # see this; the closure must label everything with the chain min
    got = _cc(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_multiple_components_and_edge_order_independence(spark):
    edges = [(10, 7), (7, 12), (3, 5), (20, 21), (21, 20)]
    got = _cc(spark, edges)
    assert got == {7: 7, 10: 7, 12: 7, 3: 3, 5: 3, 20: 20, 21: 20}


def test_long_chain_converges_within_logarithmic_rounds(spark):
    # a 64-node path has diameter 63; plain propagation would need 63
    # rounds — pointer jumping must get there in far fewer
    edges = [(i, i + 1) for i in range(63)]
    got = _cc(spark, edges, max_iterations=12)
    assert set(got.values()) == {0}
    assert len(got) == 64


def test_empty_pair_graph(spark):
    got = _cc(spark, [])
    assert got == {}


def test_dedup_clusters_covers_all_rows_and_marks_canonicals(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),   # dup of 0
        (2, "the quick brown fox jumps over the lazy dog !"), # near-dup
        (3, "an entirely different document about spark"),
        (4, "yet another unrelated piece of text entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.dedup_clusters(df, "doc_id", "text", threshold=0.8).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 5  # every input row labeled, singletons included
    assert by_id[0]["cluster_id"] == 0 and by_id[1]["cluster_id"] == 0
    assert by_id[3]["cluster_id"] == 3 and by_id[3]["cluster_size"] == 1
    assert by_id[0]["is_canonical"] and not by_id[1]["is_canonical"]
    sizes = {r["cluster_id"]: r["cluster_size"] for r in out}
    assert sizes[0] >= 2
    # exactly one canonical per cluster
    canon = [r for r in out if r["is_canonical"]]
    assert len(canon) == len({r["cluster_id"] for r in out})


def test_nonconvergence_raises(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    with pytest.raises(RuntimeError):
        dedup.connected_components(pairs, max_iterations=0)


def test_deduplicate_transitive_keeps_one_per_cluster(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog !"),
        (3, "an entirely different document about spark"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(
        r["doc_id"]
        for r in dedup.deduplicate_transitive(
            df, "doc_id", "text", threshold=0.8
        ).collect()
    )
    # one canonical from the {0,1,2} cluster (the min id), plus the singleton
    assert kept == [0, 3]
