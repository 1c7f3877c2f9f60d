"""Physical-plan assertions: the properties SCALING.md promises must be
visible in explain() — pushdown into scans, partial/final aggregation,
broadcast dimension joins, top-n instead of global sorts."""

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plans(spark):
    queries = entry_mod.queries()

    def plan_of(name):
        df = queries[name](spark, SF)
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    return plan_of


def test_filter_pushdown_reaches_parquet_scan(plans):
    p = plans("raw_filter_project")
    assert "PushedFilters: [IsNotNull(event_type), IsNotNull(value)" in p
    assert "EqualTo(event_type,purchase)" in p
    assert "GreaterThan(value,100.0)" in p


def test_column_pruning(plans):
    # projection only needs 3 columns -> ReadSchema must not include props
    p = plans("raw_filter_project")
    read_schema = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "props" not in read_schema and "event_id" in read_schema


def test_two_phase_aggregation(plans):
    p = plans("group_by_event_type")
    assert p.count("HashAggregate") >= 2  # partial + final
    assert "hashpartitioning(event_type" in p  # shuffle keyed on the group key


def test_dimension_joins_broadcast(plans):
    p = plans("join_revenue_by_nation")
    assert "BroadcastHashJoin" in p


def test_top_n_never_global_sort(plans):
    for name in ("top_k_event_user", "join_top_orders_by_revenue"):
        p = plans(name)
        assert "TakeOrderedAndProject" in p
        # a global Sort node (outside TakeOrdered) would be a red flag
        assert "Sort [" not in p.split("TakeOrderedAndProject")[0]


def test_timestamp_filter_pushdown(plans):
    p = plans("lineitem_pricing_summary")
    assert "LessThan(l_shipdate" in p


# all-pairs by declared contract: block VERIFIERS whose input the caller
# bounds (docstrings route scale users to the LSH variants), plus the
# brute-force ANN baseline whose nested loop is over a broadcast,
# contract-bounded query set (O(|Q|*N), |Q| small) — not N x N
_ALL_PAIRS_VERIFIERS = {
    "dedup_ngram_jaccard_pairs",
    "dedup_containment_pairs",  # same bounded-block verifier contract as
    #                             the jaccard verifier (winnow supplies
    #                             candidates at scale)
    "dedup_embedding_pairs_exact_block",
    "ann_brute_force_topk",
    "ann_quantized_topk",  # same broadcast-|Q| contract as brute force
    "ann_pq_topk",  # same broadcast-|Q| contract; the candidate side scans
    #                 m-byte CODES, not vectors — the loop is O(|Q|*N) cheap
    #                 lookups, and the byte cut is the operator's point
    "dedup_lsh_recall",  # recall audit embeds the exact all-pairs ground
    #                      truth by definition; caller bounds the block
    "ann_recall_report",  # same: ground truth IS the brute-force verifier
    "ann_pca_rerank_topk",  # coarse stage is a DECLARED brute-force scan
    #                         over the 16-dim projections — same broadcast
    #                         contract-bounded |Q| as brute force, at 1/4
    #                         the bytes per pair; the rerank touches only
    #                         k*expand rows per query
    "ann_rrf_fusion",  # fuses the brute-force ranker (the declared
    #                    broadcast-|Q| verifier above) with the LSH one;
    #                    the fusion itself joins rank LISTS only
    "ann_hybrid_bm25_rrf",  # dense side is the same broadcast-|Q|
    #                         brute-force contract; the BM25 side is
    #                         hash-joined postings (its own 1-row stats
    #                         cross is the allowed scalar broadcast) and
    #                         the fusion joins rank lists only
    "ann_hard_negatives",  # band-filtered variant of the brute-force
    #                        verifier: same broadcast contract-bounded
    #                        |Q|; the scale path band-filters IVF/LSH
    #                        candidates instead (operator docstring)
}


# entries whose ONLY nested loop is a 1-row scalar broadcast (a corpus
# aggregate like doc count N crossing into a vocabulary-sized frame —
# O(n*1), not a pair generator)
_SCALAR_BROADCAST_CROSS = {
    "sim_tfidf_pairs",            # corpus size N into the posting list
    "graph_pagerank_dedup",       # node count into the rank table, per iter
    "dedup_canonical_pagerank",   # same, via the composed pagerank stage
    "graph_triangle_stats",       # 1-row aggregates (counts/edges/tris) cross
    "link_sorted_neighborhood",   # 1-row n_records scalar into the report
}


@pytest.mark.slow
def test_no_nested_loop_joins_in_dedup_and_ann_plans(plans):
    """Every dedup_*/ann_* candidate-generation plan must be hash-join
    blocked — a BroadcastNestedLoopJoin or CartesianProduct means the
    blocking claim is false and the operator is O(n^2) at scale."""
    names = [
        n
        for n in entry_mod.queries()
        if (
            n.startswith("dedup_")
            or n.startswith("ann_")
            or n.startswith("sim_")    # sparse TF-IDF posting-list join
            or n.startswith("freq_")   # CMS broadcast probe join
            or n.startswith("graph_")  # pair-graph analytics
            or n.startswith("link_")   # record-linkage blocked self-join
        )
        and n not in _ALL_PAIRS_VERIFIERS
    ]
    assert len(names) >= 8  # inventory guard: the sweep actually covers the surface
    offenders = {}
    for name in names:
        p = plans(name)
        if name in _SCALAR_BROADCAST_CROSS:
            # the only nested loops allowed are Cross BuildRight scalar
            # broadcasts (corpus size N riding into every posting row,
            # O(n*1); the subtree repeats once per diamond-DAG branch).
            # A real pair-generating nested loop shows up as an
            # Inner/Left/Right BNLJ or a CartesianProduct.
            bad_bnlj = any(
                "BroadcastNestedLoopJoin" in l and "Cross BuildRight" not in l
                for l in p.splitlines()
                if "+- BroadcastNestedLoopJoin" in l or ":- BroadcastNestedLoopJoin" in l
            )
            if bad_bnlj or "CartesianProduct" in p:
                offenders[name] = True
        elif "BroadcastNestedLoopJoin" in p or "CartesianProduct" in p:
            offenders[name] = True
    assert not offenders, f"nested-loop plans in: {sorted(offenders)}"


def test_entity_dimension_ranks_never_single_task_windows(plans):
    """The r8 verdict's one scale-killer shape: an unpartitioned
    Window.orderBy over the user/doc dimension funnels 10^8-10^9 rows
    through ONE WindowExec task at 100 TB. The migrated entries
    (range-exchange partition-offset ranking, operators/ids.py) may keep
    exactly one class of unpartitioned window: the prefix-sum over
    __pid — a partition-count-sized frame, bounded by cluster size, not
    data. Any other unpartitioned windowspecdefinition is a regression."""
    import re

    for name in (
        "events_rfm_segments",
        "events_user_gini",
        "corpus_token_gini",
        "events_dense_ids",
    ):
        p = plans(name)
        offenders = []
        for m in re.finditer(r"windowspecdefinition\(([^)]*)", p):
            args = m.group(1)
            first = args.split(",")[0].strip()
            # partitioned windows lead with a bare column (no sort
            # direction); unpartitioned ones lead with an ordering
            if (" ASC" in first or " DESC" in first) and "__pid" not in first:
                offenders.append((name, first))
        assert not offenders, f"single-task entity windows: {offenders}"
