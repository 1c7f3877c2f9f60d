"""PageRank over pair graphs (operators/graph.py): structural properties,
partitioning independence, DuckDB parity."""

import duckdb
import pytest

from bullet_storm_spark.operators import graph


@pytest.fixture(scope="module")
def star(spark):
    # node 0 is the hub of a 6-leaf star, plus a detached 2-clique (7, 8)
    rows = [(0, i) for i in range(1, 7)] + [(7, 8)]
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_pagerank_star_hub_dominates(star):
    out = {r.node: r for r in graph.pagerank(star, "id_a", "id_b").collect()}
    hub, leaf = out[0], out[1]
    assert hub.degree == 6 and leaf.degree == 1
    assert hub.pr_units > leaf.pr_units * 3
    # leaves are symmetric -> identical ranks
    assert len({out[i].pr_units for i in range(1, 7)}) == 1
    # the detached clique is symmetric too
    assert out[7].pr_units == out[8].pr_units


def test_pagerank_mass_approximately_conserved(star):
    out = graph.pagerank(star, "id_a", "id_b").collect()
    total = sum(r.pr_units for r in out)
    # floor divisions only ever LOSE units, bounded by (#ops per node) per
    # iteration; with 9 nodes and 5 iterations the loss is tiny
    assert 0.999 * graph.MASS <= total <= graph.MASS


def test_pagerank_partitioning_independent(star):
    a = [tuple(r) for r in graph.pagerank(star, "id_a", "id_b").collect()]
    b = [
        tuple(r)
        for r in graph.pagerank(star.repartition(5), "id_a", "id_b").collect()
    ]
    assert a == b


def test_pagerank_duck_parity(spark):
    rows = [(i, (i * 3 + 1) % 20) for i in range(20) if i != (i * 3 + 1) % 20]
    df = spark.createDataFrame(rows, "id_a long, id_b long")
    con = duckdb.connect()
    con.execute("CREATE TABLE e (id_a BIGINT, id_b BIGINT)")
    con.executemany("INSERT INTO e VALUES (?,?)", rows)
    s = [tuple(r) for r in graph.pagerank(df, "id_a", "id_b", iterations=7).collect()]
    d = con.execute(
        graph.pagerank_sql("SELECT id_a, id_b FROM e", "id_a", "id_b", iterations=7)
    ).fetchall()
    assert s == [tuple(r) for r in d]


def test_pagerank_validation(star):
    with pytest.raises(ValueError):
        graph.pagerank(star, "id_a", "id_b", iterations=0)
    with pytest.raises(ValueError):
        graph.pagerank_sql("SELECT 1 AS a, 2 AS b", "a", "b", iterations=25)
    with pytest.raises(ValueError):
        graph.pagerank(star, "id_a", "id_b", checkpoint_every=0)


def test_pagerank_plan_depth_bounded_by_checkpointing(star):
    # the rank lineage is cut every checkpoint_every rounds, so the FINAL
    # plan carries at most checkpoint_every iterations' worth of joins —
    # constant in the iteration count (VERDICT r4 #6). Each un-checkpointed
    # iteration contributes 2 joins; without the cut 16 iterations would
    # carry ~32.
    def n_joins(df):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        return sum(plan.count(j) for j in ("Join",))

    deep = graph.pagerank(star, "id_a", "id_b", iterations=16, checkpoint_every=4)
    shallow = graph.pagerank(star, "id_a", "id_b", iterations=4, checkpoint_every=4)
    uncut = graph.pagerank(star, "id_a", "id_b", iterations=16, checkpoint_every=16)
    # final segment (4 rounds past the last cut) ~ the 4-iteration plan; the
    # checkpointed start even saves the initial crossJoin
    assert n_joins(deep) <= n_joins(shallow)
    assert n_joins(uncut) > 2 * n_joins(deep)
    # checkpointed ranks compute the same result as the pure chain
    pure = graph.pagerank(star, "id_a", "id_b", iterations=7, checkpoint_every=20)
    cut = graph.pagerank(star, "id_a", "id_b", iterations=7, checkpoint_every=2)
    assert [tuple(r) for r in pure.collect()] == [tuple(r) for r in cut.collect()]


def test_canonical_pagerank_one_per_cluster(spark):
    import __spark_entry__ as em

    out = em.queries()["dedup_canonical_pagerank"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, rows in by_cluster.items():
        canon = [r for r in rows if r.is_canonical]
        assert len(canon) == 1, f"cluster {cid}: {len(canon)} canonicals"
        # the canonical is the max-centrality member (doc_id tiebreak)
        best = max(rows, key=lambda r: (r.pr_units, -r.doc_id))
        assert canon[0].doc_id == best.doc_id
    # singletons canonicalize to themselves with no graph presence
    singles = [r for r in out if r.cluster_size == 1]
    assert singles and all(r.is_canonical and r.pr_units == -1 for r in singles)


def test_triangle_stats_hand_graph(spark):
    import duckdb

    from bullet_storm_spark.operators.graph import (
        triangle_stats, triangle_stats_sql,
    )

    # K4 on {1,2,3,4} (4 triangles) + pendant 5-6 edge + noise:
    # duplicate, reversed, and self-loop edges must all canonicalize away
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (2, 1),          # reversed duplicate
        (3, 1),          # reversed duplicate
        (4, 4),          # self-loop: dropped
        (5, 6),
        (5, 6),          # exact duplicate
    ]
    df = spark.createDataFrame(edges, "x long, y long")
    out = triangle_stats(df, "x", "y").collect()[0]
    # degrees: 1..4 have 3 each, 5,6 have 1 -> wedges 4*3 + 0 = 12
    assert (out.n_nodes, out.n_edges, out.n_wedges, out.n_triangles) == (
        6, 7, 12, 4,
    )
    assert out.clustering_coeff == 1.0  # 3*4/12

    con = duckdb.connect()
    con.execute("CREATE TABLE e (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO e VALUES (?,?)", edges)
    duck = con.execute(
        triangle_stats_sql("SELECT * FROM e", "x", "y")
    ).fetchall()
    assert [tuple(out)] == duck


def test_triangle_stats_zero_wedges(spark):
    from bullet_storm_spark.operators.graph import triangle_stats

    # perfect matching: no wedges -> coefficient NULL, not a crash
    df = spark.createDataFrame([(1, 2), (3, 4)], "x long, y long")
    out = triangle_stats(df, "x", "y").collect()[0]
    assert out.n_wedges == 0 and out.n_triangles == 0
    assert out.clustering_coeff is None
