"""Graph analytics over the duplicate/similarity pair graph, dual-compiled.

`connected_components` (operators/dedup.py) answers "which documents are
the same?"; PageRank over the same pair graph answers "which copy is the
CANONICAL one?" — the highest-centrality node of a near-dup cluster is the
version most connected to the rest (the web-dedup authority-selection
trick), and on citation/link graphs it is the standard importance prior
for curation weighting.

Spark-first shape: PageRank with a FIXED iteration count is a chain of
joins — per iteration one equi-join of the rank table to the edge list
(shuffle keyed by node id, the graph's natural key) and one aggregation.
No driver-side state beyond the loop counter; the rank table is
node-sized, orders of magnitude smaller than the corpus that produced the
pairs.

Engine parity by INTEGER arithmetic: ranks live in BIGINT units of 1e-12
(the whole graph carries ~1e12 units of mass). Every step — uniform
start ``1e12 div n``, per-edge contribution ``pr div degree``, damping
``(sum * 85) div 100``, teleport ``15e10 div n`` — is integer division
and multiplication, bit-identical in any engine at any partitioning.
(The first formulation used decimal division; Spark's decimal-division
scale rules and DuckDB's decimal ``/`` disagree, so the twin could never
be exact. Floor-division units sidestep the whole class.)

For web-scale graphs swap the fixed unroll for the checkpoint-per-round
loop `connected_components` uses (lineage cut, convergence test on the
rank delta); the per-round plan is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MASS = 1_000_000_000_000          # total rank mass in units (1.0 == 1e12)
TELEPORT_UNITS = 150_000_000_000  # 0.15 * MASS
DAMP_NUM, DAMP_DEN = 85, 100      # 0.85 as an integer ratio


def pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iterations: int = 5,
    checkpoint_every: int = 4,
) -> DataFrame:
    """(node, degree, pr_units, pagerank) over the UNDIRECTED graph given
    as edge pairs (each input row contributes both directions; isolated
    nodes cannot appear). ``pr_units`` is the exact integer rank in 1e-12
    units; ``pagerank`` is its double rendering (unrounded — the same
    integer divides to the same double in every engine).

    ``checkpoint_every`` cuts the rank table's join lineage every k
    rounds (localCheckpoint here; swap for cluster ``checkpoint()`` on a
    real deployment, same discipline as the edge-list cut below): without
    it the optimized plan grows two joins per iteration and the final
    stage re-plans the whole chain — plan depth is now bounded by k
    regardless of iteration count (pinned in tests/test_graph.py)."""
    if not 1 <= iterations <= 20:
        raise ValueError(f"need 1 <= iterations <= 20, got {iterations}")
    if checkpoint_every < 1:
        raise ValueError(f"need checkpoint_every >= 1, got {checkpoint_every}")
    und = (
        # both orientations in ONE pass: the unionByName form re-ran the
        # (possibly expensive) edge-producing pipeline once per direction
        # BEFORE the checkpoint could cut it; explode of the two oriented
        # structs yields the identical multiset from a single scan
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
                    ),
                    F.struct(
                        F.col(dst_col).alias("__s"), F.col(src_col).alias("__d")
                    ),
                )
            ).alias("__e")
        )
        .select(F.col("__e.__s").alias("__s"), F.col("__e.__d").alias("__d"))
        .distinct()
        # materialize the edge list ONCE: the iteration chain references it
        # every round, and without the lineage cut each round re-runs the
        # (possibly expensive) edge-producing pipeline — measured 64 s ->
        # 7 s on the LSH pair graph. Same discipline as
        # dedup.connected_components; swap for checkpoint() on a cluster.
        # LAZY: the plan is cut immediately and the RDD persists on first
        # use — the n = deg.count() action below materializes edges, deg
        # and the count in ONE driver job instead of three sequential
        # ones (r12; measured 1.45-2.21 -> 1.25-1.64 s on the LSH pair
        # graph with identical ranks)
        .localCheckpoint(eager=False)
    )
    # degree is the only per-node scan needed: an undirected edge
    # contributes both endpoints, so deg's key set IS the node set —
    # deriving nodes from deg removes a second distinct over the edges,
    # and carrying ``degree`` inside the rank table removes the second
    # per-iteration join the old (ranks ⋈ und ⋈ deg) chain paid
    deg = und.groupBy(F.col("__s").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    ).localCheckpoint(eager=False)
    # the node count is a single scalar consumed only inside integer-div
    # literals; folding it here (one count on the checkpointed deg table)
    # replaces a broadcast-exchange crossJoin PER ITERATION with literal
    # arithmetic — same integers, fewer plan nodes per round
    n = deg.count()
    ranks = deg.select(
        "node", "degree", F.lit(MASS // n).cast("long").alias("__pr")
    )
    for it in range(int(iterations)):
        contrib = (
            und.join(ranks.withColumnRenamed("node", "__s"), "__s")
            .select(
                F.col("__d").alias("node"),
                F.expr("__pr div degree").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").cast("long").alias("__sum"))
        )
        ranks = (
            deg.join(contrib, "node", "left")
            .select(
                "node",
                "degree",
                (
                    F.lit(TELEPORT_UNITS // n)
                    + F.expr(
                        f"(coalesce(__sum, 0L) * {DAMP_NUM}) div {DAMP_DEN}"
                    )
                ).cast("long").alias("__pr"),
            )
        )
        if (it + 1) % checkpoint_every == 0 and (it + 1) < iterations:
            # lazy: cuts the plan now, persists within the final action's
            # job — no dedicated checkpoint job per cut
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(
        "node",
        "degree",
        F.col("__pr").alias("pr_units"),
        (F.col("__pr") / F.lit(float(MASS))).alias("pagerank"),
    ).orderBy("node")


def pagerank_sql(
    edges_sql: str,
    src_col: str,
    dst_col: str,
    iterations: int = 5,
) -> str:
    """DuckDB twin: the same fixed iteration unrolled as CTE stages over
    an edge-list subquery (``edges_sql`` must yield ``src_col`` and
    ``dst_col`` columns)."""
    if not 1 <= iterations <= 20:
        raise ValueError(f"need 1 <= iterations <= 20, got {iterations}")
    stages = []
    prev = "__r0"
    for i in range(1, int(iterations) + 1):
        cur = f"__r{i}"
        stages.append(
            f"""{cur} AS (
  SELECT n.node,
         CAST({TELEPORT_UNITS} // (SELECT n FROM __n)
              + (COALESCE(c.s, 0) * {DAMP_NUM}) // {DAMP_DEN} AS BIGINT)
           AS pr
  FROM __nodes n LEFT JOIN (
    SELECT e.__d AS node, SUM(r.pr // d.degree)::BIGINT AS s
    FROM __und e
    JOIN {prev} r ON e.__s = r.node
    JOIN __deg d ON e.__s = d.node
    GROUP BY e.__d
  ) c ON n.node = c.node
)"""
        )
        prev = cur
    joined = ",\n".join(stages)
    return f"""
WITH __edges AS MATERIALIZED ({edges_sql}),
__und AS MATERIALIZED (
  SELECT {src_col} AS __s, {dst_col} AS __d FROM __edges
  UNION
  SELECT {dst_col} AS __s, {src_col} AS __d FROM __edges
),
__nodes AS MATERIALIZED (SELECT DISTINCT __s AS node FROM __und),
__deg AS MATERIALIZED (SELECT __s AS node, COUNT(*)::BIGINT AS degree
          FROM __und GROUP BY __s),
__n AS (SELECT COUNT(*)::BIGINT AS n FROM __nodes),
__r0 AS (
  SELECT node, CAST({MASS} // (SELECT n FROM __n) AS BIGINT) AS pr
  FROM __nodes
),
{joined}
SELECT r.node, d.degree, r.pr AS pr_units,
       r.pr / {float(MASS)!r} AS pagerank
FROM {prev} r JOIN __deg d ON r.node = d.node
ORDER BY r.node
"""


def triangle_stats(
    edges: DataFrame,
    a_col: str,
    b_col: str,
    round_to: int = 9,
) -> DataFrame:
    """(n_nodes, n_edges, n_wedges, n_triangles, clustering_coeff): the
    global clustering profile of an undirected graph — triangle count by
    ordered edge-edge-edge equi-join and the transitivity ratio
    ``3·triangles / wedges`` (Newman SIAM Rev 2003).  On a dedup pair
    graph this is the audit BEHIND the cluster histogram: near-1
    transitivity says the pair generator found coherent duplicate
    groups; low transitivity with high edge count says the banding is
    chaining unrelated docs (the LSH false-positive smell).

    Plan: edges canonicalize to u<v and dedupe (one shuffle); degrees
    are one union+groupBy; triangles enumerate each (a<b<c) exactly
    once via two hash joins — (a,b)⋈(b,c) then ⋈(a,c).  Work is
    Σ deg², the standard node-iterator bound; the upstream pair
    generators' df_cap keeps hub degrees bounded, which is what makes
    this shape safe at 100 TB.
    """
    e = (
        edges.select(
            F.least(F.col(a_col), F.col(b_col)).alias("u"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("v"),
        )
        .where(F.col("u") < F.col("v"))
        .distinct()
        # the canonical edge list is referenced five times (degrees,
        # edge count, three triangle legs): pin ONE materialization so
        # an expensive upstream pair generator (minhash, winnow) does
        # not replay per reference — same posture as the components
        # loop's per-round checkpoint
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    counts = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) div 2")).cast("long").alias("n_wedges"),
    )
    n_edges = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a2"), F.col("v").alias("c2"))
    tri = (
        e.join(e2, F.col("v") == F.col("b"))
        .join(
            e3,
            (F.col("u") == F.col("a2")) & (F.col("c") == F.col("c2")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    return (
        counts.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.try_divide(
                    F.lit(3.0) * F.col("n_triangles").cast("double"),
                    F.col("n_wedges").cast("double"),
                ),
                round_to,
            ).alias("clustering_coeff"),
        )
    )


def triangle_stats_sql(
    edges_sql: str,
    a_col: str,
    b_col: str,
    round_to: int = 9,
) -> str:
    return f"""
WITH __raw AS ({edges_sql}),
__e AS (
  SELECT DISTINCT LEAST({a_col}, {b_col}) AS u,
                  GREATEST({a_col}, {b_col}) AS v
  FROM __raw WHERE LEAST({a_col}, {b_col}) < GREATEST({a_col}, {b_col})
),
__deg AS (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT u AS n FROM __e UNION ALL SELECT v FROM __e)
  GROUP BY n
),
__c AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
  FROM __deg
),
__ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM __e),
__t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM __e e1
  JOIN __e e2 ON e1.v = e2.u
  JOIN __e e3 ON e1.u = e3.u AND e2.v = e3.v
)
SELECT c.n_nodes, ne.n_edges, c.n_wedges, t.n_triangles,
       CASE WHEN ABS(3.0 * t.n_triangles / NULLIF(c.n_wedges, 0)) >= 1e16 THEN CAST((3.0 * t.n_triangles / NULLIF(c.n_wedges, 0)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((3.0 * t.n_triangles / NULLIF(c.n_wedges, 0)) * CAST(ABS(3.0 * t.n_triangles / NULLIF(c.n_wedges, 0)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END
         AS clustering_coeff
FROM __c c CROSS JOIN __ne ne CROSS JOIN __t t
"""


def degree_powerlaw(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    x_min: int = 2,
    round_to: int = 9,
) -> DataFrame:
    """Degree distribution + Hill/MLE power-law exponent over an
    undirected edge list — one row ``(n_nodes, n_edges, max_degree,
    n_tail, alpha, mean_degree)`` where ``alpha = 1 + n_tail /
    Σ ln(dᵢ/(x_min − 1/2))`` is the discrete-MLE exponent (Clauset,
    Shalizi & Newman, SIAM Rev 2009 eq. 3.7) over nodes with degree
    >= x_min. The similarity-graph health scalar: a dup graph whose
    degrees go heavy-tailed (alpha < 2.5-ish) has hub documents —
    boilerplate templates — that transitive clustering will glue into
    one giant component, so this is the pre-flight before
    connected-components survivorship.

    Engine parity: degrees are exact integers (each undirected edge
    counted once per endpoint); the ln terms round to 9 dp and sum in
    DECIMAL(38,9) (order-free — the lm_score convention), one IEEE
    finish. Scale: one edge explode + one node-keyed count (map-side
    combined), a 1-row reduction."""
    if x_min < 2:
        raise ValueError(f"need x_min >= 2, got {x_min}")
    from bullet_storm_spark.operators.stats_tests import _d2d, _div

    # both endpoints in ONE pass over the edge list: the unionAll form
    # re-ran the (possibly expensive — minhash pairs) upstream lineage
    # once per side. explode(array(src,dst)) yields the identical
    # endpoint multiset, including NULLs, from a single scan (guide §1.2)
    nodes = edges.select(
        F.explode(F.array(F.col(src_col), F.col(dst_col))).alias("__n")
    )
    deg = nodes.groupBy("__n").agg(F.count(F.lit(1)).cast("long").alias("__d"))
    _q9 = lambda c: c.cast("double").cast("string").cast("decimal(18,9)")  # noqa: E731
    term = F.when(
        F.col("__d") >= x_min,
        _q9(F.log(F.col("__d").cast("double") / F.lit(float(x_min) - 0.5))),
    )
    agg = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        (F.sum("__d") / 2).cast("long").alias("n_edges"),
        F.max("__d").cast("long").alias("max_degree"),
        F.sum(F.when(F.col("__d") >= x_min, 1).otherwise(0))
        .cast("long")
        .alias("n_tail"),
        F.sum(term.cast("decimal(38,9)")).cast("decimal(38,9)").alias("__s"),
    )
    return agg.select(
        "n_nodes",
        "n_edges",
        "max_degree",
        "n_tail",
        F.round(
            F.lit(1.0)
            + _div(F.col("n_tail").cast("double"), _d2d(F.col("__s"))),
            round_to,
        ).alias("alpha"),
        F.round(
            _div(
                (F.lit(2.0) * F.col("n_edges").cast("double")),
                F.col("n_nodes").cast("double"),
            ),
            round_to,
        ).alias("mean_degree"),
    )


def degree_powerlaw_sql(
    edges_sql: str,
    src_col: str,
    dst_col: str,
    x_min: int = 2,
    round_to: int = 9,
) -> str:
    if x_min < 2:
        raise ValueError(f"need x_min >= 2, got {x_min}")
    from bullet_storm_spark.operators.stats_tests import _d2d_sql, _qround_sql

    def q9(e: str) -> str:
        return (
            f"CAST(CAST(({e}) * CAST(ABS({e}) >= POWER(10.0, -10) AS INT)"
            f" AS VARCHAR) AS DECIMAL(18,9))"
        )

    term = q9(f"ln(CAST(d AS DOUBLE) / {float(x_min) - 0.5!r})")
    alpha = f"1.0 + CAST(n_tail AS DOUBLE) / NULLIF({_d2d_sql('s')}, 0.0)"
    meand = "(2.0 * CAST(n_edges AS DOUBLE)) / CAST(n_nodes AS DOUBLE)"
    return f"""
WITH __e AS ({edges_sql}),
__nodes AS (
  SELECT {src_col} AS n FROM __e
  UNION ALL
  SELECT {dst_col} AS n FROM __e
),
__deg AS (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM __nodes GROUP BY n
),
__a AS (
  SELECT COUNT(*)::BIGINT AS n_nodes,
         CAST(SUM(d) / 2 AS BIGINT) AS n_edges,
         CAST(MAX(d) AS BIGINT) AS max_degree,
         SUM(CASE WHEN d >= {int(x_min)} THEN 1 ELSE 0 END)::BIGINT AS n_tail,
         CAST(SUM(CASE WHEN d >= {int(x_min)}
                  THEN CAST({term} AS DECIMAL(38,9)) END)
              AS DECIMAL(38,9)) AS s
  FROM __deg
)
SELECT n_nodes, n_edges, max_degree, n_tail,
       {_qround_sql(alpha, round_to)} AS alpha,
       {_qround_sql(meand, round_to)} AS mean_degree
FROM __a
"""
