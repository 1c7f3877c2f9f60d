"""Shared-scan multi-query evaluation: one grouping-sets job must produce
exactly the same per-query state as the per-query path."""

import pytest

from bullet_storm_spark import (
    CountDistinct,
    Distribution,
    DistributionType,
    GroupAll,
    GroupBy,
    GroupOperation,
    GroupOpType,
    Projection,
    Query,
    Raw,
    TopK,
)
from bullet_storm_spark.plans.expressions import eq, fld, gt
from bullet_storm_spark.streaming import QueryRegistry, StreamingEngine


def _mixed_queries():
    return {
        "grp_all": Query(
            filter=gt("v", 10.0),
            aggregation=GroupAll(
                GroupOperation(GroupOpType.COUNT, None, "cnt"),
                GroupOperation(GroupOpType.SUM, "v", "s"),
                GroupOperation(GroupOpType.MIN, "v", "mn"),
                GroupOperation(GroupOpType.AVG, "v", "av"),
            ),
            duration_ms=600_000,
        ),
        "grp_by": Query(
            aggregation=GroupBy(
                fields={"k": "key"},
                operations=[
                    GroupOperation(GroupOpType.COUNT, None, "cnt"),
                    GroupOperation(GroupOpType.SUM, "n", "sn"),
                ],
            ),
            duration_ms=600_000,
        ),
        "grp_proj": Query(
            filter=eq("k", "a"),
            projection=Projection.of(kk=fld("k"), doubled=fld("n")),
            aggregation=GroupBy(
                fields={"kk": ""},
                operations=[GroupOperation(GroupOpType.MAX, "doubled", "mx")],
            ),
            duration_ms=600_000,
        ),
        "topk": Query(
            aggregation=TopK(size=3, name="cnt", fields={"k": "", "s": "str"}),
            duration_ms=600_000,
        ),
        "pmf": Query(
            aggregation=Distribution(
                field="v", dist_type=DistributionType.PMF, points=[10.0, 50.0]
            ),
            duration_ms=600_000,
        ),
        "cdf": Query(
            aggregation=Distribution(
                field="v", dist_type=DistributionType.CDF, points=[10.0, 50.0]
            ),
            duration_ms=600_000,
        ),
        # count distinct IS shareable: HLL sketch column (approx) /
        # collect_set column (exact)
        "cd_approx": Query(
            filter=gt("n", 10),
            aggregation=CountDistinct(fields=["k"], name="u", exact=False),
            duration_ms=600_000,
        ),
        "cd": Query(
            aggregation=CountDistinct(fields=["k"], name="u"), duration_ms=600_000
        ),
        # NOT shareable -> per-query path alongside
        "raw": Query(filter=gt("n", 50), aggregation=Raw(size=10), duration_ms=600_000),
    }


@pytest.fixture()
def batches(spark):
    rows1 = [(f"{'ab'[i % 2]}", ["x", "y", None][i % 3], float(i), i) for i in range(80)]
    rows2 = [("c", "x", float(i) + 0.5, i) for i in range(40)]
    schema = "k string, s string, v double, n int"
    return (
        spark.createDataFrame(rows1, schema),
        spark.createDataFrame(rows2, schema),
    )


def _run(spark, batches, shared: bool):
    engine = StreamingEngine(spark, enable_shared_scan=shared)
    for qid, q in _mixed_queries().items():
        engine.submit(qid, q)
    for b in batches:
        engine.process_batch(b)
    return {
        qid: sorted(map(str, rq.state.result()))
        for qid, rq in engine.registry.queries.items()
    }, engine


def test_shared_scan_equals_per_query(spark, batches):
    base, _ = _run(spark, batches, shared=False)
    shared, engine = _run(spark, batches, shared=True)
    assert engine.shared_scan_queries >= 14  # 7 shareable queries x 2 batches
    assert base.keys() == shared.keys()
    for qid in base:
        assert base[qid] == shared[qid], qid


def test_shared_scan_single_query_falls_back(spark, batches):
    engine = StreamingEngine(spark, enable_shared_scan=True)
    engine.submit("only", _mixed_queries()["grp_by"])
    engine.process_batch(batches[0])
    assert engine.shared_scan_queries == 0  # <2 shareable -> per-query path
    assert engine.registry.queries["only"].state.result()


def test_shared_plan_cache_invalidates_on_fleet_change(spark, batches):
    # the ChunkPlan cache must rebuild when a member leaves the fleet
    # (killed query) and keep producing per-query-identical results
    engine = StreamingEngine(spark, enable_shared_scan=True)
    for qid, q in _mixed_queries().items():
        engine.submit(qid, q)
    engine.process_batch(batches[0])
    key1 = engine._chunk_cache_key
    assert key1 is not None and engine._chunk_cache
    engine.process_batch(batches[0])
    assert engine._chunk_cache_key == key1  # stable fleet -> cache reused
    engine.kill("grp_all")
    engine.process_batch(batches[1])
    key2 = engine._chunk_cache_key
    assert key2 is not None and key2 != key1
    # survivors still aggregate both batches correctly vs per-query path
    base, _ = _run(spark, [batches[0], batches[0], batches[1]], shared=False)
    for qid, rq in engine.registry.queries.items():
        if qid == "grp_all":
            continue
        assert sorted(map(str, rq.state.result())) == base[qid], qid


def test_shared_plan_cache_released_when_fleet_shrinks(spark, batches):
    # killing the fleet below the shareable threshold must drop the
    # cached ChunkPlans (they hold the retired queries' state)
    engine = StreamingEngine(spark, enable_shared_scan=True)
    for qid, q in _mixed_queries().items():
        engine.submit(qid, q)
    engine.process_batch(batches[0])
    assert engine._chunk_cache is not None
    for qid in list(engine.registry.queries):
        if qid != "raw":
            engine.kill(qid)
    engine.process_batch(batches[1])
    assert engine._chunk_cache is None and engine._chunk_cache_key is None
