"""Query-predicate partitioner tests (QueryManager.categorize analogue)."""

from bullet_storm_spark import GroupAll, GroupOperation, GroupOpType, Query, Raw
from bullet_storm_spark.plans.expressions import eq, gt, isin
from bullet_storm_spark.streaming import QueryRegistry, StreamingEngine
from bullet_storm_spark.streaming.partitioner import equality_constraints


def test_equality_constraint_extraction():
    assert equality_constraints(eq("a", "x")) == {"a": "x"}
    assert equality_constraints(eq("a", "x") & eq("b", 5)) == {"a": "x", "b": 5}
    # OR branches and non-equality ops contribute nothing
    assert equality_constraints(eq("a", "x") | eq("a", "y")) == {}
    assert equality_constraints(gt("a", 1)) == {}
    assert equality_constraints(isin("a", "x", "y")) == {}
    # nested AND keeps harvesting
    assert equality_constraints((eq("a", "x") & gt("v", 1)) & eq("b", "y")) == {
        "a": "x",
        "b": "y",
    }
    assert equality_constraints(None) == {}


def test_engine_prunes_non_matching_queries(spark):
    engine = StreamingEngine(spark, enable_query_partitioner=True)
    mk = lambda v: Query(
        filter=eq("field", v),
        aggregation=GroupAll(GroupOperation(GroupOpType.COUNT, None, "cnt")),
        duration_ms=60_000,
    )
    engine.submit("match", mk("x"))
    engine.submit("nomatch", mk("zzz"))
    engine.submit("unprunable", Query(aggregation=Raw(size=100), duration_ms=60_000))
    batch = spark.createDataFrame([("x", 1.0), ("y", 2.0)], "field string, v double")
    engine.process_batch(batch)
    assert engine.queries_pruned == 1
    # pruned query consumed nothing but is still alive
    assert engine.registry.queries["nomatch"].state.result() == [{"cnt": 0}]
    assert engine.registry.queries["match"].state.result() == [{"cnt": 1}]
    assert len(engine.registry.queries["unprunable"].state.records) == 2


def test_pruned_query_still_expires(spark):
    import time as _time

    class Clock:
        t = 1000.0

        def __call__(self):
            return self.t

    clock = Clock()
    engine = StreamingEngine(
        spark,
        registry=QueryRegistry(clock=clock),
        clock=clock,
        enable_query_partitioner=True,
    )
    engine.submit(
        "will-expire",
        Query(
            filter=eq("field", "absent"),
            aggregation=GroupAll(GroupOperation(GroupOpType.COUNT, None, "cnt")),
            duration_ms=1_000,
        ),
    )
    engine.submit(
        "other",
        Query(filter=eq("field", "x"), aggregation=Raw(size=100), duration_ms=60_000),
    )
    batch = spark.createDataFrame([("x", 1.0)], "field string, v double")
    engine.process_batch(batch)
    clock.t += 2.0
    engine.process_batch(batch)  # expiry fires even though pruned
    sigs = [c.meta.get("signal") for i, c in engine.results if i == "will-expire"]
    assert sigs == ["COMPLETE"]
