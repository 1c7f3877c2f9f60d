"""Graceful shutdown: live queries flush final results with COMPLETE."""

from bullet_storm_spark import GroupAll, GroupOperation, GroupOpType, Query, Raw
from bullet_storm_spark.streaming import StreamingEngine


def test_shutdown_flushes_all_live_queries(spark):
    engine = StreamingEngine(spark)
    engine.submit(
        "agg",
        Query(
            aggregation=GroupAll(GroupOperation(GroupOpType.COUNT, None, "cnt")),
            duration_ms=600_000,
        ),
    )
    engine.submit("raw", Query(aggregation=Raw(size=100), duration_ms=600_000))
    engine.process_batch(spark.createDataFrame([("a",)] * 6, "k string"))
    engine.shutdown()
    results = {i: c for i, c in engine.results}
    assert results["agg"].meta["signal"] == "COMPLETE"
    assert results["agg"].records == [{"cnt": 6}]
    assert len(results["raw"].records) == 6
    assert not engine.registry.active()
    # idempotent
    engine.shutdown()
    assert len(engine.results) == 2
