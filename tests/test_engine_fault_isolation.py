"""One broken query must FAIL alone; the rest of the batch proceeds
(JoinBolt init-error parity)."""

from bullet_storm_spark import GroupAll, GroupOperation, GroupOpType, Query, Raw
from bullet_storm_spark.plans.expressions import eq
from bullet_storm_spark.streaming import StreamingEngine


def test_broken_query_fails_alone(spark):
    engine = StreamingEngine(spark, enable_shared_scan=False)
    engine.submit(
        "bad", Query(filter=eq("no_such_column", 1), aggregation=Raw(size=10),
                     duration_ms=600_000)
    )
    engine.submit(
        "good",
        Query(
            aggregation=GroupAll(GroupOperation(GroupOpType.COUNT, None, "cnt")),
            duration_ms=600_000,
        ),
    )
    batch = spark.createDataFrame([("a", 1.0)] * 4, "k string, v double")
    engine.process_batch(batch)
    # bad query FAILed with error metadata; good one kept running
    sigs = {i: c.meta.get("signal") for i, c in engine.results}
    assert sigs.get("bad") == "FAIL"
    assert "bad" not in engine.registry.queries
    assert engine.registry.queries["good"].state.result() == [{"cnt": 4}]
    # next batch unaffected
    engine.process_batch(batch)
    assert engine.registry.queries["good"].state.result() == [{"cnt": 8}]
