"""Multi-stream routing: queries bind to their named source; lifecycle
advances everywhere."""

from bullet_storm_spark import GroupAll, GroupOperation, GroupOpType, Query, Raw
from bullet_storm_spark.streaming import QueryRegistry, StreamingEngine


class Clock:
    t = 1000.0

    def __call__(self):
        return self.t


def test_queries_bind_to_their_source(spark):
    clock = Clock()
    engine = StreamingEngine(spark, registry=QueryRegistry(clock=clock), clock=clock)
    cnt = lambda src, dur=600_000: Query(
        source=src,
        aggregation=GroupAll(GroupOperation(GroupOpType.COUNT, None, "cnt")),
        duration_ms=dur,
    )
    engine.submit("ev", cnt("events"))
    engine.submit("docs", cnt("documents"))
    engine.submit("short", cnt("documents", dur=1_000))
    ev_batch = spark.createDataFrame([("a",)] * 7, "x string")
    doc_batch = spark.createDataFrame([("b",)] * 3, "x string")
    engine.process_batch(ev_batch, source="events")
    engine.process_batch(doc_batch, source="documents")
    engine.process_batch(ev_batch, source="events")
    assert engine.registry.queries["ev"].state.result() == [{"cnt": 14}]
    assert engine.registry.queries["docs"].state.result() == [{"cnt": 3}]
    # duration expiry fires even from a batch of a DIFFERENT source
    clock.t += 2.0
    engine.process_batch(ev_batch, source="events")  # ev: 21
    sigs = [c.meta.get("signal") for i, c in engine.results if i == "short"]
    assert sigs == ["COMPLETE"]
    # source=None (single-stream mode) feeds everyone
    engine.process_batch(doc_batch)
    assert engine.registry.queries["docs"].state.result() == [{"cnt": 6}]
    assert engine.registry.queries["ev"].state.result() == [{"cnt": 24}]
