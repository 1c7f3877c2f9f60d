"""include=ALL windows, result-metadata config, engine stats, approx
quantiles — the small reference-parity surfaces."""

from bullet_storm_spark import (
    Distribution,
    DistributionType,
    GroupBy,
    GroupOperation,
    GroupOpType,
    Query,
    Raw,
    TumblingWindow,
    compile_query,
)
from bullet_storm_spark.config import EngineConfig
from bullet_storm_spark.streaming import QueryRegistry, StreamingEngine


class FakeClock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t


def _count_query(window):
    return Query(
        aggregation=GroupBy(
            fields={}, operations=[GroupOperation(GroupOpType.COUNT, None, "cnt")], size=1
        ),
        window=window,
        duration_ms=600_000,
    )


def test_include_all_window_is_additive(spark):
    clock = FakeClock()
    engine = StreamingEngine(spark, registry=QueryRegistry(clock=clock), clock=clock)
    engine.submit("w", _count_query(TumblingWindow(emit_every_ms=1_000, include_all=True)))
    batch = lambda n: spark.createDataFrame([("a",)] * n, "k string")
    engine.process_batch(batch(3))
    clock.t += 1.1
    engine.process_batch(batch(2))
    clock.t += 1.1
    engine.tick()
    counts = [c.records[0]["cnt"] for i, c in engine.results]
    assert counts == [5, 5]  # additive: never resets


def test_result_meta_disable_and_remap(spark):
    clock = FakeClock()
    cfg = EngineConfig(result_meta_enable=False)
    engine = StreamingEngine(spark, registry=QueryRegistry(clock=clock), clock=clock, config=cfg)
    engine.submit("m", Query(aggregation=Raw(size=1), duration_ms=600_000))
    engine.process_batch(spark.createDataFrame([("a",)], "k string"))
    (_, clip), = engine.results
    assert set(clip.meta) == {"signal"}  # only the control signal survives

    cfg2 = EngineConfig(result_meta_keys={"query_id": "Query ID", "signal": "Signal"})
    engine2 = StreamingEngine(spark, registry=QueryRegistry(clock=clock), clock=clock, config=cfg2)
    engine2.submit("m2", Query(aggregation=Raw(size=1), duration_ms=600_000))
    engine2.process_batch(spark.createDataFrame([("a",)], "k string"))
    (_, clip2), = engine2.results
    assert clip2.meta["Query ID"] == "m2" and clip2.meta["Signal"] == "COMPLETE"


def test_engine_stats(spark):
    clock = FakeClock()
    engine = StreamingEngine(spark, registry=QueryRegistry(clock=clock), clock=clock)
    q = Query(aggregation=Raw(size=100), duration_ms=600_000)
    engine.submit("s1", q)
    engine.submit("s1", q)  # duplicate
    engine.process_batch(spark.createDataFrame([("a",), ("b",)], "k string"))
    s = engine.stats()
    assert s["active_queries"] == 1
    assert s["batches_processed"] == 1
    assert s["duplicates_ignored"] == 1
    assert s["records_consumed"] == 2


def test_approx_quantile(spark):
    df = spark.range(10_000).selectExpr("cast(id as double) AS v")
    q = Query(
        aggregation=Distribution(
            field="v",
            dist_type=DistributionType.QUANTILE,
            points=[0.5],
            approx=True,
        )
    )
    got = compile_query(q)(df).collect()[0]
    assert abs(got.value - 5000) < 200  # within approx tolerance
