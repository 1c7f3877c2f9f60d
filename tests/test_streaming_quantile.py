"""Streaming quantile state: exact under the cap, uniform reservoir above."""

from bullet_storm_spark import Distribution, DistributionType, Query
from bullet_storm_spark.streaming import StreamingEngine
from bullet_storm_spark.streaming.state import DistributionState


def _quantile_query(points):
    return Query(
        aggregation=Distribution(
            field="v", dist_type=DistributionType.QUANTILE, points=points
        ),
        duration_ms=600_000,
    )


def test_exact_under_cap(spark):
    engine = StreamingEngine(spark)
    engine.submit("q", _quantile_query([0.0, 0.5, 1.0]))
    engine.process_batch(spark.createDataFrame([(float(i),) for i in range(51)], "v double"))
    engine.process_batch(spark.createDataFrame([(float(i),) for i in range(51, 101)], "v double"))
    got = {r["quantile"]: r["value"] for r in engine.registry.queries["q"].state.result()}
    assert got == {0.0: 0.0, 0.5: 50.0, 1.0: 100.0}  # exact across batches


def test_reservoir_above_cap(spark, monkeypatch):
    monkeypatch.setattr(DistributionState, "SAMPLE_CAP", 2_000)
    engine = StreamingEngine(spark)
    engine.submit("q", _quantile_query([0.25, 0.5, 0.75]))
    # 3 batches x 4000 uniform values in [0, 100)
    for b in range(3):
        rows = [((i * 997 + b * 131) % 4000 / 40.0,) for i in range(4000)]
        engine.process_batch(spark.createDataFrame(rows, "v double"))
    state = engine.registry.queries["q"].state
    assert len(state.values) == 2_000 and state.seen == 12_000  # bounded state
    got = {r["quantile"]: r["value"] for r in state.result()}
    for frac, expect in [(0.25, 25.0), (0.5, 50.0), (0.75, 75.0)]:
        assert abs(got[frac] - expect) < 5.0  # sampling tolerance
