"""Max in-flight query cap (DRPC max-uncommitted analogue)."""

from bullet_storm_spark import Query, Raw
from bullet_storm_spark.config import EngineConfig
from bullet_storm_spark.streaming import StreamingEngine


def test_submissions_beyond_cap_rejected(spark):
    engine = StreamingEngine(spark, config=EngineConfig(max_concurrent_queries=2))
    for i in range(4):
        engine.submit(f"q{i}", Query(aggregation=Raw(size=5), duration_ms=600_000))
    engine.tick()
    assert len(engine.registry.queries) == 2
    rejected = [i for i, c in engine.results if c.meta.get("signal") == "FAIL"]
    assert rejected == ["q2", "q3"]
    # removing one frees a slot
    engine.kill("q0")
    engine.submit("q9", Query(aggregation=Raw(size=5), duration_ms=600_000))
    engine.tick()
    assert "q9" in engine.registry.queries
