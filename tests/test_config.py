"""Config validation tests — BulletStormConfigTest style (defaults, floors,
cross-field rules)."""

import pytest

from bullet_storm_spark.config import ConfigError, EngineConfig
from bullet_storm_spark.plans.query import Query, Raw, TumblingWindow
from bullet_storm_spark.streaming import QueryRegistry, StreamingEngine


def test_defaults_mirror_reference():
    c = EngineConfig()
    assert c.tick_interval_ms == 100
    assert c.pre_start_delay_ticks == 2
    assert c.post_finish_buffer_ticks == 3
    # derived floor: tick * (pre_start + 2) = 400 (BulletStormConfig.java:468-472)
    assert c.window_min_emit_every_ms == 400
    assert c.max_query_duration_ms == 10_000


def test_tick_floor():
    assert EngineConfig(tick_interval_ms=10).tick_interval_ms == 10
    with pytest.raises(ConfigError):
        EngineConfig(tick_interval_ms=5)


def test_window_min_cross_field_rule():
    with pytest.raises(ConfigError):
        EngineConfig(window_min_emit_every_ms=100)  # below 400 floor
    c = EngineConfig(tick_interval_ms=10, window_min_emit_every_ms=100)
    assert c.window_min_emit_every_ms == 100


def test_duration_rule():
    with pytest.raises(ConfigError):
        EngineConfig(default_query_duration_ms=20_000, max_query_duration_ms=10_000)


def test_raw_size_clamped_and_window_validation():
    c = EngineConfig()
    q = Query(aggregation=Raw(size=5_000))
    assert c.validate_query(q) == []
    assert q.aggregation.size == c.raw_max_size  # clamped like the reference
    q2 = Query(aggregation=Raw(size=10), window=TumblingWindow(emit_every_ms=50))
    errs = c.validate_query(q2)
    assert errs and "below the minimum" in errs[0]
    errs = EngineConfig(window_disable=True).validate_query(
        Query(aggregation=Raw(size=10), window=TumblingWindow(emit_every_ms=1000))
    )
    assert errs and "disabled" in errs[0]


def test_engine_rejects_invalid_query_with_fail_clip(spark):
    engine = StreamingEngine(spark)
    engine.submit(
        "bad", Query(aggregation=Raw(size=10), window=TumblingWindow(emit_every_ms=50))
    )
    engine.tick()
    assert "bad" not in engine.registry.queries
    (qid, clip), = engine.results
    assert qid == "bad" and clip.meta["signal"] == "FAIL"
    assert "below the minimum" in clip.meta["errors"][0]


def test_engine_clamps_duration_to_max(spark):
    engine = StreamingEngine(spark)
    engine.submit("d", Query(aggregation=Raw(size=10), duration_ms=3_600_000))
    engine.tick()
    rq = engine.registry.queries["d"]
    assert rq.deadline_ms - rq.receive_time_ms == 10_000
