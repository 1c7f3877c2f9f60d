"""Engine configuration with validation — the BulletStormConfig analogue.

The reference validates and clamps its settings at startup
(/root/reference src/main/java/com/yahoo/bullet/storm/BulletStormConfig.java:
154-176 tick minimum, 468-472/580-586 window-minimum cross-field rule;
defaults in src/main/resources/bullet_storm_defaults.yaml). We keep the
same semantic knobs under Spark-appropriate names, the same floors, and the
same cross-field validation; Storm-only resource hints (per-bolt CPU/heap)
map to ordinary Spark executor sizing and are intentionally absent.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# reference defaults (bullet_storm_defaults.yaml:126-148, test_config.yaml:4-5)
TICK_INTERVAL_MS_DEFAULT = 100
TICK_INTERVAL_MS_MIN = 10
PRE_START_DELAY_TICKS_DEFAULT = 2
POST_FINISH_BUFFER_TICKS_DEFAULT = 3
DEFAULT_QUERY_DURATION_MS = 1_000
MAX_QUERY_DURATION_MS = 10_000
RAW_MAX_SIZE_DEFAULT = 100
AGGREGATION_MAX_SIZE_DEFAULT = 500


class ConfigError(ValueError):
    pass


@dataclass
class EngineConfig:
    """Validated engine settings.

    tick_interval_ms: micro-batch trigger = the engine clock
      (bullet.topology.tick.spout.interval.ms, min 10).
    window_min_emit_every_ms: floor for tumbling-window emit periods; the
      reference requires >= tick * (pre_start_delay + 2)
      (BulletStormConfig.java:468-472).
    pre_start_delay_ticks / post_finish_buffer_ticks: kept for parity and
      observability; in the single-engine design there is no cross-bolt
      clock skew or straggler-partial problem, so they act as documented
      no-ops (SURVEY.md §2.5).
    """

    tick_interval_ms: int = TICK_INTERVAL_MS_DEFAULT
    pre_start_delay_ticks: int = PRE_START_DELAY_TICKS_DEFAULT
    post_finish_buffer_ticks: int = POST_FINISH_BUFFER_TICKS_DEFAULT
    default_query_duration_ms: int = DEFAULT_QUERY_DURATION_MS
    max_query_duration_ms: int = MAX_QUERY_DURATION_MS
    raw_max_size: int = RAW_MAX_SIZE_DEFAULT
    aggregation_max_size: int = AGGREGATION_MAX_SIZE_DEFAULT
    rate_limit_records_per_s: int | None = None
    window_disable: bool = False  # bullet.query.window.disable analogue
    window_min_emit_every_ms: int = field(default=0)  # 0 -> derived
    # result metadata (SURVEY.md §2.7): RESULT_METADATA_ENABLE + the
    # concept -> key mapping (JoinBoltTest.java:227-233). Keys here rename
    # the default concept keys in every emitted Clip's meta.
    result_meta_enable: bool = True
    result_meta_keys: dict[str, str] = field(default_factory=dict)
    # in-flight query cap — the DRPC max-uncommitted-messages analogue
    # (bullet_storm_defaults.yaml:220-223, default 50); None = unlimited
    max_concurrent_queries: int | None = None

    def __post_init__(self) -> None:
        if self.tick_interval_ms < TICK_INTERVAL_MS_MIN:
            raise ConfigError(
                f"tick_interval_ms must be >= {TICK_INTERVAL_MS_MIN} "
                f"(got {self.tick_interval_ms})"
            )
        derived_floor = self.tick_interval_ms * (self.pre_start_delay_ticks + 2)
        if self.window_min_emit_every_ms == 0:
            self.window_min_emit_every_ms = derived_floor
        elif self.window_min_emit_every_ms < derived_floor:
            raise ConfigError(
                "window_min_emit_every_ms must be >= tick_interval_ms * "
                f"(pre_start_delay_ticks + 2) = {derived_floor} "
                f"(got {self.window_min_emit_every_ms})"
            )
        if self.default_query_duration_ms > self.max_query_duration_ms:
            raise ConfigError("default duration exceeds max duration")
        if self.raw_max_size <= 0 or self.aggregation_max_size <= 0:
            raise ConfigError("size caps must be positive")

    def validate_query(self, query) -> list[str]:
        """Per-query validation at submission (QueryBolt init-error path,
        JoinBolt.java:261-268). Returns a list of error strings; empty means
        acceptable. Oversized caps are clamped rather than rejected, like
        the reference's aggregation max sizes."""
        from bullet_storm_spark.plans.query import Raw, TumblingWindow

        errors: list[str] = []
        agg = query.aggregation
        if isinstance(agg, Raw) and agg.size > self.raw_max_size:
            agg.size = self.raw_max_size
        elif getattr(agg, "size", None) and agg.size > 10_000_000:
            errors.append(f"aggregation size {agg.size} is unreasonable")
        win = query.window
        if win is not None and self.window_disable:
            errors.append("windowing is disabled by configuration")
        if isinstance(win, TumblingWindow) and (
            win.emit_every_ms < self.window_min_emit_every_ms
        ):
            errors.append(
                f"window emit every {win.emit_every_ms}ms is below the "
                f"minimum {self.window_min_emit_every_ms}ms"
            )
        return errors
