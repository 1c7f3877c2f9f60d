"""Shared helpers for operator lowerings: post-aggregation application and
SQL assembly used by every aggregation type."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from bullet_storm_spark.plans.expressions import Dialect
from bullet_storm_spark.plans.query import (
    Computation,
    Culling,
    Having,
    OrderBy,
    PostAggregation,
)


def split_post(post: Sequence[PostAggregation]):
    """Post-aggregations are applied in a fixed order:
    HAVING -> COMPUTATION -> CULLING -> ORDER BY (then the aggregation's own
    size cap). bullet-core applies its post-aggregation list in submission
    order; the fixed order covers every combination its BQL can produce and
    keeps the SQL oracle assembly simple."""
    having = [p for p in post if isinstance(p, Having)]
    comp = [p for p in post if isinstance(p, Computation)]
    cull = [p for p in post if isinstance(p, Culling)]
    order = [p for p in post if isinstance(p, OrderBy)]
    return having, comp, cull, order


def apply_post(df: DataFrame, post: Sequence[PostAggregation], limit: int | None) -> DataFrame:
    having, comp, cull, order = split_post(post)
    for h in having:
        df = df.where(h.expression.to_column())
    for c in comp:
        for f in c.fields:
            df = df.withColumn(f.name, f.expression.to_column())
    for c in cull:
        df = df.drop(*c.fields)
    for o in order:
        cols = [
            F.col(name).asc() if asc else F.col(name).desc() for name, asc in o.keys
        ]
        df = df.orderBy(*cols)
    if limit is not None:
        df = df.limit(limit)
    return df


def post_sql(inner: str, post: Sequence[PostAggregation], limit: int | None) -> str:
    """Wrap ``inner`` SQL with the post-aggregation steps (DuckDB dialect).

    Null ordering is pinned to Spark's defaults (ASC -> NULLS FIRST,
    DESC -> NULLS LAST) so LIMIT truncation agrees between engines.
    """
    having, comp, cull, order = split_post(post)
    sql = inner
    for h in having:
        sql = f"SELECT * FROM ({sql}) WHERE {h.expression.to_sql(Dialect.DUCKDB)}"
    for c in comp:
        exprs = ", ".join(
            f"{f.expression.to_sql(Dialect.DUCKDB)} AS {f.name}" for f in c.fields
        )
        sql = f"SELECT *, {exprs} FROM ({sql})"
    for c in cull:
        cols = ", ".join(c.fields)
        sql = f"SELECT * EXCLUDE ({cols}) FROM ({sql})"
    order_clause = ""
    if order:
        keys = []
        for name, asc in order[-1].keys:
            keys.append(f"{name} ASC NULLS FIRST" if asc else f"{name} DESC NULLS LAST")
        order_clause = " ORDER BY " + ", ".join(keys)
    limit_clause = f" LIMIT {limit}" if limit is not None else ""
    if order_clause or limit_clause:
        sql = f"SELECT * FROM ({sql}){order_clause}{limit_clause}"
    return sql


_HUB_MIN_BYTES_ENV = "SPARK_GRAFT_HUB_MIN_BYTES"


def hub_min_bytes() -> int:
    import os

    return int(os.environ.get(_HUB_MIN_BYTES_ENV, str(32 << 20)))


def hub_checkpoint(df: DataFrame, src: DataFrame) -> DataFrame:
    """Size-gated multi-consumer hub materialization (guide §3.3).

    An eager ``localCheckpoint`` replaces N re-runs of the hub's lineage
    with one — the right trade when each re-run re-scans a large source.
    But the checkpoint itself costs a fixed extra job (driver latency +
    hub serialization + a pipeline barrier: consumers wait for full
    materialization), which at small-source scale exceeds the duplicate
    lineage it saves (measured r11 at sf0.1: events_acf 0.52 s
    re-deriving the hourly cells twice vs 0.86 s checkpointing them;
    text_kn_doc_score 1.67 vs 2.26). Gate on the SOURCE's optimizer size
    estimate — the thing each extra lineage run would re-scan — with the
    same posture as functions.vectors.prefer_fixed: below the threshold
    return the frame unmaterialized (the optimizer re-derives it, r10
    behavior), above it checkpoint. Sites whose hub wins at ANY scale
    (measured: the session-basket and kn-bigram hubs) keep an
    unconditional localCheckpoint instead of this gate."""
    try:
        size = int(
            src._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # pragma: no cover - stats unavailable -> big
        size = 1 << 62
    if size >= hub_min_bytes():
        return df.localCheckpoint()
    return df


def fmt_point(x: float) -> str:
    """Canonical split-point rendering for DISTRIBUTION range labels,
    identical in both generated programs ('0.0', '50.0', ...)."""
    return repr(float(x))


_US_PER_HOUR = 3_600_000_000


def hourly_cells(df: DataFrame, key_col: str) -> DataFrame:
    """(__key, hour, cnt): per-key hourly event counts DENSIFIED onto
    the key's min..max hour spine (zero hours materialized) — the
    shared first stage of every span-bounded series operator (EWMA,
    changepoint, Theil-Sen, Mann-Kendall, Holt, forecast backtests).
    One corpus collapse; everything downstream is calendar-bounded.
    The spine carries the key's first hour as ``__h0`` so consumers
    needing a relative axis don't re-aggregate."""
    observed = (
        df.select(
            F.col(key_col).alias("__key"),
            # integer div end-to-end (matches the DuckDB twin's `//` and
            # the intervals/forecast convention); double division is only
            # coincidentally exact for current-era epoch-µs magnitudes
            F.expr(f"(ts_ns div 1000) div {_US_PER_HOUR}").alias("hour"),
        )
        .groupBy("__key", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    # the observed cells feed TWO consumers (the min/max spine and the
    # densifying join) — materialize the keys × hours frame once so every
    # series operator's event collapse runs once, not twice (guide §3.3;
    # this is the shared first stage of the whole EWMA/changepoint/
    # Theil-Sen/Holt/forecast family). Size-gated: below hub_min_bytes
    # the checkpoint job costs more than the second collapse (measured
    # events_acf 0.52 s ungated-small vs 0.86 s checkpointed at sf0.1).
    observed = hub_checkpoint(observed, df)
    spine = (
        observed.groupBy("__key")
        .agg(F.min("hour").alias("__h0"), F.max("hour").alias("__h1"))
        .select(
            "__key",
            "__h0",
            F.explode(F.sequence("__h0", "__h1")).alias("hour"),
        )
    )
    return spine.join(observed, ["__key", "hour"], "left").select(
        "__key",
        "__h0",
        "hour",
        F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"),
    )


def hourly_cells_sql(table: str, key_col: str) -> str:
    """DuckDB twin of hourly_cells: emits CTEs __obs/__spine/__cells;
    consumers SELECT from __cells (key, h0, hour, cnt)."""
    return f"""__obs AS (
  SELECT {key_col} AS key, epoch_us(ts) // {_US_PER_HOUR} AS hour,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM {table} GROUP BY key, hour
),
__spine AS (
  SELECT o.key, o.h0, UNNEST(range(o.h0, o.h1 + 1)) AS hour
  FROM (SELECT key, MIN(hour) AS h0, MAX(hour) AS h1
        FROM __obs GROUP BY key) o
),
__cells AS (
  SELECT s.key, s.h0, s.hour, CAST(COALESCE(o.cnt, 0) AS BIGINT) AS cnt
  FROM __spine s LEFT JOIN __obs o ON s.key = o.key AND s.hour = o.hour
)"""
