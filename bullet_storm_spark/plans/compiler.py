"""Query compiler: lower a logical Query to (a) a Spark DataFrame
transformation and (b) an equivalent DuckDB SQL oracle string.

The compile pipeline preserves the reference's operator order exactly
(SURVEY.md §3.2; /root/reference src/main/java/com/yahoo/bullet/storm/
FilterBolt.java:148-151 — consume = filter -> project -> aggregate):

    base = project(filter(source))        # filter sees RAW names only
    out  = aggregation(base)              # one of the 5 §2.4 families
    out  = post_aggregations(out)         # having/compute/cull/order/limit

Both programs are generated from the same Query object, so the driver's
Spark-vs-DuckDB comparison is comparing one semantics rendered twice.

Everything stays declarative: the Spark side builds Column expressions only
(no UDFs), so Catalyst pushes filters into the parquet scan, prunes columns,
and plans two-phase aggregation on its own. ``explain()`` on any compiled
query shows PushedFilters + WholeStageCodegen end-to-end.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from bullet_storm_spark.operators import (
    count_distinct as _count_distinct,
    distribution as _distribution,
    group as _group,
    raw as _raw,
    top_k as _top_k,
)
from bullet_storm_spark.plans.expressions import Dialect
from bullet_storm_spark.plans.query import (
    CountDistinct,
    Distribution,
    GroupBy,
    Query,
    Raw,
    TopK,
)

PlanFn = Callable[[DataFrame], DataFrame]


def _apply_base(df: DataFrame, query: Query) -> DataFrame:
    """Filter (on raw names — FilterBoltTest.java:349-393) then project."""
    if query.filter is not None:
        df = df.where(query.filter.to_column())
    if query.projection.fields is not None:
        df = df.select(
            *[f.expression.to_column().alias(f.name) for f in query.projection.fields]
        )
    return df


def _base_sql(query: Query, table: str) -> str:
    where = (
        f" WHERE {query.filter.to_sql(Dialect.DUCKDB)}" if query.filter is not None else ""
    )
    if query.projection.fields is not None:
        cols = ", ".join(
            f"{f.expression.to_sql(Dialect.DUCKDB)} AS {f.name}"
            for f in query.projection.fields
        )
    else:
        cols = "*"
    return f"SELECT {cols} FROM {table}{where}"


_DISPATCH = {
    Raw: _raw,
    GroupBy: _group,
    CountDistinct: _count_distinct,
    Distribution: _distribution,
    TopK: _top_k,
}


def _operator_module(query: Query):
    for cls, mod in _DISPATCH.items():
        if isinstance(query.aggregation, cls):
            return mod
    raise ValueError(f"unsupported aggregation {type(query.aggregation).__name__}")


def compile_query(query: Query) -> PlanFn:
    """Query -> DataFrame transformation (batch mode; the streaming engine
    reuses the same compiled plan per micro-batch)."""
    mod = _operator_module(query)

    def plan(df: DataFrame) -> DataFrame:
        return mod.apply(_apply_base(df, query), query.aggregation, query.post_aggregations)

    return plan


def oracle_sql_for(query: Query, table: str | None = None) -> str:
    """Query -> DuckDB SQL producing the same rows/columns as compile_query.

    Raises ValueError for aggregations with no exact SQL equivalent
    (approximate COUNT DISTINCT) — callers should then omit the oracle entry
    and accept the driver's rows-only check.
    """
    mod = _operator_module(query)
    return mod.sql(
        query.aggregation, _base_sql(query, table or query.source), query.post_aggregations
    )
