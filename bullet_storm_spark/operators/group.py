"""GROUP ALL / GROUP BY aggregation.

Reference semantics (SURVEY.md §2.4): global or keyed aggregates COUNT /
COUNT(field) / SUM / MIN / MAX / AVG with caller aliases
(/root/reference src/test/java/com/yahoo/bullet/storm/FilterBoltTest.java:
651-676 GROUP ALL count; JoinBoltTest.java:737-786 GROUP BY {"fieldA":"A"}
with COUNT->cnt, SUM(fieldB)->sumB, 16 groups exact; partial-merge
associativity JoinBoltTest.java:663-693).

Spark lowering: plain ``groupBy().agg()`` — Catalyst already produces the
reference's partial->final two-phase plan (HashAggregate partial on the scan
side, exchange on the group keys, HashAggregate final), with map-side
combine so only one pre-aggregated row per key per partition crosses the
shuffle. That is exactly the FilterBolt(partial)->JoinBolt(merge) dataflow,
but with codegen and spill.

Determinism at scale: SUM/AVG over doubles depends on combine order; with
``exact_decimal`` the accumulator is DECIMAL(38,6) (exact, order-independent)
cast back to DOUBLE, so a 1000-executor run and the single-threaded oracle
produce bit-identical results.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from bullet_storm_spark.operators.common import apply_post, post_sql
from bullet_storm_spark.plans.query import (
    GroupBy,
    GroupOperation,
    GroupOpType,
    PostAggregation,
)

_DECIMAL = "decimal(38,6)"


def _agg_column(op: GroupOperation) -> Column:
    f = F.col(op.field) if op.field else None
    t = op.op
    if t == GroupOpType.COUNT:
        col = F.count(F.lit(1))
    elif t == GroupOpType.COUNT_FIELD:
        col = F.count(f)
    elif t == GroupOpType.SUM:
        col = (
            F.sum(f.cast(_DECIMAL)).cast("double") if op.exact_decimal else F.sum(f)
        )
    elif t == GroupOpType.MIN:
        col = F.min(f)
    elif t == GroupOpType.MAX:
        col = F.max(f)
    elif t == GroupOpType.AVG:
        col = (
            (F.sum(f.cast(_DECIMAL)).cast("double") / F.count(f))
            if op.exact_decimal
            else F.avg(f)
        )
    elif t in (GroupOpType.VAR_POP, GroupOpType.STDDEV_POP):
        if op.exact_decimal:
            # E[x^2] - E[x]^2 from exact decimal moment sums: identical
            # doubles regardless of combine order or engine
            n = F.count(f)
            s1 = F.sum(f.cast(_DECIMAL)).cast("double")
            s2 = F.sum((f * f).cast(_DECIMAL)).cast("double")
            col = (s2 - s1 * s1 / n) / n
        else:
            col = F.var_pop(f)
        if t == GroupOpType.STDDEV_POP:
            col = F.sqrt(col) if op.exact_decimal else F.stddev_pop(f)
    elif t == GroupOpType.PERCENTILE:
        if op.p is None or not (0.0 <= op.p <= 1.0):
            raise ValueError(f"PERCENTILE needs p in [0,1], got {op.p}")
        # exact percentile, linear interpolation at rank p*(n-1) — the
        # same definition as the DuckDB twin's quantile_cont. Batch-only
        # (GroupState rejects it for streaming; use DISTRIBUTION there).
        col = F.percentile(f.cast("double"), F.lit(op.p))
    else:  # pragma: no cover
        raise ValueError(f"unsupported group op {t}")
    if op.round_to is not None:
        col = F.round(col, op.round_to)
    return col.alias(op.alias)


def _agg_sql(op: GroupOperation) -> str:
    t = op.op
    if t == GroupOpType.COUNT:
        body = "COUNT(*)"
    elif t == GroupOpType.COUNT_FIELD:
        body = f"COUNT({op.field})"
    elif t == GroupOpType.SUM:
        if op.exact_decimal:
            body = f"CAST(SUM(CAST({op.field} AS DECIMAL(38,6))) AS DOUBLE)"
        elif op.field_kind == "float":
            # DuckDB SUM(float) is DOUBLE already; the pin documents intent
            # (a BIGINT pin here would ROUND — Spark returns the double)
            body = f"CAST(SUM({op.field}) AS DOUBLE)"
        else:
            # DuckDB sums integers into HUGEINT; pin to BIGINT like Spark
            body = f"CAST(SUM({op.field}) AS BIGINT)"
    elif t == GroupOpType.MIN:
        body = f"MIN({op.field})"
    elif t == GroupOpType.MAX:
        body = f"MAX({op.field})"
    elif t == GroupOpType.AVG:
        body = (
            f"(CAST(SUM(CAST({op.field} AS DECIMAL(38,6))) AS DOUBLE)"
            f" / COUNT({op.field}))"
            if op.exact_decimal
            else f"AVG({op.field})"
        )
    elif t in (GroupOpType.VAR_POP, GroupOpType.STDDEV_POP):
        if op.exact_decimal:
            n = f"COUNT({op.field})"
            s1 = f"CAST(SUM(CAST({op.field} AS DECIMAL(38,6))) AS DOUBLE)"
            s2 = (
                f"CAST(SUM(CAST({op.field} * {op.field} AS DECIMAL(38,6)))"
                f" AS DOUBLE)"
            )
            body = f"(({s2} - {s1} * {s1} / {n}) / {n})"
            if t == GroupOpType.STDDEV_POP:
                body = f"sqrt{body}"
        else:
            fn = "var_pop" if t == GroupOpType.VAR_POP else "stddev_pop"
            body = f"{fn}({op.field})"
    elif t == GroupOpType.PERCENTILE:
        if op.p is None or not (0.0 <= op.p <= 1.0):
            raise ValueError(f"PERCENTILE needs p in [0,1], got {op.p}")
        body = f"quantile_cont(CAST({op.field} AS DOUBLE), {op.p!r})"
    else:  # pragma: no cover
        raise ValueError(f"unsupported group op {t}")
    if op.round_to is not None:
        body = f"CASE WHEN ABS({body}) >= 1e16 THEN CAST(({body}) AS DOUBLE) ELSE CAST(CAST(CAST(CAST(({body}) * CAST(ABS({body}) >= POWER(10.0, -({op.round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{op.round_to})) AS VARCHAR) AS DOUBLE) END"
    return f"{body} AS {op.alias}"


def apply(df: DataFrame, agg: GroupBy, post: Sequence[PostAggregation]) -> DataFrame:
    keys = [F.col(f).alias(agg.alias_of(f)) for f in agg.fields]
    aggs = [_agg_column(op) for op in agg.operations]
    if keys and not aggs:
        # metric-less GROUP BY == DISTINCT over the keys (bullet-bql
        # SELECT DISTINCT); same hash-aggregate plan, no metric columns
        out = df.select(*keys).distinct()
        limit = agg.size
    elif keys:
        out = df.groupBy(*keys).agg(*aggs)
        limit = agg.size
    else:
        out = df.agg(*aggs)  # GROUP ALL: single row even on empty input
        limit = None
    return apply_post(out, post, limit)


def sql(agg: GroupBy, base_sql: str, post: Sequence[PostAggregation]) -> str:
    key_exprs = [f"{f} AS {agg.alias_of(f)}" for f in agg.fields]
    agg_exprs = [_agg_sql(op) for op in agg.operations]
    select = ", ".join(key_exprs + agg_exprs)
    inner = f"SELECT {select} FROM ({base_sql})"
    limit = None
    if agg.fields:
        aliases = ", ".join(agg.alias_of(f) for f in agg.fields)
        inner += f" GROUP BY {aliases}"
        limit = agg.size
    return post_sql(inner, post, limit)
