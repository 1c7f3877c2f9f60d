"""The Query model — the engine's logical plan.

Mirrors bullet-core's ``com.yahoo.bullet.query.Query`` as exercised by the
reference (SURVEY.md §1.2, §2.3-§2.5; /root/reference src/test/java/com/
yahoo/bullet/storm/FilterBoltTest.java `QueryUtils.make*Query` helpers at
lines 62-70 and the five aggregation families of §2.4):

    Query{projection, filter, aggregation, window, duration}

plus post-aggregation steps (HAVING / ORDER BY / LIMIT / computed columns /
culling) from bullet-core's public BQL surface — not exercised by the
reference tests but part of its published query language, and needed here to
make otherwise-unordered results deterministic for the DuckDB oracle.

Semantics preserved exactly (proven by reference tests):
* the filter sees RAW field names, never projected names
  (FilterBoltTest.java:349-393) -> filter is applied before projection;
* aggregate outputs use caller-supplied aliases (cnt/sumB/... —
  JoinBoltTest.java:737-786);
* TOP K stringifies group values and renders missing as "null"
  (FilterBoltTest.java:824-831).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from enum import Enum
from typing import Any, Sequence

from bullet_storm_spark.plans.expressions import Expression, ExprLike, ensure_expr


# ---------------------------------------------------------------------------
# Projection
# ---------------------------------------------------------------------------

@dataclass
class Field:
    """One projected output column: Field(outName, expr) —
    FilterBoltTest.java:14,268-285 (rename + nested extraction)."""

    name: str
    expression: Expression


@dataclass
class Projection:
    """fields=None -> pass-through copy projection (whole record out,
    FilterBoltTest.java:306-324)."""

    fields: Sequence[Field] | None = None

    @staticmethod
    def of(**kwargs: ExprLike) -> "Projection":
        return Projection([Field(k, ensure_expr(v)) for k, v in kwargs.items()])


# ---------------------------------------------------------------------------
# Aggregations (the 5 types — SURVEY.md §2.4)
# ---------------------------------------------------------------------------

class Aggregation:
    """Marker base; concrete aggregations below."""

    size: int | None = None


DEFAULT_AGGREGATION_SIZE = 500  # bullet-core AGGREGATION_DEFAULT_SIZE analogue
RAW_AGGREGATION_MAX_SIZE = 100  # reference RAW cap (JoinBoltTest.java:237)


@dataclass
class Raw(Aggregation):
    """Collect at most ``size`` matching projected records; a streaming query
    completes when full (JoinBoltTest.java:340-351,644-660)."""

    size: int = RAW_AGGREGATION_MAX_SIZE


class GroupOpType(str, Enum):
    COUNT = "COUNT"            # COUNT(*)
    COUNT_FIELD = "COUNT_FIELD"  # COUNT(field) — non-null count
    SUM = "SUM"
    MIN = "MIN"
    MAX = "MAX"
    AVG = "AVG"
    # extension beyond bullet-core's enum: population variance/stddev,
    # computed from decimal moment sums so they stay order-independent
    # (exact_decimal) and oracle-checkable
    VAR_POP = "VAR_POP"
    STDDEV_POP = "STDDEV_POP"
    # exact per-group percentile (linear interpolation at rank p*(n-1)) —
    # batch-only: not mergeable from numeric partials, so the streaming
    # engine rejects it at submit (GroupState._SUPPORTED); streaming
    # percentiles go through DISTRIBUTION's mergeable KLL summary instead
    PERCENTILE = "PERCENTILE"


@dataclass
class GroupOperation:
    """GroupOperation(COUNT, null, "cnt") — FilterBoltTest.java:651-676.

    ``exact_decimal``: compute SUM/AVG over DECIMAL(38,6) and cast the result
    to DOUBLE. Decimal accumulation is exact and order-independent, so Spark
    and any SQL oracle produce bit-identical doubles regardless of partial
    -aggregation order — crucial for distributed determinism at scale, not
    just for tests. ``round_to`` optionally rounds the final double.
    """

    op: GroupOpType
    field: str | None
    alias: str
    exact_decimal: bool = False
    round_to: int | None = None
    # oracle-dialect hint for non-exact SUM: DuckDB sums integers into
    # HUGEINT (pin to BIGINT like Spark) but sums floats into DOUBLE —
    # casting a float sum to BIGINT would round. 'float' emits a DOUBLE
    # pin; 'int' (the default, matching the dominant integer-count use)
    # keeps BIGINT. exact_decimal sidesteps the issue entirely.
    field_kind: str = "int"
    # PERCENTILE only: the fraction in [0, 1] (0.5 = median). Keyword-ish
    # tail position so existing positional construction sites are unmoved.
    p: float | None = None


@dataclass
class GroupBy(Aggregation):
    """GROUP BY keyed aggregation with field aliasing
    (JoinBoltTest.java:737-786: fields={"fieldA": "A"}, ops COUNT->cnt,
    SUM(fieldB)->sumB). ``fields`` maps input field -> output alias
    ("" alias means keep the input name, mirroring bullet-core)."""

    fields: dict[str, str] = dc_field(default_factory=dict)
    operations: Sequence[GroupOperation] = ()
    size: int = DEFAULT_AGGREGATION_SIZE

    def alias_of(self, field: str) -> str:
        alias = self.fields.get(field, "")
        return alias if alias else field


def GroupAll(*operations: GroupOperation) -> GroupBy:
    """GROUP ALL == GroupBy with no keys (FilterBoltTest.java:651-676)."""
    return GroupBy(fields={}, operations=list(operations), size=1)


@dataclass
class CountDistinct(Aggregation):
    """COUNT DISTINCT over a field tuple, named output
    (FilterBoltTest.java:680-710: 256 distinct -> exactly 256).

    exact=True  -> COUNT(DISTINCT ...) (Catalyst expand+two-phase agg);
    exact=False -> approx_count_distinct (HLL++, bounded state at any
    cardinality — semantic parity with the reference's Theta sketch)."""

    fields: Sequence[str] = ()
    name: str = "count"
    exact: bool = True
    rsd: float = 0.05


class DistributionType(str, Enum):
    QUANTILE = "QUANTILE"
    PMF = "PMF"
    CDF = "CDF"


@dataclass
class Distribution(Aggregation):
    """DISTRIBUTION over a numeric field (FilterBoltTest.java:740-786):
    QUANTILE -> rows {quantile, value}; PMF -> rows {range, count,
    probability} over (-inf,s0),[s0,s1),...,[sn,+inf) incl. empty bins; CDF
    -> rows {range, count, probability} with ranges (-inf,s_i].

    ``points``: explicit split points (PMF/CDF) or fractions in [0,1]
    (QUANTILE). The reference also supports (start,end,increment) and
    number-of-points forms; helpers below generate the explicit list.
    """

    field: str = ""
    dist_type: DistributionType = DistributionType.QUANTILE
    points: Sequence[float] = ()
    round_to: int | None = 6
    # approx=True: QUANTILE via approx_percentile (bounded quantile-summary
    # state — the KLL-sketch contract; PMF/CDF are already O(k) exact).
    # No exact SQL oracle; the driver records a rows-only check.
    approx: bool = False
    accuracy: int = 10_000

    @staticmethod
    def linspace(start: float, end: float, num: int) -> list[float]:
        if num < 2:
            return [start]
        step = (end - start) / (num - 1)
        return [start + i * step for i in range(num)]


@dataclass
class TopK(Aggregation):
    """TOP K most frequent value-combinations (FilterBoltTest.java:788-832):
    fields maps input->alias ("" keeps name); values stringified with nulls
    rendered "null"; optional min-count ``threshold``
    (JoinBoltTest.java:846-893); count emitted under ``name``; rows ordered
    by count desc. We additionally tie-break by the group values ascending so
    results are fully deterministic under ties (the reference's sketch makes
    no tie guarantee)."""

    size: int = 1
    threshold: int | None = None
    name: str = "count"
    fields: dict[str, str] = dc_field(default_factory=dict)
    # sketch_capacity=None -> exact counts (unbounded key state);
    # an integer m -> SpaceSaving summary with m counters in the streaming
    # engine (bounded state at any cardinality, NO_FALSE_NEGATIVES)
    sketch_capacity: int | None = None

    def alias_of(self, field: str) -> str:
        alias = self.fields.get(field, "")
        return alias if alias else field


# ---------------------------------------------------------------------------
# Post-aggregations (bullet-core BQL surface; also our determinism tool)
# ---------------------------------------------------------------------------

@dataclass
class OrderBy:
    """ORDER BY on output columns. (col, ascending) pairs."""

    keys: Sequence[tuple[str, bool]]


@dataclass
class Having:
    expression: Expression


@dataclass
class Computation:
    """Computed output columns appended after aggregation."""

    fields: Sequence[Field]


@dataclass
class Culling:
    """Drop output columns (bullet-core CULLING post-aggregation)."""

    fields: Sequence[str]


PostAggregation = Any  # OrderBy | Having | Computation | Culling


# ---------------------------------------------------------------------------
# Windows (SURVEY.md §2.5)
# ---------------------------------------------------------------------------

@dataclass
class TumblingWindow:
    """TIME-based window: emit every ``emit_every_ms``
    (JoinBoltTest.java:1288; M/JoinBolt.java:252-259).

    include_all=False -> tumbling: state resets after each emission
    (Querier.reset). include_all=True -> additive: each emission covers
    everything since query start (bullet-core Window include=ALL)."""

    emit_every_ms: int
    include_all: bool = False


@dataclass
class SlidingRecordWindow:
    """RECORD-based window: emit every ``emit_every`` records consumed
    (FilterBoltTest.java:396-411 — RECORD,1 emits per record).
    include_all mirrors TumblingWindow."""

    emit_every: int = 1
    include_all: bool = False


WindowSpec = Any  # TumblingWindow | SlidingRecordWindow | None


# ---------------------------------------------------------------------------
# Query
# ---------------------------------------------------------------------------

DEFAULT_DURATION_MS = 1_000  # test_config.yaml:4
MAX_DURATION_MS = 10_000     # test_config.yaml:5


@dataclass
class Query:
    """The logical plan (SURVEY.md §1.2). ``source`` names the input table
    (the reference is single-stream; named sources are our multi-table
    extension and enable joins downstream)."""

    source: str = "events"
    filter: Expression | None = None
    projection: Projection = dc_field(default_factory=Projection)
    aggregation: Aggregation = dc_field(default_factory=Raw)
    post_aggregations: Sequence[PostAggregation] = ()
    window: WindowSpec = None
    duration_ms: int = DEFAULT_DURATION_MS
