"""Query-predicate partitioner — the QueryManager.categorize analogue.

The reference indexes live queries by simple equality predicates so each
record is only tested against plausibly-matching queries
(/root/reference src/main/java/com/yahoo/bullet/storm/FilterBolt.java:
71,148-155; bullet.query.partitioner.enable / SimpleEqualityPartitioner in
bullet_storm_defaults.yaml:121-124 via bullet-core).

Spark translation: per micro-batch (not per record — the batch is the unit
of work), compute the distinct values of every equality-filtered field ONCE
across all live queries, then skip the per-query Spark jobs whose equality
constant is absent from the batch. With N selective standing queries this
turns N batch scans into 1 stats scan + the few matching scans.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F

import re

from bullet_storm_spark.plans.expressions import (
    BinaryExpression,
    Expression,
    FieldExpression,
    NAryExpression,
    Operation,
    SqlExpression,
    ValueExpression,
)

# cap on distinct values collected per field; fields with more are treated
# as unprunable for the batch (stats stay bounded no matter the data)
MAX_DISTINCT_PER_FIELD = 10_000


def equality_constraints(expr: Expression | None) -> dict[str, Any]:
    """Extract field -> literal for top-level AND-connected equality
    predicates on plain fields (the 'simple equality' class the reference
    partitions on). Anything else contributes no constraint."""
    out: dict[str, Any] = {}
    if expr is None:
        return out

    def walk(e: Expression) -> None:
        if isinstance(e, NAryExpression) and e.op == Operation.AND:
            for o in e.operands:
                walk(o)
        elif isinstance(e, SqlExpression):
            # BQL filters arrive as raw SQL strings; harvest equality
            # conjuncts conservatively (bail on OR/parens/NOT — any
            # matched conjunct is still a valid constraint under AND)
            out.update(_sql_equality_constraints(e.sql))
        elif isinstance(e, BinaryExpression) and e.op == Operation.EQUALS:
            l, r = e.left, e.right
            if (
                isinstance(l, FieldExpression)
                and l.subfield is None
                and isinstance(r, ValueExpression)
            ):
                out[l.field] = r.value
            elif (
                isinstance(r, FieldExpression)
                and r.subfield is None
                and isinstance(l, ValueExpression)
            ):
                out[r.field] = l.value

    walk(expr)
    return out


_EQ_CLAUSE = re.compile(r"^\s*(\w+)\s*=\s*(?:'([^']*)'|(-?\d+))\s*$")


def _sql_equality_constraints(sql: str) -> dict[str, Any]:
    if re.search(r"\bOR\b|\bNOT\b|[()]", sql, re.IGNORECASE):
        return {}
    found: dict[str, Any] = {}
    for clause in re.split(r"\bAND\b", sql, flags=re.IGNORECASE):
        m = _EQ_CLAUSE.match(clause)
        if m:
            field, s, num = m.groups()
            found[field] = s if s is not None else int(num)
    return found


class BatchPartitioner:
    """Per-batch pruning decisions for a set of running queries."""

    def __init__(self, running_queries) -> None:
        self.constraints = {
            rq.id: equality_constraints(rq.query.filter) for rq in running_queries
        }
        self.fields = sorted(
            {f for cons in self.constraints.values() for f in cons}
        )

    def batch_values(self, batch_df: DataFrame) -> dict[str, set | None]:
        """One stats job: distinct values per constrained field present in
        the batch (None = unprunable for that field: over cap or missing)."""
        present = [f for f in self.fields if f in batch_df.columns]
        if not present:
            return {}
        aggs = [
            F.slice(F.collect_set(F.col(f)), 1, MAX_DISTINCT_PER_FIELD + 1).alias(f)
            for f in present
        ]
        row = batch_df.agg(*aggs).collect()[0]
        out: dict[str, set | None] = {}
        for f in present:
            vals = row[f]
            out[f] = None if len(vals) > MAX_DISTINCT_PER_FIELD else set(vals)
        return out

    def should_scan(self, query_id: str, values: dict[str, set | None]) -> bool:
        """False only when some equality constraint provably cannot match
        the batch (constraint value absent from the field's distinct set)."""
        for field, want in self.constraints.get(query_id, {}).items():
            have = values.get(field)
            if have is not None and want not in have:
                return False
        return True
