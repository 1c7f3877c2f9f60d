"""Bounded-state sketches.

SpaceSaving (Metwally et al., "Efficient computation of frequent and top-k
elements in data streams", ICDT 2005) provides the reference's
frequent-items contract (SURVEY.md §2.4 TOP K: NO_FALSE_NEGATIVES — every
item with true count > n/m survives, estimates carry a per-item error
bound) with m counters of state regardless of key cardinality.

Used two ways:
* batch: per-partition sketches via mapInPandas, merged on the driver —
  the partial/final shape with O(partitions x m) driver work;
* streaming: TopK(sketch_capacity=m) swaps the exact unbounded dict in
  streaming.state.TopKState for a SpaceSaving sketch.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame, functions as F


class SpaceSavingSketch:
    """m-counter space-saving summary. offer() is O(1) amortized (min
    tracked lazily); merge implements the standard summary merge: union
    estimates, take top m, inherit error bounds."""

    def __init__(self, capacity: int):
        if capacity <= 0:
            raise ValueError("capacity must be positive")
        self.capacity = capacity
        self.counts: dict[Any, int] = {}
        self.errors: dict[Any, int] = {}

    def offer(self, key: Any, count: int = 1) -> None:
        if key in self.counts:
            self.counts[key] += count
            return
        if len(self.counts) < self.capacity:
            self.counts[key] = count
            self.errors[key] = 0
            return
        victim = min(self.counts, key=lambda k: self.counts[k])
        floor = self.counts.pop(victim)
        self.errors.pop(victim)
        self.counts[key] = floor + count
        self.errors[key] = floor

    def merge(self, other: "SpaceSavingSketch") -> None:
        for key, cnt in other.counts.items():
            err = other.errors[key]
            if key in self.counts:
                self.counts[key] += cnt
                self.errors[key] += err
            else:
                self.counts[key] = cnt
                self.errors[key] = err
        if len(self.counts) > self.capacity:
            keep = sorted(self.counts, key=lambda k: -self.counts[k])[: self.capacity]
            dropped_floor = max(
                self.counts[k] for k in self.counts if k not in set(keep)
            )
            new_counts, new_errors = {}, {}
            for k in keep:
                new_counts[k] = self.counts[k]
                new_errors[k] = self.errors[k]
            self.counts, self.errors = new_counts, new_errors
            # dropped keys may reappear later with up to dropped_floor
            # uncounted occurrences; track as the summary's base error
            self._base_error = max(getattr(self, "_base_error", 0), dropped_floor)

    def top(self, k: int, threshold: int | None = None) -> list[tuple[Any, int, int]]:
        """[(key, estimate, max_error)] by estimate desc then key asc.
        estimate >= true count always (no false negatives); true count >=
        estimate - max_error."""
        items = sorted(self.counts.items(), key=lambda kv: (-kv[1], str(kv[0])))
        out = []
        for key, est in items[:k]:
            if threshold is not None and est < threshold:
                continue
            out.append((key, est, self.errors[key]))
        return out


def top_k_sketch(
    df: DataFrame,
    fields: dict[str, str],
    k: int,
    name: str = "count",
    capacity: int = 4096,
    threshold: int | None = None,
) -> DataFrame:
    """Bounded-memory TOP K over arbitrary key cardinality: per-partition
    SpaceSaving sketches (Arrow batches), merged on the driver. Output
    matches the exact operator's shape plus an ``{name}_error`` bound
    column (0 error == exact; the reference surfaces the same concept via
    its sketch metadata)."""
    import pandas as pd

    from bullet_storm_spark.operators.top_k import NULL_RENDERING

    aliases = [alias if alias else f for f, alias in fields.items()]
    keyed = df.select(
        *[
            F.coalesce(F.col(f).cast("string"), F.lit(NULL_RENDERING)).alias(
                alias if alias else f
            )
            for f, alias in fields.items()
        ]
    )

    # NOTE: the closure must be self-contained — cloudpickle serializes
    # module-level classes (SpaceSavingSketch) by reference, which breaks on
    # workers that can't import this package (e.g. a driver-owned session
    # launched from another directory). Nested functions pickle by value.
    cap = capacity

    def partition_sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        errors: dict = {}

        def offer(key, cnt):
            if key in counts:
                counts[key] += cnt
                return
            if len(counts) < cap:
                counts[key] = cnt
                errors[key] = 0
                return
            victim = min(counts, key=lambda k: counts[k])
            floor = counts.pop(victim)
            errors.pop(victim)
            counts[key] = floor + cnt
            errors[key] = floor

        for pdf in batches:
            for key, cnt in pdf.groupby(aliases, dropna=False).size().items():
                offer(key if isinstance(key, tuple) else (key,), int(cnt))
        items = sorted(counts.items(), key=lambda kv: (-kv[1], str(kv[0])))
        rows = [list(key) + [est, errors[key]] for key, est in items]
        yield pd.DataFrame(rows, columns=aliases + ["__est", "__err"])

    schema = (
        ", ".join(f"`{a}` string" for a in aliases) + ", __est long, __err long"
    )
    partials = keyed.mapInPandas(partition_sketch, schema).collect()
    merged = SpaceSavingSketch(capacity)
    for row in partials:
        key = tuple(row[a] for a in aliases)
        if key in merged.counts:
            merged.counts[key] += row["__est"]
            merged.errors[key] += row["__err"]
        else:
            merged.counts[key] = row["__est"]
            merged.errors[key] = row["__err"]
    out_rows = [
        dict(zip(aliases, key)) | {name: est, f"{name}_error": err}
        for key, est, err in merged.top(k, threshold)
    ]
    spark = df.sparkSession
    out_schema = (
        ", ".join(f"`{a}` string" for a in aliases)
        + f", `{name}` long, `{name}_error` long"
    )
    return spark.createDataFrame(out_rows, out_schema)
