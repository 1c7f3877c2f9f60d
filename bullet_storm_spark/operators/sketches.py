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
    tracked lazily).

    ``_base_error`` is the summary's floor for ABSENT keys: an upper bound
    on the true count any key not currently tracked may have accumulated
    (from evictions, merge truncation, or absence from one side of a
    merge). Every (re-)inserted key inherits it, and merge() adds the
    counterpart's floor for one-sided keys, so the documented guarantees
    hold through arbitrary merge trees: estimate >= true count (no false
    negatives) and true count >= estimate - max_error."""

    def __init__(self, capacity: int):
        if capacity <= 0:
            raise ValueError("capacity must be positive")
        self.capacity = capacity
        self.counts: dict[Any, int] = {}
        self.errors: dict[Any, int] = {}
        self._base_error = 0

    def offer(self, key: Any, count: int = 1) -> None:
        if key in self.counts:
            self.counts[key] += count
            return
        if len(self.counts) < self.capacity:
            self.counts[key] = self._base_error + count
            self.errors[key] = self._base_error
            return
        victim = min(self.counts, key=lambda k: self.counts[k])
        floor = max(self.counts.pop(victim), self._base_error)
        self.errors.pop(victim)
        self.counts[key] = floor + count
        self.errors[key] = floor

    def merge(self, other: "SpaceSavingSketch") -> None:
        """Standard mergeable-summary union: for each key in either side,
        the side missing it contributes its absent-key floor to both the
        estimate and the error bound; then truncate to capacity, folding
        the largest truncated estimate into the new absent-key floor."""
        sb, ob = self._base_error, other._base_error
        new_counts: dict[Any, int] = {}
        new_errors: dict[Any, int] = {}
        for key in self.counts.keys() | other.counts.keys():
            c1, c2 = self.counts.get(key), other.counts.get(key)
            new_counts[key] = (c1 if c1 is not None else sb) + (
                c2 if c2 is not None else ob
            )
            new_errors[key] = (self.errors[key] if c1 is not None else sb) + (
                other.errors[key] if c2 is not None else ob
            )
        base = sb + ob  # a key absent from both may have up to sb+ob mass
        if len(new_counts) > self.capacity:
            keep = sorted(new_counts, key=lambda k: -new_counts[k])[: self.capacity]
            dropped_floor = max(
                new_counts[k] for k in new_counts if k not in set(keep)
            )
            base = max(base, dropped_floor)
            new_counts = {k: new_counts[k] for k in keep}
            new_errors = {k: new_errors[k] for k in keep}
        self.counts, self.errors = new_counts, new_errors
        self._base_error = base

    def top(self, k: int, threshold: int | None = None) -> list[tuple[Any, int, int]]:
        """[(key, estimate, max_error)] by estimate desc then key asc
        (element-wise tuple order — matches the exact operator's ORDER BY
        count DESC, aliases ASC). Threshold filters BEFORE the k cut, like
        the exact operator's HAVING. estimate >= true count always (no
        false negatives); true count >= estimate - max_error."""
        items = sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out = []
        for key, est in items:
            if threshold is not None and est < threshold:
                continue
            out.append((key, est, self.errors[key]))
            if len(out) >= k:
                break
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
        # the partition's absent-key floor: when the sketch is full, any
        # untracked key's true count <= min tracked estimate (SpaceSaving
        # invariant); rigorous driver-side merging needs it per partition
        base = min(counts.values()) if len(counts) >= cap else 0
        from pyspark import TaskContext

        part = TaskContext.get().partitionId() if TaskContext.get() else -1
        rows = [
            list(key) + [est, errors[key], base, part] for key, est in items
        ]
        yield pd.DataFrame(
            rows, columns=aliases + ["__est", "__err", "__base", "__part"]
        )

    schema = (
        ", ".join(f"`{a}` string" for a in aliases)
        + ", __est long, __err long, __base long, __part int"
    )
    partials = keyed.mapInPandas(partition_sketch, schema).collect()
    by_part: dict[int, list] = {}
    for row in partials:
        by_part.setdefault(row["__part"], []).append(row)
    merged = SpaceSavingSketch(capacity)
    for rows in by_part.values():
        partial = SpaceSavingSketch(capacity)
        for row in rows:
            key = tuple(row[a] for a in aliases)
            partial.counts[key] = row["__est"]
            partial.errors[key] = row["__err"]
            partial._base_error = row["__base"]
        merged.merge(partial)
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
