"""Bounded-state sketches.

SpaceSaving (Metwally et al., "Efficient computation of frequent and top-k
elements in data streams", ICDT 2005) provides the reference's
frequent-items contract (SURVEY.md §2.4 TOP K: NO_FALSE_NEGATIVES — every
item with true count > n/m survives, estimates carry a per-item error
bound) with m counters of state regardless of key cardinality.

KLLSummary provides the reference's QuantileSketch contract (SURVEY.md
§2.4 DISTRIBUTION): a mergeable, bounded quantile summary in the
MRL/KLL compactor family (Manku-Rajagopalan-Lindsay SIGMOD'98; Karnin-
Lang-Liberty FOCS'16) — exact while everything fits one compactor,
rank-approximate beyond, associative under merge like the reference's
sketch union (JoinBoltTest.java:696-735).

Used two ways:
* batch: per-partition sketches via mapInPandas, merged on the driver —
  the partial/final shape with O(partitions x m) driver work;
* streaming: TopK(sketch_capacity=m) swaps the exact unbounded dict in
  streaming.state.TopKState for a SpaceSaving sketch; DISTRIBUTION
  QUANTILE state IS a KLLSummary merged from per-partition summaries.
"""

from __future__ import annotations

import math
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


def _fold_schedule(nparts: int, fanin: int) -> list[int]:
    """Partition counts for each tree-fold level: divide by ``fanin``
    (ceiling) until at most ``fanin`` partitions remain. Empty when the
    scan already fits — each listed level merges <= ~fanin sketches per
    task and the final count bounds the driver collect at
    fanin x capacity rows."""
    if fanin < 2:
        raise ValueError("fanin must be >= 2 (or None for a flat collect)")
    out = []
    while nparts > fanin:
        nparts = -(-nparts // fanin)
        out.append(nparts)
    return out


def top_k_sketch(
    df: DataFrame,
    fields: dict[str, str],
    k: int,
    name: str = "count",
    capacity: int = 4096,
    threshold: int | None = None,
    fanin: int = 64,
) -> DataFrame:
    """Bounded-memory TOP K over arbitrary key cardinality: per-partition
    SpaceSaving sketches (Arrow batches), tree-merged. Output matches the
    exact operator's shape plus an ``{name}_error`` bound column (0 error
    == exact; the reference surfaces the same concept via its sketch
    metadata).

    Driver intake is O(fanin × capacity) regardless of input partition
    count: when the scan has more than ``fanin`` partitions, one
    intermediate re-sketch level (keyed ``__part % fanin``) merges
    partition partials worker-side before the driver merge — at 10⁵
    scan partitions a flat collect would be partitions × capacity rows
    on the driver (VERDICT r8 item 6). Each level preserves the
    absent-key floor (``__base``) so the SpaceSaving guarantees —
    estimate ≥ true count, true ≥ estimate − max_error — hold through
    the whole merge tree."""
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
    partial_df = keyed.mapInPandas(partition_sketch, schema)

    def merge_level(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one fan-in group: merge its source-partition sketches into ONE
        # partial, emitting the same row shape so the driver merge below
        # is level-agnostic. Self-contained for the same cloudpickle
        # reason as partition_sketch. Merge math mirrors
        # SpaceSavingSketch.merge: one-sided keys take the counterpart's
        # absent-key floor; truncation folds the largest dropped estimate
        # into the group floor. Deterministic: source partials merge in
        # ascending __part order, truncation ties break on key text.
        frames = [pdf for pdf in batches if len(pdf)]
        cols = aliases + ["__est", "__err", "__base", "__part"]
        if not frames:
            yield pd.DataFrame(columns=cols)
            return
        allrows = pd.concat(frames, ignore_index=True)
        counts: dict = {}
        errors: dict = {}
        base = 0
        first = True
        for part in sorted(allrows["__part"].unique()):
            grp = allrows[allrows["__part"] == part]
            ob = int(grp["__base"].iloc[0]) if len(grp) else 0
            # vectorized column pull, not iterrows: the fan-in task walks
            # fanin x capacity rows per group and pandas row iteration
            # would dominate the level it exists to parallelize (ADVICE r9)
            oc = {
                kk: (int(c), int(e))
                for kk, c, e in zip(
                    zip(*(grp[a].tolist() for a in aliases)),
                    grp["__est"].tolist(),
                    grp["__err"].tolist(),
                )
            }
            if first:
                counts = {kk: c for kk, (c, _) in oc.items()}
                errors = {kk: e for kk, (_, e) in oc.items()}
                base, first = ob, False
                continue
            merged_c: dict = {}
            merged_e: dict = {}
            for kk in counts.keys() | oc.keys():
                c1 = counts.get(kk)
                c2 = oc.get(kk, (None, None))[0]
                merged_c[kk] = (c1 if c1 is not None else base) + (
                    c2 if c2 is not None else ob
                )
                merged_e[kk] = (errors[kk] if c1 is not None else base) + (
                    oc[kk][1] if c2 is not None else ob
                )
            base = base + ob
            if len(merged_c) > cap:
                keep = sorted(
                    merged_c, key=lambda x: (-merged_c[x], str(x))
                )[:cap]
                kept = set(keep)
                base = max(
                    base, max(merged_c[x] for x in merged_c if x not in kept)
                )
                merged_c = {x: merged_c[x] for x in keep}
                merged_e = {x: merged_e[x] for x in keep}
            counts, errors = merged_c, merged_e
        from pyspark import TaskContext

        gid = TaskContext.get().partitionId() if TaskContext.get() else -1
        items = sorted(counts.items(), key=lambda kv: (-kv[1], str(kv[0])))
        rows = [list(kk) + [c, errors[kk], base, gid] for kk, c in items]
        yield pd.DataFrame(rows, columns=cols)

    if fanin is not None:
        # fold the partials as a TREE: each level's group merges <= ~fanin
        # source sketches (a single level keyed __part % fanin would make
        # one task merge N/fanin sketches serially — unbounded per-task
        # work at 10^5 scan partitions), and the loop runs until <= fanin
        # partitions remain, so the driver collect is O(fanin x capacity)
        # rows regardless of input partition count (VERDICT r9 item 5)
        for nparts in _fold_schedule(partial_df.rdd.getNumPartitions(), fanin):
            partial_df = partial_df.repartition(
                nparts, F.pmod(F.col("__part"), F.lit(nparts))
            ).mapInPandas(merge_level, schema)
    partials = partial_df.collect()
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


class KLLSummary:
    """Mergeable bounded quantile summary (MRL/KLL compactor family).

    ``levels[i]`` holds values each representing 2^i originals. A level
    over ``capacity`` sorts and keeps alternate items, promoting them one
    level up (weight doubles). Deterministic: the compaction offset
    alternates per compaction (a counter, not a coin), so identical input
    produces identical summaries everywhere — the property the engine's
    hash-checked determinism audit relies on.

    Contracts (mirroring the reference's QuantileSketch):
    * bounded state: <= capacity * ceil(log2(n/capacity) + 1) floats;
    * EXACT while n <= capacity (no compaction ever happens);
    * mergeable: merge() concatenates level-wise then re-compacts — the
      summary-union shape (JoinBoltTest.java:696-735), associative in
      the rank-error sense, and bitwise order-insensitive while exact;
    * rank error ~ O(log(n/capacity) / capacity) beyond exactness.
    """

    def __init__(self, capacity: int = 8192):
        if capacity < 2:
            raise ValueError("capacity must be >= 2")
        self.capacity = capacity
        self.levels: list[list[float]] = [[]]
        self._compactions = 0

    # -- ingestion ----------------------------------------------------------

    def update(self, value: float) -> None:
        self.levels[0].append(float(value))
        self._compress()

    def extend(self, values) -> None:
        self.levels[0].extend(float(v) for v in values)
        self._compress()

    def merge(self, other: "KLLSummary") -> None:
        for i, lvl in enumerate(other.levels):
            while len(self.levels) <= i:
                self.levels.append([])
            self.levels[i].extend(lvl)
        self._compress()

    @classmethod
    def from_levels(cls, levels, capacity: int = 8192) -> "KLLSummary":
        s = cls(capacity)
        s.levels = [list(map(float, lvl)) for lvl in levels] or [[]]
        s._compress()
        return s

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self.capacity:
                lvl = sorted(self.levels[i])
                off = self._compactions & 1
                self._compactions += 1
                held = []
                if len(lvl) & 1:
                    # hold one item back so EXACTLY half promotes at
                    # double weight — total weighted count stays exact
                    # (alternating which end avoids a one-sided bias)
                    held = [lvl.pop()] if off else [lvl.pop(0)]
                if len(self.levels) <= i + 1:
                    self.levels.append([])
                self.levels[i + 1].extend(lvl[off::2])
                self.levels[i] = held
            i += 1

    # -- queries ------------------------------------------------------------

    @property
    def n(self) -> int:
        """Weighted count of represented values."""
        return sum(len(lvl) << i for i, lvl in enumerate(self.levels))

    @property
    def stored(self) -> int:
        return sum(len(lvl) for lvl in self.levels)

    def is_exact(self) -> bool:
        return self._compactions == 0

    def quantile(self, p: float) -> float | None:
        """Interpolated quantile over the weighted multiset. With all
        weights 1 (exact regime) this is precisely the classic
        sorted-values interpolation v[floor(t)]*(1-f) + v[ceil(t)]*f at
        t = p*(n-1) — byte-compatible with the engine's batch/exact path."""
        items = sorted(
            (v, 1 << i) for i, lvl in enumerate(self.levels) for v in lvl
        )
        if not items:
            return None
        total = sum(w for _, w in items)
        target = p * (total - 1)
        lo, hi = int(math.floor(target)), int(math.ceil(target))
        frac = target - lo

        def value_at(rank: int) -> float:
            cum = 0
            for v, w in items:
                if rank < cum + w:
                    return v
                cum += w
            return items[-1][0]

        vlo = value_at(lo)
        vhi = vlo if hi == lo else value_at(hi)
        return vlo * (1 - frac) + vhi * frac


def hll_daily_rollup(df: DataFrame, key_col: str) -> DataFrame:
    """(day, est_distinct): per-epoch-day approximate distinct ``key_col``
    via Spark's NATIVE Apache DataSketches HLL aggregate, plus one
    ``day = -1`` row holding the UNION of all daily sketches — the
    month's distinct count derived by merging summaries, never
    rescanning the raw stream. This is exactly the reference's
    Theta-sketch union posture (SURVEY.md §2.4 COUNT DISTINCT: partial
    sketches merge associatively in the combine stage); materialize the
    daily sketch column instead of the estimate and the same rollup
    composes across arbitrary ranges (week/month/quarter) at constant
    cost per range.

    Scale shape: one groupBy(day) carrying fixed-size sketch buffers
    (lgConfigK=12 -> 4 KB each) regardless of key cardinality; the union
    is a |days|-row aggregate. Estimates are deterministic for a given
    input set (the sketch is hash-based, not sampled), but NOT
    SQL-portable — the driver records this entry rows-only and pytest
    pins the error envelope instead."""
    days = df.select(
        F.expr("(ts_ns div 1000) div 86400000000").alias("day"),
        F.col(key_col).cast("string").alias("__k"),
    )
    daily = days.groupBy("day").agg(F.hll_sketch_agg("__k").alias("__sk"))
    per_day = daily.select(
        "day", F.hll_sketch_estimate("__sk").cast("long").alias("est_distinct")
    )
    total = daily.agg(F.hll_union_agg("__sk").alias("__u")).select(
        F.lit(-1).cast("long").alias("day"),
        F.hll_sketch_estimate("__u").cast("long").alias("est_distinct"),
    )
    return per_day.unionByName(total).orderBy("day")


def hll_audience_overlap(
    df: DataFrame,
    key_col: str,
    slice_col: str,
) -> DataFrame:
    """(slice_a, slice_b, est_a, est_b, est_union, est_intersect,
    jaccard_est): pairwise audience set algebra over sketch SUMMARIES —
    distinct-key union via native DataSketches HLL merge and
    intersection by inclusion-exclusion (|A∩B| = |A|+|B|−|A∪B|,
    clamped at 0), the workhorse "how much do these segments overlap"
    readout the reference serves with Theta-sketch set operations
    (SURVEY.md §2.4; Theta supports intersection natively, HLL gets it
    via inclusion-exclusion — same API surface, wider error on small
    overlaps, which is the documented trade).

    Scale shape: ONE pass collapses the fact table to |slices| fixed-
    size sketches (4 KB each at lgConfigK=12); every pairwise union
    happens on the sketch frame (slices², not rows², and slices² of
    4 KB buffers is nothing).  At 100 TB this is the only viable shape
    for N-way segment overlap — the exact computation would be N² 
    distinct-count shuffles over the raw keys.

    Estimates are deterministic per input set but not SQL-portable:
    rows-only entry, pytest pins the error envelope vs exact counts.
    """
    sketches = (
        df.select(
            F.col(slice_col).alias("__s"),
            F.col(key_col).cast("string").alias("__k"),
        )
        .groupBy("__s")
        .agg(F.hll_sketch_agg("__k").alias("__sk"))
    )
    a = sketches.select(
        F.col("__s").alias("slice_a"), F.col("__sk").alias("__ska")
    )
    b = sketches.select(
        F.col("__s").alias("slice_b"), F.col("__sk").alias("__skb")
    )
    pairs = a.join(F.broadcast(b), F.col("slice_a") < F.col("slice_b"))
    est_a = F.hll_sketch_estimate("__ska").cast("long")
    est_b = F.hll_sketch_estimate("__skb").cast("long")
    # per-pair union: merge the two 1-sketch buffers via the binary
    # hll_union expression (no re-aggregation of the fact table)
    est_u = F.hll_sketch_estimate(
        F.expr("hll_union(__ska, __skb)")
    ).cast("long")
    inter = F.greatest(est_a + est_b - est_u, F.lit(0).cast("long"))
    return pairs.select(
        "slice_a",
        "slice_b",
        est_a.alias("est_a"),
        est_b.alias("est_b"),
        est_u.alias("est_union"),
        inter.alias("est_intersect"),
        F.round(
            F.try_divide(inter.cast("double"), est_u.cast("double")), 9
        ).alias("jaccard_est"),
    ).orderBy("slice_a", "slice_b")
