"""Scalable dense global ID assignment (distributed ROW_NUMBER),
dual-compiled.

Every pipeline eventually needs a dense, gap-free, deterministic
ordinal per row — shard-stable sample ids, training-order positions,
citation indexes. The naive ``ROW_NUMBER() OVER (ORDER BY ...)`` is the
classic Spark scale trap: a window with no PARTITION BY moves the
ENTIRE table to one partition (WindowExec warns, then one task sorts
100 TB). The scalable shape is the two-pass partition-offset pattern:

1. range-repartition on the order keys (Spark's global-sort exchange);
2. count rows per physical partition — a partition-count-sized frame;
3. prefix-sum those counts into per-partition offsets (tiny window);
4. broadcast the offsets back and add the within-partition rank
   (window PARTITIONED by partition id — bounded, parallel).

``dense_id = offset(partition) + rank_within_partition`` reproduces the
global ROW_NUMBER exactly — for any placement of the range boundaries —
PROVIDED the order keys are a TOTAL order (no ties). That is the
operator's contract (tests enforce it by construction; callers append a
unique id as the final key, exactly what ROW_NUMBER determinism needs in
any engine). The ranged frame is localCheckpoint-ed so the offset pass
and the rank pass see the SAME physical partitioning — without the pin,
the range exchange's boundary sampling may re-run differently per
consumer and the offsets would describe partitions that no longer
exist.

Scale posture (100 TB): one range exchange + one checkpoint write + one
pid-keyed window (each group = one range partition, processed in
parallel); the offset frame is partition-count-sized and broadcast.
Oracle: the single-partition ROW_NUMBER the trap version would compute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def assign_dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_name: str = "dense_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based dense ordinal ``id_name`` following the total
    order of ``order_cols`` (ascending; MUST be tie-free — append a
    unique key as the last column). Returns the input columns +
    ``id_name``, ordered by ``id_name``."""
    if not order_cols:
        raise ValueError("need at least one order column")
    keys = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *keys)
        if num_partitions
        else df.repartitionByRange(*keys)
    ).withColumn("__pid", F.spark_partition_id())
    # pin ONE materialization: offsets and ranks must describe the same
    # physical partitions (range-boundary sampling is not replayed)
    ranged = ranged.localCheckpoint()
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        ranged.groupBy("__pid")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        .select(
            "__pid",
            F.coalesce(F.sum("__n").over(w_off), F.lit(0))
            .cast("long")
            .alias("__off"),
        )
    )
    w_rank = Window.partitionBy("__pid").orderBy(*keys)
    out_cols = [c for c in df.columns]
    return (
        ranged.join(F.broadcast(offsets), "__pid")
        .select(
            *out_cols,
            (F.col("__off") + F.row_number().over(w_rank))
            .cast("long")
            .alias(id_name),
        )
        .orderBy(id_name)
    )


def assign_ntile(
    df: DataFrame,
    order_cols: list[str],
    n: int,
    name: str = "ntile",
) -> DataFrame:
    """Scale-safe ``NTILE(n) OVER (ORDER BY order_cols)``: dense rank via
    the partition-offset pattern above plus a 1-row total broadcast —
    never a single-task global window (the r8 verdict's one scale-killer
    shape). ``order_cols`` must be a total order (append a unique key).

    Standard NTILE semantics, reproduced arithmetically: with N rows,
    base = N div n and rem = N mod n, the first ``rem`` buckets hold
    base+1 rows; 0-based rank r maps to
    ``r div (base+1) + 1``               when r < rem * (base + 1)
    ``rem + (r - rem*(base+1)) div base + 1`` otherwise
    — bit-identical to both engines' NTILE over the same tie-free order."""
    if n < 1:
        raise ValueError(f"need n >= 1, got {n}")
    with_rn = assign_dense_ids(df, order_cols, id_name="__rn")
    total = with_rn.agg(F.count(F.lit(1)).cast("long").alias("__N"))
    r = F.col("__rn") - 1
    base = F.expr(f"__N div {n}")
    rem = F.col("__N") % n
    cut = rem * (base + 1)
    # greatest(base, 1): base = 0 (N < n) keeps every row in the r < cut
    # branch, but ANSI-mode codegen may hoist the other branch's division
    bucket = F.when(r < cut, F.floor(r / (base + 1)) + 1).otherwise(
        rem + F.floor((r - cut) / F.greatest(base, F.lit(1))) + 1
    )
    out_cols = [c for c in df.columns]
    return with_rn.crossJoin(F.broadcast(total)).select(
        *out_cols, bucket.cast("int").alias(name)
    )


def assign_dense_ids_sql(
    table: str,
    order_cols: list[str],
    id_name: str = "dense_id",
    select_cols: list[str] | None = None,
) -> str:
    """DuckDB twin: the plain global ROW_NUMBER (fine on one node —
    that is the point of the comparison)."""
    if not order_cols:
        raise ValueError("need at least one order column")
    order = ", ".join(order_cols)
    cols = ", ".join(select_cols) if select_cols else "*"
    return f"""
SELECT {cols},
       ROW_NUMBER() OVER (ORDER BY {order})::BIGINT AS {id_name}
FROM {table}
ORDER BY {id_name}
"""
