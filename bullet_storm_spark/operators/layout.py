"""Data-layout writer: materialize a curated/packed corpus as training
shards — hive-partitioned, sorted-within-file, size-bounded parquet.

The last step of a training-data pipeline (no bullet-storm counterpart;
part of the LLM-pipeline extension surface): downstream loaders want (a)
partition directories they can prune (e.g. lang=en/), (b) files small
enough to schedule (maxRecordsPerFile), (c) rows clustered so sequential
reads are coherent (sort keys), and (d) deterministic layout for
resumable runs.

Scale posture (100 TB):
* `repartitionByRange` on the sort keys samples the key distribution and
  builds BALANCED output tasks — a plain `repartition(n)` would round-robin
  and destroy clustering; `partitionBy` alone would create one task per
  partition value (skew: en >> mt). Range partitioning composes with
  hive partitioning: each task writes contiguous key ranges into each
  partition directory it touches.
* `sortWithinPartitions` is a task-local sort — no global shuffle beyond
  the range exchange; combined with range partitioning the GLOBAL order
  across shards is still monotone per partition directory.
* `maxRecordsPerFile` bounds file size without an extra job; shard count
  scales with data volume automatically.
* The writer never collects anything: one exchange + one write pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_training_shards(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
    shard_tasks: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as training shards under ``path``.

    ``partition_by``: hive partition columns (directory pruning).
    ``sort_by``: cluster rows within files (and order shards) by these.
    ``max_records_per_file``: upper bound per parquet file.
    ``shard_tasks``: number of write tasks (defaults to the session's
    shuffle partitions via repartitionByRange's default).
    """
    out = df
    range_keys = [*(partition_by or []), *(sort_by or [])]
    if range_keys:
        if shard_tasks:
            out = out.repartitionByRange(shard_tasks, *range_keys)
        else:
            out = out.repartitionByRange(*range_keys)
        out = out.sortWithinPartitions(*range_keys)
    writer = out.write.mode(mode).option(
        "maxRecordsPerFile", max_records_per_file
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


# ---------------------------------------------------------------------------
# Z-order (Morton) interleave keys — multi-dimensional clustering
# ---------------------------------------------------------------------------

def zorder_key(
    dims: "list[tuple[str, float, float]]",
    bits: int = 8,
):
    """Morton/Z-order interleave key over ``dims`` = [(col, lo, hi), ...]
    — the Delta ``OPTIMIZE ZORDER BY`` analogue as a pure scan
    expression. Each dimension is quantized to ``bits`` buckets over its
    fixed [lo, hi) range (out-of-range values clamp to the edge buckets),
    then the bucket bits are interleaved so rows close in EVERY dimension
    get close keys. Range-partitioning + sorting shards by this key makes
    min/max file statistics selective for predicates on ANY prefix of
    the dimensions — the data-skipping layout for multi-dim filters that
    a single-column sort cannot give.

    Pure integer arithmetic (floor-quantize, shift, or), identical in
    Spark and DuckDB; use ``zorder_key_sql`` for the oracle twin. Keep
    ``len(dims) * bits <= 62``."""
    from pyspark.sql import functions as F

    if not dims:
        raise ValueError("zorder_key needs >= 1 dimension")
    if len(dims) * bits > 62:
        raise ValueError(f"{len(dims)} dims x {bits} bits overflows a long")
    n = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for d, (col, lo, hi) in enumerate(dims):
        if not hi > lo:
            raise ValueError(f"need hi > lo for {col}, got [{lo}, {hi})")
        width = (float(hi) - float(lo)) / (1 << bits)
        q = F.floor((F.col(col).cast("double") - F.lit(float(lo))) / F.lit(width))
        q = F.least(F.greatest(q, F.lit(0)), F.lit(n)).cast("long")
        for b in range(bits):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit, b * len(dims) + d)
            )
    return key


def zorder_key_sql(
    dims: "list[tuple[str, float, float]]",
    bits: int = 8,
) -> str:
    if not dims:
        raise ValueError("zorder_key needs >= 1 dimension")
    if len(dims) * bits > 62:
        raise ValueError(f"{len(dims)} dims x {bits} bits overflows a long")
    n = (1 << bits) - 1
    parts = []
    for d, (col, lo, hi) in enumerate(dims):
        if not hi > lo:
            raise ValueError(f"need hi > lo for {col}, got [{lo}, {hi})")
        width = (float(hi) - float(lo)) / (1 << bits)
        q = (
            f"LEAST(GREATEST(CAST(floor((CAST({col} AS DOUBLE) - {float(lo)!r})"
            f" / {width!r}) AS BIGINT), 0), {n})"
        )
        for b in range(bits):
            parts.append(f"((({q} >> {b}) & 1) << {b * len(dims) + d})")
    return "(" + " | ".join(parts) + ")"


def zorder_block_report(
    df: DataFrame,
    dims: "list[tuple[str, float, float]]",
    bits: int = 8,
    block_shift: int = 8,
):
    """(block, n_rows, <col>_min, <col>_max per dim): the data-skipping
    proof table — group rows by the TOP bits of their z-key (``block`` =
    zkey >> block_shift, one row per would-be file) and report each
    dimension's min/max inside the block. Tight per-block ranges on EVERY
    dimension are exactly the parquet min/max statistics a scan prunes
    with; a single-column sort shows tight ranges on one dim and full-
    span ranges on the rest. One scan-expression key + one block-keyed
    aggregation."""
    from pyspark.sql import functions as F

    key = zorder_key(dims, bits)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for col, _, _ in dims:
        aggs.append(F.min(F.col(col).cast("double")).alias(f"{col}_min"))
        aggs.append(F.max(F.col(col).cast("double")).alias(f"{col}_max"))
    return (
        df.select(F.shiftright(key, block_shift).alias("block"), *[c for c, _, _ in dims])
        .groupBy("block")
        .agg(*aggs)
        .orderBy("block")
    )


def zorder_block_report_sql(
    table: str,
    dims: "list[tuple[str, float, float]]",
    bits: int = 8,
    block_shift: int = 8,
) -> str:
    key = zorder_key_sql(dims, bits)
    cols = ",\n       ".join(
        f"MIN(CAST({c} AS DOUBLE)) AS {c}_min, MAX(CAST({c} AS DOUBLE)) AS {c}_max"
        for c, _, _ in dims
    )
    return f"""
SELECT ({key} >> {block_shift}) AS block,
       COUNT(*)::BIGINT AS n_rows,
       {cols}
FROM {table}
GROUP BY block ORDER BY block
"""


def compaction_plan(
    df: DataFrame,
    part_col: str,
    bytes_col: str,
    target_bytes: int,
    round_to: int = 6,
) -> DataFrame:
    """(part, n_docs, bytes_total, n_files, avg_file_bytes, largest_doc,
    oversize_docs): per-partition small-file compaction plan — how many
    output files a bin-packing writer needs per partition at
    ``target_bytes`` per file (the lakehouse OPTIMIZE sizing pass; cf.
    spark.sql.files.maxPartitionBytes on the READ side). ``n_files`` is
    the pure ceiling ⌈bytes/target⌉ via the positive-operand identity
    (bytes + target − 1) div target — packing.py's FFD does the actual
    document→file assignment when row order matters; this is the
    planning aggregate that sizes the job. ``oversize_docs`` counts
    documents that exceed the target on their own (they force a
    one-doc file no matter the packer). ``fill_ratio`` =
    bytes/(n_files·target) is the expected packing efficiency.

    All arithmetic is int64 (`div`, never `/` — the time_split class);
    the single ratio is one correctly-rounded IEEE division. One
    partition-keyed aggregation; output partition-count-sized."""
    t = int(target_bytes)
    if t <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    from pyspark.sql import functions as F

    b = F.col(bytes_col).cast("long")
    g = (
        df.where(F.col(part_col).isNotNull() & b.isNotNull())
        .groupBy(F.col(part_col).alias("part"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(b).cast("long").alias("bytes_total"),
            F.max(b).cast("long").alias("largest_doc"),
            F.sum(F.when(b > t, 1).otherwise(0)).cast("long").alias(
                "oversize_docs"
            ),
        )
    )
    n_files = F.expr(f"(bytes_total + {t - 1}) div {t}").cast("long")
    return g.select(
        "part",
        "n_docs",
        "bytes_total",
        n_files.alias("n_files"),
        # greatest(..., 1): an all-zero-bytes partition has n_files = 0
        # and a bare `div 0` ERRORS under ANSI (and a when() guard can be
        # hoisted by codegen subexpression elimination — the try_divide
        # class); 0 div 1 = 0 is the right answer there anyway
        F.expr(
            f"bytes_total div greatest((bytes_total + {t - 1}) div {t}, 1)"
        )
        .cast("long")
        .alias("avg_file_bytes"),
        "largest_doc",
        "oversize_docs",
        F.round(
            F.try_divide(
                F.col("bytes_total").cast("double"),
                n_files.cast("double") * F.lit(float(t)),
            ),
            round_to,
        ).alias("fill_ratio"),
    ).orderBy("part")


def compaction_plan_sql(
    table: str,
    part_sql: str,
    bytes_sql: str,
    target_bytes: int,
    round_to: int = 6,
) -> str:
    t = int(target_bytes)
    return f"""
WITH __g AS (
  SELECT {part_sql} AS part, COUNT(*)::BIGINT AS n_docs,
         SUM(CAST({bytes_sql} AS BIGINT))::BIGINT AS bytes_total,
         MAX(CAST({bytes_sql} AS BIGINT))::BIGINT AS largest_doc,
         SUM(CASE WHEN CAST({bytes_sql} AS BIGINT) > {t}
             THEN 1 ELSE 0 END)::BIGINT AS oversize_docs
  FROM {table}
  WHERE ({part_sql}) IS NOT NULL AND ({bytes_sql}) IS NOT NULL
  GROUP BY part
)
SELECT part, n_docs, bytes_total,
       ((bytes_total + {t - 1}) // {t})::BIGINT AS n_files,
       (bytes_total // greatest((bytes_total + {t - 1}) // {t}, 1))::BIGINT
         AS avg_file_bytes,
       largest_doc, oversize_docs,
       CAST(CAST(CAST(CAST((CAST(bytes_total AS DOUBLE)
             / (CAST((bytes_total + {t - 1}) // {t} AS DOUBLE)
                * {float(t)!r})) * CAST(ABS(CAST(bytes_total AS DOUBLE)
             / (CAST((bytes_total + {t - 1}) // {t} AS DOUBLE)
                * {float(t)!r})) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS fill_ratio
FROM __g ORDER BY part
"""
