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
