"""SparkSession factory tuned for the engine.

The reference runs 16 filter-stage executors and 2 combiner executors
(/root/reference src/main/resources/bullet_storm_defaults.yaml:100-107); we
instead let Spark's scheduler own parallelism and size the SQL shuffle for
the local test harness while keeping every knob cluster-ready:

* AQE on: runtime partition coalescing + skew-join splitting replace the
  reference's hand-tuned parallelism at any scale.
* Arrow on: all Pandas-UDF paths (similarity search, multimodal decode) move
  data in columnar batches, not pickled rows.
* UTC session timezone: deterministic timestamp semantics vs. the DuckDB
  correctness oracle.
* Generous broadcast threshold: dimension tables (region/nation/customer at
  test SF) broadcast instead of shuffling the fact table.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "bullet-storm-spark"


def _default_parallelism() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    except ValueError:
        return 32


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    On a real cluster, pass ``master=None`` and submit with spark-submit; the
    defaults here are safe at any scale (AQE re-plans shuffle partition counts
    at runtime, so ``spark.sql.shuffle.partitions`` is only an upper seed).
    """
    cpus = _default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    shuffle = shuffle_partitions if shuffle_partitions is not None else cpus

    # Python workers unpickle mapInPandas closures by module reference; make
    # sure they can import this package no matter the driver's cwd (local
    # mode workers inherit the driver process env). On a real cluster, ship
    # the package with --py-files / addArtifact instead.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        # the driver's events table carries TIMESTAMP(NANOS) parquet, which
        # Spark has no native type for; read it as epoch-nanos longs and let
        # sources.tables derive a microsecond timestamp column.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # local mode runs every task thread in the driver JVM: size the
        # heap for 32-way execution or long query sequences GC-thrash
        # (observed: 3x slowdowns on late-bench queries at 8g)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # reclaim dead shuffle/broadcast state promptly during long
        # many-query sessions instead of waiting for heap-pressure GC
        .config("spark.cleaner.periodicGC.interval", "5min")
        # Streaming: micro-batch trigger is the engine clock (reference ticks
        # every 100 ms, bullet_storm_defaults.yaml:143-148); state store kept
        # default (RocksDB only needed at real-cluster state sizes).
        .config("spark.sql.streaming.schemaInference", "true")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


def cluster_conf(target_partition_mb: int = 256) -> dict[str, str]:
    """Recommended spark-submit conf for a real multi-executor deployment
    of this engine (the knobs local mode can't meaningfully exercise).
    Pass with --conf or SparkConf; see SCALING.md for the reasoning."""
    return {
        # scan sizing: row groups -> task-sized splits at 100 TB
        "spark.sql.files.maxPartitionBytes": str(target_partition_mb * 1024 * 1024),
        # runtime re-planning: coalesce + skew splitting at real data shape
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # dimension joins broadcast; raise with executor memory
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # streaming state that exceeds heap (many live windowed queries)
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        ),
        # Arrow batches for every pandas-UDF operator (ANN, multimodal)
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        # deterministic timestamps vs any SQL oracle
        "spark.sql.session.timeZone": "UTC",
        # concurrent live queries (engine thread pool) share fairly
        "spark.scheduler.mode": "FAIR",
        # the driver's nanos-timestamp parquet (see sources.tables)
        "spark.sql.legacy.parquet.nanosAsLong": "true",
    }
