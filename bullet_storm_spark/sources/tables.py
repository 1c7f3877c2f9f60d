"""Load the driver's synthetic parquet tables (TESTDATA.md).

The reference never reads files — it is stream-only (SURVEY.md §2.1 "File
formats: none") — so batch parquet tables are our Spark-idiomatic source
layer: correctness queries run on these, and the streaming engine reads the
same schemas via readStream.

The events table needs one normalization: the driver writes
TIMESTAMP(NANOS) parquet, which Spark reads (under
spark.sql.legacy.parquet.nanosAsLong) as an epoch-nanos LongType. We keep
the raw nanos as ``ts_ns`` and derive a microsecond ``ts`` timestamp, so
queries can use native time functions while the DuckDB oracle (which reads
nanos natively) compares via epoch arithmetic that truncates identically in
both engines.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def load_table(spark: SparkSession, directory: str, name: str) -> DataFrame:
    if name == "events":
        # the driver may hand us a session without our defaults; the nanos
        # flag is runtime-settable, so apply it defensively (without it the
        # TIMESTAMP(NANOS) column is an unreadable PARQUET_TYPE_ILLEGAL)
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    df = spark.read.parquet(os.path.join(directory, f"{name}.parquet"))
    if name == "events":
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumnRenamed("ts", "ts_ns").withColumn(
                "ts", F.timestamp_micros((F.col("ts_ns") / 1000).cast("long"))
            )
        else:
            # plain TIMESTAMP/TIMESTAMP_NTZ (micros) parquet: derive the
            # nanos clock so queries written against ts_ns keep working
            # (DuckDB's epoch_ns(ts) produces the identical value);
            # timestampdiff on the wall-clock is timezone-independent
            df = df.withColumn(
                "ts_ns",
                F.expr(
                    "timestampdiff(MICROSECOND,"
                    " cast('1970-01-01 00:00:00' as timestamp_ntz),"
                    " cast(ts as timestamp_ntz)) * 1000"
                ),
            )
    return df


def load_tables(
    spark: SparkSession, directory: str | None = None, register_views: bool = True
) -> dict[str, DataFrame]:
    directory = directory or sf_dir()
    tables: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(directory, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, directory, name)
        tables[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return tables
