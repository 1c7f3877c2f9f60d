"""Load the driver's synthetic parquet tables (TESTDATA.md).

The reference never reads files — it is stream-only (SURVEY.md §2.1 "File
formats: none") — so batch parquet tables are our Spark-idiomatic source
layer: correctness queries run on these, and the streaming engine reads the
same schemas via readStream.

The events table needs one normalization, and the driver has shipped two
parquet layouts for its ``ts`` column over time:

* TIMESTAMP(NANOS), which Spark reads (under
  spark.sql.legacy.parquet.nanosAsLong) as an epoch-nanos LongType;
* plain microsecond TIMESTAMP / TIMESTAMP_NTZ.

Whatever the layout, we normalize to the same two columns: ``ts`` as a
session-timezone-independent TIMESTAMP_NTZ wall clock and ``ts_ns`` as
epoch nanos (== DuckDB's ``epoch_ns(ts)``), so queries can use native time
functions while the DuckDB oracle compares via epoch arithmetic that
truncates identically in both engines regardless of driver timezone.
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
        # Normalize every parquet flavor to the same (ts: TIMESTAMP_NTZ,
        # ts_ns: epoch-nanos bigint) pair without ever passing through a
        # session-timezone-dependent conversion.
        _NTZ_EPOCH = "cast('1970-01-01 00:00:00' as timestamp_ntz)"
        dtype = df.schema["ts"].dataType
        if isinstance(dtype, T.LongType):
            # nanosAsLong layout: the long IS the nanos clock; rebuild the
            # NTZ wall clock by adding micros to the NTZ epoch (timestampadd
            # on an NTZ base stays NTZ and never consults the session tz)
            # floor-division nanos->micros (`div` truncates toward zero,
            # which for pre-epoch negative nanos would land 1µs above
            # DuckDB's floor-based conversion); pmod keeps it exact integer
            # math, no double round-trip
            df = df.withColumnRenamed("ts", "ts_ns").withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, "
                    f"(ts_ns - pmod(ts_ns, 1000)) div 1000, {_NTZ_EPOCH})"
                ),
            )
        elif isinstance(dtype, T.TimestampType):
            # instant-typed (isAdjustedToUTC) micros parquet: unix_micros is
            # the tz-independent reading; then rebuild ts as NTZ from it
            df = df.withColumn(
                "ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000)
            ).withColumn(
                "ts",
                F.expr(f"timestampadd(MICROSECOND, ts_ns div 1000, {_NTZ_EPOCH})"),
            )
        else:
            # TIMESTAMP_NTZ (micros) parquet — the current test-data layout:
            # ts is already the wall clock; diff vs the NTZ epoch is
            # tz-independent and equals DuckDB's epoch_ns(ts)
            df = df.withColumn(
                "ts_ns",
                F.expr(f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, ts) * 1000"),
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


# --- format-agnostic batch sources (reference §2.1 "file formats" row) -----

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".jsonl": "json",
    ".json": "json",
    ".ndjson": "json",
    ".csv": "csv",
    ".tsv": "csv",
}


def load_batch_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    fmt: str | None = None,
    **options,
) -> DataFrame:
    """Read a batch table from any supported format, dispatched on file
    extension (or forced via ``fmt``) — the batch analogue of the stream
    DSL's config-dispatched connector + deserializer chain
    (sources/dsl.py). CSV defaults to header=true; TSV sets the tab
    separator; pass an explicit ``schema`` for text formats in production
    (inference scans the data twice and types drift with content).

    Scale: all formats arrive through the same DataSource V2 scan, so
    partition-splitting applies everywhere; column pruning and predicate
    pushdown reach parquet/ORC natively, while text formats prune after
    parse — another reason the pipeline writes parquet (layout.py) even
    when ingest lands as JSONL/CSV."""
    ext = os.path.splitext(path)[1].lower()
    if fmt is None:
        if ext not in _EXT_FORMAT:
            raise ValueError(
                f"cannot infer format from {path!r}; pass fmt= explicitly "
                f"(known extensions: {sorted(_EXT_FORMAT)})"
            )
        fmt = _EXT_FORMAT[ext]
    if ext == ".tsv" and fmt == "csv":
        # a .tsv path must get the tab separator even when fmt='csv' was
        # passed explicitly — otherwise the file silently parses as
        # one-column comma rows
        options.setdefault("sep", "\t")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
    return reader.format(fmt).options(**options).load(path)
