"""DSL-style ingestion chain: connector -> deserializer -> converter.

Mirrors bullet-dsl's pluggable trio as exercised by the reference
(SURVEY.md §2.1; /root/reference src/main/java/com/yahoo/bullet/storm/
DSLSpout.java:51-53,78-97 BulletConnector + BulletDeserializer;
DSLBolt.java:42-67 BulletRecordConverter with optional declared schema and
type checking enabled via bullet.dsl.converter.schema.type.check.enable —
src/test/resources/test_config.yaml:28-32, schema file
src/test/resources/test_dsl_schema.json).

Spark translation: a connector is a readStream/read source config; a
deserializer is a bytes/string -> struct expression (from_json / from_csv);
a converter applies a declared RecordSchema with cast/type-check semantics.
The reference's convert-in-bolt variant (DSLBolt decoupling I/O from CPU)
is irrelevant here — Spark pipelines stages automatically (SURVEY.md §2.1).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

# bullet-dsl schema type names -> Spark types (SURVEY.md §1.1 type system)
_TYPE_MAP: dict[str, T.DataType] = {
    "BOOLEAN": T.BooleanType(),
    "INTEGER": T.IntegerType(),
    "LONG": T.LongType(),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "STRING": T.StringType(),
    "BOOLEAN_MAP": T.MapType(T.StringType(), T.BooleanType()),
    "INTEGER_MAP": T.MapType(T.StringType(), T.IntegerType()),
    "LONG_MAP": T.MapType(T.StringType(), T.LongType()),
    "FLOAT_MAP": T.MapType(T.StringType(), T.FloatType()),
    "DOUBLE_MAP": T.MapType(T.StringType(), T.DoubleType()),
    "STRING_MAP": T.MapType(T.StringType(), T.StringType()),
    "BOOLEAN_LIST": T.ArrayType(T.BooleanType()),
    "INTEGER_LIST": T.ArrayType(T.IntegerType()),
    "LONG_LIST": T.ArrayType(T.LongType()),
    "FLOAT_LIST": T.ArrayType(T.FloatType()),
    "DOUBLE_LIST": T.ArrayType(T.DoubleType()),
    "STRING_LIST": T.ArrayType(T.StringType()),
}


@dataclass
class SchemaField:
    name: str
    type: str

    def spark_type(self) -> T.DataType:
        key = self.type.upper()
        if key not in _TYPE_MAP:
            raise ValueError(f"unsupported DSL type {self.type}")
        return _TYPE_MAP[key]


@dataclass
class RecordSchema:
    """Declared schema (test_dsl_schema.json analogue: a JSON list of
    {name, type} pairs)."""

    fields: list[SchemaField]

    @staticmethod
    def from_json(text: str) -> "RecordSchema":
        items = json.loads(text)
        return RecordSchema([SchemaField(f["name"], f["type"]) for f in items])

    @staticmethod
    def from_file(path: str) -> "RecordSchema":
        with open(path) as f:
            return RecordSchema.from_json(f.read())

    def to_struct(self) -> T.StructType:
        return T.StructType(
            [T.StructField(f.name, f.spark_type(), True) for f in self.fields]
        )


class SchemaTypeError(ValueError):
    pass


def convert(
    df: DataFrame,
    schema: RecordSchema,
    type_check: bool = False,
    keep_extras_as_map: bool = False,
) -> DataFrame:
    """BulletRecordConverter analogue.

    type_check=True  -> reject the frame when a declared field is missing or
    its Spark type cannot be safely widened to the declared type (the
    reference converter's schema type-check mode).
    type_check=False -> missing fields become typed nulls; present fields
    are cast.
    keep_extras_as_map -> undeclared STRING-compatible columns are preserved
    in a map<string,string> 'extras' column (the §1.1 dynamic-attribute
    catch-all).
    """
    declared = {f.name: f for f in schema.fields}
    existing = dict(df.dtypes)
    if type_check:
        for f in schema.fields:
            if f.name not in existing:
                raise SchemaTypeError(f"missing declared field '{f.name}'")
            actual = df.schema[f.name].dataType
            if not _can_widen(actual, f.spark_type()):
                raise SchemaTypeError(
                    f"field '{f.name}': {actual.simpleString()} does not "
                    f"type-check against declared {f.type}"
                )
    cols: list[Column] = []
    for f in schema.fields:
        if f.name in existing:
            cols.append(F.col(f.name).cast(f.spark_type()).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.spark_type()).alias(f.name))
    if keep_extras_as_map:
        extras = [c for c in df.columns if c not in declared]
        if extras:
            pairs: list[Column] = []
            for c in extras:
                pairs += [F.lit(c), F.col(c).cast("string")]
            cols.append(F.create_map(*pairs).alias("extras"))
    return df.select(*cols)


def _can_widen(actual: T.DataType, declared: T.DataType) -> bool:
    if actual == declared:
        return True
    numeric_rank = [T.IntegerType(), T.LongType(), T.FloatType(), T.DoubleType()]
    if actual in numeric_rank and declared in numeric_rank:
        return numeric_rank.index(actual) <= numeric_rank.index(declared)
    # everything casts to string safely
    if declared == T.StringType():
        return True
    return False


# ---------------------------------------------------------------------------
# Deserializers (BulletDeserializer analogue)
# ---------------------------------------------------------------------------

def deserialize_json(
    df: DataFrame, value_col: str, schema: RecordSchema
) -> DataFrame:
    """JSON string/bytes column -> typed columns."""
    value = F.col(value_col).cast("string")
    parsed = F.from_json(value, schema.to_struct())
    return df.withColumn("__rec", parsed).select("__rec.*")


def deserialize_csv(
    df: DataFrame, value_col: str, schema: RecordSchema, sep: str = ","
) -> DataFrame:
    value = F.col(value_col).cast("string")
    ddl = ", ".join(
        f"{f.name} {f.spark_type().simpleString()}" for f in schema.fields
    )
    parsed = F.from_csv(value, ddl, {"sep": sep})
    return df.withColumn("__rec", parsed).select("__rec.*")


# ---------------------------------------------------------------------------
# Connectors (BulletConnector analogue): config -> streaming DataFrame
# ---------------------------------------------------------------------------

def read_stream_source(spark: SparkSession, conf: dict[str, Any]) -> DataFrame:
    """Build a streaming source from a config dict — the Spark analogue of
    the class-name-configured connector (ReflectionUtils.java:32-50):

      {"type": "kafka", "options": {...}}                 -> kafka source
      {"type": "parquet"|"json"|"csv", "path":, "schema":} -> file source
      {"type": "rate", "rows_per_second": n}              -> test source
    """
    kind = conf.get("type")
    if kind == "kafka":
        reader = spark.readStream.format("kafka")
        for k, v in conf.get("options", {}).items():
            reader = reader.option(k, v)
        return reader.load()
    if kind in ("parquet", "json", "csv"):
        reader = spark.readStream.format(kind)
        if "schema" in conf:
            reader = reader.schema(conf["schema"])
        for k, v in conf.get("options", {}).items():
            reader = reader.option(k, v)
        return reader.load(conf["path"])
    if kind == "rate":
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", str(conf.get("rows_per_second", 100)))
            .load()
        )
    raise ValueError(f"unsupported connector type {kind}")
