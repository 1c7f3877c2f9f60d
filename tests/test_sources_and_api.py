"""DSL ingestion chain, result sinks, and the synchronous API facade."""

import json

import pytest

from bullet_storm_spark import GroupAll, GroupOperation, GroupOpType, Query, Raw
from bullet_storm_spark.api import execute
from bullet_storm_spark.clip import Clip, QUERY_ID_KEY
from bullet_storm_spark.plans.expressions import eq
from bullet_storm_spark.plans.query import TumblingWindow
from bullet_storm_spark.sources import dsl
from bullet_storm_spark.streaming.sinks import JsonlResultSink, MemoryResultSink

SCHEMA_JSON = json.dumps(
    [{"name": "foo", "type": "STRING"}, {"name": "bar", "type": "STRING"}]
)


def test_record_schema_parse_and_struct():
    schema = dsl.RecordSchema.from_json(SCHEMA_JSON)
    struct = schema.to_struct()
    assert [f.name for f in struct.fields] == ["foo", "bar"]
    assert struct["foo"].dataType.simpleString() == "string"


def test_converter_casts_and_fills_missing(spark):
    # test_dsl_schema.json shape: foo/bar STRING; input has foo as int and
    # no bar -> cast + typed null
    df = spark.createDataFrame([(1, "x")], "foo int, extra string")
    schema = dsl.RecordSchema.from_json(SCHEMA_JSON)
    out = dsl.convert(df, schema)
    assert out.columns == ["foo", "bar"]
    row = out.collect()[0]
    assert row.foo == "1" and row.bar is None


def test_converter_type_check_rejects(spark):
    schema = dsl.RecordSchema.from_json(
        json.dumps([{"name": "n", "type": "INTEGER"}])
    )
    ok = spark.createDataFrame([(1,)], "n int")
    assert dsl.convert(ok, schema, type_check=True).collect()[0].n == 1
    # missing field
    with pytest.raises(dsl.SchemaTypeError):
        dsl.convert(spark.createDataFrame([("a",)], "other string"), schema, True)
    # narrowing (double -> INTEGER) fails the check
    with pytest.raises(dsl.SchemaTypeError):
        dsl.convert(spark.createDataFrame([(1.5,)], "n double"), schema, True)


def test_converter_extras_map(spark):
    df = spark.createDataFrame([("a", "b", 3)], "foo string, x string, y int")
    schema = dsl.RecordSchema.from_json(json.dumps([{"name": "foo", "type": "STRING"}]))
    out = dsl.convert(df, schema, keep_extras_as_map=True).collect()[0]
    assert out.extras == {"x": "b", "y": "3"}


def test_json_and_csv_deserializers(spark):
    schema = dsl.RecordSchema.from_json(SCHEMA_JSON)
    jdf = spark.createDataFrame([('{"foo": "a", "bar": "b"}',)], "value string")
    row = dsl.deserialize_json(jdf, "value", schema).collect()[0]
    assert (row.foo, row.bar) == ("a", "b")
    cdf = spark.createDataFrame([("a,b",)], "value string")
    row = dsl.deserialize_csv(cdf, "value", schema).collect()[0]
    assert (row.foo, row.bar) == ("a", "b")


def test_rate_connector(spark):
    stream = dsl.read_stream_source(spark, {"type": "rate", "rows_per_second": 5})
    assert stream.isStreaming and "value" in stream.columns


def test_unknown_connector(spark):
    with pytest.raises(ValueError):
        dsl.read_stream_source(spark, {"type": "carrier-pigeon"})


def test_sinks(tmp_path):
    mem = MemoryResultSink()
    mem("q1", Clip.of([{"a": 1}]))
    assert mem.for_query("q1")[0].records == [{"a": 1}]
    path = str(tmp_path / "out" / "results.jsonl")
    jsonl = JsonlResultSink(path)
    jsonl("q2", Clip.of([{"b": 2}], note="x"))
    with open(path) as f:
        rec = json.loads(f.readline())
    assert rec["query_id"] == "q2"
    assert rec["clip"]["records"] == [{"b": 2}]


def test_execute_sync_api(spark, sf_tables):
    q = Query(
        source="events",
        filter=eq("event_type", "purchase"),
        aggregation=GroupAll(GroupOperation(GroupOpType.COUNT, None, "cnt")),
    )
    clip = execute(q, spark=spark, query_id="drpc-1")
    assert clip.meta[QUERY_ID_KEY] == "drpc-1"
    assert clip.records[0]["cnt"] == 202  # sf0.001 purchase count


def test_execute_sync_rejects_windows(spark, sf_tables):
    q = Query(
        source="events",
        aggregation=Raw(size=1),
        window=TumblingWindow(emit_every_ms=100),
    )
    with pytest.raises(ValueError, match="window"):
        execute(q, spark=spark)
