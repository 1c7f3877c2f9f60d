"""Expression-tree tests mirroring the reference's predicate coverage
(FilterBoltTest.java:268-285,306-458,566-617 — see FIXTURES.md F1/F2)."""

import pytest

from bullet_storm_spark.plans.expressions import (
    CastExpression,
    Dialect,
    NAryExpression,
    Operation,
    eq,
    fld,
    gt,
    isin,
    lst,
    not_isin,
    val,
)


@pytest.fixture(scope="module")
def events_basic(spark):
    # FIXTURES.md F1: (field, timestamp, mid, map_field)
    rows = [
        ("b235gf23b", 92, "3", {"id": "123", "bar": "x"}),
        ("a1", 1, None, {"id": "9", "bar": "y"}),
        ("b235gf23b", 2, "7", {"id": "123", "bar": "z"}),
        ("c3", 45, "11", None),
    ]
    return spark.createDataFrame(
        rows, "field string, timestamp long, mid string, map_field map<string,string>"
    )


def test_field_equality_filter(events_basic):
    # makeFieldFilterQuery("b235gf23b") — FilterBoltTest.java:306-324
    out = events_basic.where(eq("field", "b235gf23b").to_column()).collect()
    assert len(out) == 2
    assert {r.timestamp for r in out} == {92, 2}


def test_nested_map_access(events_basic):
    # FieldExpression("map_field", "id") — FilterBoltTest.java:276,328
    out = events_basic.where(eq(fld("map_field", "id"), "123").to_column()).collect()
    assert len(out) == 2


def test_equals_any_and_not_equals_all(events_basic):
    # EQUALS_ANY / NOT_EQUALS_ALL — FilterBoltTest.java:414-458
    out = events_basic.where(isin("field", "a1", "c3").to_column()).collect()
    assert {r.field for r in out} == {"a1", "c3"}
    out = events_basic.where(not_isin("field", "a1", "c3").to_column()).collect()
    assert {r.field for r in out} == {"b235gf23b"}


def test_complex_boolean_tree(spark):
    # FIXTURES.md F2 / FilterBoltTest.java:566-617:
    # (field='abc' AND (experience IN ('app','tv') OR mid>10)) OR
    # (CAST(demographic_map['age'] AS INT) > 65 AND filter_map['is_fake_event'])
    rows = [
        ("abc", "app", 5, {"age": "30"}, {"is_fake_event": False}),   # matches arm 1
        ("abc", "web", 15, {"age": "30"}, {"is_fake_event": False}),  # matches arm 1 (mid)
        ("zzz", "web", 5, {"age": "67"}, {"is_fake_event": True}),    # matches arm 2
        ("zzz", "web", 5, {"age": "67"}, {"is_fake_event": False}),   # no match
        ("abc", "web", 5, {"age": "30"}, {"is_fake_event": False}),   # no match
    ]
    df = spark.createDataFrame(
        rows,
        "field string, experience string, mid int, "
        "demographic_map map<string,string>, filter_map map<string,boolean>",
    )
    pred = (
        eq("field", "abc")
        & (isin("experience", "app", "tv") | gt("mid", 10))
    ) | (
        gt(CastExpression(fld("demographic_map", "age"), "INTEGER"), 65)
        & eq(fld("filter_map", "is_fake_event"), True)
    )
    out = df.where(pred.to_column()).collect()
    assert len(out) == 3


def test_projection_rename_and_nested_extract(events_basic):
    # makeProjectionQuery: id <- field, mid <- map_field['id']
    # FilterBoltTest.java:268-285
    from bullet_storm_spark.plans.query import Projection

    proj = Projection.of(id=fld("field"), mid=fld("map_field", "id"))
    out = events_basic.select(
        *[f.expression.to_column().alias(f.name) for f in proj.fields]
    )
    assert out.columns == ["id", "mid"]
    vals = {(r.id, r.mid) for r in out.collect()}
    assert ("b235gf23b", "123") in vals and ("c3", None) in vals


def test_filter_sees_raw_names_not_projected(events_basic):
    # testFilteringUsingProjectedName — FilterBoltTest.java:349-370:
    # a filter on the projected name must NOT match.
    from bullet_storm_spark import Query, Raw, Projection, compile_query

    q = Query(
        source="t",
        filter=eq("id", "b235gf23b"),  # 'id' is the *projected* name
        projection=Projection.of(id=fld("field")),
        aggregation=Raw(size=10),
    )
    plan = compile_query(q)
    with pytest.raises(Exception):
        plan(events_basic).collect()  # raw schema has no 'id' -> analysis error

    # and the raw name works even though it's renamed away in the output
    # (testProjectionNotLosingFilterColumn — FilterBoltTest.java:372-393)
    q2 = Query(
        source="t",
        filter=eq("field", "b235gf23b"),
        projection=Projection.of(id=fld("field")),
        aggregation=Raw(size=10),
    )
    out = compile_query(q2)(events_basic)
    assert out.columns == ["id"]
    assert out.count() == 2


def test_sql_rendering_roundtrip(spark, events_basic):
    """The DuckDB rendering of a tree must select the same rows as the
    Column rendering (checked via Spark SQL, which shares ANSI syntax for
    the fragments we emit)."""
    pred = (eq("field", "abc") & gt("timestamp", 10)) | isin("field", "c3")
    ssql = pred.to_sql(Dialect.SPARK)
    events_basic.createOrReplaceTempView("rt_events")
    via_sql = spark.sql(f"SELECT * FROM rt_events WHERE {ssql}").collect()
    via_col = events_basic.where(pred.to_column()).collect()
    assert sorted(map(tuple, via_sql)) == sorted(map(tuple, via_col))


def test_if_and_arithmetic(spark):
    from bullet_storm_spark.plans.expressions import BinaryExpression

    df = spark.createDataFrame([(4, 2), (9, 3)], "a int, b int")
    expr = NAryExpression(
        [gt("a", 5), BinaryExpression(fld("a"), fld("b"), Operation.MUL), val(-1)],
        Operation.IF,
    )
    out = [r[0] for r in df.select(expr.to_column()).collect()]
    assert out == [-1, 27]
