"""BQL front-door tests: parse -> compile -> run against sf0.001 tables."""

import pytest

from bullet_storm_spark import compile_query
from bullet_storm_spark.bql import BQLError, parse
from bullet_storm_spark.plans.query import (
    CountDistinct,
    Distribution,
    DistributionType,
    GroupBy,
    Raw,
    SlidingRecordWindow,
    TopK,
    TumblingWindow,
)


def run(bql, tables):
    q = parse(bql)
    return compile_query(q)(tables[q.source])


def test_raw_star_with_stream_duration():
    q = parse("SELECT * FROM STREAM(30000, TIME) WHERE value > 1 LIMIT 10")
    assert isinstance(q.aggregation, Raw) and q.aggregation.size == 10
    assert q.duration_ms == 30000 and q.source == "events"


def test_raw_projection_runs(sf_tables):
    out = run(
        "SELECT event_id AS id, value FROM events WHERE event_type = 'error' LIMIT 7",
        sf_tables,
    )
    rows = out.collect()
    assert out.columns == ["id", "value"] and len(rows) == 7


def test_group_all(sf_tables):
    out = run(
        "SELECT COUNT(*) AS cnt, SUM(value) AS s FROM events WHERE value > 0",
        sf_tables,
    ).collect()
    assert len(out) == 1 and out[0]["cnt"] == 1000


def test_group_by_with_having_order(sf_tables):
    out = run(
        "SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type "
        "HAVING cnt > 200 ORDER BY cnt DESC",
        sf_tables,
    ).collect()
    assert [r.cnt for r in out] == sorted([r.cnt for r in out], reverse=True)
    assert all(r.cnt > 200 for r in out)


def test_count_distinct(sf_tables):
    q = parse("SELECT COUNT(DISTINCT user_id) AS u FROM events")
    assert isinstance(q.aggregation, CountDistinct)
    out = compile_query(q)(sf_tables["events"]).collect()
    expected = sf_tables["events"].select("user_id").distinct().count()
    assert out[0]["u"] == expected


def test_top_k(sf_tables):
    q = parse("SELECT TOP(3, event_type) AS cnt FROM events")
    assert isinstance(q.aggregation, TopK) and q.aggregation.size == 3
    rows = compile_query(q)(sf_tables["events"]).collect()
    assert len(rows) == 3 and rows[0]["cnt"] >= rows[1]["cnt"] >= rows[2]["cnt"]


def test_top_k_with_threshold():
    q = parse("SELECT TOP(5, 100, event_type, user_id) AS cnt FROM events")
    assert q.aggregation.threshold == 100
    assert list(q.aggregation.fields) == ["event_type", "user_id"]


def test_distribution_forms(sf_tables):
    q = parse("SELECT QUANTILE(value, MANUAL, 0.25, 0.5, 0.75) FROM events")
    assert isinstance(q.aggregation, Distribution)
    assert q.aggregation.dist_type == DistributionType.QUANTILE
    rows = compile_query(q)(sf_tables["events"]).collect()
    assert [r.quantile for r in rows] == [0.25, 0.5, 0.75]

    q = parse("SELECT FREQ(value, MANUAL, 0, 50, 100) FROM events")
    assert q.aggregation.dist_type == DistributionType.PMF
    q = parse("SELECT CUMFREQ(value, MANUAL, 0, 50, 100) FROM events")
    assert q.aggregation.dist_type == DistributionType.CDF


def test_windowing_clauses():
    q = parse("SELECT * FROM STREAM(60000, TIME) WINDOWING EVERY(1000, TIME)")
    assert isinstance(q.window, TumblingWindow) and q.window.emit_every_ms == 1000
    assert q.window.include_all is False
    q = parse("SELECT * FROM STREAM(60000, TIME) WINDOWING EVERY(10, RECORD)")
    assert isinstance(q.window, SlidingRecordWindow) and q.window.emit_every == 10
    q = parse("SELECT * FROM STREAM(60000, TIME) WINDOWING EVERY(1000, TIME, ALL)")
    assert q.window.include_all is True


def test_parse_errors():
    with pytest.raises(BQLError):
        parse("DELETE FROM events")
    with pytest.raises(BQLError):
        parse("SELECT * FROM STREAM(1000, TIME) WINDOWING SOMETIMES(5)")
    with pytest.raises(BQLError):
        parse("SELECT TOP(3) AS cnt FROM events")


def test_select_distinct(sf_tables):
    q = parse("SELECT DISTINCT event_type, user_type FROM events")
    assert isinstance(q.aggregation, GroupBy) and not q.aggregation.operations
    rows = run("SELECT DISTINCT event_type FROM events", sf_tables).collect()
    assert sorted(r.event_type for r in rows) == sorted(
        {r.event_type for r in rows}
    ) and len(rows) == 5


def test_distribution_linear_and_region(sf_tables):
    q = parse("SELECT QUANTILE(value, LINEAR, 11) FROM events")
    assert q.aggregation.points == [round(i / 10, 10) for i in range(11)]
    q = parse("SELECT FREQ(value, REGION, 0, 200, 50) FROM events")
    assert q.aggregation.points == [0.0, 50.0, 100.0, 150.0, 200.0]
    rows = run("SELECT CUMFREQ(value, REGION, 0, 100, 50) FROM events", sf_tables)
    assert rows.count() == 4  # 3 splits -> 3 CDF rows + the +inf row
    with pytest.raises(BQLError):
        parse("SELECT FREQ(value, LINEAR, 5) FROM events")  # LINEAR is quantile-only
    with pytest.raises(BQLError):
        parse("SELECT QUANTILE(value, REGION, 5, 1, -1) FROM events")


def test_tumbling_window_synonym():
    q = parse("SELECT * FROM STREAM(60000, TIME) WINDOWING TUMBLING(1000, TIME)")
    assert isinstance(q.window, TumblingWindow) and not q.window.include_all
    with pytest.raises(BQLError):
        parse("SELECT * FROM STREAM(60000, TIME) WINDOWING TUMBLING(1000, TIME, ALL)")


def test_computed_select_items_are_post_aggregations(sf_tables):
    out = run(
        "SELECT event_type, COUNT(*) AS cnt, cnt * 2 AS double_cnt "
        "FROM events GROUP BY event_type ORDER BY event_type",
        sf_tables,
    )
    rows = out.collect()
    assert out.columns == ["event_type", "cnt", "double_cnt"]
    assert all(r.double_cnt == 2 * r.cnt for r in rows) and len(rows) == 5


def test_plain_field_not_in_group_by_rejected():
    with pytest.raises(BQLError):
        parse("SELECT region, COUNT(*) AS c FROM events GROUP BY event_type")


def test_bql_percentile(spark, sf_tables):
    import duckdb
    from bullet_storm_spark import compile_query, oracle_sql_for
    from bullet_storm_spark.bql import parse

    q = parse(
        "SELECT event_type AS type, PERCENTILE(value, 0.5) AS p50, "
        "COUNT(*) AS cnt FROM events GROUP BY event_type ORDER BY type"
    )
    got = [tuple(r) for r in compile_query(q)(sf_tables["events"]).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    want = con.sql(oracle_sql_for(q)).fetchall()
    assert got == want


def test_bql_percentile_arity_error():
    import pytest as _pytest
    from bullet_storm_spark.bql import BQLError, parse

    with _pytest.raises(BQLError):
        parse("SELECT PERCENTILE(value) FROM events")
