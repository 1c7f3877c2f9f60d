"""Query JSON round-trip: every entry-inventory query must survive
serialization and still compile to the identical oracle SQL (which is a
full structural fingerprint of the query)."""

import __spark_entry__ as entry_mod
from bullet_storm_spark import compile_query, oracle_sql_for
from bullet_storm_spark.bql import parse
from bullet_storm_spark.plans.serde import query_from_json, query_to_json


def test_all_core_queries_round_trip():
    for name, q in entry_mod._core_queries().items():
        back = query_from_json(query_to_json(q))
        assert oracle_sql_for(back) == oracle_sql_for(q), name


def test_bql_queries_round_trip_and_run(spark, sf_tables):
    q = parse(
        "SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type "
        "HAVING cnt > 100 ORDER BY cnt DESC LIMIT 3"
    )
    back = query_from_json(query_to_json(q))
    a = sorted(map(tuple, compile_query(q)(sf_tables["events"]).collect()))
    b = sorted(map(tuple, compile_query(back)(sf_tables["events"]).collect()))
    assert a == b and len(a) > 0


def test_windowed_query_round_trip():
    q = parse("SELECT * FROM STREAM(60000, TIME) WINDOWING EVERY(10, RECORD)")
    back = query_from_json(query_to_json(q))
    assert back.window.emit_every == 10
    assert back.duration_ms == 60000
