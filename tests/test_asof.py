"""As-of join: exact semantics vs hand computation and vs DuckDB's native
ASOF JOIN on real events data."""

import duckdb
from pyspark.sql import functions as F

from bullet_storm_spark.operators.asof import asof_join, asof_join_sql


def test_asof_semantics(spark):
    states = spark.createDataFrame(
        [("u1", 10, "a"), ("u1", 20, "b"), ("u2", 15, "x")],
        "k string, t long, state string",
    )
    facts = spark.createDataFrame(
        [("u1", 5, 1), ("u1", 10, 2), ("u1", 25, 3), ("u2", 14, 4), ("u3", 9, 5)],
        "k string, t long, fid int",
    )
    out = {
        r.fid: r.asof_state
        for r in asof_join(facts, states, "k", "t", ["state"]).collect()
    }
    assert out == {
        1: None,   # before any state
        2: "a",    # state AT the fact ts matches (inclusive)
        3: "b",    # latest prior state
        4: None,   # u2's state arrives later
        5: None,   # unknown key
    }
    inner = asof_join(facts, states, "k", "t", ["state"], how="inner").collect()
    assert sorted(r.fid for r in inner) == [2, 3]


def test_asof_null_payload_latest_state_wins(spark):
    """The LATEST state row wins even when its payload column is NULL —
    per-column last(ignorenulls) would skip back to an older value and
    misclassify the match (ADVICE r1); native ASOF JOIN pins the
    semantics."""
    states = spark.createDataFrame(
        [("u1", 10, "a"), ("u1", 20, None), ("u2", 5, None)],
        "k string, t long, state string",
    )
    facts = spark.createDataFrame(
        [("u1", 15, 1), ("u1", 25, 2), ("u2", 9, 3), ("u3", 9, 4)],
        "k string, t long, fid int",
    )
    left = {
        r.fid: r.asof_state
        for r in asof_join(facts, states, "k", "t", ["state"]).collect()
    }
    # fid=2: matched row is (u1, 20, NULL) -> NULL, not the older "a";
    # fid=3: matched row exists with NULL payload
    assert left == {1: "a", 2: None, 3: None, 4: None}
    # inner keeps MATCHED facts regardless of payload nullness (2, 3)
    inner = asof_join(facts, states, "k", "t", ["state"], how="inner").collect()
    assert sorted(r.fid for r in inner) == [1, 2, 3]
    # DuckDB native ASOF JOIN agrees on both shapes
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW s AS SELECT * FROM (VALUES ('u1', 10, 'a'), "
        "('u1', 20, NULL), ('u2', 5, NULL)) t(k, t, state)"
    )
    con.execute(
        "CREATE VIEW f AS SELECT * FROM (VALUES ('u1', 15, 1), ('u1', 25, 2), "
        "('u2', 9, 3), ('u3', 9, 4)) t(k, t, fid)"
    )
    want_left = dict(
        con.sql(asof_join_sql("FROM f", "FROM s", "k", "t", ["state"], ["fid"]))
        .fetchall()
    )
    assert {k: left[k] for k in want_left} == want_left and len(want_left) == 4
    want_inner = sorted(
        r[0]
        for r in con.sql(
            asof_join_sql("FROM f", "FROM s", "k", "t", ["state"], ["fid"], how="inner")
        ).fetchall()
    )
    assert want_inner == [1, 2, 3]


def test_asof_matches_duckdb_on_events(spark):
    """purchases asof-join signups per user on the raw nanosecond clock."""
    from bullet_storm_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    facts = ev.where("event_type = 'purchase'").select(
        "event_id", "user_id", F.col("ts_ns").alias("tns")
    )
    states = ev.where("event_type = 'signup'").select(
        "user_id", F.col("ts_ns").alias("tns"), F.col("value").alias("signup_value")
    )
    got = sorted(
        tuple(r)
        for r in asof_join(facts, states, "user_id", "tns", ["signup_value"])
        .select("event_id", "asof_signup_value")
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS FROM read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    sql = asof_join_sql(
        "SELECT event_id, user_id, epoch_ns(ts) AS tns FROM events WHERE event_type = 'purchase'",
        "SELECT user_id, epoch_ns(ts) AS tns, value AS signup_value FROM events WHERE event_type = 'signup'",
        "user_id",
        "tns",
        ["signup_value"],
        ["event_id"],
    )
    want = sorted(con.sql(sql).fetchall())
    assert got == want and len(got) > 100
