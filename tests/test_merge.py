"""MERGE INTO (upsert) semantics: action tagging, NULL-safe no-op
detection, DuckDB parity, and the single-join plan contract."""

import duckdb
import pytest

from bullet_storm_spark.operators import merge as M

TARGET = [
    (1, "a", 10.0),
    (2, "b", 20.0),
    (3, "c", None),   # NULL value in target
    (4, "d", 40.0),
    (None, "n", 5.0),  # NULL key in target: full-outer never matches it
]
UPDATES = [
    (2, "b", 25.0),   # matched, changed -> update
    (3, "c", None),   # matched, identical incl. NULL -> keep
    (4, "d", 40.0),   # matched, identical -> keep
    (9, "z", 90.0),   # new key -> insert
    (None, "m", 6.0),  # NULL key in updates: arrives as its own insert
]


@pytest.fixture(scope="module")
def frames(spark):
    t = spark.createDataFrame(TARGET, "k long, name string, bal double")
    u = spark.createDataFrame(UPDATES, "k long, name string, bal double")
    return t, u


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, name VARCHAR, bal DOUBLE)")
    con.execute("CREATE TABLE u (k BIGINT, name VARCHAR, bal DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", TARGET)
    con.executemany("INSERT INTO u VALUES (?,?,?)", UPDATES)
    return con


def test_merge_semantics(frames):
    t, u = frames
    rows = M.merge_upsert(t, u, "k", ["name", "bal"]).collect()
    out = {r.k: r for r in rows if r.k is not None}
    assert set(out) == {1, 2, 3, 4, 9}
    assert out[1].action == "keep" and out[1].bal == 10.0      # target-only
    assert out[2].action == "update" and out[2].bal == 25.0    # update wins
    assert out[3].action == "keep" and out[3].bal is None      # NULL == NULL
    assert out[4].action == "keep" and out[4].bal == 40.0      # no-op echo
    assert out[9].action == "insert" and out[9].bal == 90.0
    # NULL keys never match in a full-outer join: the target's NULL-key
    # row is a keep, the update's is an insert — presence flags, not
    # key-NULL tests, decide (the SQL twin regression)
    nulls = {(r.name, r.action) for r in rows if r.k is None}
    assert nulls == {("n", "keep"), ("m", "insert")}


def test_merge_duck_parity(frames, duck):
    t, u = frames

    def canon(rows):
        # Spark sorts NULL keys first, DuckDB last — compare as multisets
        return sorted(
            (tuple(r) for r in rows),
            key=lambda r: tuple((v is None, v) for v in r),
        )

    s = canon(M.merge_upsert(t, u, "k", ["name", "bal"]).collect())
    d = canon(duck.execute(M.merge_upsert_sql("t", "u", "k", ["name", "bal"])).fetchall())
    assert s == d
    sa = [tuple(r) for r in M.merge_accounting(t, u, "k", ["name", "bal"]).collect()]
    da = duck.execute(
        M.merge_accounting_sql("t", "u", "k", ["name", "bal"])
    ).fetchall()
    assert sa == [tuple(r) for r in da]
    assert dict((a, n) for a, n in sa) == {"insert": 2, "keep": 4, "update": 1}


def test_merge_single_join(frames):
    """Exactly one join in the plan — MERGE is one full-outer pass."""
    t, u = frames
    plan = (
        M.merge_upsert(t, u, "k", ["name", "bal"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Join") == 1
