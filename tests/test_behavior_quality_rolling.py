"""Tests for the r8 fifth batch: activity concentration, session
report, top movers, rolling median, code detection."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.operators.behavior import (
    session_report,
    session_report_sql,
)
from bullet_storm_spark.operators.concentration import (
    activity_concentration,
    activity_concentration_sql,
)
from bullet_storm_spark.operators.quality import (
    code_detection,
    code_detection_sql,
)
from bullet_storm_spark.operators.rolling import (
    rolling_median,
    rolling_median_sql,
)
from bullet_storm_spark.operators.trend import top_movers, top_movers_sql

_US_PER_HOUR = 3_600_000_000


@pytest.fixture(scope="module")
def ev(spark):
    random.seed(5)
    rows = []
    for eid in range(800):
        uid = random.randrange(40) if random.random() < 0.8 else random.randrange(3)
        h = random.randrange(48)
        rows.append(
            (eid, uid, "t%d" % (eid % 4), round(random.uniform(0, 100), 3),
             h * _US_PER_HOUR * 1000 + random.randrange(_US_PER_HOUR) * 1000)
        )
    return spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, value double, ts_ns long",
    )


@pytest.fixture(scope="module")
def ev_duck(ev):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev (event_id BIGINT, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE, ts TIMESTAMP)"
    )
    con.executemany(
        "INSERT INTO ev VALUES (?,?,?,?,make_timestamp(?))",
        [(r.event_id, r.user_id, r.event_type, r.value, r.ts_ns // 1000)
         for r in ev.collect()],
    )
    return con


# --- activity concentration ----------------------------------------------------

def test_activity_gini_hand_oracle(spark):
    # counts 1,1,1,1,6: gini via the exact rank formula
    rows = []
    eid = 0
    for uid, c in enumerate([1, 1, 1, 1, 6]):
        for _ in range(c):
            rows.append((eid, uid))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long")
    out = activity_concentration(df, "user_id").collect()[0]
    xs = sorted([1, 1, 1, 1, 6])
    n = len(xs)
    s0 = sum(xs)
    s1 = sum((i + 1) * x for i, x in enumerate(xs))
    gini = (2 * s1 - (n + 1) * s0) / (n * s0)
    assert (out.n_keys, out.n_events) == (5, 10)
    assert out.gini == round(gini, 9)
    # top decile: ceil(5/10)=1 largest actor owns 6/10
    assert out.top_decile_share == 0.6


def test_activity_gini_uniform_is_zero(spark):
    rows = [(i, i % 4) for i in range(16)]
    df = spark.createDataFrame(rows, "event_id long, user_id long")
    assert activity_concentration(df, "user_id").collect()[0].gini == 0.0


def test_activity_gini_duck_parity(ev, ev_duck):
    sp = [tuple(r) for r in activity_concentration(ev, "user_id").collect()]
    duck = ev_duck.execute(activity_concentration_sql("ev", "user_id")).fetchall()
    assert sp == duck


# --- session report -------------------------------------------------------------

def test_session_report_hand_oracle(spark):
    # user 1: two sessions (3 events tight, then 1 event an hour later);
    # user 2: one single-event session -> 2 bounces of 3 sessions
    rows = [
        (0, 1, 10.0, 0),
        (1, 1, 10.0, 60_000_000),
        (2, 1, 10.0, 120_000_000),
        (3, 1, 5.0, 2 * _US_PER_HOUR * 1_000_000 // 1_000_000 * 1_000_000),
        (4, 2, 7.0, 0),
    ]
    rows = [(e, u, v, us * 1000) for e, u, v, us in rows]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, value double, ts_ns long"
    )
    out = session_report(df).collect()[0]
    assert (out.n_sessions, out.n_users, out.n_bounce) == (3, 2, 2)
    assert out.bounce_rate == round(2 / 3, 9)
    assert out.avg_events == round(5 / 3, 9)
    assert out.avg_value == round((30.0 + 5.0 + 7.0) / 3, 9)


def test_session_report_duck_parity(ev, ev_duck):
    sp = [tuple(r) for r in session_report(ev).collect()]
    duck = ev_duck.execute(session_report_sql("ev")).fetchall()
    assert sp == duck


# --- top movers ------------------------------------------------------------------

def test_top_movers_hand_oracle(spark):
    # span hours 0..9 -> mid 4; user 1 all early, user 2 all late,
    # user 3 balanced
    rows = []
    eid = 0
    for uid, hours in ((1, [0, 1, 2]), (2, [7, 8, 9]), (3, [0, 9])):
        for h in hours:
            rows.append((eid, uid, h * _US_PER_HOUR * 1000))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts_ns long")
    out = top_movers(df, "user_id", top_k=10).collect()
    byk = {r.key: r for r in out}
    assert (byk[1].cnt_a, byk[1].cnt_b, byk[1].delta) == (3, 0, -3)
    assert (byk[2].cnt_a, byk[2].cnt_b, byk[2].delta) == (0, 3, 3)
    assert byk[3].delta == 0
    # |delta| ordering with key tie-break: 1 (|−3|) before 2? no — equal
    # |delta|, key asc -> user 1 first
    assert [r.key for r in out] == [1, 2, 3]


def test_top_movers_duck_parity(ev, ev_duck):
    sp = [tuple(r) for r in top_movers(ev, "user_id", top_k=12).collect()]
    duck = ev_duck.execute(top_movers_sql("ev", "user_id", top_k=12)).fetchall()
    assert sp == duck


# --- rolling median ---------------------------------------------------------------

def test_rolling_median_hand_oracle(spark):
    # counts [5,1,4,2,9]: trailing 3-frame medians 5,3,4,2,4
    rows = []
    eid = 0
    for h, c in enumerate([5, 1, 4, 2, 9]):
        for _ in range(c):
            rows.append(("k", eid, h * _US_PER_HOUR * 1000))
            eid += 1
    df = spark.createDataFrame(rows, "event_type string, event_id long, ts_ns long")
    out = rolling_median(df, "event_type", window_hours=3).collect()
    assert [r.roll_median for r in out] == [5.0, 3.0, 4.0, 2.0, 4.0]
    assert [r.roll_n for r in out] == [1, 2, 3, 3, 3]


def test_rolling_median_ignores_spike(spark):
    # a 100x spike hour barely moves the rolling median
    counts = [4, 4, 4, 400, 4, 4]
    rows = []
    eid = 0
    for h, c in enumerate(counts):
        for _ in range(c):
            rows.append(("k", eid, h * _US_PER_HOUR * 1000))
            eid += 1
    df = spark.createDataFrame(rows, "event_type string, event_id long, ts_ns long")
    out = rolling_median(df, "event_type", window_hours=4).collect()
    assert all(r.roll_median == 4.0 for r in out)


def test_rolling_median_duck_parity(ev, ev_duck):
    sp = [tuple(r) for r in rolling_median(
        ev, "event_type", window_hours=6
    ).collect()]
    duck = ev_duck.execute(
        rolling_median_sql("ev", "event_type", window_hours=6)
    ).fetchall()
    assert sp == duck


# --- code detection ----------------------------------------------------------------

def test_code_detection_hand_oracle(spark):
    code = "def f(x):\n  y = x;\n  return {1: 2}\n"
    prose = "Plain prose about the weather and the sea."
    df = spark.createDataFrame(
        [(0, code), (1, prose), (2, None), (3, "")],
        "doc_id long, text string",
    )
    out = {r.id: r for r in code_detection(df, "doc_id", "text").collect()}
    c = out[0]
    assert c.n_braces == 2 and c.n_semis == 1 and c.n_eq == 1
    assert c.indent_lines == 2  # "  y = x;" and "  return ..."
    assert c.is_code
    p = out[1]
    assert p.n_braces == 0 and not p.is_code
    # NULL text coalesces to '' -> empty doc -> NULL score/flag
    assert out[2].code_score is None and out[2].is_code is None
    assert out[3].code_score is None


def test_code_detection_duck_parity(spark):
    rows = [
        (0, "def f(x):\n  y = x;\n  return {1: 2}\n"),
        (1, "Plain prose about the weather today."),
        (2, None),
        (3, ""),
        (4, "x = 1; y = 2; z = {a: b};"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?,?)", rows)
    sp = [tuple(r) for r in code_detection(df, "doc_id", "text").collect()]
    duck = con.execute(code_detection_sql("documents", "doc_id", "text")).fetchall()
    assert sp == duck


# --- RFM segmentation --------------------------------------------------------

def test_rfm_hand_oracle(spark):
    # 3 users with clearly ordered R/F/M; corpus max is user 3's event
    rows = [
        # user 1: stale, low frequency, low value
        (0, 1, 10.0, 0),
        # user 2: mid
        (1, 2, 50.0, 10 * _US_PER_HOUR * 1000),
        (2, 2, 50.0, 11 * _US_PER_HOUR * 1000),
        # user 3: fresh, frequent, high value
        (3, 3, 100.0, 20 * _US_PER_HOUR * 1000),
        (4, 3, 100.0, 21 * _US_PER_HOUR * 1000),
        (5, 3, 100.0, 22 * _US_PER_HOUR * 1000),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, value double, ts_ns long"
    )
    from bullet_storm_spark.operators.behavior import rfm_segments

    out = {r.user_id: r for r in rfm_segments(df).collect()}
    assert out[1].r_hours == 22 and out[3].r_hours == 0
    assert (out[1].frequency, out[2].frequency, out[3].frequency) == (1, 2, 3)
    assert out[3].monetary == 300.0
    # strict orderings: user 3 beats user 2 beats user 1 on every score
    for col in ("r_score", "f_score", "m_score"):
        assert out[3][col] > out[2][col] > out[1][col]
    assert out[3].rfm_code == f"{out[3].r_score}{out[3].f_score}{out[3].m_score}"


def test_rfm_duck_parity(ev, ev_duck):
    from bullet_storm_spark.operators.behavior import (
        rfm_segments,
        rfm_segments_sql,
    )

    sp = [tuple(r) for r in rfm_segments(ev).collect()]
    duck = ev_duck.execute(rfm_segments_sql("ev")).fetchall()
    assert sp == duck
