"""Batch behavioral analytics (operators/behavior.py): sessionization
gaps-and-islands semantics, ordered funnel conversion, retention cohorts,
and DuckDB parity for all three."""

import duckdb
import pytest

from bullet_storm_spark.operators import behavior

MIN = 60_000_000  # µs
DAY = 86_400_000_000


def _mk(spark, rows):
    # rows: (event_id, user_id, event_type, value, us)
    df = spark.createDataFrame(
        [(e, u, t, v, us * 1000) for (e, u, t, v, us) in rows],
        "event_id long, user_id long, event_type string, value double, ts_ns long",
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev (event_id BIGINT, user_id BIGINT, "
        "event_type VARCHAR, value DOUBLE, ts TIMESTAMP)"
    )
    con.executemany(
        "INSERT INTO ev VALUES (?,?,?,?,make_timestamp(?))",
        [(e, u, t, v, us) for (e, u, t, v, us) in rows],
    )
    return df, con


@pytest.fixture(scope="module")
def sess_data(spark):
    rows = [
        # user 1: three events 10 min apart, then a 2 h gap, then one more
        (1, 1, "view", 1.0, 0),
        (2, 1, "click", 2.0, 10 * MIN),
        (3, 1, "view", 3.0, 20 * MIN),
        (4, 1, "purchase", 4.0, 140 * MIN),
        # user 2: single event
        (5, 2, "view", 0.5, 5 * MIN),
    ]
    return _mk(spark, rows)


def test_sessionize_semantics(sess_data):
    df, _ = sess_data
    out = {
        (r.user_id, r.session_idx): (r.n_events, r.start_us, r.end_us, r.total_value)
        for r in behavior.sessionize(df, gap_minutes=30).collect()
    }
    assert out[(1, 1)] == (3, 0, 20 * MIN, 6.0)
    assert out[(1, 2)] == (1, 140 * MIN, 140 * MIN, 4.0)
    assert out[(2, 1)] == (1, 5 * MIN, 5 * MIN, 0.5)


def test_sessionize_duck_parity(sess_data):
    df, con = sess_data
    s = [tuple(r) for r in behavior.sessionize(df, gap_minutes=30).collect()]
    d = con.execute(behavior.sessionize_sql("ev", gap_minutes=30)).fetchall()
    assert s == [tuple(r) for r in d]


@pytest.fixture(scope="module")
def funnel_data(spark):
    rows = [
        # user 1 completes view -> click -> purchase in order
        (1, 1, "view", 0.0, 0),
        (2, 1, "click", 0.0, 10 * MIN),
        (3, 1, "purchase", 0.0, 20 * MIN),
        # user 2: click BEFORE view -> stalls at view
        (4, 2, "click", 0.0, 0),
        (5, 2, "view", 0.0, 10 * MIN),
        # user 3: view then click, purchase outside the horizon
        (6, 3, "view", 0.0, 0),
        (7, 3, "click", 0.0, 5 * MIN),
        (8, 3, "purchase", 0.0, 3 * DAY + 10 * MIN),
        # user 4: never views
        (9, 4, "purchase", 0.0, 0),
    ]
    return _mk(spark, rows)


def test_funnel_semantics(funnel_data):
    df, _ = funnel_data
    out = {
        r.stage_idx: (r.stage, r.n_users, r.conversion)
        for r in behavior.funnel(
            df, ["view", "click", "purchase"], horizon_hours=72
        ).collect()
    }
    assert out[1] == ("view", 3, 1.0)          # users 1, 2, 3
    assert out[2][1] == 2                       # users 1, 3 (user 2 clicked first)
    assert out[3][1] == 1                       # user 1 only (user 3 past horizon)
    assert out[3][2] == pytest.approx(round(1 / 3, 6))


def test_funnel_duck_parity(funnel_data):
    df, con = funnel_data
    s = [
        tuple(r)
        for r in behavior.funnel(
            df, ["view", "click", "purchase"], horizon_hours=72
        ).collect()
    ]
    d = con.execute(
        behavior.funnel_sql("ev", ["view", "click", "purchase"], horizon_hours=72)
    ).fetchall()
    assert s == [tuple(r) for r in d]


def test_funnel_rejects_single_stage(funnel_data):
    df, _ = funnel_data
    with pytest.raises(ValueError):
        behavior.funnel(df, ["view"])


@pytest.fixture(scope="module")
def cohort_data(spark):
    rows = [
        # cohort day 0: users 1, 2; user 1 returns day 1 and day 3
        (1, 1, "view", 0.0, 1 * MIN),
        (2, 2, "view", 0.0, 2 * MIN),
        (3, 1, "click", 0.0, DAY + MIN),
        (4, 1, "view", 0.0, 3 * DAY + MIN),
        # cohort day 1: user 3, returns day 2
        (5, 3, "view", 0.0, DAY + 2 * MIN),
        (6, 3, "view", 0.0, 2 * DAY + MIN),
        (7, 3, "view", 0.0, 2 * DAY + 2 * MIN),  # same day, counted once
    ]
    return _mk(spark, rows)


def test_retention_semantics(cohort_data):
    df, _ = cohort_data
    out = {
        (r.cohort_day, r.day_offset): (r.n_active, r.cohort_size, r.retention)
        for r in behavior.retention_cohorts(df).collect()
    }
    assert out[(0, 0)] == (2, 2, 1.0)
    assert out[(0, 1)] == (1, 2, 0.5)
    assert out[(0, 3)] == (1, 2, 0.5)
    assert out[(1, 0)] == (1, 1, 1.0)
    assert out[(1, 1)] == (1, 1, 1.0)
    assert (0, 2) not in out


def test_retention_duck_parity(cohort_data):
    df, con = cohort_data
    s = [tuple(r) for r in behavior.retention_cohorts(df).collect()]
    d = con.execute(behavior.retention_cohorts_sql("ev")).fetchall()
    assert s == [tuple(r) for r in d]


def test_session_assignment_consistent_with_sessionize(sess_data):
    df, con = sess_data
    assign = behavior.session_assignment(df, gap_minutes=30).collect()
    sessions = behavior.sessionize(df, gap_minutes=30).collect()
    # per (user, session): assignment count == session n_events, and
    # event_in_session runs 1..n
    from collections import defaultdict

    got = defaultdict(list)
    for r in assign:
        got[(r.user_id, r.session_idx)].append(r.event_in_session)
    for s in sessions:
        lst = sorted(got[(s.user_id, s.session_idx)])
        assert lst == list(range(1, s.n_events + 1))
    d = con.execute(behavior.session_assignment_sql("ev", gap_minutes=30)).fetchall()
    assert [tuple(r) for r in assign] == [tuple(r) for r in d]


def test_transition_matrix_semantics_and_parity(spark):
    rows = [
        # user 1: view -> click -> view -> purchase
        (1, 1, "view", 0.0, 0),
        (2, 1, "click", 0.0, MIN),
        (3, 1, "view", 0.0, 2 * MIN),
        (4, 1, "purchase", 0.0, 3 * MIN),
        # user 2: view -> click
        (5, 2, "view", 0.0, 0),
        (6, 2, "click", 0.0, MIN),
    ]
    df, con = _mk(spark, rows)
    out = {
        (r.from_type, r.to_type): (r.cnt, r.prob)
        for r in behavior.transition_matrix(df).collect()
    }
    # 'view' row: 2x view->click, 1x view->purchase
    assert out[("view", "click")] == (2, round(2 / 3, 6))
    assert out[("view", "purchase")] == (1, round(1 / 3, 6))
    # 'click' row: 1x click->view (user 1 only; user 2's click is last)
    assert out[("click", "view")] == (1, 1.0)
    # probabilities row-normalize to 1
    from collections import defaultdict

    rowsum = defaultdict(float)
    for (f, _), (_, p) in out.items():
        rowsum[f] += p
    assert all(abs(s - 1.0) < 1e-5 for s in rowsum.values())
    d = con.execute(behavior.transition_matrix_sql("ev")).fetchall()
    got = [tuple(r) for r in behavior.transition_matrix(df).collect()]
    assert got == [tuple(r) for r in d]


HOUR = 3_600_000_000


def test_attribution_first_last_touch(spark):
    rows = [
        # user 1: view @0h, click @1h, purchase @2h -> first=view last=click
        (1, 1, "view", 0.0, 0),
        (2, 1, "click", 0.0, HOUR),
        (3, 1, "purchase", 9.0, 2 * HOUR),
        # user 2: touch OUTSIDE 72h lookback -> organic (NULL touches)
        (4, 2, "view", 0.0, 0),
        (5, 2, "purchase", 5.0, 80 * HOUR),
        # user 3: touch AT conversion time (not strictly before) -> organic
        (6, 3, "click", 0.0, 10 * HOUR),
        (7, 3, "purchase", 1.0, 10 * HOUR),
    ]
    # _mk expects µs in the last slot; rows above carry us already scaled
    df, con = _mk(spark, [(e, u, t, v, us) for (e, u, t, v, us) in rows])
    got = {
        r.conv_event_id: r
        for r in behavior.attribution(
            df, "purchase", ["view", "click"], lookback_hours=72
        ).collect()
    }
    assert got[3].first_touch == "view" and got[3].last_touch == "click"
    assert got[3].n_touches == 2
    assert got[5].first_touch is None and got[5].n_touches == 0
    assert got[7].first_touch is None and got[7].n_touches == 0
    # DuckDB twin parity on the same fixture
    want = con.sql(
        behavior.attribution_sql("ev", "purchase", ["view", "click"], 72)
    ).fetchall()
    spark_rows = sorted(
        (r.conv_event_id, r.user_id, r.conv_us, r.first_touch, r.last_touch,
         r.n_touches)
        for r in got.values()
    )
    assert spark_rows == sorted(want)


def test_attribution_tie_breaks_on_event_id(spark):
    # two touches at the SAME timestamp: election must use event_id order
    us = 5 * HOUR
    rows = [
        (10, 1, "click", 0.0, us),
        (11, 1, "view", 0.0, us),
        (12, 1, "purchase", 1.0, us + HOUR),
    ]
    df, con = _mk(spark, rows)
    [r] = behavior.attribution(df, "purchase", ["view", "click"], 72).collect()
    assert r.first_touch == "click" and r.last_touch == "view"  # id 10 < 11


def test_state_intervals_collapse_and_chain(spark):
    rows = [
        # user 1: view view click view -> 3 intervals
        (1, 1, "view", 0.0, 0),
        (2, 1, "view", 0.0, 10 * MIN),
        (3, 1, "click", 0.0, 20 * MIN),
        (4, 1, "view", 0.0, 30 * MIN),
        # user 2: single state
        (5, 2, "error", 0.0, 0),
    ]
    df, con = _mk(spark, rows)
    got = sorted(
        (r.user_id, r.interval_idx, r.state, r.valid_from_us, r.valid_to_us,
         r.n_events, r.is_current)
        for r in behavior.state_intervals(df).collect()
    )
    assert got == [
        (1, 1, "view", 0, 20 * MIN, 2, False),
        (1, 2, "click", 20 * MIN, 30 * MIN, 1, False),
        (1, 3, "view", 30 * MIN, None, 1, True),
        (2, 1, "error", 0, None, 1, True),
    ]
    want = sorted(con.sql(behavior.state_intervals_sql("ev")).fetchall())
    assert got == want


def test_state_intervals_null_state_is_its_own_interval(spark):
    rows = [
        (1, 1, "view", 0.0, 0),
        (2, 1, None, 0.0, 10 * MIN),
        (3, 1, None, 0.0, 20 * MIN),
        (4, 1, "view", 0.0, 30 * MIN),
    ]
    df, con = _mk(spark, rows)
    got = sorted(
        (r.interval_idx, r.state, r.n_events)
        for r in behavior.state_intervals(df).collect()
    )
    # NULL run forms its own interval; the surrounding views do NOT merge
    assert got == [(1, "view", 1), (2, None, 2), (3, "view", 1)]
    want = sorted(
        (r[1], r[2], r[5]) for r in con.sql(behavior.state_intervals_sql("ev")).fetchall()
    )
    assert got == want


def test_sequence_ngrams_semantics_and_parity(spark):
    rows = [
        # user 1: view > click > view > click > buy
        (1, 1, "view", 0.0, 0),
        (2, 1, "click", 0.0, MIN),
        (3, 1, "view", 0.0, 2 * MIN),
        (4, 1, "click", 0.0, 3 * MIN),
        (5, 1, "buy", 0.0, 4 * MIN),
        # user 2: view > click > view  (repeats the common trigram)
        (6, 2, "view", 0.0, 0),
        (7, 2, "click", 0.0, MIN),
        (8, 2, "view", 0.0, 2 * MIN),
        # user 3: too short for any trigram
        (9, 3, "view", 0.0, 0),
        (10, 3, "click", 0.0, MIN),
    ]
    df, con = _mk(spark, rows)
    got = [tuple(r) for r in behavior.sequence_ngrams(df, n=3, min_count=1).collect()]
    # trigrams: u1 -> v>c>v, c>v>c, v>c>b; u2 -> v>c>v. No cross-user
    # paths (u3's pair never forms a trigram), so v>c>v counts twice.
    assert got[0] == (1, "view>click>view", 2)
    assert {g[1] for g in got} == {
        "view>click>view", "click>view>click", "view>click>buy",
    }
    oracle = con.execute(
        behavior.sequence_ngrams_sql("ev", n=3, min_count=1)
    ).fetchall()
    assert got == [tuple(r) for r in oracle]
    # min_count prunes the singletons; bigrams reduce to transition pairs
    got2 = behavior.sequence_ngrams(df, n=3, min_count=2).collect()
    assert [(r["path"], r["cnt"]) for r in got2] == [("view>click>view", 2)]


def test_sequence_ngrams_validation(spark):
    df, _ = _mk(spark, [(1, 1, "view", 0.0, 0)])
    with pytest.raises(ValueError):
        behavior.sequence_ngrams(df, n=1)
    with pytest.raises(ValueError):
        behavior.sequence_ngrams_sql("ev", n=3, k=0)


def test_session_assoc_rules_semantics_and_parity(spark):
    rows = [
        # u1 s1: view+click+buy | u1 s2 (2h later): view only
        (1, 1, "view", 0.0, 0),
        (2, 1, "click", 0.0, MIN),
        (3, 1, "buy", 0.0, 2 * MIN),
        (4, 1, "view", 0.0, 200 * MIN),
        # u2 s1: view+click | u2 s2: click+buy
        (5, 2, "view", 0.0, 0),
        (6, 2, "click", 0.0, MIN),
        (7, 2, "click", 0.0, 300 * MIN),
        (8, 2, "buy", 0.0, 301 * MIN),
    ]
    df, con = _mk(spark, rows)
    got = [
        tuple(r)
        for r in behavior.session_assoc_rules(
            df, gap_minutes=30, min_support=2
        ).collect()
    ]
    byp = {(g[1], g[2]): g for g in got}
    # 4 sessions total; view-sessions=3, click-sessions=3, buy-sessions=2
    # view&click together in 2 sessions -> conf(view->click)=2/3,
    # lift = (2*4)/(3*3)
    assert byp[("view", "click")][3] == 2
    assert byp[("view", "click")][4] == pytest.approx(2 / 3)
    assert byp[("view", "click")][5] == pytest.approx(8 / 9)
    # click->buy: 2 sessions, conf 2/3, lift (2*4)/(3*2)=4/3 ranks first
    assert got[0][1:3] == ("buy", "click") or got[0][1:3] == ("click", "buy")
    assert got[0][5] == pytest.approx(4 / 3)
    # min_support prunes singletons: view&buy co-occur once -> absent
    assert ("view", "buy") not in byp
    oracle = con.execute(
        behavior.session_assoc_rules_sql("ev", gap_minutes=30, min_support=2)
    ).fetchall()
    assert got == [tuple(r) for r in oracle]


def test_session_assoc_rules_validation(spark):
    df, _ = _mk(spark, [(1, 1, "view", 0.0, 0)])
    with pytest.raises(ValueError):
        behavior.session_assoc_rules(df, min_support=0)
    with pytest.raises(ValueError):
        behavior.session_assoc_rules_sql("ev", k=0)


def test_interarrival_stats_semantics_and_parity(spark):
    rows = [
        # u1 'tick': perfectly periodic (gap = MIN) -> cv 0, B = -1
        (1, 1, "tick", 0.0, 0),
        (2, 1, "tick", 0.0, MIN),
        (3, 1, "tick", 0.0, 2 * MIN),
        (4, 1, "tick", 0.0, 3 * MIN),
        # u1+u2 'hit': gaps MIN and 9*MIN (u2) -> bursty
        (5, 1, "hit", 0.0, 0),
        (6, 1, "hit", 0.0, MIN),
        (7, 2, "hit", 0.0, 0),
        (8, 2, "hit", 0.0, 9 * MIN),
        # 'solo': one event per user -> no gaps -> absent
        (9, 1, "solo", 0.0, 0),
    ]
    df, con = _mk(spark, rows)
    got = {r["event_type"]: r for r in behavior.interarrival_stats(df).collect()}
    assert set(got) == {"tick", "hit"}
    t = got["tick"]
    assert (t["n_gaps"], t["mean_gap_us"]) == (3, float(MIN))
    assert t["cv"] == 0.0 and t["burstiness"] == -1.0
    h = got["hit"]
    assert h["n_gaps"] == 2 and h["mean_gap_us"] == 5.0 * MIN
    import math
    sd = math.sqrt(((MIN - 5 * MIN) ** 2 + (9 * MIN - 5 * MIN) ** 2) / 1)
    assert h["cv"] == pytest.approx(sd / (5 * MIN), rel=1e-12)
    assert h["burstiness"] == pytest.approx((sd - 5 * MIN) / (sd + 5 * MIN), rel=1e-12)
    oracle = con.execute(behavior.interarrival_stats_sql("ev")).fetchall()
    srows = [tuple(r) for r in behavior.interarrival_stats(df).collect()]
    assert srows == [tuple(r) for r in oracle]


# ---------------------------------------------------------------------------
# Markov next-event backtest
# ---------------------------------------------------------------------------

def test_markov_backtest_hand_oracle(spark):
    import duckdb
    from pyspark.sql import functions as F

    from bullet_storm_spark.operators.behavior import (
        markov_backtest, markov_backtest_sql,
    )

    # span 0..1000 µs, split at 800. user 1 train: a->b, b->a, a->b
    # (predictor: a->b, b->a); test (us>=800): a->b (hit), b->c (miss)
    rows = [
        (1, 1, "a", 0), (1, 2, "b", 100), (1, 3, "a", 200),
        (1, 4, "b", 300), (1, 5, "a", 700),
        (1, 6, "a", 850), (1, 7, "b", 900), (1, 8, "c", 1000),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, us long"
    ).select(
        "user_id", "event_id", "event_type",
        (F.col("us") * 1000).alias("ts_ns"),
    )
    out = {r.prev_type: r for r in markov_backtest(df).collect()}
    # train pairs: (a,b),(b,a),(a,b),(b,a? no: 300->700 a->... wait
    # train events us<800: 0,100,200,300,700 -> pairs (a,b),(b,a),
    # (a,b),(b,a) -> predictor a->b, b->a
    # test events us>=800: 850 a, 900 b, 1000 c -> pairs (a,b),(b,c)
    assert out["a"].n_test == 1 and out["a"].n_correct == 1
    assert out["b"].n_test == 1 and out["b"].n_correct == 0
    assert out["__all__"].n_test == 2 and out["__all__"].accuracy == 0.5

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev (user_id BIGINT, event_id BIGINT,"
        " event_type VARCHAR, ts TIMESTAMP)"
    )
    con.executemany(
        "INSERT INTO ev VALUES (?,?,?,make_timestamp(?))",
        [(u, e, t, us) for u, e, t, us in rows],
    )
    duck = con.execute(markov_backtest_sql("ev")).fetchall()
    assert [tuple(r) for r in markov_backtest(df).collect()] == duck


def test_ltv_curve_hand_oracle(spark):
    import duckdb
    from pyspark.sql import functions as F

    from bullet_storm_spark.operators.behavior import ltv_curve, ltv_curve_sql

    D = 86_400_000_000  # µs/day
    # cohort day0: users 1,2. user1 spends 10 on d0, 5 on d2;
    # user2 spends 2 on d0. cohort day1: user3 spends 7 on d1.
    rows = [
        (1, 0, 10.0), (1, 2 * D, 5.0),
        (2, 0, 2.0),
        (3, 1 * D, 7.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, us long, value double").select(
        "user_id", (F.col("us") * 1000).alias("ts_ns"), "value"
    )
    out = {(r.cohort_day, r.day_offset): r for r in ltv_curve(df).collect()}
    c0 = out[(0, 0)]
    assert c0.cohort_size == 2 and c0.n_active == 2
    assert c0.cum_value == 12.0 and c0.ltv_per_user == 6.0
    c02 = out[(0, 2)]
    assert c02.n_active == 1 and c02.cum_value == 17.0
    assert c02.ltv_per_user == 8.5
    c1 = out[(1, 0)]
    assert c1.cohort_size == 1 and c1.cum_value == 7.0

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev (user_id BIGINT, ts TIMESTAMP, value DOUBLE)"
    )
    con.executemany(
        "INSERT INTO ev VALUES (?, make_timestamp(?), ?)",
        [(u, us, v) for u, us, v in rows],
    )
    duck = con.execute(ltv_curve_sql("ev")).fetchall()
    assert [tuple(r) for r in ltv_curve(df).collect()] == duck
