"""Group splits / Kaplan-Meier survival / interval joins: pure-Python
oracles + DuckDB twins + guards."""

import hashlib
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.operators.intervals import (
    interval_overlap_join,
    user_day_incident_overlap,
    user_day_incident_overlap_sql,
)
from bullet_storm_spark.operators.sampling import (
    group_split,
    group_split_audit,
    group_split_audit_sql,
    group_split_sql,
)
from bullet_storm_spark.operators.survival import km_survival, km_survival_sql

_US_H = 3_600_000_000


def _duck(setup_sql, query):
    con = duckdb.connect()
    con.execute(setup_sql)
    return con.execute(query).fetchall()


# --- group split ------------------------------------------------------------


def _py_bucket(gid, salt="gsplit"):
    h = hashlib.md5(f"{gid}:{salt}".encode()).hexdigest()[:8]
    return int(h, 16) / 2.0**32


def _events_sql(rows):
    vals = ", ".join(f"({u}, {i})" for u, i in rows)
    return (
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + vals
        + ") v(user_id, event_id)"
    )


SPLIT_ROWS = [(u, i) for u in range(40) for i in range(u % 5 + 1)]


def test_group_split_matches_hash_and_duckdb(spark):
    df = spark.createDataFrame(SPLIT_ROWS, "user_id long, event_id long")
    got = [tuple(r) for r in group_split(df, "user_id").collect()]
    oracle = _duck(_events_sql(SPLIT_ROWS), group_split_sql("events", "user_id"))
    assert got == oracle
    for grp, n_rows, split in got:
        u = _py_bucket(grp)
        expect = "train" if u < 0.8 else ("val" if u < 0.8 + 0.1 else "test")
        assert split == expect, (grp, u, split, expect)
        assert n_rows == grp % 5 + 1


def test_group_split_audit_proves_no_leak(spark):
    df = spark.createDataFrame(SPLIT_ROWS, "user_id long, event_id long")
    got = [tuple(r) for r in group_split_audit(df, "user_id").collect()]
    oracle = _duck(
        _events_sql(SPLIT_ROWS), group_split_audit_sql("events", "user_id")
    )
    assert got == oracle
    assert all(r[5] == 0 for r in got)  # leaked_groups
    assert sum(r[1] for r in got) == 40  # groups partition
    assert sum(r[2] for r in got) == len(SPLIT_ROWS)
    assert sum(r[4] for r in got) == pytest.approx(1.0)


def test_group_split_validation(spark):
    df = spark.createDataFrame([(1, 1)], "user_id long, event_id long")
    with pytest.raises(ValueError, match="sum to 1"):
        group_split(df, "user_id", fracs={"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="> 0"):
        group_split(df, "user_id", fracs={"a": 1.5, "b": -0.5})
    with pytest.raises(ValueError, match="duplicate"):
        group_split(df, "user_id", fracs=[("a", 0.5), ("a", 0.5)])
    with pytest.raises(ValueError, match="at least one"):
        group_split(df, "user_id", fracs={})


def test_group_split_two_way_custom_fracs(spark):
    df = spark.createDataFrame(SPLIT_ROWS, "user_id long, event_id long")
    fr = {"fit": 0.5, "holdout": 0.5}
    got = [tuple(r) for r in group_split(df, "user_id", fracs=fr).collect()]
    oracle = _duck(
        _events_sql(SPLIT_ROWS), group_split_sql("events", "user_id", fracs=fr)
    )
    assert got == oracle
    assert {r[2] for r in got} <= {"fit", "holdout"}


# --- Kaplan-Meier -----------------------------------------------------------


def _py_km(lifetimes, censor_gap, dmax):
    """lifetimes: list of (t, last_unit); dmax = corpus last unit."""
    subj = [(t, 1 if d1 <= dmax - censor_gap else 0) for t, d1 in lifetimes]
    times = sorted({t for t, c in subj if c == 1})
    out, surv = [], 1.0
    for t in times:
        n_risk = sum(1 for tt, _ in subj if tt >= t)
        d = sum(1 for tt, c in subj if tt == t and c == 1)
        cens = sum(1 for tt, c in subj if tt == t and c == 0)
        f = (n_risk - d) / n_risk
        surv = surv * f
        out.append((t, n_risk, d, cens, f, surv))
    return out


def _km_events(spark, users):
    """users: dict uid -> list of epoch hours."""
    rows = [
        (u, h * _US_H * 1000) for u, hs in users.items() for h in hs
    ]
    return spark.createDataFrame(rows, "user_id long, ts_ns long")


def _km_events_sql(users):
    vals = ", ".join(
        f"({u}, make_timestamp({h * _US_H}))"
        for u, hs in users.items()
        for h in hs
    )
    return (
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + vals
        + ") v(user_id, ts)"
    )


KM_USERS = {
    1: [0, 10],     # t=10, last=10 -> churned (dmax=100)
    2: [0, 10],     # t=10, churned (same time as 1: d=2 at t=10)
    3: [5, 35],     # t=30, churned
    4: [0, 60],     # t=60, churned
    5: [40, 100],   # t=60, last=100=dmax -> censored at 60
    6: [95, 100],   # t=5, censored (inside gap)
}


def test_km_matches_python_and_duckdb(spark):
    got = [
        tuple(r)
        for r in km_survival(
            _km_events(spark, KM_USERS), censor_gap_units=12
        ).collect()
    ]
    lifetimes = [(max(h) - min(h), max(h)) for h in KM_USERS.values()]
    expected = _py_km(lifetimes, 12, 100)
    assert got == expected
    # t=60 row: user 4 churned, user 5 censored at the same t, both at risk
    t60 = [r for r in got if r[0] == 60][0]
    assert t60[1] == 2 and t60[2] == 1 and t60[3] == 1
    oracle = _duck(
        _km_events_sql(KM_USERS), km_survival_sql("events", censor_gap_units=12)
    )
    assert got == oracle
    # survival is a non-increasing curve in (0, 1]
    survs = [r[5] for r in got]
    assert all(a >= b for a, b in zip(survs, survs[1:]))
    assert all(0 < s <= 1 for s in survs)


def test_km_validation(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        km_survival(df, censor_gap_units=-1)
    with pytest.raises(ValueError):
        km_survival(df, unit_us=0)
    with pytest.raises(ValueError):
        km_survival_sql("events", censor_gap_units=-1)


@pytest.mark.parametrize("seed", range(3))
def test_km_parity_fuzz(spark, seed):
    rng = random.Random(7400 + seed)
    users = {
        u: sorted(
            rng.sample(range(0, 300), rng.randint(1, 6))
        )
        for u in range(rng.randint(5, 25))
    }
    got = [
        tuple(r)
        for r in km_survival(
            _km_events(spark, users), censor_gap_units=24
        ).collect()
    ]
    oracle = _duck(
        _km_events_sql(users), km_survival_sql("events", censor_gap_units=24)
    )
    assert got == oracle
    dmax = max(max(h) for h in users.values())
    lifetimes = [(max(h) - min(h), max(h)) for h in users.values()]
    assert got == _py_km(lifetimes, 24, dmax)


# --- interval joins ---------------------------------------------------------


def _py_overlap(lefts, rights):
    out = set()
    for lid, ls, le in lefts:
        for rid, rs, re_ in rights:
            if ls <= re_ and rs <= le:
                out.add((lid, rid, max(ls, rs), min(le, re_), min(le, re_) - max(ls, rs)))
    return out


def test_interval_overlap_join_matches_bruteforce(spark):
    B = 1000
    lefts = [
        ("a", 0, 500),        # inside bucket 0
        ("b", 900, 2100),     # spans buckets 0-2
        ("c", 5000, 5000),    # point interval
        ("d", 3000, 3999),    # exactly bucket 3
    ]
    rights = [
        ("x", 450, 950),      # overlaps a (450..500) and b (900..950)
        ("y", 2100, 2100),    # touches b's closed end exactly
        ("z", 4000, 4999),    # adjacent to d, NO overlap (closed ints)
        ("w", 0, 9999),       # overlaps everything
    ]
    ldf = spark.createDataFrame(lefts, "lid string, ls long, le long")
    rdf = spark.createDataFrame(rights, "rid string, rs long, re long")
    got = {
        tuple(r)
        for r in interval_overlap_join(
            ldf, rdf, ["lid"], "ls", "le", ["rid"], "rs", "re", bucket_us=B
        ).collect()
    }
    assert got == _py_overlap(lefts, rights)
    # dedupe check: b x w share 3 buckets but appear once
    assert sum(1 for t in got if t[:2] == ("b", "w")) == 1


def test_interval_overlap_join_validation_and_guard(spark):
    ldf = spark.createDataFrame([("a", 0, 10**7)], "lid string, ls long, le long")
    rdf = spark.createDataFrame([("x", 0, 5)], "rid string, rs long, re long")
    with pytest.raises(ValueError, match="bucket_us"):
        interval_overlap_join(ldf, rdf, ["lid"], "ls", "le", ["rid"], "rs", "re", bucket_us=0)
    with pytest.raises(ValueError, match="disjoint"):
        interval_overlap_join(ldf, ldf, ["lid"], "ls", "le", ["lid"], "ls", "le")
    # the fan-out guard fires at action time on a degenerate interval
    with pytest.raises(Exception, match="buckets"):
        interval_overlap_join(
            ldf, rdf, ["lid"], "ls", "le", ["rid"], "rs", "re",
            bucket_us=10, max_buckets=5,
        ).collect()


def test_user_day_incident_overlap_matches_duckdb(spark, sf_tables):
    got = [
        tuple(r) for r in user_day_incident_overlap(sf_tables["events"]).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    oracle = con.execute(user_day_incident_overlap_sql("events")).fetchall()
    assert got == oracle
    assert len(got) == 15  # 5 types x top-3 hours
    assert all(r[2] > 0 and r[3] > 0 for r in got)


# ---------------------------------------------------------------------------
# Temporal embargo split audit
# ---------------------------------------------------------------------------

def test_time_split_audit_hand_oracle(spark):
    from bullet_storm_spark.operators.sampling import time_split_audit

    # span 0..1000 µs, 80% boundary -> split=800; embargo 100 µs ->
    # embargo band [800, 900), test [900, 1000]
    rows = [
        ("a", 0), ("a", 500), ("a", 950),    # a: train+test -> leaks
        ("b", 100), ("b", 799),              # b: train only
        ("c", 850),                          # c: embargo only
        ("d", 900), ("d", 1000),             # d: test only
    ]
    df = spark.createDataFrame(rows, "user_id string, us long")
    out = {
        r.bucket: r
        for r in time_split_audit(
            df, ts_us=__import__("pyspark.sql.functions", fromlist=["col"]).col("us"),
            embargo_us=100,
        ).collect()
    }
    assert out["train"].n_rows == 4 and out["train"].n_users == 2
    assert out["embargo"].n_rows == 1 and out["embargo"].n_users == 1
    assert out["test"].n_rows == 3 and out["test"].n_users == 2
    assert out["test"].users_also_in_train == 1          # only 'a'
    assert out["train"].users_also_in_train is None


def test_time_split_audit_duck_parity(spark, sf_tables):
    from bullet_storm_spark.operators.sampling import (
        time_split_audit, time_split_audit_sql,
    )

    got = [tuple(r) for r in time_split_audit(sf_tables["events"]).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    oracle = con.execute(time_split_audit_sql("events")).fetchall()
    assert got == oracle
    by = {r[0]: r for r in got}
    # embargo band is 1h of a multi-day span: tiny but usually nonempty;
    # the split must partition all rows
    total = sum(r[1] for r in got)
    assert total == sf_tables["events"].count()
    assert by["train"][1] > by["test"][1] > 0
