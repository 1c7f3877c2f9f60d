"""Pin the driver-canonicalizer hazard classes closed (VERDICT r5 item 1).

The driver's correctness gate hashes both result sides through pandas:
Spark via ``DataFrame.toPandas()``, DuckDB via ``.df()``. Three dtype/
shape divergences break that hash even when values agree:

1. list/dict cells — pandas ``sort_values`` raises ``unhashable type``
   (a hard driver ERROR row);
2. int-vs-float dtype divergence — e.g. an uncast windowed ``SUM`` over
   BIGINT becomes HUGEINT in DuckDB, which pandas renders float64 while
   Spark stays int64 (hash-FAIL with identical values);
3. datetime unit divergence — Spark hands pandas datetime64[ns], DuckDB
   datetime64[us].

Rounds 4 and 5 each fixed *instances* of classes 1–2 and the same bugs
recurred elsewhere. These tests pin the class: (a) the hazard detector in
``scripts/oracle_check.py`` must flag all three classes, and (b) the SQL
twins repaired this round must produce driver-safe dtypes from DuckDB.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from oracle_check import hazard_check  # noqa: E402

from bullet_storm_spark.operators import anomaly, behavior

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# (a) the detector sees every class
# ---------------------------------------------------------------------------

def test_detector_flags_int_float_divergence():
    a = pd.DataFrame({"x": pd.Series([1, 2], dtype="int64")})
    b = pd.DataFrame({"x": pd.Series([1.0, 2.0], dtype="float64")})
    issues = hazard_check(a, b)
    assert issues and "dtype divergence" in issues[0]


def test_detector_flags_container_cells():
    lists = pd.DataFrame({"y": [[1, 2], [3]]})
    arrays = pd.DataFrame({"y": [np.array([1, 2]), np.array([3])]})
    assert any("unhashable" in i for i in hazard_check(lists, lists[[]]))
    assert any("unhashable" in i for i in hazard_check(arrays[[]], arrays))


def test_detector_flags_datetime_unit_divergence():
    ns = pd.DataFrame({"t": pd.to_datetime(["2026-01-01"]).astype("datetime64[ns]")})
    us = pd.DataFrame({"t": pd.to_datetime(["2026-01-01"]).astype("datetime64[us]")})
    issues = hazard_check(ns, us)
    assert issues and "datetime64" in issues[0]


def test_detector_clean_on_identical_frames():
    a = pd.DataFrame({"x": pd.Series([1, 2], dtype="int64"), "s": ["a", "b"]})
    assert hazard_check(a, a.copy()) == []


# ---------------------------------------------------------------------------
# (b) the repaired SQL twins are driver-safe straight from DuckDB
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def duck():
    if not os.path.exists(os.path.join(SF_DIR, "events.parquet")):
        pytest.skip(f"no testdata at {SF_DIR}")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF_DIR, 'events.parquet')}')"
    )
    yield con
    con.close()


def _dtypes(con, sql):
    return con.sql(sql).df().dtypes


def test_sessionize_twin_session_idx_is_int(duck):
    dt = _dtypes(duck, behavior.sessionize_sql("events"))
    assert dt["session_idx"].kind in ("i", "u"), dt["session_idx"]


def test_session_assignment_twin_session_idx_is_int(duck):
    dt = _dtypes(duck, behavior.session_assignment_sql("events"))
    assert dt["session_idx"].kind in ("i", "u"), dt["session_idx"]
    assert dt["event_in_session"].kind in ("i", "u")


def test_ks_drift_twin_counters_are_int(duck):
    sql = anomaly.ks_drift_sql(
        "events", "event_type", "user_id % 2 = 0", "user_id % 2 = 1"
    )
    dt = _dtypes(duck, sql)
    for col in ("n_a", "n_b", "ks_num", "ks_den"):
        assert dt[col].kind in ("i", "u"), (col, dt[col])
    assert dt["ks_d"].kind == "f"
