"""Exact weighted quantiles: pure-Python oracle + DuckDB twin."""

import random

import duckdb
import pytest

from bullet_storm_spark.operators.distribution import (
    weighted_quantiles,
    weighted_quantiles_sql,
)


def _duck(rows, query):
    con = duckdb.connect()
    vals = ", ".join(f"('{k}', {v}, {w})" for k, v, w in rows)
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) v(k, v, w)")
    return con.execute(query).fetchall()


def _py_wq(rows, q):
    """Smallest v with cumw >= q*W per key (exact rational compare)."""
    out = {}
    by_key = {}
    for k, v, w in rows:
        by_key.setdefault(k, []).append((v, w))
    qm = int(round(q * 1000))
    for k, vw in by_key.items():
        agg = {}
        for v, w in vw:
            agg[v] = agg.get(v, 0) + w
        total = sum(agg.values())
        if total == 0:
            out[k] = None
            continue
        cum = 0
        for v in sorted(agg):
            cum += agg[v]
            if 1000 * cum >= qm * total:
                out[k] = v
                break
    return out


def test_weighted_median_vs_unweighted_intuition(spark):
    # 9 docs of length 10 (weight 10) + 1 doc of length 1000 (weight
    # 1000): unweighted median is 10, but more than half the token mass
    # is in the big doc -> weighted median = 1000
    rows = [("s", 10, 10)] * 9 + [("s", 1000, 1000)]
    df = spark.createDataFrame(rows, "k string, v long, w long")
    got = [
        tuple(r)
        for r in weighted_quantiles(df, "k", "v", "w", qs=[0.5]).collect()
    ]
    want = _duck(rows, weighted_quantiles_sql("t", "k", "v", "w", qs=[0.5]))
    assert got == want
    assert got[0] == ("s", 0.5, 1000)


def test_weighted_quantiles_exact_boundary(spark):
    # W=10, q=0.3 -> threshold exactly 3: value whose cum reaches 3
    rows = [("s", 1, 3), ("s", 2, 3), ("s", 3, 4)]
    df = spark.createDataFrame(rows, "k string, v long, w long")
    got = [
        tuple(r)
        for r in weighted_quantiles(
            df, "k", "v", "w", qs=[0.3, 0.301, 1.0]
        ).collect()
    ]
    want = _duck(
        rows, weighted_quantiles_sql("t", "k", "v", "w", qs=[0.3, 0.301, 1.0])
    )
    assert got == want
    by_q = {r[1]: r[2] for r in got}
    assert by_q[0.3] == 1  # cum(1)=3 == 0.3*10 exactly (>= is inclusive)
    assert by_q[0.301] == 2
    assert by_q[1.0] == 3


def test_weighted_quantiles_zero_weight_key(spark):
    rows = [("z", 5, 0), ("z", 7, 0), ("a", 1, 2)]
    df = spark.createDataFrame(rows, "k string, v long, w long")
    got = [
        tuple(r) for r in weighted_quantiles(df, "k", "v", "w", qs=[0.5]).collect()
    ]
    want = _duck(rows, weighted_quantiles_sql("t", "k", "v", "w", qs=[0.5]))
    assert got == want
    assert dict((r[0], r[2]) for r in got) == {"a": 1, "z": None}


def test_weighted_quantiles_validation(spark):
    df = spark.createDataFrame([("a", 1, 1)], "k string, v long, w long")
    for bad in ([], [0.0], [1.0001], [0.1234]):
        with pytest.raises(ValueError):
            weighted_quantiles(df, "k", "v", "w", qs=bad)
        with pytest.raises(ValueError):
            weighted_quantiles_sql("t", "k", "v", "w", qs=bad)


@pytest.mark.parametrize("seed", range(3))
def test_weighted_quantiles_parity_fuzz(spark, seed):
    rng = random.Random(4400 + seed)
    rows = [
        (rng.choice(["a", "b"]), rng.randint(-20, 20), rng.randint(0, 50))
        for _ in range(rng.randint(5, 120))
    ]
    qs = sorted(rng.sample([0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0], 3))
    df = spark.createDataFrame(rows, "k string, v long, w long")
    got = [
        tuple(r) for r in weighted_quantiles(df, "k", "v", "w", qs=qs).collect()
    ]
    want = _duck(rows, weighted_quantiles_sql("t", "k", "v", "w", qs=qs))
    assert got == want
    for q in qs:
        ref = _py_wq(rows, q)
        by_key = {r[0]: r[2] for r in got if r[1] == float(q)}
        assert by_key == ref
