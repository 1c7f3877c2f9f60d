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


# ---------------------------------------------------------------------------
# Quantile normalization
# ---------------------------------------------------------------------------

def test_quantile_normalize_semantics(spark):
    import duckdb

    from bullet_storm_spark.operators.distribution import (
        quantile_normalize, quantile_normalize_sql,
    )

    # group A is uniformly SHORTER than group B; pooled support is the
    # union. A's max (40) sits at A's top permille -> maps to pooled max
    rows = (
        [("A", v) for v in (10, 20, 20, 30, 40)]
        + [("B", v) for v in (100, 200, 200, 300, 400)]
    )
    df = spark.createDataFrame(rows, "src string, v long")
    out = quantile_normalize(df, "src", "v").collect()
    got = {(r.grp, r.v): (r.pct_permille, r.v_norm) for r in out}
    # hand-check A/v=40: cb=4, c=1, n=5 -> pct = 1000*(2*4+1) div 10 = 900
    # pooled cum at 900 permille: N=10; the smallest pooled v with
    # (1000*cum) div N covering 900 -> cum >= 9 -> v=300 (cum=9)
    assert got[("A", 40)] == (900, 300)
    # A's minimum: cb=0, c=1 -> pct = 100 -> pooled v with cum>=1 ->
    # need permille range of v=10 (cum=1): lo=0, hi=100 -> 100 in range
    assert got[("A", 10)] == (100, 10)
    # every (grp, v) maps to exactly one row; permille in [0, 1000]
    assert len(out) == len(got)
    assert all(0 <= p <= 1000 for p, _ in got.values())
    # monotone: within a group, higher v never gets lower v_norm
    for grp in ("A", "B"):
        seq = [vn for (g, v), (_, vn) in sorted(got.items()) if g == grp]
        assert seq == sorted(seq)

    con = duckdb.connect()
    con.execute("CREATE TABLE t (src VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    duck = con.execute(quantile_normalize_sql("t", "src", "v")).fetchall()
    assert [tuple(r) for r in out] == duck


def test_quantile_normalize_empty_permille_rows(spark):
    """Support rows covering no permille point (lo > hi) must vanish,
    not reverse-explode (the Spark sequence() descending trap)."""
    from bullet_storm_spark.operators.distribution import quantile_normalize

    # 2000 rows over 3 values: middle value covers a sliver; every
    # permille has exactly one owner -> output = support size, no dups
    rows = [("g", 1)] * 999 + [("g", 2)] * 1 + [("g", 3)] * 1000
    df = spark.createDataFrame(rows, "src string, v long")
    out = quantile_normalize(df, "src", "v").collect()
    assert len(out) == 3
    assert len({(r.grp, r.v) for r in out}) == 3
