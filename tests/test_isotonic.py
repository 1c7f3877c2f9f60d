"""Isotonic regression: the minimax-identity formulation must equal the
classical sequential PAV, stay monotone, and match the DuckDB twin."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.operators.isotonic import isotonic_fit, isotonic_fit_sql


def _py_pav(cells):
    """Sequential Pool-Adjacent-Violators over (score, cnt, pos) cells:
    the textbook stack algorithm, weighted by cnt."""
    blocks = []  # (w, p, members)
    for score, cnt, pos in sorted(cells):
        blocks.append([cnt, pos, [score]])
        while len(blocks) > 1 and (
            blocks[-2][1] * blocks[-1][0] >= blocks[-1][1] * blocks[-2][0]
        ):  # prev_rate >= cur_rate, exact integer cross-multiply
            w2, p2, m2 = blocks.pop()
            blocks[-1][0] += w2
            blocks[-1][1] += p2
            blocks[-1][2] += m2
    out = {}
    for w, p, members in blocks:
        for s in members:
            out[s] = p / w
    return out


def _cells_df(spark, cells):
    rows = []
    for score, cnt, pos in cells:
        rows += [(score, True)] * pos + [(score, False)] * (cnt - pos)
    return spark.createDataFrame(rows, "s long, y boolean")


CASES = [
    # textbook violation: middle cell dips, pools with the first
    [(1, 2, 1), (2, 5, 1), (3, 5, 4)],
    # strictly increasing: fit == raw everywhere
    [(1, 4, 0), (2, 4, 1), (3, 4, 2), (4, 4, 4)],
    # strictly decreasing: everything pools to the global rate
    [(1, 3, 3), (2, 3, 2), (3, 3, 1), (4, 3, 0)],
    # single cell
    [(7, 5, 2)],
]


@pytest.mark.parametrize("cells", CASES)
def test_minimax_equals_sequential_pav(spark, cells):
    got = {
        r.score: r.rate_fit
        for r in isotonic_fit(
            _cells_df(spark, cells), F.col("s"), F.col("y")
        ).collect()
    }
    want = _py_pav(cells)
    assert set(got) == set(want)
    for s in want:
        assert got[s] == pytest.approx(want[s], abs=1e-9), (s, got, want)


def test_randomized_pav_and_duck_parity(spark):
    rng = random.Random(20260815)
    for _ in range(3):
        cells = []
        for score in range(rng.randint(5, 25)):
            cnt = rng.randint(1, 9)
            cells.append((score, cnt, rng.randint(0, cnt)))
        df = _cells_df(spark, cells)
        rows = isotonic_fit(df, F.col("s"), F.col("y")).collect()
        want = _py_pav(cells)
        fits = [r.rate_fit for r in rows]
        # monotone nondecreasing by construction
        assert fits == sorted(fits)
        for r in rows:
            assert r.rate_fit == pytest.approx(want[r.score], abs=1e-9)
        # DuckDB twin: identical rows
        con = duckdb.connect()
        con.execute("CREATE OR REPLACE TABLE t (s BIGINT, y BOOLEAN)")
        data = [(s, True) for s, c, p in cells for _ in range(p)] + [
            (s, False) for s, c, p in cells for _ in range(c - p)
        ]
        con.executemany("INSERT INTO t VALUES (?,?)", data)
        duck = con.execute(isotonic_fit_sql("t", "s", "y")).fetchall()
        assert [tuple(r) for r in rows] == duck


def test_weighted_mse_optimality(spark):
    """The isotonic fit must not be beatable by the raw rates' own
    monotone projection on a known case: weighted MSE of the fit <=
    MSE of any other monotone candidate we try."""
    cells = [(1, 2, 1), (2, 5, 1), (3, 5, 4)]
    rows = isotonic_fit(
        _cells_df(spark, cells), F.col("s"), F.col("y")
    ).collect()
    fit = {r.score: r.rate_fit for r in rows}

    def mse(g):
        return sum(
            c * ((p / c) - g[s]) ** 2 for s, c, p in cells
        )

    base = mse(fit)
    for cand in (
        {1: 0.2, 2: 0.2, 3: 0.8},
        {1: 0.3, 2: 0.3, 3: 0.7},
        {1: 0.25, 2: 0.3, 3: 0.8},
    ):
        assert base <= mse(cand) + 1e-12
