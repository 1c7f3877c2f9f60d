"""Distributed full-corpus k-means: the driver loop is not one SQL
statement (rows-only entry), so correctness is pinned by an exact
pure-Python replica of every step — same init, same tie-breaks, same
rounding grid, same decimal-exact sums."""

import math
from decimal import ROUND_HALF_UP, Decimal

import pytest

from bullet_storm_spark.operators.kmeans import (
    COORD_DP,
    _unit,
    kmeans_report,
    kmeans_train,
)

SF = "/root/testdata/sf0.001"


def _round_half_up(x: float, dp: int) -> float:
    # Spark's round() on doubles: BigDecimal.valueOf (shortest repr, same
    # as Python repr) then HALF_UP at dp
    return float(Decimal(repr(x)).quantize(Decimal(f"1e-{dp}"), ROUND_HALF_UP))


def _dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _norm(a):
    acc = 0.0
    for x in a:
        acc = acc + x * x
    return math.sqrt(acc)


def _assign(v, cents):
    # assign_cells_frozen: min over (-dot, index) — ties to lowest index
    return min(((-_dot(v, c), i) for i, c in enumerate(cents)))[1]


def _reference_kmeans(vecs: dict[int, list[float]], k: int, iters: int):
    """Pure-Python replica of kmeans_train's exact arithmetic."""
    ids = sorted(vecs)
    cents = [_unit(vecs[i]) for i in ids[:k]]
    dim = len(cents[0])
    for _ in range(iters):
        sums = [[Decimal(0)] * dim for _ in range(k)]
        counts = [0] * k
        for i in ids:
            v = vecs[i]
            nrm = _norm(v)
            if nrm <= 0:
                continue
            cell = _assign(v, cents)
            counts[cell] += 1
            for d, x in enumerate(v):
                coord = _round_half_up(x / nrm, COORD_DP)
                sums[cell][d] += Decimal(repr(coord))
        new = []
        for c in range(k):
            if counts[c]:
                mean = [float(sums[c][d]) / counts[c] for d in range(dim)]
                new.append(_unit(mean))
            else:
                new.append(cents[c])
        cents = new
    return cents


@pytest.fixture(scope="module")
def embs(spark):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .where("vec_id < 64")
    )


def test_kmeans_train_matches_pure_python_oracle(embs):
    got = kmeans_train(embs, "vec_id", "embedding", k=4, iters=2)
    vecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in embs.collect()
    }
    want = _reference_kmeans(vecs, k=4, iters=2)
    assert got == want


def test_kmeans_train_deterministic(embs):
    a = kmeans_train(embs, "vec_id", "embedding", k=4, iters=2)
    b = kmeans_train(
        embs.repartition(7), "vec_id", "embedding", k=4, iters=2
    )
    # decimal-exact sums make the codebook partitioning-independent
    assert a == b


def test_kmeans_report_invariants(embs):
    rep = kmeans_report(embs, "vec_id", "embedding", k=4, iters=2).collect()
    n_total = embs.count()
    assert sum(r["n_members"] for r in rep) == n_total
    # empty cells (if Lloyd leaves any) report n_members=0 / mean_sim NULL
    assert all(
        (r["mean_sim"] is None) == (r["n_members"] == 0) for r in rep
    )
    assert all(
        r["mean_sim"] is None or -1.0 <= r["mean_sim"] <= 1.0 + 1e-9 for r in rep
    )
    assert all(r["centroid_l1"] > 0 for r in rep)
    # every codebook cell is present exactly once, in order
    assert [r["cell"] for r in rep] == list(range(4))


def test_kmeans_train_rejects_too_few_vectors(embs):
    with pytest.raises(ValueError, match="at least k"):
        kmeans_train(embs.where("vec_id < 3"), "vec_id", "embedding", k=8)
