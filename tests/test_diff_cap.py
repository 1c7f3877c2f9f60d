"""Corpus snapshot diff + per-group cap: semantics and determinism."""

from pyspark.sql import functions as F

from bullet_storm_spark.operators.diff import corpus_diff, diff_summary
from bullet_storm_spark.operators.sampling import cap_accounting, cap_per_group


def _snap(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_diff_statuses(spark):
    old = _snap(spark, [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, "delta")])
    new = _snap(spark, [(2, "beta"), (3, "GAMMA  v2"), (5, "epsilon")])
    got = {r.id: r.status for r in corpus_diff(old, new, "doc_id", "text").collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "removed", 5: "added"}


def test_diff_fingerprint_normalizes_whitespace_and_case(spark):
    # fingerprint() lowercases + collapses whitespace: cosmetic edits are
    # NOT "changed"
    old = _snap(spark, [(1, "Hello   World")])
    new = _snap(spark, [(1, "hello world")])
    [r] = corpus_diff(old, new, "doc_id", "text").collect()
    assert r.status == "unchanged"


def test_diff_summary_pct(spark):
    old = _snap(spark, [(i, f"doc {i}") for i in range(10)])
    new = _snap(
        spark,
        [(i, f"doc {i}" if i % 3 else f"doc {i} v2") for i in range(8)]
        + [(100, "new"), (101, "new2")],
    )
    rows = {r.status: r for r in diff_summary(old, new, "doc_id", "text").collect()}
    assert rows["added"].n == 2 and rows["removed"].n == 2
    assert rows["changed"].n == 3  # ids 0, 3, 6
    assert rows["unchanged"].n == 5
    assert rows["removed"].pct_of_new is None
    assert abs(rows["added"].pct_of_new - 0.2) < 1e-9  # 2 / 10 new docs


def test_cap_bounds_and_determinism(spark):
    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(90)]
    df = spark.createDataFrame(rows, "id long, grp string")
    kept1 = cap_per_group(df, "grp", "id", cap=10)
    got1 = sorted((r.grp, r.id, r.grp_rank) for r in kept1.collect())
    # every group capped at 10, ranks are 1..10
    per_grp = {}
    for g, i, rk in got1:
        per_grp.setdefault(g, []).append(rk)
    assert all(sorted(v) == list(range(1, 11)) for v in per_grp.values())
    # deterministic under re-partitioning: same survivors, same ranks
    got2 = sorted(
        (r.grp, r.id, r.grp_rank)
        for r in cap_per_group(df.repartition(7), "grp", "id", cap=10).collect()
    )
    assert got1 == got2


def test_cap_under_cap_groups_survive_whole(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "id long, grp string")
    kept = cap_per_group(df, "grp", "id", cap=5)
    assert kept.count() == 3


def test_cap_accounting(spark):
    rows = [(i, "hot" if i < 40 else "cold") for i in range(50)]
    df = spark.createDataFrame(rows, "id long, grp string")
    got = {r.grp: r for r in cap_accounting(df, "grp", "id", cap=15).collect()}
    assert got["hot"].n_rows == 40 and got["hot"].kept == 15 and got["hot"].dropped == 25
    assert got["cold"].n_rows == 10 and got["cold"].kept == 10 and got["cold"].dropped == 0


def test_cap_rejects_nonpositive(spark):
    import pytest

    df = spark.createDataFrame([(1, "a")], "id long, grp string")
    with pytest.raises(ValueError):
        cap_per_group(df, "grp", "id", cap=0)
    with pytest.raises(ValueError):
        cap_accounting(df, "grp", "id", cap=0)


def test_diff_null_text_presence_and_change(spark):
    # presence is tested on the ID: NULL text != absent doc (r6 review)
    old = _snap(spark, [(1, None), (2, None), (3, "real")])
    new = _snap(spark, [(1, "now has text"), (2, None), (3, None)])
    got = {r.id: r.status for r in corpus_diff(old, new, "doc_id", "text").collect()}
    assert got == {1: "changed", 2: "unchanged", 3: "changed"}
