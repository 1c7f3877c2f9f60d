"""SemDeDup semantic dedup: keep rule, cluster locality, oracle parity."""

import duckdb
import pytest

from bullet_storm_spark.operators import semdedup as sd


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v array<double>")


# two well-separated unit centroids: items assigned by sign of first axis
CENTS = [[1.0, 0.0], [-1.0, 0.0]]


def test_near_identical_in_same_cell_dropped_keep_lowest_id(spark):
    rows = [
        (1, [1.0, 0.01]),
        (2, [1.0, 0.012]),   # ~cos 1.0 with id 1 -> dropped
        (3, [-1.0, 0.5]),    # other cell, survives
    ]
    out = {
        r["id"]: (r["cell"], r["keep"])
        for r in sd.semantic_dedup(
            _df(spark, rows), "id", "v", centroids=CENTS, threshold=0.95
        ).collect()
    }
    assert out[1] == (0, True)
    assert out[2] == (0, False)
    assert out[3][1] is True


def test_similar_but_different_cells_both_kept(spark):
    # nearly identical vectors straddling the centroid boundary: SemDeDup is
    # cluster-local by design, so neither is dropped
    rows = [(1, [0.001, 1.0]), (2, [-0.001, 1.0])]
    out = sd.semantic_dedup(
        _df(spark, rows), "id", "v", centroids=CENTS, threshold=0.9
    ).collect()
    assert [r["keep"] for r in out] == [True, True]
    assert out[0]["cell"] != out[1]["cell"]


def test_chain_drops_all_but_lowest(spark):
    # 1~2, 2~3, 1~3 all above threshold in one cell -> only id 1 survives
    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.001]), (3, [1.0, 0.002])]
    out = sd.semantic_dedup(
        _df(spark, rows), "id", "v", centroids=CENTS, threshold=0.99
    ).collect()
    assert [(r["id"], r["keep"]) for r in out] == [(1, True), (2, False), (3, False)]


@pytest.mark.parametrize("threshold", [0.3, 0.4])
def test_oracle_parity_on_driver_embeddings(spark, sf_tables, threshold):
    srows = [
        tuple(r)
        for r in sd.semantic_dedup(
            sf_tables["embeddings"], "vec_id", "embedding", threshold=threshold
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS FROM "
        "read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
    )
    drows = [
        tuple(r)
        for r in con.sql(
            sd.semantic_dedup_sql(
                "embeddings", "vec_id", "embedding", threshold=threshold
            )
        ).fetchall()
    ]
    assert srows == drows
    assert any(not keep for _, _, keep in srows) or threshold > 0.35


def test_report_accounts_every_row(spark, sf_tables):
    n = sf_tables["embeddings"].count()
    rep = sd.semantic_dedup_report(
        sf_tables["embeddings"], "vec_id", "embedding", threshold=0.4
    ).collect()
    assert sum(r["n"] for r in rep) == n
    assert all(r["kept"] + r["dropped"] == r["n"] for r in rep)
