"""PCA projection: offline-vs-Spark fit identity, orthonormal components,
variance ordering, DuckDB parity, and validation."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from bullet_storm_spark.operators import pca as P

SF = "/root/testdata/sf0.001"
PQ = f"{SF}/embeddings.parquet"


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(PQ)


@pytest.fixture(scope="module")
def codebook():
    return P.pca_fit_from_parquet(PQ, "vec_id", "embedding", n_components=8)


def test_offline_fit_identical_to_spark_fit(embs, codebook):
    spark_fit = P.pca_fit(embs, "vec_id", "embedding", n_components=8)
    assert spark_fit == codebook


def test_components_orthonormal(codebook):
    w = np.array(codebook[0])
    gram = w @ w.T
    assert np.allclose(gram, np.eye(len(w)), atol=1e-6)


def test_project_parity_and_variance_order(embs, codebook):
    comps, offs = codebook
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{PQ}'")
    a = P.pca_project(embs, "vec_id", "embedding", comps, offs).toPandas()
    b = con.sql(
        P.pca_project_sql("embeddings", "vec_id", "embedding", comps, offs)
    ).df()[list(a.columns)]
    a["proj"] = a["proj"].map(list)
    b["proj"] = b["proj"].map(list)
    pd.testing.assert_frame_equal(
        a.sort_values("vec_id").reset_index(drop=True),
        b.sort_values("vec_id").reset_index(drop=True),
        check_dtype=False,
    )
    rep = P.pca_report(
        embs, "vec_id", "embedding", codebook=codebook
    ).toPandas()
    # the fit sample covers the whole table here, so captured variance is
    # non-increasing by component and every ratio is within (0, 1]
    v = list(rep["var_captured"])
    assert all(v[i] >= v[i + 1] - 1e-9 for i in range(len(v) - 1))
    assert ((rep["var_total_ratio"] > 0) & (rep["var_total_ratio"] <= 1)).all()


def test_fit_validation(embs):
    with pytest.raises(ValueError, match="n_components"):
        P.pca_fit(embs, "vec_id", "embedding", n_components=999)
    with pytest.raises(ValueError, match=">= 2"):
        P.pca_fit(embs.where("vec_id < 1"), "vec_id", "embedding")


def test_rerank_topk_recall_vs_exact(embs, codebook):
    from pyspark.sql import functions as F
    from bullet_storm_spark.operators.similarity import brute_force_neighbors

    comps, offs = codebook
    approx = P.pca_rerank_neighbors(
        embs, "vec_id", "embedding", F.col("id") < 4, comps, offs, k=5, expand=8
    ).toPandas()
    exact = brute_force_neighbors(
        embs, "vec_id", "embedding", F.col("id") < 4, k=5
    ).toPandas()
    # structural contract
    assert (approx.groupby("query_id")["rank"].max() == 5).all()
    # the exact-rerank stage means every returned cos is a TRUE cosine:
    # approx results are a subset of the corpus ranked exactly, so
    # top-1 recall vs full brute force is a meaningful overlap measure
    overlap = 0
    for qid, grp in approx.groupby("query_id"):
        ex = set(exact[exact.query_id == qid]["neighbor_id"])
        overlap += len(set(grp["neighbor_id"]) & ex)
    # coarse truncation loses some neighbors on near-isotropic data, but
    # with expand=8 at least a third of the exact top-5 must survive
    assert overlap >= len(approx) // 3
