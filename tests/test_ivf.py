"""IVF approximate neighbors: shape, determinism, and the nprobe=all
exactness property (probing every cell == brute force)."""

from pyspark.sql import functions as F

from bullet_storm_spark.operators import similarity


def test_ivf_full_probe_equals_brute_force(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = similarity.brute_force_neighbors(
        emb, "vec_id", "embedding", F.col("vec_id") < 4, k=5
    ).collect()
    ivf_all = similarity.ivf_neighbors(
        emb, "vec_id", "embedding", F.col("vec_id") < 4, k=5,
        n_centroids=8, nprobe=8,
    ).collect()
    assert [(r.query_id, r.neighbor_id, r.cos, r.rank) for r in exact] == [
        (r.query_id, r.neighbor_id, r.cos, r.rank) for r in ivf_all
    ]


def test_ivf_partial_probe_shape_and_recall(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = similarity.ivf_neighbors(
        emb, "vec_id", "embedding", F.col("vec_id") < 4, k=5,
        n_centroids=8, nprobe=3,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        cos = [r.cos for r in rows]
        assert cos == sorted(cos, reverse=True)
    # partial probing still finds the true top-1 for most queries (the
    # query's own cell contains its nearest neighbors with high probability)
    exact = similarity.brute_force_neighbors(
        emb, "vec_id", "embedding", F.col("vec_id") < 4, k=1
    ).collect()
    top1 = {r.query_id: r.neighbor_id for r in exact}
    hits = sum(
        1 for qid, rows in by_q.items() if rows and rows[0].neighbor_id == top1[qid]
    )
    assert hits >= 2  # >= half the queries (random data, 3/8 cells probed)


# --- persistent index: build -> save -> reload -> probe/append ---------------

def test_ivf_index_persist_probe_and_append(spark, sf_tables, tmp_path):
    from pyspark.sql import functions as F
    from bullet_storm_spark.operators.similarity import (
        ivf_append_to_index,
        ivf_build_index,
        ivf_probe_index,
    )

    embs = sf_tables["embeddings"]
    corpus = embs.where(F.col("vec_id") >= 10)
    queries = embs.where(F.col("vec_id") < 4)

    index, cents = ivf_build_index(corpus, "vec_id", "embedding", n_centroids=8)
    ipath, cpath = str(tmp_path / "ivf"), str(tmp_path / "cents")
    index.write.partitionBy("cell").parquet(ipath)
    cents.write.parquet(cpath)

    # fresh-session shape: reload from parquet and probe
    index2 = spark.read.parquet(ipath)
    cents2 = spark.read.parquet(cpath)
    got = ivf_probe_index(index2, cents2, queries, "vec_id", "embedding",
                          k=3, nprobe=8)
    rows = got.collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2, 3}
    for qid in (0, 1, 2, 3):
        ranks = [r["rank"] for r in rows if r["query_id"] == qid]
        assert ranks == [1, 2, 3]

    # nprobe == n_centroids probes every cell -> exact brute-force answer
    from bullet_storm_spark.operators.similarity import brute_force_neighbors
    exact = brute_force_neighbors(
        embs.where((F.col("vec_id") >= 10) | (F.col("vec_id") < 4)),
        "vec_id", "embedding", F.col("vec_id") < 4, k=3,
    ).collect()
    assert {(r["query_id"], r["neighbor_id"]) for r in rows} == {
        (r["query_id"], r["neighbor_id"]) for r in exact
    }

    # append new vectors against the frozen codebook; probe finds them
    novel = queries.select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    index3 = ivf_append_to_index(index2, cents2, novel, "vec_id", "embedding")
    got2 = ivf_probe_index(index3, cents2, queries, "vec_id", "embedding",
                           k=1, nprobe=1)
    # each query's identical twin (cos 1.0) lives in its own nearest cell
    top1 = {r["query_id"]: r["neighbor_id"] for r in got2.collect()}
    assert top1 == {0: 1000, 1: 1001, 2: 1002, 3: 1003}
