"""Int8 embedding quantization: invariants, exactness of the integer
path, arrow/expression agreement, and recall against the float baseline."""

import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.operators import quantize as Q
from bullet_storm_spark.operators import similarity as S


@pytest.fixture(scope="module")
def embs(sf_tables):
    return sf_tables["embeddings"]


def test_quantize_invariants(embs):
    rows = Q.quantize_embeddings(embs, "vec_id", "embedding").collect()
    assert len(rows) == embs.count()
    for r in rows:
        assert r["scale"] > 0
        assert all(-127 <= x <= 127 for x in r["qv"])
        # symmetric max-abs quantization saturates at least one axis
        assert max(abs(x) for x in r["qv"]) == 127


def test_reconstruction_error_bound(embs):
    rows = Q.quantization_report(embs, "vec_id", "embedding").collect()
    for r in rows:
        # round() is nearest: error <= scale/2 (+ float-rendering slack)
        assert r["max_abs_err"] <= r["err_bound"] + 1e-9


def test_quantize_deterministic(embs):
    a = Q.quantize_embeddings(embs, "vec_id", "embedding").collect()
    b = Q.quantize_embeddings(embs, "vec_id", "embedding").collect()
    assert a == b


def test_arrow_path_bit_identical_to_expression_path(embs):
    pred = F.col("vec_id") < 8
    expr = Q.quantized_neighbors(embs, "vec_id", "embedding", pred, k=5).collect()
    arrow = Q.quantized_neighbors_arrow(embs, "vec_id", "embedding", pred, k=5).collect()
    assert [tuple(r) for r in expr] == [tuple(r) for r in arrow]


def test_quantized_recall_vs_float_baseline(embs):
    """int8 cosine preserves neighborhoods: recall@5 vs the exact float
    top-5 stays high (the quantization error per axis is <= 1/127)."""
    pred = F.col("vec_id") < 16
    exact = S.brute_force_neighbors(embs, "vec_id", "embedding", pred, k=5).collect()
    quant = Q.quantized_neighbors(embs, "vec_id", "embedding", pred, k=5).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for r in quant:
        total += 1
        if r["neighbor_id"] in truth[r["query_id"]]:
            hits += 1
    assert total == len(exact)
    assert hits / total >= 0.85, f"recall@5 {hits}/{total}"


def test_quantized_pairs_agree_with_float_pipeline(embs):
    """Same LSH blocking, quantized vs float verify: the pair sets agree
    except within the quantization error band around the threshold."""
    from bullet_storm_spark.operators import dedup as D

    kw = dict(threshold=0.4, nbits=4, ntables=4, dim=64)
    fl = {
        (r["id_a"], r["id_b"])
        for r in D.embedding_neardup_pairs_lsh(
            embs, "vec_id", "embedding", **kw
        ).collect()
    }
    qt = {
        (r["id_a"], r["id_b"])
        for r in Q.quantized_neardup_pairs_lsh(
            embs, "vec_id", "embedding", **kw
        ).collect()
    }
    assert fl and qt
    jacc = len(fl & qt) / len(fl | qt)
    assert jacc >= 0.9, f"pair-set jaccard {jacc:.3f}"


def test_zero_vector_excluded(spark):
    df = spark.createDataFrame(
        [(0, [0.0] * 4), (1, [1.0, 0.0, 0.0, 0.0]), (2, [0.9, 0.1, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = Q.quantized_neighbors(
        df, "vec_id", "embedding", F.col("vec_id") >= 0, k=2
    ).collect()
    ids = {r["query_id"] for r in out} | {r["neighbor_id"] for r in out}
    assert 0 not in ids  # all-zero vector is neither query nor candidate
    assert len(out) == 2  # 1<->2 both ways


# --- Matryoshka truncation audit -----------------------------------------

def test_matryoshka_audit(spark):
    import duckdb

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 1.0, 0.0]),   # pair (0,1): cos2 = 1.0, cos4 ~ .7071
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 1.0]),   # pair (2,3): cos2 = 1.0, cos4 ~ .7071
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from bullet_storm_spark.operators.quantize import (
        matryoshka_audit, matryoshka_audit_sql,
    )

    got = matryoshka_audit(df, "vec_id", "embedding", dims=(2,)).collect()
    assert len(got) == 1 and got[0].dims == 2 and got[0].n_pairs == 2
    # truncating to 2 dims inflates cos from .707107 to 1.0 on both pairs
    assert got[0].mean_abs_err == round(1.0 - 0.707107, 6)
    assert got[0].max_abs_err == got[0].mean_abs_err
    con = duckdb.connect()
    con.execute("CREATE TABLE e (vec_id BIGINT, embedding FLOAT[])")
    con.executemany("INSERT INTO e VALUES (?,?)", rows)
    d = con.execute(
        matryoshka_audit_sql("e", "vec_id", "embedding", dims=(2,))
    ).fetchall()
    assert [tuple(r) for r in got] == [tuple(w) for w in d]


def test_matryoshka_audit_guards(spark):
    import duckdb
    import pytest

    from bullet_storm_spark.operators.quantize import (
        matryoshka_audit, matryoshka_audit_sql,
    )

    rows = [
        (0, [0.0, 0.0, 1.0, 0.0]),   # prefix-2 is all-zero -> row dropped
        (1, [0.0, 0.0, 1.0, 1.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),   # all-zero vector -> excluded upfront
        (3, [1.0, 1.0, 0.0, 0.0]),
        (4, [1.0, 0.0, 0.0, 0.0]),
        (5, [1.0, 1.0, 0.0, 0.0]),   # only surviving pair for dims=2
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # dims=2: pair (0,1) dropped (zero prefixes), pair (2,3) dropped
    # (zero full vector), pair (4,5) survives; dims=128 > len -> no rows
    got = matryoshka_audit(df, "vec_id", "embedding", dims=(2, 128)).collect()
    assert len(got) == 1 and got[0].dims == 2 and got[0].n_pairs == 1
    con = duckdb.connect()
    con.execute("CREATE TABLE e (vec_id BIGINT, embedding FLOAT[])")
    con.executemany("INSERT INTO e VALUES (?,?)", rows)
    d = con.execute(
        matryoshka_audit_sql("e", "vec_id", "embedding", dims=(2, 128))
    ).fetchall()
    assert [tuple(r) for r in got] == [tuple(w) for w in d]
    with pytest.raises(ValueError):
        matryoshka_audit(df, "vec_id", "embedding", dims=())
    with pytest.raises(ValueError):
        matryoshka_audit_sql("e", "vec_id", "embedding", dims=(0,))
