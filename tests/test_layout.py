"""Training-shard layout writer: hive partition dirs, bounded file sizes,
within-file sort order, and lossless read-back."""

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from bullet_storm_spark.operators.layout import write_training_shards


def test_shards_partitioned_sorted_and_bounded(spark, sf_tables, tmp_path):
    docs = sf_tables["documents"].select("doc_id", "lang", "source", "n_chars")
    path = str(tmp_path / "shards")
    write_training_shards(
        docs,
        path,
        partition_by=["lang"],
        sort_by=["doc_id"],
        max_records_per_file=20,
        shard_tasks=4,
    )

    # hive partition directories exist per language
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    dirs = {os.path.basename(d) for d in glob.glob(f"{path}/lang=*")}
    assert dirs == {f"lang={l}" for l in langs}

    files = glob.glob(f"{path}/lang=*/*.parquet")
    assert len(files) > 1
    for f in files:
        t = pq.read_table(f)
        # file size bound respected
        assert t.num_rows <= 20
        # rows clustered by the sort key within every file
        ids = t.column("doc_id").to_pylist()
        assert ids == sorted(ids)

    # lossless round-trip
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert {tuple(r) for r in back.select("doc_id", "lang").collect()} == {
        tuple(r) for r in docs.select("doc_id", "lang").collect()
    }


def test_shards_without_partitioning(spark, sf_tables, tmp_path):
    docs = sf_tables["documents"].select("doc_id", "n_chars")
    path = str(tmp_path / "flat")
    write_training_shards(docs, path, sort_by=["n_chars"], max_records_per_file=100)
    files = glob.glob(f"{path}/*.parquet")
    assert files
    for f in files:
        t = pq.read_table(f)
        assert t.num_rows <= 100
        vals = t.column("n_chars").to_pylist()
        assert vals == sorted(vals)
    assert spark.read.parquet(path).count() == docs.count()


def test_zorder_key_interleaves_and_clamps(spark):
    from bullet_storm_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [(0.0, 0.0), (255.5, 255.5), (999.0, -5.0)], "x double, y double"
    )
    keys = [
        r.k
        for r in df.select(
            zorder_key([("x", 0.0, 256.0), ("y", 0.0, 256.0)], bits=8).alias("k")
        ).collect()
    ]
    assert keys[0] == 0
    # (255, 255) -> all 16 bits set
    assert keys[1] == (1 << 16) - 1
    # x clamps to bucket 255, y clamps to bucket 0 -> even bits set only
    assert keys[2] == sum(1 << (2 * b) for b in range(8))


def test_zorder_blocks_cluster_every_dimension(spark):
    # uniform 2-D grid: top-4-bit blocks must bound BOTH dims to ~1/4 of
    # their range (a single-column sort leaves the other dim full-span)
    from pyspark.sql import functions as F

    from bullet_storm_spark.operators.layout import zorder_block_report

    rows = [(float(i % 64) * 4, float((i * 17) % 64) * 4) for i in range(4096)]
    df = spark.createDataFrame(rows, "x double, y double")
    dims = [("x", 0.0, 256.0), ("y", 0.0, 256.0)]
    blocks = zorder_block_report(df, dims, bits=8, block_shift=12).collect()
    assert len(blocks) == 16
    for b in blocks:
        assert b.x_max - b.x_min <= 0.3 * 256
        assert b.y_max - b.y_min <= 0.3 * 256


def test_zorder_rejects_bad_config(spark):
    import pytest

    from bullet_storm_spark.operators.layout import zorder_key, zorder_key_sql

    with pytest.raises(ValueError):
        zorder_key([], bits=8)
    with pytest.raises(ValueError):
        zorder_key([("x", 0.0, 1.0)] * 8, bits=8)  # 64 bits overflows
    with pytest.raises(ValueError):
        zorder_key_sql([("x", 5.0, 5.0)])


def test_compaction_plan_hand_oracle(spark):
    import duckdb

    from bullet_storm_spark.operators.layout import (
        compaction_plan, compaction_plan_sql,
    )

    rows = [
        ("a", 30), ("a", 30), ("a", 50),   # 110 bytes @40 -> 3 files
        ("b", 45), ("b", 10),              # 55 -> 2 files, one oversize
        ("c", 120),                        # 120 -> 3 files, oversize doc
    ]
    df = spark.createDataFrame(rows, "src string, b long")
    out = {r.part: r for r in compaction_plan(
        df, "src", "b", target_bytes=40).collect()}
    assert (out["a"].n_files, out["a"].oversize_docs) == (3, 1)
    assert out["a"].avg_file_bytes == 110 // 3
    assert (out["b"].n_files, out["b"].oversize_docs) == (2, 1)
    assert (out["c"].n_files, out["c"].largest_doc) == (3, 120)
    assert out["a"].fill_ratio == round(110 / (3 * 40), 6)

    con = duckdb.connect()
    con.execute("CREATE TABLE t (src VARCHAR, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    duck = con.execute(
        compaction_plan_sql("t", "src", "b", target_bytes=40)
    ).fetchall()
    assert [tuple(r) for r in compaction_plan(
        df, "src", "b", target_bytes=40).collect()] == duck
