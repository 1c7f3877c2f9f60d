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
