"""Incremental dedup against a persisted band index: arrivals duplicating
the historical corpus drop without rescanning old text; novel docs and
batch-internal dups behave like the one-shot pipeline."""

from bullet_storm_spark.operators import dedup


def test_incremental_dedup_against_index(spark, tmp_path):
    hist_rows = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "one two three four five six"),
        (2, "completely different historical text here"),
    ]
    hist = spark.createDataFrame(hist_rows, "doc_id long, text string")
    index = dedup.band_index(hist, "doc_id", "text")
    # persist + reload the index as parquet (the production cycle)
    path = str(tmp_path / "index")
    index.write.mode("overwrite").parquet(path)
    index = spark.read.parquet(path)

    new_rows = [
        (10, "alpha beta gamma delta epsilon"),       # dup of hist 0
        (11, "brand new novel document text"),         # novel
        (12, "brand new novel document text"),         # dup of 11 (in-batch)
        (13, "one two three four five six"),           # dup of hist 1
        (14, "another unrelated fresh document"),      # novel
    ]
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    survivors = dedup.dedup_against_index(new, index, "doc_id", "text")
    ids = sorted(r.doc_id for r in survivors.collect())
    assert ids == [11, 14]

    # appending survivors' index rows closes the loop: resubmitting the
    # same novel doc later is now a duplicate
    index2 = index.union(dedup.band_index(survivors, "doc_id", "text"))
    again = spark.createDataFrame(
        [(20, "brand new novel document text")], "doc_id long, text string"
    )
    assert dedup.dedup_against_index(again, index2, "doc_id", "text").count() == 0


def test_compact_index_preserves_rows_and_reduces_files(spark, tmp_path):
    import glob

    rows = [(i, f"document number {i} with words {i % 5}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "idx")
    # simulate many tiny appends (one per "batch")
    for lo in range(0, 40, 10):
        part = df.where((df.doc_id >= lo) & (df.doc_id < lo + 10))
        dedup.band_index(part, "doc_id", "text").write.mode("append").parquet(path)
    n_before = len(glob.glob(f"{path}/*.parquet"))

    dedup.compact_index(spark, path, partitions=2)
    out = str(tmp_path / "idx.compact")
    compacted = spark.read.parquet(out)
    assert compacted.count() == spark.read.parquet(path).count()
    assert len(glob.glob(f"{out}/*.parquet")) == 2 < n_before
    # probing the compacted index behaves identically
    probe = spark.createDataFrame(
        [(100, "document number 7 with words 2")], "doc_id long, text string"
    )
    before = dedup.dedup_against_index(probe, spark.read.parquet(path), "doc_id", "text").count()
    after = dedup.dedup_against_index(probe, compacted, "doc_id", "text").count()
    assert before == after == 0  # duplicate of historical doc 7 -> dropped
