"""Format-agnostic batch source: same rows through parquet/JSONL/CSV."""

import os

import pytest

from bullet_storm_spark.sources.tables import load_batch_source, load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sample(spark):
    return (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
        .limit(200)
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_jsonl_roundtrip(spark, sample, tmp_path):
    path = os.path.join(str(tmp_path), "events_json")
    sample.write.mode("overwrite").json(path)
    got = load_batch_source(
        spark, path, fmt="json",
        schema="event_id long, user_id long, event_type string, value double",
    ).select("event_id", "user_id", "event_type", "value")
    assert _rows(got) == _rows(sample)


def test_csv_roundtrip_with_schema(spark, sample, tmp_path):
    path = os.path.join(str(tmp_path), "events_csv")
    sample.write.mode("overwrite").option("header", "true").csv(path)
    got = load_batch_source(
        spark, path, fmt="csv",
        schema="event_id long, user_id long, event_type string, value double",
    ).select("event_id", "user_id", "event_type", "value")
    assert _rows(got) == _rows(sample)


def test_extension_dispatch_and_unknown(spark, sample, tmp_path):
    p = os.path.join(str(tmp_path), "e.parquet")
    sample.write.mode("overwrite").parquet(p)
    assert _rows(load_batch_source(spark, p)) == _rows(sample)
    with pytest.raises(ValueError, match="cannot infer format"):
        load_batch_source(spark, "/tmp/file.xyz")


def test_tsv_with_explicit_csv_fmt_gets_tab_sep(spark, tmp_path):
    p = tmp_path / "t.tsv"
    p.write_text("a\tb\n1\tx\n2\ty\n")
    from bullet_storm_spark.sources.tables import load_batch_source

    df = load_batch_source(spark, str(p), fmt="csv", schema="a int, b string")
    assert df.columns == ["a", "b"]
    assert sorted(tuple(r) for r in df.collect()) == [(1, "x"), (2, "y")]
