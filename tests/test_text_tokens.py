"""BPE-ish token counting + rolling fingerprints: behavior and DuckDB
parity."""

import duckdb

from bullet_storm_spark.functions import text as T


def test_bpe_token_count_behavior(spark):
    rows = [
        ("hello world",),          # 2 segments
        ("don't stop",),           # don + 't + stop = 3
        ("a1b2",),                 # a,1,b,2 = 4
        ("  spaced   out  ",),     # 2 (whitespace not counted)
        ("price: $5.99!",),        # price,:,$,5,.,99,! -> 7ish segments
    ]
    df = spark.createDataFrame(rows, "s string")
    out = [r[0] for r in df.select(T.bpe_token_count("s")).collect()]
    assert out[0] == 2 and out[1] == 3 and out[2] == 4 and out[3] == 2
    assert out[4] >= 6


def test_rolling_fingerprint_edit_robustness(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog EXTRA TAIL"),  # append
        (2, "completely different content with other characters"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, s string")
    fp = {r.doc_id: r.fp for r in df.select(
        "doc_id", T.rolling_fingerprint("s").alias("fp")).collect()}
    # appended text usually leaves the minimizing k-gram intact
    assert fp[0] == fp[1] != fp[2]
    # too-short text -> null, not a crash
    short = spark.createDataFrame([("abc",)], "s string")
    assert short.select(T.rolling_fingerprint("s").alias("fp")).collect()[0].fp is None


def test_token_accounting_sql_parity(spark):
    rows = [(i, f"doc {i} isn't only text; value={i*3}.14") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, s string")
    spark_rows = sorted(
        tuple(r)
        for r in df.select(
            "doc_id",
            T.bpe_token_count("s").alias("bpe"),
            T.rolling_fingerprint("s").alias("fp"),
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck_rows = sorted(
        con.sql(
            f"SELECT doc_id, {T.bpe_token_count_sql('s')} AS bpe, "
            f"{T.rolling_fingerprint_sql('s')} AS fp FROM t"
        ).fetchall()
    )
    assert spark_rows == duck_rows


# --- vocabulary building ----------------------------------------------------

def test_vocabulary_counts_and_idf(spark):
    from bullet_storm_spark.operators import vocab

    rows = [
        (1, "the cat sat"),
        (2, "the the dog"),
        (3, "a cat ran"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["token"]: r for r in vocab.vocabulary(df, "doc_id", "text").collect()}
    assert out["the"]["term_freq"] == 3 and out["the"]["doc_freq"] == 2
    assert out["cat"]["term_freq"] == 2 and out["cat"]["doc_freq"] == 2
    assert out["dog"]["doc_freq"] == 1
    import math
    assert out["dog"]["idf"] == round(math.log(4 / 2), 6)


def test_vocabulary_plan_is_two_phase_and_take_ordered(spark, sf_tables):
    from bullet_storm_spark.operators import vocab

    df = vocab.vocabulary(sf_tables["documents"], "doc_id", "text", top_n=50)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # wordcount shape: partial/final pairs for both aggregations, top-N as
    # TakeOrdered (never a global sort), corpus size broadcast not collected
    assert plan.count("HashAggregate") >= 4
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# --- repetition + decontamination -------------------------------------------

def test_repetition_ratio_semantics(spark):
    from bullet_storm_spark.functions.text import repetition_ratio
    from pyspark.sql import functions as F

    rows = [
        (1, "a b a b a b"),        # bigrams: ab ba ab ba ab -> 5 total 2 uniq
        (2, "all words differ here"),
        (3, "x"),                   # shorter than n -> 0.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["rep"]
        for r in df.select(
            "doc_id", repetition_ratio("text", 2).alias("rep")
        ).collect()
    }
    assert out[1] == 0.6   # 1 - 2/5
    assert out[2] == 0.0
    assert out[3] == 0.0


def test_contamination_counts_and_flag(spark):
    from bullet_storm_spark.operators.decontam import contamination

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "totally novel training text"),
            (3, "the quick brown cat sleeps"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox runs fast")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in contamination(
            corpus, "doc_id", "text", bench, "text", shingle_n=2, threshold=0.5
        ).collect()
    }
    # doc 1 bigrams: {the quick, quick brown, brown fox, fox jumps};
    # bench has the first three -> 3/4
    assert out[1]["total_ngrams"] == 4 and out[1]["overlap_ngrams"] == 3
    assert out[1]["contamination"] == 0.75 and out[1]["is_contaminated"]
    assert out[2]["overlap_ngrams"] == 0 and not out[2]["is_contaminated"]
    # doc 3 overlaps on exactly half its bigrams: 0.5 >= threshold
    assert out[3]["overlap_ngrams"] == 2 and out[3]["contamination"] == 0.5
    assert out[3]["is_contaminated"]


def test_contamination_plan_broadcasts_benchmark_side(spark, sf_tables):
    from bullet_storm_spark.operators.decontam import contamination
    from pyspark.sql import functions as F

    docs = sf_tables["documents"]
    df = contamination(
        docs, "doc_id", "text", docs.where(F.col("doc_id") % 10 == 0), "text",
        shingle_n=3,
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # benchmark n-grams broadcast into a semi-join: the corpus n-gram
    # stream is never shuffled on the gram key
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_contamination_flags_near_duplicates(spark):
    import duckdb
    import pandas as pd
    from bullet_storm_spark.operators.decontam import (
        fuzzy_contamination,
        fuzzy_contamination_sql,
    )

    corpus_rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),  # near-dup
        (2, "totally unrelated training text about spark engines here"),
        (3, "the quick brown fox jumps over the lazy dog today"),  # exact dup
    ]
    bench_rows = [(100, "the quick brown fox jumps over the lazy dog now")]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    kw = dict(num_hashes=16, bands=4, shingle_n=1, threshold=0.5)
    out = fuzzy_contamination(
        corpus, "doc_id", "text", bench, "doc_id", "text", **kw
    ).toPandas()
    by = out.set_index("doc_id")
    # edited near-dup and its exact copy flag; the unrelated doc does not
    assert bool(by.loc[1, "contaminated"]) and bool(by.loc[3, "contaminated"])
    assert not bool(by.loc[2, "contaminated"])
    assert by.loc[1, "max_jaccard"] > 0.7
    # DuckDB twin parity on the same frame
    con = duckdb.connect()
    con.execute("CREATE TABLE corpus (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO corpus VALUES (?, ?)", corpus_rows)
    con.execute("CREATE TABLE bench (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO bench VALUES (?, ?)", bench_rows)
    twin = con.sql(
        fuzzy_contamination_sql(
            "corpus", "doc_id", "text", "bench", "doc_id", "text", **kw
        )
    ).df()[list(out.columns)]
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        twin.sort_values("doc_id").reset_index(drop=True),
        check_dtype=False,
    )


def test_fuzzy_contamination_plan_broadcasts_bench_index(spark, sf_tables):
    from bullet_storm_spark.operators.decontam import fuzzy_contamination
    from pyspark.sql import functions as F

    docs = sf_tables["documents"]
    df = fuzzy_contamination(
        docs, "doc_id", "text",
        docs.where(F.col("doc_id") % 10 == 0), "doc_id", "text",
        shingle_n=3,
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # the benchmark band index broadcasts; the probe must be a hash join,
    # never a nested loop
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
