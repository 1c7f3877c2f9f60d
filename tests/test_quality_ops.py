"""Tests for the quality-gating + data-selection operators: Gopher rule
suite, unicode-script profile, TF-IDF terms, DSIR importance weights, and
the deterministic epoch shuffle — behavior plus DuckDB parity."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.operators import quality as Q
from bullet_storm_spark.operators import sampling as S
from bullet_storm_spark.operators import vocab as V
from bullet_storm_spark.operators.dsir import dsir_weights, dsir_weights_sql

GOOD = (
    "the quick brown fox jumps over the lazy dog and that is for sure "
    "a fine day in the field with plenty of calm and steady words that "
    "keep going for a while so the word count clears the floor easily"
)

ROWS = [
    (0, GOOD),  # passes everything
    (1, "too short"),  # fails min_words
    (2, GOOD + " ### $$$ %%% !!! ??? *** ((( ))) @@@ &&& ^^^ ~~~ ```"),
    (3, " ".join(["zz"] * 60)),  # no stopwords, short mean word len
    (4, " ".join(["12345"] * 60)),  # numeric: fails alpha + stopwords
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


@pytest.fixture(scope="module")
def duck(docs):
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", ROWS)
    return con


def _parity(sdf, con, sql):
    a = sdf.toPandas()
    b = con.sql(sql).df()[list(a.columns)]
    key = list(a.columns)
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    return a


# --- gopher rules -----------------------------------------------------------

def test_gopher_rules_flags(docs, duck):
    out = _parity(
        Q.gopher_rules(docs, "doc_id", "text"),
        duck,
        Q.gopher_rules_sql("docs", "doc_id", "text"),
    )
    by = out.set_index("doc_id")
    assert bool(by.loc[0, "passes"])
    assert not bool(by.loc[1, "ok_words"]) and not bool(by.loc[1, "passes"])
    assert not bool(by.loc[2, "ok_symbols"])
    assert not bool(by.loc[3, "ok_stopwords"])
    assert not bool(by.loc[4, "ok_alpha"]) and not bool(by.loc[4, "ok_stopwords"])
    # measurements are consistent with flags (flag compares the emitted value)
    assert by.loc[2, "symbol_word_ratio"] > Q.GOPHER_DEFAULTS["max_symbol_word_ratio"]


def test_gopher_rules_overrides(docs):
    out = (
        Q.gopher_rules(docs, "doc_id", "text", min_words=1, min_stopword_hits=0,
                       min_alpha_word_ratio=0.0, min_mean_word_len=0.0,
                       max_symbol_word_ratio=10.0)
        .toPandas()
        .set_index("doc_id")
    )
    assert bool(out.loc[1, "passes"])  # relaxed thresholds admit everything
    assert bool(out.loc[4, "passes"])


# --- filter funnel ----------------------------------------------------------

def test_filter_funnel(docs, duck):
    out = _parity(
        Q.filter_funnel(docs, "doc_id", "text"),
        duck,
        Q.filter_funnel_sql("docs", "doc_id", "text"),
    )
    assert list(out["rule"]) == ["words", "word_len", "symbols", "alpha", "stopwords"]
    assert list(out["stage"]) == [1, 2, 3, 4, 5]
    # chain consistency: survivors of stage k enter stage k+1
    assert out.loc[0, "n_in"] == 5
    for k in range(1, 5):
        assert out.loc[k, "n_in"] == out.loc[k - 1, "n_out"]
    assert (out["n_killed"] == out["n_in"] - out["n_out"]).all()
    # a doc killed at stage k fails rule k, so it also counts as a solo
    # failure of that rule
    assert (out["n_killed"] <= out["solo_failures"]).all()
    # stage 1: only doc 1 fails min_words (solo and marginal agree)
    assert out.loc[0, "n_killed"] == 1 and out.loc[0, "solo_failures"] == 1
    assert out.loc[0, "marginal_kill_rate"] == 0.2
    # only doc 0 survives the whole cascade
    assert out.loc[4, "n_out"] == 1


# --- unigram self-entropy -----------------------------------------------

def test_token_entropy(spark):
    import math

    rows = [
        (0, "a a b b"),          # uniform over 2 kinds: H = ln 2, norm = 1
        (1, "a a a a"),          # single kind: H = 0, norm undefined
        (2, "a a a b"),          # skewed: H = -(3/4 ln 3/4 + 1/4 ln 1/4)
        (3, ""),                 # no tokens -> absent from output
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in Q.token_entropy(df, "doc_id", "text").collect()}
    assert set(out) == {0, 1, 2}
    assert out[0].n_tokens == 4 and out[0].n_distinct == 2
    assert out[0].token_entropy == round(math.log(2), 6)
    assert out[0].norm_entropy == 1.0
    assert out[1].token_entropy == 0.0 and out[1].norm_entropy is None
    h2 = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert abs(out[2].token_entropy - h2) < 1e-6
    # parity
    con = duckdb.connect()
    con.execute("CREATE TABLE edocs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO edocs VALUES (?,?)", rows)
    s = [tuple(r) for r in Q.token_entropy(df, "doc_id", "text").collect()]
    d = con.execute(Q.token_entropy_sql("edocs", "doc_id", "text")).fetchall()
    assert s == [tuple(r) for r in d]


def test_token_entropy_plan_two_exchanges(spark):
    """The doc-keyed final agg must reuse the window's hash partitioning:
    exactly two Exchanges (token agg, doc window), not three."""
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    plan = (
        Q.token_entropy(df, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    # exclude the final orderBy's range exchange from the count
    n = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n == 2, plan


# --- zlib compression signal --------------------------------------------

def test_compression_signal_exact(spark):
    """Exact pure-Python zlib oracle — the rows-only contract."""
    import zlib

    rows = [
        (0, GOOD),
        (1, "spam " * 200),        # degenerate repetition -> high ratio
        (2, ""),                   # empty: 0 raw bytes, header-only deflate
        (3, "naïve café — 中文"),   # multi-byte UTF-8
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in Q.compression_signal(df, "doc_id", "text").collect()}
    for i, t in rows:
        b = t.encode("utf-8")
        c = zlib.compress(b, 6)
        assert out[i].n_bytes == len(b)
        assert out[i].n_zlib_bytes == len(c)
        assert out[i].compression_ratio == round(len(b) / len(c), 6)
    # the signal separates repetition from prose
    assert out[1].compression_ratio > 10 > out[0].compression_ratio > 1


# --- script profile ---------------------------------------------------------

SCRIPT_ROWS = [
    (0, "plain latin text only"),
    (1, "короткий русский текст"),
    (2, "中文文本测试中文"),
    (3, "mixed латиница and 中文 chars"),
    (4, "1234 .,!? 5678"),  # no script chars at all -> 'und'
    (5, "ελληνικά words here yes"),  # greek chars outnumber latin? no: latin more
]


def test_script_profile(spark):
    df = spark.createDataFrame(SCRIPT_ROWS, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", SCRIPT_ROWS)
    out = _parity(
        Q.script_profile(df, "doc_id", "text"),
        con,
        Q.script_profile_sql("t", "doc_id", "text"),
    )
    by = out.set_index("doc_id")
    assert by.loc[0, "dominant_script"] == "latin"
    assert by.loc[1, "dominant_script"] == "cyrillic"
    assert by.loc[2, "dominant_script"] == "cjk"
    assert by.loc[4, "dominant_script"] == "und"
    assert by.loc[0, "non_ascii_ratio"] == 0.0
    assert by.loc[2, "non_ascii_ratio"] > 0.9
    # mixed doc counts both scripts
    assert by.loc[3, "n_latin"] > 0 and by.loc[3, "n_cyrillic"] > 0
    assert by.loc[3, "n_cjk"] == 2


# --- tf-idf terms -----------------------------------------------------------

TFIDF_ROWS = [
    (0, "common common common unicorn"),
    (1, "common common dragon dragon"),
    (2, "common words words words everywhere"),
]


def test_tfidf_terms(spark):
    df = spark.createDataFrame(TFIDF_ROWS, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", TFIDF_ROWS)
    out = _parity(
        V.tfidf_terms(df, "doc_id", "text", top_k=2),
        con,
        V.tfidf_terms_sql("t", "doc_id", "text", top_k=2),
    )
    by_rank = out.set_index(["doc_id", "rank"])
    # the doc-unique term outranks the corpus-wide 'common' everywhere
    assert by_rank.loc[(0, 1), "token"] == "unicorn"
    assert by_rank.loc[(1, 1), "token"] == "dragon"
    assert by_rank.loc[(2, 1), "token"] == "words"
    assert (out.groupby("doc_id")["rank"].max() <= 2).all()


# --- DSIR importance weights ------------------------------------------------

DSIR_ROWS = [
    (0, "alpha beta gamma delta alpha beta", "target"),
    (1, "alpha beta gamma delta epsilon zeta", "target"),
    (2, "alpha beta gamma delta alpha gamma", "raw"),  # looks like target
    (3, "omega psi chi phi upsilon tau", "raw"),  # looks nothing like it
    (4, "solo", "raw"),  # < 2 tokens -> no bigram
]


def test_dsir_weights(spark):
    df = spark.createDataFrame(DSIR_ROWS, "doc_id long, text string, src string")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR, src VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", DSIR_ROWS)
    out = _parity(
        dsir_weights(df, "doc_id", "text", F.col("src") == "target",
                     n_buckets=64),
        con,
        dsir_weights_sql("t", "doc_id", "text", "src = 'target'", n_buckets=64),
    )
    by = out.set_index("doc_id")
    # target-looking raw doc scores above the target-alien one
    assert by.loc[2, "log_weight"] > by.loc[3, "log_weight"]
    # and the target docs themselves score high
    assert by.loc[0, "log_weight"] > by.loc[3, "log_weight"]
    # no-bigram doc: zero grams, zero weight
    assert by.loc[4, "n_grams"] == 0 and by.loc[4, "log_weight"] == 0.0
    assert by.loc[0, "n_grams"] == 5


# --- epoch shuffle ----------------------------------------------------------

def test_epoch_shuffle(spark):
    rows = [(i, f"doc {i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    out = _parity(
        S.epoch_shuffle(df, "doc_id", "ep1", n_shards=4),
        con,
        S.epoch_shuffle_sql("t", "doc_id", "ep1", n_shards=4),
    )
    # a permutation: every id exactly once
    assert sorted(out["doc_id"]) == list(range(40))
    # positions are contiguous 1..n within each shard
    for _, grp in out.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))
    # deterministic under re-run; different seed -> different order
    again = S.epoch_shuffle(df, "doc_id", "ep1", n_shards=4).toPandas()
    pd.testing.assert_frame_equal(
        out.sort_values(["shard", "pos"]).reset_index(drop=True),
        again.sort_values(["shard", "pos"]).reset_index(drop=True),
        check_dtype=False,
    )
    other = S.epoch_shuffle(df, "doc_id", "ep2", n_shards=4).toPandas()
    assert list(other.sort_values(["shard", "pos"])["doc_id"]) != list(
        out.sort_values(["shard", "pos"])["doc_id"]
    )


# --- source divergence ------------------------------------------------------

DIV_ROWS = [
    (0, "alpha beta gamma alpha beta", "blend"),
    (1, "alpha beta gamma delta", "blend"),
    (2, "alpha beta delta gamma", "blend"),
    (3, "omega omega omega psi psi", "weird"),  # distributionally far
]


def test_source_divergence(spark):
    df = spark.createDataFrame(DIV_ROWS, "doc_id long, text string, source string")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", DIV_ROWS)
    out = _parity(
        V.source_divergence(df, "source", "text"),
        con,
        V.source_divergence_sql("t", "source", "text"),
    )
    by = out.set_index("source")
    # KL is non-negative and the alien source diverges far more
    assert (out["kl_to_corpus"] >= 0).all()
    assert by.loc["weird", "kl_to_corpus"] > by.loc["blend", "kl_to_corpus"]
    assert by.loc["blend", "n_tokens"] == 13
    assert by.loc["weird", "vocab_size"] == 2


# --- curriculum report ------------------------------------------------------

def test_curriculum_report(spark):
    rows = [
        (0, "alpha alpha alpha alpha", "easy"),   # all high-freq tokens
        (1, "alpha alpha alpha beta", "easy"),
        (2, "alpha beta rare1 rare2", "hard"),    # rare tokens -> high CE
        (3, "rare3 rare4 rare5 rare6", "hard"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    out = _parity(
        V.curriculum_report(df, "doc_id", "text", "source", n_buckets=2),
        con,
        V.curriculum_report_sql("t", "doc_id", "text", "source", n_buckets=2),
    )
    # the all-common-token docs land in the easy bucket, rares in the hard
    agg = out.groupby(["bucket", "source"])["n_docs"].sum()
    assert agg.get((1, "easy"), 0) == 2
    assert agg.get((2, "hard"), 0) == 2
    # bucket means are ordered: difficulty rises with the bucket index
    means = out.groupby("bucket")["mean_ce"].mean()
    assert means.loc[1] < means.loc[2]


# --- property-based parity (adversarial text) -------------------------------

from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

# realistic document alphabet: ASCII words/punct/digits, multilingual
# script runs, and whitespace — the input space the corpus entries see
_CHUNKS = st.sampled_from(
    [
        "the", "quick", "fox", "data", "spark", "zz", "12345", "a",
        "###", "!?.", "...", "(x)", "@@",
        "привет", "мир", "中文测试", "ελληνικά", "سلام",
        " ", "  ", "\t",
    ]
)
_TEXT = st.lists(_CHUNKS, min_size=0, max_size=30).map(" ".join)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_TEXT, min_size=1, max_size=8))
@pytest.mark.slow
def test_quality_ops_random_text_parity(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    _parity(
        Q.gopher_rules(df, "doc_id", "text"),
        con,
        Q.gopher_rules_sql("t", "doc_id", "text"),
    )
    _parity(
        Q.script_profile(df, "doc_id", "text"),
        con,
        Q.script_profile_sql("t", "doc_id", "text"),
    )
    _parity(
        V.tfidf_terms(df, "doc_id", "text", top_k=3),
        con,
        V.tfidf_terms_sql("t", "doc_id", "text", top_k=3),
    )


def test_epoch_shuffle_rejects_zero_shards(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_shards"):
        S.epoch_shuffle(df, "doc_id", "s", n_shards=0)
    with pytest.raises(ValueError, match="n_shards"):
        S.epoch_shuffle_sql("t", "doc_id", "s", n_shards=0)


# --- sparse TF-IDF cosine pairs (V.tfidf_pairs) -------------------------

class TestTfidfPairs:
    @pytest.fixture(scope="class")
    def sim_docs(self, spark):
        rows = [
            (0, "apple banana cherry durian elderberry"),
            (1, "apple banana cherry durian fig"),        # near-dup of 0
            (2, "apple banana grape honeydew icefruit"),  # some overlap
            (3, "xylo yam zucchini quince ugli"),          # disjoint
            (4, "apple banana cherry durian elderberry"), # exact dup of 0
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    @pytest.fixture(scope="class")
    def sim_duck(self, sim_docs):
        con = duckdb.connect()
        con.execute("CREATE TABLE simdocs (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO simdocs VALUES (?,?)", sim_docs.collect())
        return con

    def test_semantics(self, sim_docs):
        out = {
            (r.doc_a, r.doc_b): (r.n_shared_terms, r.cosine)
            for r in V.tfidf_pairs(
                sim_docs, "doc_id", "text", df_cap=4, min_sim=0.1
            ).collect()
        }
        # exact duplicates score 1.0 in the pruned space
        assert out[(0, 4)][1] == pytest.approx(1.0)
        # near-dup of 0 scores higher than the partial-overlap doc
        assert out[(0, 1)][1] > out[(0, 2)][1]
        # the disjoint doc pairs with nobody
        assert not any(3 in p for p in out)

    def test_df_cap_prunes_ubiquitous_terms(self, sim_docs):
        # df_cap=3 drops 'apple'/'banana' (df=4): doc 2 now shares
        # nothing with 0/1/4 above threshold
        out = V.tfidf_pairs(
            sim_docs, "doc_id", "text", df_cap=3, min_sim=0.1
        ).collect()
        assert not any(r.doc_a == 2 or r.doc_b == 2 for r in out)

    def test_duck_parity(self, sim_docs, sim_duck):
        s = [
            tuple(r)
            for r in V.tfidf_pairs(
                sim_docs, "doc_id", "text", df_cap=4, min_sim=0.1
            ).collect()
        ]
        d = sim_duck.execute(
            V.tfidf_pairs_sql("simdocs", "doc_id", "text", df_cap=4, min_sim=0.1)
        ).fetchall()
        assert s == [tuple(r) for r in d]

    def test_rejects_tiny_cap(self, sim_docs):
        with pytest.raises(ValueError):
            V.tfidf_pairs(sim_docs, "doc_id", "text", df_cap=1)

    def test_fractional_df_cap_survives_corpus_growth(self, spark, sim_docs):
        # replicate the corpus 8x with perturbed ids/text: every term's
        # absolute df scales 8x, so an absolute cap tuned for 1x empties
        # the posting list, while the fractional cap tracks N (the
        # SCALING.md data-growth finding)
        frames = [
            sim_docs.select(
                (F.col("doc_id") + i * 1000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" tag{i}")).alias("text"),
            )
            for i in range(8)
        ]
        big = frames[0]
        for f in frames[1:]:
            big = big.unionByName(f)
        absolute = V.tfidf_pairs(big, "doc_id", "text", df_cap=4, min_sim=0.1)
        fractional = V.tfidf_pairs(big, "doc_id", "text", df_cap=0.81, min_sim=0.1)
        assert absolute.count() == 0
        assert fractional.count() > 0

    def test_fractional_cap_duck_parity(self, sim_docs, sim_duck):
        s = [
            tuple(r)
            for r in V.tfidf_pairs(
                sim_docs, "doc_id", "text", df_cap=0.81, min_sim=0.1
            ).collect()
        ]
        d = sim_duck.execute(
            V.tfidf_pairs_sql("simdocs", "doc_id", "text", df_cap=0.81, min_sim=0.1)
        ).fetchall()
        assert s == [tuple(r) for r in d]

    def test_fractional_cap_validation(self, sim_docs):
        with pytest.raises(ValueError):
            V.tfidf_pairs(sim_docs, "doc_id", "text", df_cap=1.5)

    def test_zero_norm_docs_never_pair(self, spark):
        # 'common' appears in every doc (df == N <= df_cap): its idf is
        # ln(1) = 0, so docs 0/1 — made ONLY of that term — have norm 0
        # and used to surface as NaN-cosine pairs (NaN >= min_sim is true
        # in both engines; round-4 ADVICE). They must pair with nobody.
        rows = [
            (0, "common common"),
            (1, "common"),
            (2, "common alpha beta"),
            (3, "common alpha gamma"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = V.tfidf_pairs(df, "doc_id", "text", df_cap=4, min_sim=0.1).collect()
        assert not any(r.doc_a in (0, 1) or r.doc_b in (0, 1) for r in out)
        assert all(r.cosine == r.cosine for r in out)  # no NaN survives
        # (2,3) still pair on 'alpha'
        assert any((r.doc_a, r.doc_b) == (2, 3) for r in out)
        con = duckdb.connect()
        con.execute("CREATE TABLE zn (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO zn VALUES (?,?)", rows)
        d = con.execute(
            V.tfidf_pairs_sql("zn", "doc_id", "text", df_cap=4, min_sim=0.1)
        ).fetchall()
        assert [tuple(r) for r in out] == [tuple(r) for r in d]


def test_source_overlap_matrix(spark):
    import duckdb

    from bullet_storm_spark.operators.vocab import (
        source_overlap_matrix,
        source_overlap_matrix_sql,
    )

    rows = [
        # a and b share "x y z"; c is disjoint
        (1, "a", "x y z q"),
        (2, "a", "p q r"),
        (3, "b", "x y z w"),
        (4, "c", "completely different words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r.source_a, r.source_b): r
        for r in source_overlap_matrix(df, "source", "text", shingle_n=3).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}  # complete matrix
    ab = got[("a", "b")]
    assert ab.shared == 1  # the trigram "x y z"
    assert ab.grams_a == 3 and ab.grams_b == 2
    assert abs(ab.jaccard - 1 / 4) < 1e-9
    assert got[("a", "c")].shared == 0 and got[("a", "c")].jaccard == 0.0
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, source VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?,?,?)", rows)
    want = sorted(
        con.sql(source_overlap_matrix_sql("d", "source", "text", 3)).fetchall()
    )
    spark_rows = sorted(
        (r.source_a, r.source_b, r.grams_a, r.grams_b, r.shared, r.jaccard)
        for r in got.values()
    )
    assert spark_rows == want


def test_source_overlap_short_doc_and_null_sources(spark):
    import duckdb

    from bullet_storm_spark.operators.vocab import (
        source_overlap_matrix,
        source_overlap_matrix_sql,
    )

    rows = [
        (1, "a", "x y z q"),
        (2, "b", "x y z w"),
        # source d: only a too-short doc (2 tokens < trigram) -> must
        # still appear in the matrix with grams=0 (r6 review)
        (3, "d", "too short"),
        # NULL source: excluded by contract
        (4, None, "x y z leaked everywhere"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r.source_a, r.source_b): r
        for r in source_overlap_matrix(df, "source", "text", shingle_n=3).collect()
    }
    assert set(got) == {("a", "b"), ("a", "d"), ("b", "d")}
    ad = got[("a", "d")]
    assert ad.grams_b == 0 and ad.shared == 0 and ad.jaccard == 0.0
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, source VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?,?,?)", rows)
    want = sorted(
        con.sql(source_overlap_matrix_sql("d", "source", "text", 3)).fetchall()
    )
    assert want == sorted(
        (r.source_a, r.source_b, r.grams_a, r.grams_b, r.shared, r.jaccard)
        for r in got.values()
    )


# --- language-tag vs script consistency -----------------------------------

def test_script_lang_matrix(spark):
    rows = [
        (0, "en", "plain latin text here"),
        (1, "en", "plain latin words again"),
        (2, "zh", "latin text wrongly tagged chinese"),   # mismatch
        (3, "zh", "中文中文中文"),                          # consistent
        (4, "xx", "unknown language tag"),                 # no expectation
        (5, "en", "1234 .,!?"),                            # und -> not judged
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {(r.lang, r.dominant_script): r
           for r in Q.script_lang_matrix(df, "doc_id", "text", "lang").collect()}
    assert out[("en", "latin")].n_docs == 2
    assert out[("en", "latin")].is_mismatch is False
    assert out[("zh", "latin")].is_mismatch is True       # the wrong tag
    assert out[("zh", "cjk")].is_mismatch is False
    assert out[("xx", "latin")].expected_script is None
    assert out[("xx", "latin")].is_mismatch is False
    assert out[("en", "und")].is_mismatch is False
    # parity
    con = duckdb.connect()
    con.execute("CREATE TABLE sdocs (doc_id BIGINT, lang VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO sdocs VALUES (?,?,?)", rows)
    s = [tuple(r) for r in Q.script_lang_matrix(df, "doc_id", "text", "lang").collect()]
    d = con.execute(Q.script_lang_matrix_sql("sdocs", "doc_id", "text", "lang")).fetchall()
    assert s == [tuple(r) for r in d]


def test_token_fertility_hand_oracle(spark):
    import duckdb

    from bullet_storm_spark.operators.quality import (
        token_fertility, token_fertility_sql,
    )
    from bullet_storm_spark.functions.text import (
        bpe_token_count_sql, token_count_sql,
    )

    rows = [
        (1, "hello world program"),        # latin, 3 ws tokens
        (2, "the quick brown fox jumps"),  # latin
        (3, "это тест на кириллице"),      # cyrillic
        (4, "1234 5678"),                  # no script chars -> und
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.script: r for r in token_fertility(df, "text").collect()}
    assert set(out) == {"latin", "cyrillic", "und"}
    assert out["latin"].n_docs == 2
    assert out["cyrillic"].n_docs == 1
    # whitespace tokens by hand
    assert out["latin"].ws_tokens == 3 + 5
    # ratios: one division from the integer sums
    lat = out["latin"]
    assert lat.chars_per_bpe == round(lat.chars / lat.bpe_tokens, 6)
    assert lat.bpe_per_ws == round(lat.bpe_tokens / lat.ws_tokens, 6)

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    duck = con.execute(token_fertility_sql("t", "text")).fetchall()
    assert [tuple(r) for r in token_fertility(df, "text").collect()] == duck
