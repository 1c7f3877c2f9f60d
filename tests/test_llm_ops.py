"""Tests for the training-data-pipeline operators (dedup / similarity /
text / multimodal) — Spark behavior plus DuckDB parity on small real data."""

import duckdb
import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.operators import dedup, multimodal, similarity
from bullet_storm_spark.functions import text as T


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox leaps over the lazy dog"),  # near dup
        (3, "completely different text about spark engines"),
        (4, "  The   QUICK brown fox jumps over the lazy dog "),  # ws/case dup
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def duck_docs(docs):
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", docs.collect())
    return con


# --- text functions ---------------------------------------------------------

def test_token_and_quality_columns(docs):
    out = docs.select(
        "doc_id",
        T.token_count("text").alias("tc"),
        T.quality_score("text").alias("q"),
        T.fingerprint("text").alias("fp"),
    ).collect()
    by_id = {r.doc_id: r for r in by_list(out)}
    assert by_id[0].tc == 9
    # normalization: 0 and 4 share a fingerprint, 2 does not
    assert by_id[0].fp == by_id[4].fp != by_id[2].fp
    assert 0.0 <= by_id[3].q <= 1.0


def by_list(rows):
    return rows


def test_text_sql_parity(docs, duck_docs):
    """Spark column builders and DuckDB SQL builders must agree exactly."""
    sdf = docs.where("text <> ''").select(
        "doc_id",
        T.token_count("text").alias("tc"),
        T.quality_score("text").alias("q"),
        T.fingerprint("text").alias("fp"),
        T.predicted_lang("text").alias("lang"),
    )
    srows = sorted(tuple(r) for r in sdf.collect())
    drows = sorted(
        duck_docs.sql(
            f"SELECT doc_id, {T.token_count_sql('text')} AS tc, "
            f"{T.quality_score_sql('text')} AS q, "
            f"{T.fingerprint_sql('text')} AS fp, "
            f"{T.predicted_lang_sql('text')} AS lang "
            f"FROM docs WHERE text <> ''"
        ).fetchall()
    )
    assert srows == drows


def test_shingles(docs):
    out = {
        r.doc_id: r.sh
        for r in docs.select("doc_id", T.shingles("text", 3).alias("sh")).collect()
    }
    assert "the quick brown" in out[0]
    assert len(out[0]) == 7  # 9 tokens -> 7 trigrams (all distinct here)
    assert out[5] == [""] or out[5] == []  # empty text degenerates, no crash


# --- dedup ------------------------------------------------------------------

def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs, "doc_id", "text")
    keep = {r.doc_id: r.keep for r in out.collect()}
    assert keep[0] is True and keep[1] is False and keep[4] is False
    assert keep[2] is True and keep[3] is True


def test_exact_dedup_sql_parity(docs, duck_docs):
    srows = sorted(tuple(r) for r in dedup.exact_dedup(docs, "doc_id", "text").collect())
    drows = sorted(duck_docs.sql(dedup.exact_dedup_sql("docs", "doc_id", "text")).fetchall())
    assert srows == drows


def test_minhash_lsh_finds_near_dups(docs):
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4, shingle_n=1, threshold=0.5
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in found and (0, 4) in found  # exact dups, jaccard 1.0
    assert (0, 2) in found  # near dup (8/10 unigram overlap)
    assert all(r.jaccard >= 0.5 for r in pairs)


def test_minhash_lsh_sql_parity(docs, duck_docs):
    kw = dict(num_hashes=16, bands=4, shingle_n=1, threshold=0.5)
    srows = sorted(
        tuple(r) for r in dedup.minhash_lsh_pairs(docs, "doc_id", "text", **kw).collect()
    )
    drows = sorted(
        duck_docs.sql(dedup.minhash_lsh_pairs_sql("docs", "doc_id", "text", **kw)).fetchall()
    )
    assert srows == drows


def test_simhash_parity_and_pairs(docs, duck_docs):
    srows = sorted(tuple(r) for r in dedup.simhash(docs, "doc_id", "text").collect())
    drows = sorted(duck_docs.sql(dedup.simhash_sql("docs", "doc_id", "text")).fetchall())
    assert srows == drows
    by_id = dict(srows)
    assert by_id[0] == by_id[1] == by_id[4]  # identical token sets
    pairs = dedup.simhash_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    assert {(r.id_a, r.id_b) for r in pairs} >= {(0, 1), (0, 4), (1, 4)}


def test_simhash_bucket_profile(docs, duck_docs):
    # the pre-flight prices the pair join WITHOUT materializing pairs:
    # per band, sum C(bucket, 2) must equal the number of candidate
    # pairs the band's equi-join would emit (pair-listed here on the
    # tiny fixture to verify the identity), and the DuckDB twin matches
    prof = dedup.simhash_bucket_profile(docs, "doc_id", "text").collect()
    assert [r.band for r in prof] == [0, 1, 2, 3]
    n_docs = dedup.simhash(docs, "doc_id", "text").count()
    hdf = dedup.simhash(docs, "doc_id", "text").collect()
    from collections import Counter

    for r in prof:
        assert r.n_docs == n_docs
        buckets = Counter(
            (h.simhash >> (dedup.SIMHASH_BAND_BITS * r.band))
            & ((1 << dedup.SIMHASH_BAND_BITS) - 1)
            for h in hdf
        )
        assert r.n_buckets == len(buckets)
        assert r.max_bucket == max(buckets.values())
        assert r.candidate_pairs == sum(s * (s - 1) // 2 for s in buckets.values())
    drows = duck_docs.sql(
        dedup.simhash_bucket_profile_sql("docs", "doc_id", "text")
    ).fetchall()
    assert sorted(tuple(r) for r in prof) == sorted(drows)


def test_ngram_jaccard_pairs(docs, duck_docs):
    kw = dict(shingle_n=1, threshold=0.6)
    srows = sorted(
        tuple(r)
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", **kw).collect()
    )
    drows = sorted(
        duck_docs.sql(dedup.ngram_jaccard_pairs_sql("docs", "doc_id", "text", **kw)).fetchall()
    )
    assert srows == drows
    assert (0, 1, 1.0) in srows


# --- similarity -------------------------------------------------------------

@pytest.fixture(scope="module")
def vectors(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_brute_force_neighbors(vectors):
    out = similarity.brute_force_neighbors(
        vectors, "vec_id", "embedding", F.col("vec_id") < 3, k=5
    ).collect()
    assert len(out) == 15
    for qid in (0, 1, 2):
        ranks = [r.rank for r in out if r.query_id == qid]
        assert ranks == [1, 2, 3, 4, 5]
        cos = [r.cos for r in out if r.query_id == qid]
        assert cos == sorted(cos, reverse=True)


def test_brute_force_sql_parity(vectors):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW emb AS FROM read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
    )
    srows = sorted(
        tuple(r)
        for r in similarity.brute_force_neighbors(
            vectors, "vec_id", "embedding", F.col("vec_id") < 3, k=5
        ).collect()
    )
    drows = sorted(
        con.sql(
            similarity.brute_force_neighbors_sql(
                "emb", "vec_id", "embedding", "id < 3", k=5
            )
        ).fetchall()
    )
    assert srows == drows


def test_lsh_bucketed_subset_of_bucket(vectors):
    out = similarity.lsh_bucketed_neighbors(
        vectors, "vec_id", "embedding", F.col("vec_id") < 5, k=3, nbits=3
    ).collect()
    # every query row reports <= k neighbors, ranked
    for qid in {r.query_id for r in out}:
        ranks = [r.rank for r in out if r.query_id == qid]
        assert ranks == list(range(1, len(ranks) + 1))


def test_arrow_matches_expression_topk(vectors):
    exact = similarity.brute_force_neighbors(
        vectors, "vec_id", "embedding", F.col("vec_id") < 3, k=5
    ).collect()
    arrow = similarity.brute_force_neighbors_arrow(
        vectors, "vec_id", "embedding", F.col("vec_id") < 3, k=5
    ).collect()
    # same neighbor sets and order (cos values may differ in last ulp)
    assert [(r.query_id, r.neighbor_id, r.rank) for r in exact] == [
        (r.query_id, r.neighbor_id, r.rank) for r in arrow
    ]
    # expression path rounds to 6 decimals; arrow path is unrounded
    for e, a in zip(exact, arrow):
        assert abs(e.cos - a.cos) < 1e-6


# --- multimodal -------------------------------------------------------------

def test_multimodal_payload_and_decode(docs):
    payloads = multimodal.with_payload(docs.where("text <> ''"), "doc_id", "text")
    assert dict(payloads.dtypes)["payload"] == "binary"
    meta = multimodal.decode_image_meta(payloads).collect()
    assert len(meta) == 5
    for r in meta:
        assert r.decode_ok and 1 <= r.width <= 64 and r.n_bytes > 0
    # deterministic: second run identical
    meta2 = multimodal.decode_image_meta(payloads).collect()
    assert sorted(map(tuple, meta)) == sorted(map(tuple, meta2))


def test_multimodal_real_decode_contract(docs):
    # r9: decode_image_real REALLY decodes JPEG/BMP containers (the
    # in-repo numpy codec) and reports decode_ok=false for anything
    # else — text payloads are not images, so every row must come back
    # ok=false with true byte lengths, not an exception
    payloads = multimodal.with_payload(docs, "doc_id", "text")
    rows = multimodal.decode_image_real(payloads).collect()
    assert rows and all(not r.decode_ok for r in rows)
    assert any(r.n_bytes > 0 for r in rows)  # byte lengths are real
    # r10: the audio front door mirrors the image contract — text
    # payloads are not WAVs, so truthful ok=false rows, no exception
    arows = multimodal.decode_audio_real(payloads).collect()
    assert arows and all(not r.decode_ok for r in arows)


def test_sample_frames(docs):
    payloads = multimodal.with_payload(docs.where("doc_id = 0"), "doc_id", "text")
    frames = multimodal.sample_frames(payloads, n_frames=4).collect()
    assert [r.frame_idx for r in frames] == [0, 1, 2, 3]
    text = "the quick brown fox jumps over the lazy dog"
    assert all(r.frame_len == len(text) // 4 for r in frames)


def test_deduplicate_exact_first_same_survivors_fewer_candidates(spark):
    from bullet_storm_spark.operators import dedup

    # a "viral" doc with 30 exact copies + a near-dup + unrelated docs
    viral = "breaking news everyone is sharing this exact same story today"
    rows = (
        [(i, viral) for i in range(30)]
        + [(100, viral + " !")]                       # near-dup of the viral text
        + [(200, "a completely unrelated document"),
           (201, "another quite different text entirely")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")

    fast = sorted(r["doc_id"] for r in
                  dedup.deduplicate(df, "doc_id", "text", threshold=0.8).collect())
    slow = sorted(r["doc_id"] for r in
                  dedup.deduplicate(df, "doc_id", "text", threshold=0.8,
                                    exact_first=False).collect())
    # identical survivor sets: one viral representative + the singletons
    assert fast == slow == [0, 200, 201]

    # the guard's point: candidate volume collapses from O(copies^2) to O(1)
    n_raw = dedup.minhash_lsh_pairs(df, "doc_id", "text", threshold=0.8).count()
    assert n_raw >= 30 * 29 / 2  # every copy pair verifies at jaccard 1.0


def test_multimodal_extract_features(docs):
    import numpy as np

    payloads = multimodal.with_payload(docs.where("text <> ''"), "doc_id", "text")
    out = {r["id"]: r for r in multimodal.extract_features(payloads).collect()}
    rows = {r["doc_id"]: r["text"] for r in docs.where("text <> ''").collect()}
    for i, text in rows.items():
        arr = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        want = np.bincount(arr >> 4, minlength=16)
        got = out[i]
        assert got["n_bytes"] == len(arr)
        assert list(got["features"]) == [int(x) for x in want]
        assert got["top_nibble"] == int(np.argmax(want))
        # histogram mass accounts for every byte
        assert sum(got["features"]) == got["n_bytes"]


def test_containment_catches_quote_jaccard_misses(spark):
    import duckdb

    from bullet_storm_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_containment_pairs_sql,
        ngram_jaccard_pairs,
    )

    long = "alpha beta gamma delta " * 20 + "epsilon zeta eta theta " * 20
    quote = "alpha beta gamma delta alpha beta gamma delta alpha beta"
    rows = [(1, long), (2, quote), (3, "totally unrelated words entirely here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cont = ngram_containment_pairs(df, "doc_id", "text", shingle_n=3, threshold=0.8)
    got = [(r.id_a, r.id_b, r.containment) for r in cont.collect()]
    assert len(got) == 1 and got[0][:2] == (1, 2) and got[0][2] >= 0.8
    # the symmetric metric misses the same pair at any meaningful bar
    jac = ngram_jaccard_pairs(df, "doc_id", "text", shingle_n=3, threshold=0.5)
    assert jac.count() == 0
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?,?)", rows)
    want = con.sql(
        ngram_containment_pairs_sql("d", "doc_id", "text", 3, 0.8)
    ).fetchall()
    spark_rows = [
        (r.id_a, r.id_b, r.containment, r.size_a, r.size_b) for r in cont.collect()
    ]
    assert spark_rows == want


# ---------------------------------------------------------------------------
# Neyman allocation
# ---------------------------------------------------------------------------

def test_neyman_allocation_hand_oracle(spark):
    import statistics

    import duckdb
    from pyspark.sql import functions as F

    from bullet_storm_spark.operators.sampling import (
        neyman_allocation, neyman_allocation_sql,
    )

    rows = (
        [("big_noisy", float(v)) for v in (0, 10, 20, 30, 40, 50, 60, 70)]
        + [("small_quiet", float(v)) for v in (10, 10, 11, 11)]
        + [("constant", 5.0)] * 4
        + [("singleton", 99.0)]
    )
    df = spark.createDataFrame(rows, "src string, v double")
    out = {r.stratum: r for r in
           neyman_allocation(df, "src", "v", total_n=100).collect()}
    # quotas sum to exactly the budget
    assert sum(r.alloc_n for r in out.values()) == 100
    # all weight sits on the strata with variance; the noisy stratum
    # dominates the allocation
    assert out["big_noisy"].alloc_n > out["small_quiet"].alloc_n
    assert out["constant"].alloc_n == 0 and out["singleton"].alloc_n == 0
    # sd matches python's sample stdev
    want_sd = statistics.stdev([v for s, v in rows if s == "big_noisy"])
    assert out["big_noisy"].sd == round(want_sd, 9)
    # proportional split: quota_h = 100 * (w_h / W) with each N_h*S_h
    # quantized through the 6dp text hop (the order-independent decimal
    # weight sum) and the total*(w/W) association shared by both twins
    from decimal import ROUND_HALF_UP, Decimal

    def q6(x):
        return float(
            Decimal(repr(float(x))).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )

    w_bn = q6(8 * out["big_noisy"].sd)
    w_sq = q6(4 * out["small_quiet"].sd)
    assert out["big_noisy"].quota == round(100 * (w_bn / (w_bn + w_sq)), 9)

    con = duckdb.connect()
    con.execute("CREATE TABLE t (src VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    duck = con.execute(
        neyman_allocation_sql("t", "src", "v", total_n=100)
    ).fetchall()
    spark_rows = [tuple(r) for r in
                  neyman_allocation(df, "src", "v", total_n=100).collect()]
    assert spark_rows == duck


def test_simhash_pairs_candidate_budget_guard(docs):
    # the automated pre-flight: a budget below the priced workload must
    # raise BEFORE any pair materializes, naming the per-band workload;
    # a budget above it must return the normal pair set
    import pytest as _pytest

    prof = dedup.simhash_bucket_profile(docs, "doc_id", "text").collect()
    total = sum(r.candidate_pairs for r in prof)
    assert total > 0
    with _pytest.raises(ValueError, match="candidate pairs"):
        dedup.simhash_pairs(
            docs, "doc_id", "text", candidate_pair_budget=total - 1
        )
    ok = dedup.simhash_pairs(
        docs, "doc_id", "text", candidate_pair_budget=total
    ).collect()
    base = dedup.simhash_pairs(docs, "doc_id", "text").collect()
    assert sorted(map(tuple, ok)) == sorted(map(tuple, base))


def test_corpus_datacard(docs, duck_docs, spark):
    # one-row corpus readout with a hand-checkable fixture: add lang and
    # source columns to the tiny docs frame and verify every cell
    from bullet_storm_spark.operators import curate

    annotated = docs.where("text <> ''").selectExpr(
        "doc_id",
        "text",
        "CASE WHEN doc_id % 2 = 0 THEN 'en' ELSE 'de' END AS lang",
        "concat('s', CAST(doc_id % 2 AS STRING)) AS source",
    )
    out = curate.datacard(annotated, "doc_id", "text").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_docs == 5 and r.n_sources == 2 and r.n_langs == 2
    # 3 distinct fingerprints among 5 docs (0/1/4 share one)
    assert r.exact_dup_rate == round(1 - 3 / 5, 6)
    assert r.top_lang == "en" and r.top_lang_share == round(3 / 5, 6)
    assert r.total_tokens == sum(
        len(t.split()) for _, t in annotated.select("doc_id", "text").collect()
    )
    # DuckDB twin equality on the same frame
    import duckdb as _duck

    con = _duck.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR)"
    )
    con.executemany("INSERT INTO d VALUES (?,?,?,?)", annotated.collect())
    drows = con.execute(curate.datacard_sql("d", "doc_id", "text")).fetchall()
    assert [tuple(x) for x in out] == drows


@pytest.mark.slow
def test_candidate_pair_budget_guard_family_wide(spark, docs):
    # r11: the simhash budget guard generalized to EVERY banded pair
    # generator (operators.pair_budget). For each family: budget = 0
    # surfaces the priced total via the typed error, budget = total
    # passes with the unguarded result, budget = total - 1 raises
    # BEFORE any pair materializes.
    import random

    from bullet_storm_spark.operators import winnow
    from bullet_storm_spark.operators.pair_budget import (
        CandidatePairBudgetExceeded,
    )

    random.seed(11)
    embs = spark.createDataFrame(
        [
            (i, [round(random.gauss(0.1, 1), 4) for _ in range(8)])
            for i in range(60)
        ],
        "vec_id long, embedding array<float>",
    )

    cases = [
        (
            "minhash_lsh_pairs",
            lambda b: dedup.minhash_lsh_pairs(
                docs, "doc_id", "text", candidate_pair_budget=b
            ),
        ),
        (
            "winnow_neardup_pairs",
            lambda b: winnow.winnow_neardup_pairs(
                docs, "doc_id", "text", k=4, w=4, candidate_pair_budget=b
            ),
        ),
        (
            "winnow_containment_pairs",
            lambda b: winnow.winnow_containment_pairs(
                docs, "doc_id", "text", k=4, w=4, candidate_pair_budget=b
            ),
        ),
        (
            "embedding_neardup_pairs_lsh",
            lambda b: dedup.embedding_neardup_pairs_lsh(
                embs,
                "vec_id",
                "embedding",
                threshold=0.4,
                nbits=3,
                ntables=2,
                dim=8,
                candidate_pair_budget=b,
            ),
        ),
        (
            "quantized_neardup_pairs_lsh",
            lambda b: __import__(
                "bullet_storm_spark.operators.quantize", fromlist=["x"]
            ).quantized_neardup_pairs_lsh(
                embs,
                "vec_id",
                "embedding",
                threshold=0.4,
                nbits=3,
                ntables=2,
                dim=8,
                candidate_pair_budget=b,
            ),
        ),
        (
            "tfidf_pairs",
            lambda b: __import__(
                "bullet_storm_spark.operators.vocab", fromlist=["x"]
            ).tfidf_pairs(
                docs, "doc_id", "text", df_cap=10, min_sim=0.1,
                candidate_pair_budget=b,
            ),
        ),
        (
            "editdistance_pairs",
            lambda b: dedup.editdistance_pairs(
                docs, "doc_id", "text", max_dist=20, prefix_len=4,
                candidate_pair_budget=b,
            ),
        ),
        (
            "semantic_dedup",
            lambda b: __import__(
                "bullet_storm_spark.operators.semdedup", fromlist=["x"]
            ).semantic_dedup(
                embs,
                "vec_id",
                "embedding",
                threshold=0.2,
                n_centroids=4,
                dim=8,
                candidate_pair_budget=b,
            ),
        ),
        (
            "cosine_histogram",
            lambda b: similarity.cosine_histogram(
                embs,
                "vec_id",
                "embedding",
                nbits=3,
                dim=8,
                candidate_pair_budget=b,
            ),
        ),
    ]
    for name, run in cases:
        with pytest.raises(
            CandidatePairBudgetExceeded, match="candidate pairs"
        ) as ei:
            run(0)
        total = ei.value.total
        assert total > 0, name
        # containment delegates its blocking (and hence the guard) to
        # winnow_neardup_pairs — the op names the generator that priced
        expected_op = (
            "winnow_neardup_pairs"
            if name == "winnow_containment_pairs"
            else name
        )
        assert ei.value.op == expected_op, name
        assert ei.value.workload and all(
            r["candidate_pairs"] >= 0 for r in ei.value.workload
        ), name
        with pytest.raises(CandidatePairBudgetExceeded):
            run(total - 1)
        guarded = sorted(map(tuple, run(total).collect()))
        base = sorted(map(tuple, run(None).collect()))
        assert guarded == base, name


def test_cosine_histogram_budget_prices_capped_population(spark):
    # with per_bucket_cap set, the guard prices the POST-cap buckets:
    # a budget that the uncapped population would blow must pass once
    # the cap bounds every bucket
    import random

    from bullet_storm_spark.operators.pair_budget import (
        CandidatePairBudgetExceeded,
    )

    random.seed(13)
    embs = spark.createDataFrame(
        [
            (i, [round(random.gauss(0.0, 1), 4) for _ in range(4)])
            for i in range(120)
        ],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(CandidatePairBudgetExceeded) as ei:
        similarity.cosine_histogram(
            embs, "vec_id", "embedding", nbits=2, dim=4,
            candidate_pair_budget=0,
        )
    uncapped_total = ei.value.total
    # 2^2 buckets x C(3,2) = at most 12 pairs under the cap
    capped = similarity.cosine_histogram(
        embs, "vec_id", "embedding", nbits=2, dim=4,
        per_bucket_cap=3, candidate_pair_budget=12,
    ).collect()
    assert uncapped_total > 12 and capped


def test_price_candidate_pairs_identity(spark):
    # the generic pricer's Sigma C(s,2) must EQUAL the pair volume a
    # self-join on the bucket key with an id < id residual emits
    # (pre-dedup) — the same identity pin simhash_bucket_profile has,
    # for the shared helper on an arbitrary blocking layout
    from bullet_storm_spark.operators.pair_budget import (
        price_candidate_pairs,
    )

    rows = [(i, f"blk{i % 7}", i % 3) for i in range(200)]
    blocked = spark.createDataFrame(rows, "id long, bucket string, tbl int")
    priced = {
        r.block: r.candidate_pairs
        for r in price_candidate_pairs(
            blocked, ["tbl", "bucket"], block_col="tbl"
        ).collect()
    }
    l, r = blocked.alias("l"), blocked.alias("r")
    actual = (
        l.join(
            r,
            (F.col("l.tbl") == F.col("r.tbl"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .groupBy(F.col("l.tbl").alias("tbl"))
        .count()
        .collect()
    )
    assert priced == {str(a["tbl"]): a["count"] for a in actual}
    assert sum(priced.values()) > 0
    one = price_candidate_pairs(blocked, ["tbl", "bucket"]).collect()
    assert len(one) == 1 and one[0].block == "all"
    assert one[0].candidate_pairs == sum(priced.values())
