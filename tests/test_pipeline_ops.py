"""Training-data pipeline operators: span-chunk dedup, weighted source
mixing, sequence packing, PII scrubbing — semantics, DuckDB parity, and
the plan shapes the 100 TB design notes promise."""

from collections import defaultdict

import duckdb
import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.functions import text as T
from bullet_storm_spark.operators import packing, sampling, spans


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "a b c d e f g h", "s0"),
        (1, "a b c x y z", "s0"),          # chunk 'a b c' duplicates doc 0
        (2, "x y z a b c", "s1"),          # both chunks seen before -> empty
        (3, "", "s1"),
        (4, "p q r s t u v w x", "s2"),
        (5, "p q r s t u", "s2"),          # 'p q r' + 's t u' vs doc4 chunking
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


@pytest.fixture(scope="module")
def duck(docs):
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?,?,?)", docs.collect())
    return con


# --- span-chunk dedup -------------------------------------------------------

def test_span_dedup_semantics(docs):
    out = {
        r.doc_id: (r.n_chunks, r.n_kept, r.cleaned_text)
        for r in spans.span_chunk_dedup(docs, "doc_id", "text", 3).collect()
    }
    assert out[0] == (3, 3, "a b c d e f g h")      # first occurrence keeps all
    assert out[1] == (2, 1, "x y z")                # 'a b c' removed
    assert out[2] == (2, 0, "")                     # fully duplicate doc collapses
    assert out[3] == (1, 1, "")                     # empty doc's '' chunk is first
    # doc 4 chunks: 'p q r','s t u','v w x'; doc 5: 'p q r','s t u' -> both dup
    assert out[4] == (3, 3, "p q r s t u v w x")
    assert out[5] == (2, 0, "")


def test_span_dedup_duck_parity(docs, duck):
    s = [tuple(r) for r in spans.span_chunk_dedup(docs, "doc_id", "text", 3).collect()]
    d = duck.execute(spans.span_chunk_dedup_sql("docs", "doc_id", "text", 3)).fetchall()
    assert s == [tuple(r) for r in d]


def test_span_dedup_within_doc_repeat(spark):
    df = spark.createDataFrame(
        [(7, "m n o m n o m n o")], "doc_id long, text string"
    )
    out = spans.span_chunk_dedup(df, "doc_id", "text", 3).collect()[0]
    assert (out.n_chunks, out.n_kept, out.cleaned_text) == (3, 1, "m n o")


# --- weighted mixing --------------------------------------------------------

_W = {"s0": 1.5, "s1": 1.0, "s2": 0.0}


def test_weighted_sample_semantics(docs):
    out = {
        r.doc_id: r.n_copies
        for r in sampling.weighted_sample(docs, "doc_id", "source", _W).collect()
    }
    # weight 1.0 -> exactly one copy, always kept
    assert out[2] == 1 and out[3] == 1
    # weight 0.0 -> dropped entirely
    assert 4 not in out and 5 not in out
    # weight 1.5 -> one or two copies
    assert out[0] in (1, 2) and out[1] in (1, 2)


def test_weighted_sample_deterministic_and_salted(docs):
    a = sorted(map(tuple, sampling.weighted_sample(docs, "doc_id", "source", _W).collect()))
    b = sorted(map(tuple, sampling.weighted_sample(docs, "doc_id", "source", _W).collect()))
    assert a == b
    c = sorted(
        map(
            tuple,
            sampling.weighted_sample(docs, "doc_id", "source", _W, salt="other").collect(),
        )
    )
    # a different salt is allowed to (and here does) re-draw the fractional keeps
    assert {t[0] for t in a if t[2] == 1} != {t[0] for t in c if t[2] == 1} or a == c


def test_weighted_sample_duck_parity(docs, duck):
    s = [tuple(r) for r in sampling.weighted_sample(docs, "doc_id", "source", _W).collect()]
    d = duck.execute(sampling.weighted_sample_sql("docs", "doc_id", "source", _W)).fetchall()
    assert s == [tuple(r) for r in d]
    s2 = [
        tuple(r)
        for r in sampling.mix_accounting(docs, "doc_id", "source", "text", _W).collect()
    ]
    d2 = duck.execute(
        sampling.mix_accounting_sql("docs", "doc_id", "source", "text", _W)
    ).fetchall()
    assert s2 == [tuple(r) for r in d2]


def test_weighted_sample_rate_converges(spark):
    """On a large uniform id range the kept fraction approaches the weight."""
    df = spark.range(0, 20000).select(
        F.col("id").alias("doc_id"), F.lit("s").alias("source")
    )
    kept = sampling.weighted_sample(df, "doc_id", "source", {"s": 0.3}).count()
    assert abs(kept / 20000 - 0.3) < 0.02


def test_weighted_sample_is_scan_level(docs):
    """The mixing filter must not shuffle: no Exchange in the filter plan
    (orderBy excluded — take the pre-sort subplan via a limit-free filter)."""
    copies = sampling.n_copies("doc_id", "source", _W, 0.0, "mix")
    plan = (
        docs.select("doc_id", "source", copies.alias("n_copies"))
        .where(F.col("n_copies") >= 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# --- mix_plan (token-budget mixture solver) ---------------------------------

@pytest.fixture(scope="module")
def plan_docs(spark):
    # s0: 10 tokens over 2 docs; s1: 5 tokens; s2: 4 tokens, unweighted
    rows = [
        (0, "a b c d e f", "s0"),
        (1, "g h i j", "s0"),
        (2, "k l m n o", "s1"),
        (3, "p q r s", "s2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


_PLAN_KW = dict(weights={"s0": 0.6, "s1": 0.4}, budget_tokens=30, max_epochs=2.0)


def test_mix_plan_semantics(plan_docs):
    out = {
        r.source: r.asDict()
        for r in sampling.mix_plan(plan_docs, "source", "text", **_PLAN_KW).collect()
    }
    # targets: s0 = 0.6*30 = 18, s1 = 0.4*30 = 12, s2 absent -> 0
    s0 = out["s0"]
    assert (s0["n_docs"], s0["avail_tokens"], s0["target_tokens"]) == (2, 10, 18)
    assert s0["planned_epochs"] == 1.8 and s0["over_epoch"] is False
    assert s0["shortfall_tokens"] == 0          # cap = floor(10*2.0) = 20 >= 18
    s1 = out["s1"]
    assert (s1["avail_tokens"], s1["target_tokens"]) == (5, 12)
    assert s1["planned_epochs"] == 2.4 and s1["over_epoch"] is True
    assert s1["shortfall_tokens"] == 2          # 12 - floor(5*2.0) = 2
    s2 = out["s2"]                               # mixed out, still reported
    assert (s2["target_tokens"], s2["planned_epochs"], s2["shortfall_tokens"]) == (
        0, 0.0, 0,
    )


def test_mix_plan_duck_parity(plan_docs):
    con = duckdb.connect()
    con.execute("CREATE TABLE pdocs (doc_id BIGINT, text VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO pdocs VALUES (?,?,?)", plan_docs.collect())
    s = [
        tuple(r)
        for r in sampling.mix_plan(plan_docs, "source", "text", **_PLAN_KW).collect()
    ]
    d = con.execute(
        sampling.mix_plan_sql("pdocs", "source", "text", **_PLAN_KW)
    ).fetchall()
    assert s == [tuple(r) for r in d]


def test_mix_plan_rejects_zero_weights(plan_docs):
    with pytest.raises(ValueError):
        sampling.mix_plan(plan_docs, "source", "text", {}, 100)


def test_mix_plan_weighted_absent_source(plan_docs):
    """A weighted source missing from the corpus must appear with zero
    availability and its full target as shortfall — the unsatisfiable-
    target case the pre-flight exists to surface."""
    out = {
        r.source: r
        for r in sampling.mix_plan(
            plan_docs, "source", "text",
            {"s0": 0.5, "missing": 0.5}, budget_tokens=20, max_epochs=2.0,
        ).collect()
    }
    m = out["missing"]
    assert (m.n_docs, m.avail_tokens, m.target_tokens) == (0, 0, 10)
    assert m.planned_epochs is None
    assert m.over_epoch is True and m.shortfall_tokens == 10
    # duck twin agrees
    con = duckdb.connect()
    con.execute("CREATE TABLE adocs (doc_id BIGINT, text VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO adocs VALUES (?,?,?)", plan_docs.collect())
    d = con.execute(
        sampling.mix_plan_sql(
            "adocs", "source", "text",
            {"s0": 0.5, "missing": 0.5}, budget_tokens=20, max_epochs=2.0,
        )
    ).fetchall()
    s = [
        tuple(r)
        for r in sampling.mix_plan(
            plan_docs, "source", "text",
            {"s0": 0.5, "missing": 0.5}, budget_tokens=20, max_epochs=2.0,
        ).collect()
    ]
    assert s == [tuple(r) for r in d]


def test_mix_targets_conserve_budget():
    """Largest-remainder apportionment: targets sum to the budget
    exactly, for shares where independent rounding loses tokens."""
    for weights, budget in (
        ({"a": 1.0, "b": 1.0, "c": 1.0}, 100),
        ({"a": 0.5, "b": 0.5}, 5),
        ({"a": 0.7, "b": 0.2, "c": 0.1}, 33),
    ):
        t = sampling._mix_targets(weights, budget)
        assert sum(t.values()) == budget, (weights, budget, t)


def test_mix_plan_over_epoch_is_exact(spark):
    """over_epoch comes from the integer cap, not the 6dp-rounded
    epochs: a 1-token shortfall on a huge source must flag."""
    # one source, 40 tokens available, target 81 with max 2.0 epochs:
    # epochs 2.025 (clearly over), shortfall 1 if target = cap + 1
    df = spark.createDataFrame(
        [(0, " ".join(["w"] * 40), "s")], "doc_id long, text string, source string"
    )
    out = sampling.mix_plan(
        df, "source", "text", {"s": 1.0}, budget_tokens=81, max_epochs=2.0
    ).collect()[0]
    assert out.shortfall_tokens == 1 and out.over_epoch is True


# --- packing ----------------------------------------------------------------

def _toks(r):
    return r.n_tokens


def test_pack_contiguous_offsets(spark):
    df = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.array_repeat(F.lit("w"), (F.col("id") % 37 + 1).cast("int"))).alias(
            "text"
        ),
    )
    out = packing.pack_contiguous(df, "doc_id", "text", capacity=64, n_shards=4).collect()
    by_shard = defaultdict(list)
    for r in out:
        by_shard[r.shard].append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.doc_id)
        off = 0
        for r in rows:
            assert r.start_offset == off, "stream must be gap-free in id order"
            assert r.bin_first == off // 64
            assert r.bin_last == (off + r.n_tokens - 1) // 64
            off += r.n_tokens


def test_pack_contiguous_duck_parity(docs, duck):
    kw = dict(capacity=5, n_shards=2)
    s = [tuple(r) for r in packing.pack_contiguous(docs, "doc_id", "text", **kw).collect()]
    d = duck.execute(packing.pack_contiguous_sql("docs", "doc_id", "text", **kw)).fetchall()
    assert s == [tuple(r) for r in d]
    s2 = [tuple(r) for r in packing.pack_shard_stats(docs, "doc_id", "text", **kw).collect()]
    d2 = duck.execute(packing.pack_shard_stats_sql("docs", "doc_id", "text", **kw)).fetchall()
    assert s2 == [tuple(r) for r in d2]


def test_pack_greedy_invariants(spark):
    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.array_repeat(F.lit("w"), (F.col("id") * 7 % 90 + 1).cast("int"))).alias(
            "text"
        ),
    )
    cap = 100
    out = packing.pack_greedy(df, "doc_id", "text", capacity=cap, n_shards=4).collect()
    assert len(out) == 300  # every doc placed exactly once
    fill = defaultdict(int)
    members = defaultdict(list)
    for r in out:
        fill[(r.shard, r.bin_id)] += r.n_tokens
        members[(r.shard, r.bin_id)].append(r)
    for key, total in fill.items():
        if total > cap:  # only legal as an oversize singleton
            assert len(members[key]) == 1 and members[key][0].n_tokens > cap
    # determinism
    again = packing.pack_greedy(df, "doc_id", "text", capacity=cap, n_shards=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # FFD can't beat the volume lower bound, and should be near it
    for shard in {r.shard for r in out}:
        rows = [r for r in out if r.shard == shard]
        n_bins = len({r.bin_id for r in rows})
        lower = -(-sum(r.n_tokens for r in rows) // cap)
        assert lower <= n_bins <= 2 * lower + 1


# --- PII scrub --------------------------------------------------------------

def test_scrub_patterns(spark):
    rows = [
        (0, "mail a.b-c+d@ex-a.mple.org end"),
        (1, "go to https://h.i/j?k=1#l and http://m.n"),
        (2, "ips 1.2.3.4 10.200.30.7"),
        (3, "tel +49 (0) 30-1234567 and 555 123 4567"),
        (4, "no pii here, just words and 42 numbers 7"),
        (5, "v1.2.3 release is not an ip"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scr = T.scrub_pii(F.col("text"))
    out = {
        r.doc_id: r.s
        for r in df.select("doc_id", scr.alias("s")).collect()
    }
    assert out[0] == "mail <EMAIL> end"
    assert out[1] == "go to <URL> and <URL>"
    assert out[2] == "ips <IP> <IP>"
    assert out[3] == "tel <PHONE> and <PHONE>"
    assert out[4] == "no pii here, just words and 42 numbers 7"
    # 'v1.2.3' has only three octets -> not an IP; the digit run is too
    # short for the phone pattern
    assert out[5] == "v1.2.3 release is not an ip"


def test_scrub_duck_parity(docs, duck):
    aug = F.concat(F.col("text"), F.lit(" x@y.zz http://u.v 9.9.9.9 +12 345 6789"))
    scr = T.scrub_pii(aug)
    s = [
        tuple(r)
        for r in docs.select(
            "doc_id",
            scr.alias("s"),
            *[T.redaction_count(scr, k).alias("n_" + k) for k, _, _ in T.PII_PATTERNS],
        )
        .orderBy("doc_id")
        .collect()
    ]
    aug_sql = "(text || ' x@y.zz http://u.v 9.9.9.9 +12 345 6789')"
    scr_sql = T.scrub_pii_sql(aug_sql)
    cols = ", ".join(
        f"{T.redaction_count_sql(scr_sql, k)} AS n_{k}" for k, _, _ in T.PII_PATTERNS
    )
    d = duck.execute(
        f"SELECT doc_id, {scr_sql} AS s, {cols} FROM docs ORDER BY doc_id"
    ).fetchall()
    assert s == [tuple(r) for r in d]


# --- exact duplicated-substring spans (Lee et al. 2107.06499 class) ---------

@pytest.fixture(scope="module")
def sub_docs(spark):
    rows = [
        (10, "one two three four five six"),
        (11, "zz one two three four yy"),        # shares a 4-token run with 10
        (12, "r s t r s t r s t"),               # within-doc repetition
        (13, "unique tokens only here"),         # no duplicated n-gram
        (14, "ab cd"),                           # shorter than the n-gram
        (15, "one two three gapA gapB gapC r s t end"),  # two disjoint spans
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def sub_duck(sub_docs):
    con = duckdb.connect()
    con.execute("CREATE TABLE sdocs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO sdocs VALUES (?,?)", sub_docs.collect())
    return con


def test_duplicated_spans_semantics(sub_docs):
    out = defaultdict(list)
    for r in spans.duplicated_spans(sub_docs, "doc_id", "text", ngram=3).collect():
        out[r.doc_id].append((r.span_start, r.span_end, r.span_len, r.n_dup_ngrams))
    # docs 10/11 share 'one two three four': two dup 3-grams each, merged
    assert out[10] == [(0, 3, 4, 2)]
    assert out[11] == [(1, 4, 4, 2)]
    # within-doc repetition: every 3-gram of doc 12 repeats -> one full span
    assert out[12] == [(0, 8, 9, 7)]
    # no duplicated n-gram / too short -> no rows at all
    assert 13 not in out and 14 not in out
    # two disjoint duplicated runs stay separate islands
    assert out[15] == [(0, 2, 3, 1), (6, 8, 3, 1)]


def test_duplicated_spans_duck_parity(sub_docs, sub_duck):
    s = [
        tuple(r)
        for r in spans.duplicated_spans(sub_docs, "doc_id", "text", ngram=3).collect()
    ]
    d = sub_duck.execute(
        spans.duplicated_spans_sql("sdocs", "doc_id", "text", ngram=3)
    ).fetchall()
    assert s == [tuple(r) for r in d]


def test_duplicated_span_report(sub_docs, sub_duck):
    rep = {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.n_spans, r.dup_fraction)
        for r in spans.duplicated_span_report(
            sub_docs, "doc_id", "text", ngram=3
        ).collect()
    }
    assert rep[12] == (9, 9, 1, 1.0)          # fully duplicated
    assert rep[13] == (4, 0, 0, 0.0)          # clean doc still reports
    assert rep[14] == (2, 0, 0, 0.0)          # below the n-gram floor
    assert rep[15][1] == 6 and rep[15][2] == 2
    d = sub_duck.execute(
        spans.duplicated_span_report_sql("sdocs", "doc_id", "text", ngram=3)
    ).fetchall()
    got = [
        tuple(r)
        for r in spans.duplicated_span_report(
            sub_docs, "doc_id", "text", ngram=3
        ).collect()
    ]
    assert got == [tuple(r) for r in d]


def test_duplicated_spans_rejects_tiny_ngram(sub_docs):
    with pytest.raises(ValueError):
        spans.duplicated_spans(sub_docs, "doc_id", "text", ngram=1)


# --- blocked edit-distance pairs (dedup.editdistance_pairs) -----------------

def test_editdistance_pairs_semantics(spark):
    from bullet_storm_spark.operators import dedup

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),   # 3 edits
        (2, "the quick brown wolf sprints over a lazy dog"),  # close-ish
        (3, "a completely different document altogether"),
        (4, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (5, "THE quick brown fox jumps over the lazy dog"),   # edited IN prefix
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.id_a, r.id_b): r.edit_distance
        for r in dedup.editdistance_pairs(
            df, "doc_id", "text", max_dist=12, prefix_len=12
        ).collect()
    }
    assert out[(0, 4)] == 0          # exact duplicate
    assert out[(0, 1)] == 3          # dog -> cat
    assert (0, 3) not in out         # different block
    # DECLARED contract: an edit inside the prefix block is missed
    assert not any(5 in p for p in out)
    # doc 2 shares the 12-char prefix, so it IS compared and lands
    # exactly at the threshold (12 edits)
    assert out[(0, 2)] == 12


def test_editdistance_pairs_duck_parity(spark):
    from bullet_storm_spark.operators import dedup

    rows = [(i, f"prefix-{i % 3} shared body text {'x' * (i % 5)}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE ed (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO ed VALUES (?,?)", rows)
    s = [
        tuple(r)
        for r in dedup.editdistance_pairs(
            df, "doc_id", "text", max_dist=6, prefix_len=9
        ).collect()
    ]
    d = con.execute(
        dedup.editdistance_pairs_sql("ed", "doc_id", "text", max_dist=6, prefix_len=9)
    ).fetchall()
    assert s == [tuple(r) for r in d]
    assert len(s) > 0


def test_remove_duplicated_spans_semantics(sub_docs):
    out = {
        r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_text)
        for r in spans.remove_duplicated_spans(
            sub_docs, "doc_id", "text", ngram=3
        ).collect()
    }
    # docs 10/11 lose the shared 4-token run, keep their unique tails
    assert out[10] == (6, 4, "five six")
    assert out[11] == (6, 4, "zz yy")
    # fully-duplicated doc 12 collapses to ''
    assert out[12] == (9, 9, "")
    # clean doc 13 and the below-floor doc 14 are untouched
    assert out[13] == (4, 0, "unique tokens only here")
    assert out[14] == (2, 0, "ab cd")
    # doc 15 loses both disjoint spans, keeps the gap tokens + tail
    assert out[15] == (10, 6, "gapa gapb gapc end")  # tokens() lowercases


def test_remove_duplicated_spans_duck_parity(sub_docs, sub_duck):
    s = [
        tuple(r)
        for r in spans.remove_duplicated_spans(
            sub_docs, "doc_id", "text", ngram=3
        ).collect()
    ]
    d = sub_duck.execute(
        spans.remove_duplicated_spans_sql("sdocs", "doc_id", "text", ngram=3)
    ).fetchall()
    assert s == [tuple(r) for r in d]


def test_novelty_scores_semantics(spark):
    rows = [
        (0, "one two three four"),     # everything first -> novelty 1.0
        (1, "one two three zz"),       # 'one two three' seen in doc 0
        (2, "one two three four"),     # exact copy -> novelty 0.0
        (3, "ab"),                     # below the 3-gram floor -> NULL
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_ngrams, r.n_novel, r.novelty)
        for r in spans.novelty_scores(df, "doc_id", "text", ngram=3).collect()
    }
    assert out[0] == (2, 2, 1.0)
    assert out[1] == (2, 1, 0.5)
    assert out[2] == (2, 0, 0.0)
    assert out[3] == (0, 0, None)


def test_novelty_scores_duck_parity(spark):
    rows = [(i, f"w{i % 4} w{(i + 1) % 4} w{(i + 2) % 4} w{i % 5}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE nv (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO nv VALUES (?,?)", rows)
    s = [tuple(r) for r in spans.novelty_scores(df, "doc_id", "text", ngram=3).collect()]
    d = con.execute(spans.novelty_scores_sql("nv", "doc_id", "text", ngram=3)).fetchall()
    assert s == [tuple(r) for r in d]
