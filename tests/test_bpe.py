"""Distributed BPE training (operators/bpe.py) vs a pure-Python reference
implementation — the pytest oracle for the iterative (non-SQL) algorithm,
per the declared rows-only contract."""

import collections

import pytest
from pyspark.sql import functions as F

from bullet_storm_spark.operators import bpe


def _reference_bpe(texts, n_merges):
    """Classic BPE on a word-frequency table (Sennrich et al. 2016),
    ties broken (count desc, pair asc) to match the distributed argmax."""
    counts = collections.Counter(
        w for t in texts for w in t.lower().split() if w
    )
    vocab = {w: list(w) + [bpe.END] for w in counts}
    merges = []
    for _ in range(n_merges):
        pair_counts = collections.Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += counts[w]
        if not pair_counts:
            break
        (a, b), total = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, total))
        for w, syms in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            vocab[w] = res
    return merges


TEXTS = [
    "the lower the newer the wider",
    "lower power tower shower",
    "new newest lowest widest",
    "the the the low lower lowest",
    "wide wider widest new newer newest",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_bpe_train_matches_reference(docs):
    got = bpe.bpe_train(docs, "text", n_merges=10)
    expect = _reference_bpe(TEXTS, 10)
    assert got == expect
    assert len(got) == 10 and all(f > 0 for _, _, f in got)


def test_bpe_train_deterministic(docs):
    assert bpe.bpe_train(docs, "text", n_merges=5) == bpe.bpe_train(
        docs, "text", n_merges=5
    )


def test_bpe_merge_table_shape(docs):
    tbl = bpe.bpe_merge_table(docs, "text", n_merges=6).collect()
    assert [r["rank"] for r in tbl] == list(range(len(tbl)))
    assert all(r["freq"] > 0 and r["left"] and r["right"] for r in tbl)


def test_bpe_segment_applies_merges(docs):
    merges = bpe.bpe_train(docs, "text", n_merges=8)
    seg = {r["doc_id"]: r for r in bpe.bpe_segment(docs, "doc_id", "text", merges).collect()}
    assert set(seg) == set(range(len(TEXTS)))
    for i, t in enumerate(TEXTS):
        words = t.lower().split()
        assert seg[i]["n_words"] == len(words)
        # subwords at least one per word, at most chars+1 per word
        assert len(words) <= seg[i]["n_subwords"] <= sum(len(w) + 1 for w in words)
    # with zero merges every word is fully character-split
    raw = {r["doc_id"]: r for r in bpe.bpe_segment(docs, "doc_id", "text", []).collect()}
    for i, t in enumerate(TEXTS):
        assert raw[i]["n_subwords"] == sum(len(w) + 1 for w in t.lower().split() if w)
    # merges strictly reduce (or keep) the subword count
    for i in seg:
        assert seg[i]["n_subwords"] <= raw[i]["n_subwords"]
