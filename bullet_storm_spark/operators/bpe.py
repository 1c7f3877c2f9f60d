"""Distributed BPE merge training + application (tokenizer fitting).

The text surface already COUNTS tokens with a BPE-ish regex
(functions/text.bpe_token_count); this module FITS the merge table —
byte-pair encoding (Sennrich, Haddow, Birch, "Neural Machine Translation
of Rare Words with Subword Units", ACL 2016): start from characters,
repeatedly merge the most frequent adjacent symbol pair.

Scale shape (the part that matters at 100 TB): BPE statistics depend only
on the WORD FREQUENCY TABLE, not the corpus — so training first collapses
the corpus to (word, count) with one hash aggregation (vocabulary-sized,
millions of rows, not trillions) and every merge round then runs over
that small weighted table:

* pair counting: explode adjacent symbol pairs weighted by word count —
  one map-side-combined aggregation per round over |vocab| rows;
* argmax: TakeOrdered(1) with a deterministic (count desc, pair asc)
  tie-break;
* merge application: an Arrow-batched pandas pass rewriting each word's
  symbol array (sequential within a word — inherently imperative, the
  documented mapInPandas exception).

The driver loop runs ``n_merges`` rounds (iterative — NOT expressible as
one SQL statement, so the entry is rows-only by the declared contract;
the pytest oracle is a pure-Python reference BPE run on the same input).
Each round persists the rewritten vocab and unpersists the previous one:
driver state is O(merges), executor state O(vocab).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F

from bullet_storm_spark.functions.text import tokens

END = "</w>"  # end-of-word marker, the standard BPE word boundary symbol


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt): the weighted training table — corpus-sized input, one
    shuffle on the word, vocabulary-sized output."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """(symbols array<string>, cnt): characters + end-of-word marker."""
    chars = F.filter(
        F.split(F.col("word"), "(?!^)"),  # zero-width split leaves a
        lambda s: s != "",                # trailing "" in Java regex land
    )
    return words.select(
        F.concat(chars, F.array(F.lit(END))).alias("symbols"),
        "cnt",
    )


def _pair_counts(sym: DataFrame) -> DataFrame:
    """(a, b, total): adjacent-pair counts weighted by word count — the
    per-round aggregation. zip_with over (symbols, symbols[1:]) explodes
    to pairs without a Python round-trip."""
    # transform index i is 0-based and [] array indexing is 0-based in
    # Spark SQL, so the slice element at i is symbols[i] and its right
    # neighbor is symbols[i + 1]
    pairs = F.expr(
        "transform(slice(symbols, 1, size(symbols) - 1), (s, i) -> "
        "struct(s AS a, symbols[i + 1] AS b))"
    )
    return (
        sym.where(F.size("symbols") >= 2)
        .select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("total"))
    )


def _apply_merge(sym: DataFrame, a: str, b: str) -> DataFrame:
    """Rewrite every symbol array, merging adjacent (a, b) -> a+b
    left-to-right (the classic sequential scan, Arrow-batched)."""
    import pandas as pd

    merged = a + b

    def rewrite(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for syms in pdf["symbols"]:
                res = []
                i, n = 0, len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        res.append(merged)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            pdf = pdf.copy()
            pdf["symbols"] = out
            yield pdf

    return sym.mapInPandas(rewrite, "symbols array<string>, cnt bigint")


def bpe_train(
    df: DataFrame, text_col: str, n_merges: int = 16
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right, freq), ...]
    in merge order. Deterministic: ties break on (left, right) ascending."""
    spark = df.sparkSession
    sym = _initial_symbols(_word_counts(df, text_col)).persist()
    sym.count()
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            top = (
                _pair_counts(sym)
                .orderBy(F.col("total").desc(), F.col("a").asc(), F.col("b").asc())
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b, total = top[0]["a"], top[0]["b"], int(top[0]["total"])
            merges.append((a, b, total))
            nxt = _apply_merge(sym, a, b).persist()
            nxt.count()
            sym.unpersist()
            sym = nxt
    finally:
        sym.unpersist()
    return merges


def bpe_merge_table(df: DataFrame, text_col: str, n_merges: int = 16) -> DataFrame:
    """The merge table as a DataFrame entry: (rank, left, right, freq) in
    merge order — what ships to the tokenizer at inference time."""
    spark = df.sparkSession
    merges = bpe_train(df, text_col, n_merges)
    return spark.createDataFrame(
        [(i, a, b, f) for i, (a, b, f) in enumerate(merges)],
        "rank int, left string, right string, freq bigint",
    )


def bpe_segment(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str, int]],
) -> DataFrame:
    """Apply a learned merge table: (id, n_words, n_subwords, subword
    sample) per document — the corpus-side tokenization pass (one Arrow
    batch per partition; merges applied in rank order per word)."""
    import pandas as pd

    merge_list = [(a, b) for a, b, _ in merges]

    def segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def encode(word: str) -> list[str]:
            syms = list(word) + [END]
            for a, b in merge_list:
                res = []
                i, n = 0, len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            return syms

        for pdf in batches:
            rows = []
            for rid, text in zip(pdf["id"], pdf["text"]):
                words = [w for w in str(text).lower().split() if w]
                subs = [s for w in words for s in encode(w)]
                rows.append((rid, len(words), len(subs), subs[:8]))
            yield pd.DataFrame(
                rows, columns=["id", "n_words", "n_subwords", "subword_sample"]
            )

    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    return (
        base.mapInPandas(
            segment,
            "id long, n_words int, n_subwords int, subword_sample array<string>",
        )
        .withColumnRenamed("id", id_col)
        .orderBy(id_col)
    )
