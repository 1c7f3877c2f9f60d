"""Sequence packing for LLM training pipelines, dual-compiled.

Training consumes fixed-length context windows; the pipeline step that maps
variable-length documents into ``capacity``-token bins is "packing". Two
standard strategies, both deterministic:

* **Contiguous stream packing** (``pack_contiguous``): documents are laid
  end-to-end in (shard, id) order and the stream is cut every ``capacity``
  tokens (documents may straddle a cut — the common pretraining setup).
  This is a pure window cumsum per shard: one shuffle on the shard key,
  O(1) state per row, and — because shards are independent — embarrassingly
  parallel at any scale. Fully SQL-expressible, so it is oracle-checked.

* **Greedy first-fit-decreasing** (``pack_greedy``): documents must NOT be
  split (finetuning-style packing); per shard, sort by (tokens desc, id)
  and place each doc in the first bin with room, opening a new bin when
  none fits (oversize docs get a bin of their own). FFD is a sequential
  fold over per-bin remaining capacity — not expressible in window SQL —
  so it runs as an Arrow-batched ``applyInPandas`` per shard and is
  verified by property tests (capacity respected, every doc placed,
  determinism) rather than a DuckDB twin.

Sharding is ``id % n_shards`` here for oracle determinism; at 100 TB use a
hash shard (same plan shape). Each shard's docs must fit one executor's
task for the greedy variant — n_shards is the parallelism knob.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from bullet_storm_spark.functions.text import (
    token_count,
    token_count_sql,
    tokens,
    tokens_sql,
)


def _sharded_tokens(df: DataFrame, id_col: str, text_col: str, n_shards: int):
    return df.select(
        F.col(id_col).alias("__id"),
        (F.col(id_col) % n_shards).cast("bigint").alias("shard"),
        token_count(text_col).cast("bigint").alias("n_tokens"),
    )


def pack_contiguous(
    df: DataFrame,
    id_col: str,
    text_col: str,
    capacity: int = 2048,
    n_shards: int = 8,
) -> DataFrame:
    """Per-doc placement in the packed token stream: (id, shard, n_tokens,
    start_offset, bin_first, bin_last). ``bin_first != bin_last`` means the
    document straddles a context-window boundary."""
    cap = int(capacity)
    w = (
        Window.partitionBy("shard")
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return (
        _sharded_tokens(df, id_col, text_col, n_shards)
        .select(
            "__id",
            "shard",
            "n_tokens",
            (cum - F.col("n_tokens")).alias("start_offset"),
            F.floor((cum - F.col("n_tokens")) / cap).cast("bigint").alias("bin_first"),
            F.floor((cum - 1) / cap).cast("bigint").alias("bin_last"),
        )
        .withColumnRenamed("__id", id_col)
        .orderBy(id_col)
    )


def pack_contiguous_sql(
    table: str,
    id_col: str,
    text_col: str,
    capacity: int = 2048,
    n_shards: int = 8,
) -> str:
    cap = int(capacity)
    return f"""
WITH __t AS (
  SELECT {id_col} AS __id,
         CAST({id_col} % {int(n_shards)} AS BIGINT) AS shard,
         CAST({token_count_sql(text_col)} AS BIGINT) AS n_tokens
  FROM {table}
), __c AS (
  SELECT __id, shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY __id
                             ROWS UNBOUNDED PRECEDING) AS __cum
  FROM __t
)
SELECT __id AS {id_col}, shard, n_tokens,
       CAST(__cum - n_tokens AS BIGINT) AS start_offset,
       CAST(floor((__cum - n_tokens) / {cap}) AS BIGINT) AS bin_first,
       CAST(floor((__cum - 1) / {cap}) AS BIGINT) AS bin_last
FROM __c
ORDER BY {id_col}
"""


def pack_shard_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    capacity: int = 2048,
    n_shards: int = 8,
) -> DataFrame:
    """Per-shard packing report: docs, tokens, bins used, and mean bin fill
    (the waste metric a packing config review wants)."""
    cap = int(capacity)
    return (
        _sharded_tokens(df, id_col, text_col, n_shards)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.ceil(F.sum("n_tokens") / cap).cast("bigint").alias("n_bins"),
            F.round(
                F.sum("n_tokens") / (F.ceil(F.sum("n_tokens") / cap) * cap), 6
            ).alias("fill_ratio"),
        )
        .orderBy("shard")
    )


def pack_shard_stats_sql(
    table: str,
    id_col: str,
    text_col: str,
    capacity: int = 2048,
    n_shards: int = 8,
) -> str:
    cap = int(capacity)
    return f"""
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(ceil(SUM(n_tokens) / {cap}) AS BIGINT) AS n_bins,
       CASE WHEN ABS(SUM(n_tokens) / (ceil(SUM(n_tokens) / {cap}) * {cap})) >= 1e16 THEN CAST((SUM(n_tokens) / (ceil(SUM(n_tokens) / {cap}) * {cap})) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((SUM(n_tokens) / (ceil(SUM(n_tokens) / {cap}) * {cap})) * CAST(ABS(SUM(n_tokens) / (ceil(SUM(n_tokens) / {cap}) * {cap})) >= POWER(10.0, -(6+1)) AS INT) AS VARCHAR) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) END AS fill_ratio
FROM (SELECT CAST({id_col} % {int(n_shards)} AS BIGINT) AS shard,
             CAST({token_count_sql(text_col)} AS BIGINT) AS n_tokens
      FROM {table})
GROUP BY shard
ORDER BY shard
"""


def pack_greedy(
    df: DataFrame,
    id_col: str,
    text_col: str,
    capacity: int = 2048,
    n_shards: int = 8,
) -> DataFrame:
    """First-fit-decreasing packing without splitting docs: (id, shard,
    n_tokens, bin_id). Deterministic: sort (tokens desc, id), first bin
    with room wins. Oversize docs (> capacity) get singleton bins."""
    cap = int(capacity)

    def _ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        # self-contained closure: executed on workers that may not have the
        # package importable (cloudpickle serializes by reference otherwise)
        pdf = pdf.sort_values(
            ["n_tokens", "__id"], ascending=[False, True]
        ).reset_index(drop=True)
        remaining: list[int] = []
        bins = []
        for t in pdf["n_tokens"]:
            t = int(t)
            placed = -1
            for b, room in enumerate(remaining):
                if t <= room:
                    placed = b
                    break
            if placed < 0:
                remaining.append(max(cap - t, 0))
                placed = len(remaining) - 1
            else:
                remaining[placed] -= t
            bins.append(placed)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf[["__id", "shard", "n_tokens", "bin_id"]]

    out = (
        _sharded_tokens(df, id_col, text_col, n_shards)
        .groupBy("shard")
        .applyInPandas(_ffd, "__id long, shard long, n_tokens long, bin_id long")
    )
    return out.withColumnRenamed("__id", id_col).orderBy(id_col)


def truncate_to_token_budget(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_tokens: int = 128,
) -> DataFrame:
    """Per-document token-budget truncation — the pre-packing step every
    context-window pipeline runs: keep the first ``max_tokens`` whitespace
    tokens, rejoin with single spaces (the normalized-token contract the
    other text operators share). Output ``(id, n_tokens, kept_tokens,
    truncated, out_text)``. Pure column expressions; rides the scan."""
    toks = tokens(text_col)
    n = F.size(toks)
    kept = F.least(n, F.lit(int(max_tokens)))
    return df.select(
        F.col(id_col).alias("id"),
        n.cast("long").alias("n_tokens"),
        kept.cast("long").alias("kept_tokens"),
        (n > max_tokens).alias("truncated"),
        F.array_join(F.slice(toks, 1, int(max_tokens)), " ").alias("out_text"),
    ).orderBy("id")


def truncate_to_token_budget_sql(
    table: str,
    id_col: str,
    text_col: str,
    max_tokens: int = 128,
) -> str:
    t = tokens_sql(text_col)
    return f"""
SELECT {id_col} AS id,
       len({t})::BIGINT AS n_tokens,
       least(len({t}), {int(max_tokens)})::BIGINT AS kept_tokens,
       len({t}) > {int(max_tokens)} AS truncated,
       array_to_string({t}[1:{int(max_tokens)}], ' ') AS out_text
FROM {table} ORDER BY id
"""
