"""Corpus curation — the end-to-end training-data pipeline operator.

Composes the engine's text-quality, language-ID, and near-dup machinery
into the canonical curation flow:

    documents -> quality filter -> language filter -> near-dup removal
              -> curated corpus (+ per-stage accounting)

Every stage is a declarative transformation with a DuckDB SQL twin, so the
WHOLE pipeline is oracle-checkable — the property that matters when a
curation run decides what goes into a training set.

Scale shape: quality/language filters ride the scan (map-only, pushdown-
friendly once materialized); dedup is the MinHash pipeline (shuffles on
band hashes + doc ids, never all-pairs); the final anti-join broadcasts
the loser set.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from bullet_storm_spark.functions.text import (
    predicted_lang,
    predicted_lang_sql,
    quality_score,
    quality_score_sql,
)
from bullet_storm_spark.operators.dedup import (
    minhash_lsh_pairs_sql,
    minhash_lsh_pairs_unsorted,
)


@dataclass
class CurationConfig:
    min_quality: float = 0.3
    keep_langs: tuple[str, ...] | None = None  # None = all; matched on the
    # DECLARED lang column when present, else on predicted language
    lang_col: str | None = "lang"
    num_hashes: int = 16
    bands: int = 4
    shingle_n: int = 1
    dedup_threshold: float = 0.9


def curate(
    df: DataFrame, id_col: str, text_col: str, config: CurationConfig | None = None
) -> DataFrame:
    """Curated corpus: survivors of quality -> language -> near-dup stages,
    with per-row stage annotations (quality score, predicted language)."""
    cfg = config or CurationConfig()
    annotated = df.withColumn("quality", quality_score(text_col)).withColumn(
        "pred_lang", predicted_lang(text_col)
    )
    kept = annotated.where(F.col("quality") >= cfg.min_quality)
    if cfg.keep_langs is not None:
        lang = (
            F.col(cfg.lang_col)
            if cfg.lang_col and cfg.lang_col in df.columns
            else F.col("pred_lang")
        )
        kept = kept.where(lang.isin(*cfg.keep_langs))
    pairs = minhash_lsh_pairs_unsorted(
        kept,
        id_col,
        text_col,
        num_hashes=cfg.num_hashes,
        bands=cfg.bands,
        shingle_n=cfg.shingle_n,
        threshold=cfg.dedup_threshold,
    )
    losers = pairs.select(F.col("id_b").alias("__loser")).distinct()
    return kept.join(
        F.broadcast(losers), F.col(id_col) == F.col("__loser"), "left_anti"
    ).orderBy(id_col)


def curate_sql(
    table: str, id_col: str, text_col: str, config: CurationConfig | None = None
) -> str:
    cfg = config or CurationConfig()
    lang_clause = ""
    if cfg.keep_langs is not None:
        langs = ", ".join(f"'{l}'" for l in cfg.keep_langs)
        col = cfg.lang_col if cfg.lang_col else "pred_lang"
        lang_clause = f" AND {col} IN ({langs})"
    kept = f"""
SELECT *, {quality_score_sql(text_col)} AS quality,
       {predicted_lang_sql(text_col)} AS pred_lang
FROM {table}
WHERE {quality_score_sql(text_col)} >= {cfg.min_quality}{lang_clause}
"""
    pairs = minhash_lsh_pairs_sql(
        f"({kept})",
        id_col,
        text_col,
        num_hashes=cfg.num_hashes,
        bands=cfg.bands,
        shingle_n=cfg.shingle_n,
        threshold=cfg.dedup_threshold,
    )
    return f"""
SELECT * FROM ({kept})
WHERE {id_col} NOT IN (SELECT id_b FROM ({pairs}))
ORDER BY {id_col}
"""


def curation_report(
    df: DataFrame, id_col: str, text_col: str, config: CurationConfig | None = None
) -> dict[str, int]:
    """Per-stage survivor counts — the accounting a curation run logs."""
    cfg = config or CurationConfig()
    total = df.count()
    annotated = df.withColumn("quality", quality_score(text_col))
    after_quality = annotated.where(F.col("quality") >= cfg.min_quality).count()
    curated = curate(df, id_col, text_col, cfg).count()
    return {
        "input": total,
        "after_quality_filter": after_quality,
        "after_dedup": curated,
    }


def datacard(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str = "lang",
    source_col: str = "source",
    round_to: int = 6,
) -> DataFrame:
    """One-row corpus datacard — the numbers a dataset card / pre-flight
    review quotes, in one oracle-checkable scan pass: ``(n_docs,
    n_sources, n_langs, total_tokens, total_chars, median_tokens,
    exact_dup_rate, mean_quality, top_lang, top_lang_share)``.

    Engine parity: counts/token sums are integers; mean_quality sums the
    (already exact 6dp) quality scores as DECIMAL(38,6) — order-free —
    with one IEEE division out; median_tokens uses the engines' shared
    (1-g)a+gb percentile interpolation (the group_by_percentiles
    convention); top_lang breaks count ties on the lang string so the
    argmax is total-ordered. Scale: one hash-agg scan + a lang-sized
    aggregate + a 1-row broadcast join — no windows, no pair stages."""
    from bullet_storm_spark.functions.text import fingerprint, token_count
    from bullet_storm_spark.operators.stats_tests import _d2d, _div

    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(lang_col).alias("__lang"),
        F.col(source_col).alias("__src"),
        token_count(text_col).cast("long").alias("__tok"),
        F.length(F.col(text_col)).cast("long").alias("__chars"),
        fingerprint(text_col).alias("__fp"),
        quality_score(text_col).alias("__q"),
    )
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("__src").cast("long").alias("n_sources"),
        F.countDistinct("__lang").cast("long").alias("n_langs"),
        F.sum("__tok").cast("long").alias("total_tokens"),
        F.sum("__chars").cast("long").alias("total_chars"),
        F.expr("percentile(__tok, 0.5D)").cast("double").alias("median_tokens"),
        F.countDistinct("__fp").cast("long").alias("__nfp"),
        F.sum(F.col("__q").cast("decimal(18,6)").cast("decimal(38,6)")).alias(
            "__qsum"
        ),
    )
    top = (
        base.groupBy("__lang")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        .orderBy(F.col("__c").desc(), F.col("__lang").asc())
        .limit(1)
        .select(
            F.col("__lang").alias("top_lang"), F.col("__c").alias("__topc")
        )
    )
    n = F.col("n_docs").cast("double")
    return agg.crossJoin(F.broadcast(top)).select(
        "n_docs",
        "n_sources",
        "n_langs",
        "total_tokens",
        "total_chars",
        F.round(F.col("median_tokens"), round_to).alias("median_tokens"),
        F.round(
            F.lit(1.0) - _div(F.col("__nfp").cast("double"), n), round_to
        ).alias("exact_dup_rate"),
        F.round(_div(_d2d(F.col("__qsum")), n), round_to).alias("mean_quality"),
        "top_lang",
        F.round(_div(F.col("__topc").cast("double"), n), round_to).alias(
            "top_lang_share"
        ),
    )


def datacard_sql(
    table: str,
    id_col: str,
    text_col: str,
    lang_col: str = "lang",
    source_col: str = "source",
    round_to: int = 6,
) -> str:
    from bullet_storm_spark.functions.text import (
        fingerprint_sql,
        token_count_sql,
    )
    from bullet_storm_spark.operators.stats_tests import _d2d_sql, _qround_sql

    q = quality_score_sql(text_col)
    return f"""
WITH __b AS (
  SELECT {lang_col} AS lang, {source_col} AS src,
         CAST({token_count_sql(text_col)} AS BIGINT) AS tok,
         CAST(length({text_col}) AS BIGINT) AS chars,
         {fingerprint_sql(text_col)} AS fp,
         {q} AS q
  FROM {table}
),
__a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT src) AS BIGINT) AS n_sources,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(SUM(tok) AS BIGINT) AS total_tokens,
         CAST(SUM(chars) AS BIGINT) AS total_chars,
         CAST(quantile_cont(CAST(tok AS DOUBLE), 0.5) AS DOUBLE) AS med,
         CAST(COUNT(DISTINCT fp) AS BIGINT) AS nfp,
         CAST(SUM(CAST(q AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS qsum
  FROM __b
),
__l AS (
  SELECT lang AS top_lang, CAST(COUNT(*) AS BIGINT) AS topc
  FROM __b GROUP BY lang ORDER BY topc DESC, top_lang ASC LIMIT 1
)
SELECT n_docs, n_sources, n_langs, total_tokens, total_chars,
       {_qround_sql('med', round_to)} AS median_tokens,
       {_qround_sql('(1.0 - (CAST(nfp AS DOUBLE) / CAST(n_docs AS DOUBLE)))', round_to)} AS exact_dup_rate,
       {_qround_sql(f"({_d2d_sql('qsum')} / CAST(n_docs AS DOUBLE))", round_to)} AS mean_quality,
       top_lang,
       {_qround_sql('(CAST(topc AS DOUBLE) / CAST(n_docs AS DOUBLE))', round_to)} AS top_lang_share
FROM __a, __l
"""
