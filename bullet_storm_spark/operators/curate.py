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
    minhash_lsh_pairs,
    minhash_lsh_pairs_sql,
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
    pairs = minhash_lsh_pairs(
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
