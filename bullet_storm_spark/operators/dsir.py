"""DSIR-style importance weighting for data selection, dual-compiled.

Implements the hashed-n-gram importance-resampling estimator of DSIR
("Data Selection for Language Models via Importance Resampling", Xie et
al., arXiv 2302.03169): documents are featurized as bags of hashed word
bigrams over ``n_buckets`` buckets; two smoothed bucket-unigram models are
fit — one on a TARGET slice (the distribution you want more of) and one on
the RAW corpus — and each document is scored with the log-likelihood
ratio ``log p_target(doc) - log p_raw(doc)``. High-weight documents look
like the target; resampling by these weights (operators/sampling.py's
weighted mix composes directly) tilts the corpus toward it.

Everything is hash-exact against the DuckDB twin: bucket counts are
integer aggregations, the per-bucket log ratio rounds to 9 dp *before*
per-document summation, and document sums run in DECIMAL(38,9) — the same
order-free-summation treatment as operators/vocab.py's lm_score.

Scale posture (100 TB):
* featurization is explode → md5 → pmod per bigram occurrence — pure
  codegen expressions, rows multiply by ~tokens/doc, never content^2;
* both models are ONE bucket-keyed aggregation each, at most
  ``n_buckets`` rows out (partial map-side aggregation collapses every
  upstream partition to ≤ n_buckets rows before the exchange);
* the fitted model table is ≤ n_buckets rows (default 1024) — it
  BROADCASTS to the scoring join, so scoring adds zero shuffles beyond
  the one doc-keyed aggregation that produces the final weight;
* no driver-side state: corpus totals ride broadcast 1-row aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from bullet_storm_spark.functions.text import (
    shingles_from_tokens,
    shingles_sql,
    tokens,
)


def _bucket(gram: Column, n_buckets: int) -> Column:
    """First 8 md5 hex digits -> bigint -> bucket (uniform by md5)."""
    return F.pmod(
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("bigint"),
        F.lit(int(n_buckets)),
    )


def _bucket_sql(gram: str, n_buckets: int) -> str:
    # the 8-hex-digit value is < 2^32 so plain % equals pmod here
    return f"(('0x' || substr(md5({gram}), 1, 8))::BIGINT % {int(n_buckets)})"


def dsir_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    shingle_n: int = 2,
    n_buckets: int = 1024,
    alpha: float = 1.0,
    round_to: int = 6,
) -> DataFrame:
    """(id, n_grams, log_weight): per-document DSIR log importance weight
    ``sum over gram occurrences of ln p_target(bucket) - ln p_raw(bucket)``
    with add-``alpha`` smoothing over ``n_buckets``; ``target_pred`` is a
    boolean Column selecting the target slice of ``df``. Documents with no
    bigram (fewer than ``shingle_n`` tokens) score 0 over 0 grams."""
    spark = df.sparkSession
    b = int(n_buckets)
    a = float(alpha)
    grams = (
        df.select(
            F.col(id_col).alias("__id"),
            target_pred.alias("__is_target"),
            tokens(text_col).alias("__toks"),
        )
        # materialize the token array behind the exchange
        # (functions/text.py:57-65) and parallelize the one-file scan.
        # HASH on the unique id, not round-robin: a keyless repartition
        # pays a full local sort of every row first (SPARK-23207
        # determinism), and unique ids spread just as evenly (guide §2)
        .repartition(spark.sparkContext.defaultParallelism, "__id")
        .select(
            "__id",
            "__is_target",
            F.explode_outer(
                shingles_from_tokens(F.col("__toks"), shingle_n, distinct=False)
            ).alias("__gram"),
        )
        .select("__id", "__is_target", _bucket(F.col("__gram"), b).alias("__b"))
        # hash-partition by bucket so the model aggregation and the scoring
        # probe read the SAME exchange: Spark's ReuseExchange dedupes the
        # two identical subtrees and the md5-dominated featurization runs
        # ONCE (without this, fit and score each recompute it from the raw
        # scan — two full passes)
        .repartition(spark.sparkContext.defaultParallelism, "__b")
    )
    occ = grams.where(F.col("__b").isNotNull())
    model = occ.groupBy("__b").agg(
        F.count("*").cast("long").alias("__cr"),
        F.sum(F.when(F.col("__is_target"), 1).otherwise(0))
        .cast("long")
        .alias("__ct"),
    )
    totals = model.agg(
        F.sum("__cr").cast("long").alias("__Tr"),
        F.sum("__ct").cast("long").alias("__Tt"),
    )
    llr = model.crossJoin(F.broadcast(totals)).select(
        "__b",
        F.round(
            F.log((F.col("__ct") + a) / (F.col("__Tt") + a * b))
            - F.log((F.col("__cr") + a) / (F.col("__Tr") + a * b)),
            9,
        ).alias("__llr"),
    )
    scored = grams.join(F.broadcast(llr), "__b", "left")
    return (
        scored.groupBy("__id")
        .agg(
            F.count("__b").cast("long").alias("n_grams"),
            F.round(
                F.coalesce(
                    F.sum(F.col("__llr").cast("decimal(38,9)")).cast("double"),
                    F.lit(0.0),
                ),
                round_to,
            ).alias("log_weight"),
        )
        .withColumnRenamed("__id", id_col)
        .orderBy(id_col)
    )


def dsir_weights_sql(
    table: str,
    id_col: str,
    text_col: str,
    target_pred_sql: str,
    shingle_n: int = 2,
    n_buckets: int = 1024,
    alpha: float = 1.0,
    round_to: int = 6,
) -> str:
    b = int(n_buckets)
    a = float(alpha)
    sh = shingles_sql(text_col, shingle_n, distinct=False)
    return f"""
WITH __doc AS (
  SELECT {id_col} AS id, ({target_pred_sql}) AS is_target, {sh} AS grams
  FROM {table}
), __g AS (
  SELECT id, is_target,
         {_bucket_sql('g.gram', b)} AS b
  FROM __doc, LATERAL (SELECT unnest(grams) AS gram) g
), __model AS (
  SELECT b, COUNT(*)::BIGINT AS cr,
         SUM(CASE WHEN is_target THEN 1 ELSE 0 END)::BIGINT AS ct
  FROM __g GROUP BY b
), __tot AS (SELECT SUM(cr)::BIGINT AS Tr, SUM(ct)::BIGINT AS Tt FROM __model),
__llr AS (
  SELECT b, CAST(CAST(CAST(CAST((ln((ct + {a!r}) / (Tt + {a!r} * {b}))
               - ln((cr + {a!r}) / (Tr + {a!r} * {b}))) * CAST(ABS(ln((ct + {a!r}) / (Tt + {a!r} * {b}))
               - ln((cr + {a!r}) / (Tr + {a!r} * {b}))) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) AS llr
  FROM __model CROSS JOIN __tot
), __scored AS (
  SELECT g.id, g.b, l.llr FROM __g g LEFT JOIN __llr l USING (b)
), __sums AS (
  SELECT id, COUNT(b)::BIGINT AS n_grams,
         CASE WHEN ABS(COALESCE(CAST(SUM(CAST(llr AS DECIMAL(38,9))) AS DOUBLE), 0.0)) >= 1e16 THEN CAST((COALESCE(CAST(SUM(CAST(llr AS DECIMAL(38,9))) AS DOUBLE), 0.0)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((COALESCE(CAST(SUM(CAST(llr AS DECIMAL(38,9))) AS DOUBLE), 0.0)) * CAST(ABS(COALESCE(CAST(SUM(CAST(llr AS DECIMAL(38,9))) AS DOUBLE), 0.0)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS log_weight
  FROM __scored GROUP BY id
)
SELECT d.id AS {id_col}, COALESCE(s.n_grams, 0) AS n_grams,
       COALESCE(s.log_weight, 0.0) AS log_weight
FROM __doc d LEFT JOIN __sums s USING (id)
ORDER BY {id_col}
"""
