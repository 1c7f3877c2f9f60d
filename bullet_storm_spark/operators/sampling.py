"""Deterministic corpus sampling and source mixing, dual-compiled.

A training-data pipeline mixes sources with per-source weights ("2 epochs of
wiki, 0.3 epochs of crawl"). At 100 TB the only viable mechanism is a
scan-level hash-threshold filter: each record's fate is a pure function of
its id, so the sample is reproducible across runs/engines, requires no
shuffle, no global count, and no coordination — the filter rides the parquet
scan and composes with column pruning. (A rank-per-stratum design would need
a window shuffle over the full corpus; we deliberately avoid it.)

Weights may exceed 1.0: a record is kept ``floor(w)`` times plus one more
with probability ``frac(w)`` — the standard "epochs" semantics for data
mixing. ``n_copies`` is emitted so a downstream packer can materialize
repeats with posexplode without this operator ever shuffling.

The per-record uniform draw is the first 8 hex digits of
``md5(id || ':' || salt)`` scaled by 2^-32 — exactly representable in a
double, so Spark and DuckDB agree bit-for-bit (the same md5-prefix trick as
functions/text.rolling_fingerprint; cf. reference config-driven sampling at
bullet-core's RateLimiter, which gates by count not content — content
hashing is what makes the sample reproducible under replay).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from bullet_storm_spark.functions.text import token_count, token_count_sql

_SCALE = float(1 << 32)


def hash_fraction(id_col: str, salt: str) -> Column:
    """Uniform [0, 1) draw as a deterministic function of (id, salt)."""
    key = F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
    return (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint") / F.lit(_SCALE)
    )


def hash_fraction_sql(id_col: str, salt: str) -> str:
    return (
        f"(('0x' || substr(md5(CAST({id_col} AS VARCHAR) || ':{salt}'), 1, 8))"
        f"::BIGINT / {_SCALE!r})"
    )


def _weight_col(stratum_col: str, weights: dict[str, float], default: float) -> Column:
    out: Column = F.lit(float(default))
    for key in sorted(weights, reverse=True):
        out = F.when(F.col(stratum_col) == key, F.lit(float(weights[key]))).otherwise(
            out
        )
    return out


def _weight_sql(stratum_col: str, weights: dict[str, float], default: float) -> str:
    whens = " ".join(
        f"WHEN {stratum_col} = '{k}' THEN CAST({float(weights[k])!r} AS DOUBLE)"
        for k in sorted(weights)
    )
    return f"(CASE {whens} ELSE CAST({float(default)!r} AS DOUBLE) END)"


def n_copies(
    id_col: str, stratum_col: str, weights: dict[str, float], default: float, salt: str
) -> Column:
    """How many times this record appears in the mixed corpus (0 = dropped)."""
    w = _weight_col(stratum_col, weights, default)
    whole = F.floor(w).cast("bigint")
    extra = F.when(hash_fraction(id_col, salt) < (w - F.floor(w)), F.lit(1)).otherwise(
        F.lit(0)
    )
    return whole + extra


def n_copies_sql(
    id_col: str, stratum_col: str, weights: dict[str, float], default: float, salt: str
) -> str:
    w = _weight_sql(stratum_col, weights, default)
    return (
        f"(CAST(floor({w}) AS BIGINT) + CASE WHEN "
        f"{hash_fraction_sql(id_col, salt)} < ({w} - floor({w})) THEN 1 ELSE 0 END)"
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    weights: dict[str, float],
    default: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """(id, stratum, n_copies) for every record the mix keeps at least once.

    Pure scan-level filter: no shuffle, no window, no global pass — the
    100 TB-safe shape. Deterministic under re-runs and engine changes.
    """
    copies = n_copies(id_col, stratum_col, weights, default, salt).alias("n_copies")
    return (
        df.select(F.col(id_col), F.col(stratum_col), copies)
        .where(F.col("n_copies") >= 1)
        .orderBy(id_col)
    )


def weighted_sample_sql(
    table: str,
    id_col: str,
    stratum_col: str,
    weights: dict[str, float],
    default: float = 0.0,
    salt: str = "mix",
) -> str:
    copies = n_copies_sql(id_col, stratum_col, weights, default, salt)
    return f"""
SELECT {id_col}, {stratum_col}, n_copies
FROM (SELECT {id_col}, {stratum_col}, {copies} AS n_copies FROM {table})
WHERE n_copies >= 1
ORDER BY {id_col}
"""


def mix_accounting(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    text_col: str,
    weights: dict[str, float],
    default: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Per-stratum mix report: input docs, docs kept >= once, emitted copies,
    and emitted token budget (copies x tokens) — what a mixing config review
    actually wants to see before a run."""
    copies = n_copies(id_col, stratum_col, weights, default, salt)
    toks = token_count(text_col)
    return (
        df.select(
            F.col(stratum_col), copies.alias("__c"), toks.cast("bigint").alias("__t")
        )
        .groupBy(stratum_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("__c") >= 1, 1).otherwise(0)).alias("n_kept"),
            F.sum("__c").alias("n_copies"),
            F.sum(F.col("__c") * F.col("__t")).alias("mixed_tokens"),
        )
        .orderBy(stratum_col)
    )


def mix_accounting_sql(
    table: str,
    id_col: str,
    stratum_col: str,
    text_col: str,
    weights: dict[str, float],
    default: float = 0.0,
    salt: str = "mix",
) -> str:
    copies = n_copies_sql(id_col, stratum_col, weights, default, salt)
    toks = token_count_sql(text_col)
    return f"""
SELECT {stratum_col},
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN __c >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(__c) AS BIGINT) AS n_copies,
       CAST(SUM(__c * __t) AS BIGINT) AS mixed_tokens
FROM (SELECT {stratum_col}, {copies} AS __c, CAST({toks} AS BIGINT) AS __t
      FROM {table})
GROUP BY {stratum_col}
ORDER BY {stratum_col}
"""
