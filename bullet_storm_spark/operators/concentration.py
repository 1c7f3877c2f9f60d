"""Corpus concentration metrics: Gini coefficient + top-decile share of
token mass per source, dual-compiled.

The inequality audit for a training mix: a source whose token mass is
concentrated in a few giant documents behaves very differently under
doc-level sampling than its row count suggests (a handful of documents
dominate gradients; dedup and curation quotas silently skew). The Gini
coefficient over per-document token counts is the standard scalar for
that concentration (0 = uniform, →1 = one doc holds everything), computed
with the exact rank formula over the ascending-sorted masses:

    G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i)      (i = 1-based rank)

Ties in x are rank-ordered by document id; swapping equal x between
adjacent ranks leaves Σ i·x_i unchanged, so the statistic is
deterministic regardless of tie order. Both numerator and denominator
accumulate in DECIMAL(38,0) — exact in both engines, and rank·tokens
products overflow BIGINT at ~1e9-doc sources — and convert via the
``_d2d`` text hop before the single final IEEE division, so the output
double is engine-identical. ``top_decile_share`` is the token share of
the ceil(n/10) largest documents (the "how much do the whales own" view
of the same curve).

Scale posture (100 TB): one scan computing per-doc token counts, one
range-exchange dense-rank pass (operators/ids.py — the sort is inherent
to any rank statistic, but it runs as a parallel range exchange, never a
single-task window), one hash aggregation per source. No joins, no pair
generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from bullet_storm_spark.functions.text import token_count, token_count_sql
from bullet_storm_spark.operators.stats_tests import _d2d, _d2d_sql, _div

_EXACT = "decimal(38,0)"


def token_concentration(
    df: DataFrame, group_col: str, id_col: str, text_col: str
) -> DataFrame:
    """Per-source concentration: ``(source, n_docs, total_tokens, gini,
    top_decile_share)`` ordered by source."""
    from bullet_storm_spark.operators.ids import assign_dense_ids

    base = df.select(
        F.col(group_col).alias("source"),
        F.col(id_col).alias("__id"),
        token_count(text_col).cast("long").alias("__x"),
    )
    # per-source rank from ONE global range-exchange dense id ordered
    # (source, mass, id) minus a broadcast per-source offset — a
    # source-partitioned window would push a whole source (TBs at 100 TB)
    # through one WindowExec task; ranks are identical because the global
    # order is source-major (VERDICT r8 item 4 posture)
    ranked = assign_dense_ids(base, ["source", "__x", "__id"], id_name="__rn")
    src = ranked.groupBy("source").agg(
        F.min("__rn").alias("__off"),
        F.count(F.lit(1)).cast("long").alias("__n"),
    )
    per = ranked.join(F.broadcast(src), "source").withColumn(
        "__i", (F.col("__rn") - F.col("__off") + 1).cast("long")
    )
    n = F.count(F.lit(1)).cast("long")
    s0 = F.sum(F.col("__x").cast(_EXACT)).cast(_EXACT)
    # cast BEFORE the product: rank·tokens exceeds int64 at ~1e9-doc
    # sources (ANSI overflow); decimal(38,0)·decimal(38,0) stays exact
    s1 = F.sum(F.col("__i").cast(_EXACT) * F.col("__x").cast(_EXACT)).cast(
        _EXACT
    )
    agg = per.groupBy("source").agg(
        n.alias("n_docs"),
        s0.alias("__s0"),
        s1.alias("__s1"),
        # top decile: ranks above n - ceil(n/10) in the ascending order
        F.sum(
            F.when(
                F.col("__i")
                > F.col("__n")
                - F.ceil(F.col("__n") / F.lit(10.0)).cast("long"),
                F.col("__x").cast(_EXACT),
            )
        )
        .cast(_EXACT)
        .alias("__top"),
    )
    num = (
        F.lit(2).cast(_EXACT) * F.col("__s1")
        - (F.col("n_docs") + F.lit(1)).cast(_EXACT) * F.col("__s0")
    ).cast(_EXACT)
    den = (F.col("n_docs").cast(_EXACT) * F.col("__s0")).cast(_EXACT)
    return agg.select(
        "source",
        "n_docs",
        F.col("__s0").cast("long").alias("total_tokens"),
        _div(_d2d(num), _d2d(den)).alias("gini"),
        _div(_d2d(F.col("__top")), _d2d(F.col("__s0"))).alias(
            "top_decile_share"
        ),
    ).orderBy("source")


def token_concentration_sql(
    table: str, group_col: str, id_col: str, text_col: str
) -> str:
    num = _d2d_sql(
        "CAST(2 AS DECIMAL(38,0)) * s1"
        " - CAST(n_docs + 1 AS DECIMAL(38,0)) * s0"
    )
    den = _d2d_sql("CAST(n_docs AS DECIMAL(38,0)) * s0")
    top = _d2d_sql("tp")
    tot = _d2d_sql("s0")
    return f"""
WITH __x AS (
  SELECT {group_col} AS source, {id_col} AS id,
         {token_count_sql(text_col)}::BIGINT AS x
  FROM {table}
),
__r AS (
  SELECT source, x,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY x ASC, id ASC)::BIGINT
           AS i,
         COUNT(*) OVER (PARTITION BY source)::BIGINT AS n
  FROM __x
),
__a AS (
  SELECT source,
         COUNT(*)::BIGINT AS n_docs,
         CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s0,
         CAST(SUM(CAST(i * x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
         CAST(SUM(CASE WHEN i > n - CAST(CEIL(n / 10.0) AS BIGINT)
                       THEN CAST(x AS DECIMAL(38,0)) END)
              AS DECIMAL(38,0)) AS tp
  FROM __r GROUP BY source
)
SELECT source, n_docs, CAST(s0 AS BIGINT) AS total_tokens,
       {num} / {den} AS gini,
       {top} / {tot} AS top_decile_share
FROM __a
ORDER BY source
"""


def hhi(df: DataFrame, group_col: str, text_col: str, round_to: int = 9) -> DataFrame:
    """One-row Herfindahl-Hirschman concentration of token mass across
    sources: ``(n_sources, total_tokens, hhi, effective_sources)`` where
    ``hhi = Σ_s (M_s/M)² = (Σ M_s²)/M²`` over per-source token masses
    and ``effective_sources = 1/hhi`` (the "numbers equivalent", Adelman
    REStat 1969) — how many EQUAL-sized sources the mix behaves like.

    The cross-source complement to ``token_concentration``'s
    within-source Gini: a 50-source mix where one crawl holds 80% of
    tokens trains like a 1.5-source mix, and every source-level quota or
    mixture weight silently inherits that skew. Exact integer masses,
    DECIMAL(38,0) squares (M_s² overflows int64 past ~3·10⁹ tokens per
    source — routine at 100 TB), two IEEE finishes. NULL when the corpus
    has no tokens.

    Scale posture: one scan (map-side-combined per-source mass, sources
    are a bounded dimension), one source-sized reduction."""
    per = (
        df.select(
            F.col(group_col).alias("__g"),
            token_count(text_col).cast("long").alias("__x"),
        )
        .groupBy("__g")
        .agg(F.sum(F.col("__x").cast(_EXACT)).cast(_EXACT).alias("__m"))
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_sources"),
        F.sum("__m").cast(_EXACT).alias("__tot"),
        F.sum(F.col("__m") * F.col("__m")).cast(_EXACT).alias("__sq"),
    )
    h = _div(_d2d(F.col("__sq")), _d2d(F.col("__tot") * F.col("__tot")))
    return agg.select(
        "n_sources",
        F.col("__tot").cast("long").alias("total_tokens"),
        F.round(h, round_to).alias("hhi"),
        F.round(_div(F.lit(1.0), h), round_to).alias("effective_sources"),
    )


def hhi_sql(table: str, group_col: str, text_col: str, round_to: int = 9) -> str:
    d = "DECIMAL(38,0)"
    return f"""
WITH __per AS (
  SELECT {group_col} AS g,
         CAST(SUM(CAST({token_count_sql(text_col)}::BIGINT AS {d})) AS {d}) AS m
  FROM {table} GROUP BY g
),
__a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
         CAST(SUM(m) AS {d}) AS tot,
         CAST(SUM(m * m) AS {d}) AS sq
  FROM __per
)
SELECT n_sources, CAST(tot AS BIGINT) AS total_tokens,
       CAST(CAST(CAST(CAST((CASE WHEN tot > 0
                  THEN {_d2d_sql('sq')} / {_d2d_sql('tot * tot')} END) * CAST(ABS(CASE WHEN tot > 0
                  THEN {_d2d_sql('sq')} / {_d2d_sql('tot * tot')} END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS hhi,
       CAST(CAST(CAST(CAST((CASE WHEN tot > 0 AND sq > 0
                  THEN 1.0 / ({_d2d_sql('sq')} / {_d2d_sql('tot * tot')}) END) * CAST(ABS(CASE WHEN tot > 0 AND sq > 0
                  THEN 1.0 / ({_d2d_sql('sq')} / {_d2d_sql('tot * tot')}) END) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS effective_sources
FROM __a
"""


def activity_concentration(
    df: DataFrame, group_col: str, round_to: int = 9
) -> DataFrame:
    """One-row concentration of EVENT mass across actors: ``(n_keys,
    n_events, gini, top_decile_share)`` — the whale/bot audit for any
    keyed event stream. A handful of users generating most events skews
    every per-event metric (session stats, funnels, experiment arms all
    silently become whale studies); the Gini over per-actor counts is
    the one-scalar alarm, top_decile_share the "how much do the top 10%
    own" view.

    Same exact rank formula as ``token_concentration`` (ties rank-
    ordered by key, statistic invariant to tie order), same
    DECIMAL(38,0) moments; the rank window here is GLOBAL over the
    actor frame — actor-dimension-sized, not event-sized (one corpus
    collapse first)."""
    from bullet_storm_spark.operators.ids import assign_dense_ids

    per = df.groupBy(F.col(group_col).alias("__k")).agg(
        F.count(F.lit(1)).cast("long").alias("__x")
    )
    # global rank over the ACTOR dimension via the range-exchange
    # partition-offset pattern (operators/ids.py), not a single-task
    # Window.orderBy — 10^8-10^9 actors at 100 TB (VERDICT r8 item 4);
    # the 1-row actor total rides a broadcast
    ranked = assign_dense_ids(per, ["__x", "__k"], id_name="__i").crossJoin(
        F.broadcast(
            per.agg(F.count(F.lit(1)).cast("long").alias("__n"))
        )
    )
    n = F.count(F.lit(1)).cast("long")
    s0 = F.sum(F.col("__x").cast(_EXACT)).cast(_EXACT)
    s1 = F.sum(F.col("__i").cast(_EXACT) * F.col("__x").cast(_EXACT)).cast(_EXACT)
    top = (
        F.sum(
            F.when(
                F.col("__i")
                > F.col("__n") - F.ceil(F.col("__n") / F.lit(10.0)).cast("long"),
                F.col("__x").cast(_EXACT),
            )
        )
        .cast(_EXACT)
    )
    agg = ranked.agg(
        n.alias("n_keys"), s0.alias("__s0"), s1.alias("__s1"), top.alias("__top")
    )
    num = (
        F.lit(2).cast(_EXACT) * F.col("__s1")
        - (F.col("n_keys") + F.lit(1)).cast(_EXACT) * F.col("__s0")
    ).cast(_EXACT)
    den = (F.col("n_keys").cast(_EXACT) * F.col("__s0")).cast(_EXACT)
    return agg.select(
        "n_keys",
        F.col("__s0").cast("long").alias("n_events"),
        F.round(_div(_d2d(num), _d2d(den)), round_to).alias("gini"),
        F.round(_div(_d2d(F.col("__top")), _d2d(F.col("__s0"))), round_to).alias(
            "top_decile_share"
        ),
    )


def activity_concentration_sql(
    table: str, group_col: str, round_to: int = 9
) -> str:
    num = _d2d_sql(
        "CAST(2 AS DECIMAL(38,0)) * s1 - CAST(n_keys + 1 AS DECIMAL(38,0)) * s0"
    )
    den = _d2d_sql("CAST(n_keys AS DECIMAL(38,0)) * s0")
    return f"""
WITH __per AS (
  SELECT {group_col} AS k, CAST(COUNT(*) AS BIGINT) AS x
  FROM {table} GROUP BY k
),
__r AS (
  SELECT k, x,
         ROW_NUMBER() OVER (ORDER BY x ASC, k ASC)::BIGINT AS i,
         COUNT(*) OVER ()::BIGINT AS n
  FROM __per
),
__a AS (
  SELECT COUNT(*)::BIGINT AS n_keys,
         CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s0,
         CAST(SUM(CAST(i AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS s1,
         CAST(SUM(CASE WHEN i > n - CAST(CEIL(n / 10.0) AS BIGINT)
                       THEN CAST(x AS DECIMAL(38,0)) END)
              AS DECIMAL(38,0)) AS tp
  FROM __r
)
SELECT n_keys, CAST(s0 AS BIGINT) AS n_events,
       CASE WHEN ABS({num} / {den}) >= 1e16 THEN CAST(({num} / {den}) AS DOUBLE) ELSE CAST(CAST(CAST(CAST(({num} / {den}) * CAST(ABS({num} / {den}) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS gini,
       CAST(CAST(CAST(CAST(({_d2d_sql('tp')} / {_d2d_sql('s0')}) * CAST(ABS({_d2d_sql('tp')} / {_d2d_sql('s0')}) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE)
         AS top_decile_share
FROM __a
"""


def lorenz_curve(
    df: DataFrame, group_col: str, n_points: int = 10, round_to: int = 9
) -> DataFrame:
    """Lorenz curve of event mass across actors: ``(point, n_keys_le,
    cum_events, cum_share)`` at ``n_points`` equal-population cuts of
    the ascending-activity actor order — the curve whose area the Gini
    summarizes (activity_concentration), kept as actual points for
    plotting and for "the bottom 50% of users generate X% of events"
    statements. ``point`` k covers the floor(k·n/n_points) least-active
    actors; exact integer masses, one IEEE division per row.

    Scale posture: actor collapse → range-exchange dense rank
    (operators/ids.py, never a single-task window) → n_points-sized
    aggregation; the 1-row totals ride a broadcast."""
    if n_points < 1:
        raise ValueError(f"need n_points >= 1, got {n_points}")
    from bullet_storm_spark.operators.ids import assign_dense_ids

    # the actor collapse feeds TWO consumers (the rank assignment and
    # the 1-row totals); materialize once — actor-sized — so the event
    # table is aggregated once, not twice (guide §3.3)
    per = df.groupBy(F.col(group_col).alias("__k")).agg(
        F.count(F.lit(1)).cast("long").alias("__x")
    ).localCheckpoint()
    ranked = assign_dense_ids(per, ["__x", "__k"], id_name="__i").crossJoin(
        F.broadcast(
            per.agg(
                F.count(F.lit(1)).cast("long").alias("__n"),
                F.sum(F.col("__x").cast(_EXACT)).cast(_EXACT).alias("__tot"),
            )
        )
    )
    # actor at rank i belongs to the smallest point k with
    # i <= floor(k*n/n_points): k = ceil(i*n_points/n), computed as
    # (a + n - 1) div n with POSITIVE operands only — Spark's `div`
    # truncates toward zero while DuckDB's `//` floors, so the usual
    # -((-a) div n) ceil trick diverges on negatives across engines
    pt = F.expr(
        f"CAST((__i * {int(n_points)} + __n - 1) div __n AS BIGINT)"
    )
    by_pt = (
        ranked.select(
            pt.alias("point"),
            "__i",
            F.col("__x").cast(_EXACT).alias("__xe"),
            "__tot",
        )
        .groupBy("point")
        .agg(
            F.max("__i").cast("long").alias("n_keys_le"),
            F.sum("__xe").cast(_EXACT).alias("__m"),
            F.max(_d2d(F.col("__tot"))).alias("__totd"),
        )
    )
    w_cum = Window.orderBy("point").rowsBetween(Window.unboundedPreceding, 0)
    cum = F.sum(F.col("__m")).over(w_cum).cast(_EXACT)
    return by_pt.select(
        F.col("point").cast("long").alias("point"),
        "n_keys_le",
        cum.cast("long").alias("cum_events"),
        F.round(_div(_d2d(cum), F.col("__totd")), round_to).alias("cum_share"),
    ).orderBy("point")


def lorenz_curve_sql(
    table: str, group_col: str, n_points: int = 10, round_to: int = 9
) -> str:
    if n_points < 1:
        raise ValueError(f"need n_points >= 1, got {n_points}")
    cum = "CAST(SUM(m) OVER (ORDER BY point ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,0))"
    share = f"{_d2d_sql(cum)} / {_d2d_sql('CAST(tot AS DECIMAL(38,0))')}"
    guarded = (
        f"CAST(CAST(CAST(CAST(({share}) * CAST(ABS({share}) >= "
        f"POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS "
        f"DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE)"
    )
    return f"""
WITH __per AS (
  SELECT {group_col} AS k, CAST(COUNT(*) AS BIGINT) AS x
  FROM {table} GROUP BY k
),
__r AS (
  SELECT k, x,
         ROW_NUMBER() OVER (ORDER BY x ASC, k ASC)::BIGINT AS i,
         COUNT(*) OVER ()::BIGINT AS n,
         SUM(x) OVER ()::BIGINT AS tot
  FROM __per
),
__pt AS (
  SELECT (i * {int(n_points)} + n - 1) // n AS point,
         MAX(i)::BIGINT AS n_keys_le,
         CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS m,
         MAX(tot) AS tot
  FROM __r GROUP BY point
)
SELECT CAST(point AS BIGINT) AS point, n_keys_le,
       CAST({cum} AS BIGINT) AS cum_events,
       {guarded} AS cum_share
FROM __pt ORDER BY point
"""
