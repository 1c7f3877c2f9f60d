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

from pyspark.sql import Column, DataFrame, Window, functions as F

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


def _target_tokens_sql_case(
    stratum_col: str, targets: dict[str, int]
) -> str:
    whens = " ".join(
        f"WHEN {stratum_col} = '{k}' THEN CAST({targets[k]} AS BIGINT)"
        for k in sorted(targets)
    )
    return f"CASE {whens} ELSE CAST(0 AS BIGINT) END"


def _target_tokens_col(stratum_col: str, targets: dict[str, int]) -> Column:
    out: Column = F.lit(0).cast("bigint")
    for key in sorted(targets, reverse=True):
        out = F.when(
            F.col(stratum_col) == key, F.lit(int(targets[key])).cast("bigint")
        ).otherwise(out)
    return out


def _mix_targets(weights: dict[str, float], budget_tokens: int) -> dict[str, int]:
    """Per-source token targets as exact plan literals, apportioned by
    largest remainder so they sum to EXACTLY ``budget_tokens`` —
    independent per-source rounding can strand or overshoot up to
    len(weights)/2 tokens of the budget (banker's rounding makes
    {0.5, 0.5} of 5 yield 2+2), and a budget pre-flight that does not
    conserve the budget under-plans the run. Fractional-remainder ties
    break by key order (deterministic).

    Shares are resolved driver-side (weights and budget are config, not
    data), so both dialects see identical integer literals and the only
    data-dependent arithmetic left in the plan is one BIGINT division —
    no float-multiply parity surface at all."""
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("mix_plan: weights must sum to a positive value")
    budget = int(budget_tokens)
    raw = {k: weights[k] / total * budget for k in weights}
    out = {k: int(raw[k]) for k in weights}
    leftover = budget - sum(out.values())
    for k in sorted(weights, key=lambda k: (-(raw[k] - int(raw[k])), k)):
        if leftover <= 0:
            break
        out[k] += 1
        leftover -= 1
    return out


def mix_plan(
    df: DataFrame,
    stratum_col: str,
    text_col: str,
    weights: dict[str, float],
    budget_tokens: int,
    max_epochs: float = 4.0,
) -> DataFrame:
    """Token-budget mixture solver: given target source proportions and a
    total token budget, report per source what the corpus can actually
    supply — available tokens, the target, the epochs the sampler would
    need (``planned_epochs`` feeds straight into ``weighted_sample`` /
    ``n_copies`` as the per-source weight), whether that exceeds the
    over-epoching guard, and the token shortfall if it does.

    This is the pre-flight a data-budgeting pass (Chinchilla-style token
    accounting, DoReMi-style domain reweighting) runs before committing a
    100 TB mixing job: one hash aggregation over the corpus, a broadcast-
    sized output (one row per source), and every threshold a plan literal.
    Sources present in the data but absent from ``weights`` get a zero
    target (they are being mixed out); sources WEIGHTED but absent from
    the data appear too, with zero availability and their full target as
    shortfall — the worst unsatisfiable-target case is exactly what the
    pre-flight exists to surface, so it must not vanish from the report.

    Output: ``(stratum, n_docs, avail_tokens, target_tokens,
    planned_epochs, over_epoch, shortfall_tokens)``; ``planned_epochs``
    ROUND 6dp from one BIGINT/BIGINT division, NULL for a zero-token
    source; ``shortfall_tokens = max(target - floor(avail * max_epochs),
    0)`` and ``over_epoch = shortfall_tokens > 0`` — computed from the
    exact integer cap, never from the rounded epochs (a 6dp-rounded
    2.0000001 epochs would read as exactly at-cap while a real shortfall
    exists)."""
    targets = _mix_targets(weights, budget_tokens)
    toks = token_count(text_col)
    agg = (
        df.select(F.col(stratum_col), toks.cast("bigint").alias("__t"))
        .groupBy(stratum_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__t").alias("avail_tokens"),
        )
    )
    weighted = df.sparkSession.createDataFrame(
        [(k,) for k in sorted(weights)], f"{stratum_col} string"
    )
    full = agg.join(weighted, stratum_col, "full_outer").select(
        F.col(stratum_col),
        F.coalesce(F.col("n_docs"), F.lit(0)).cast("long").alias("n_docs"),
        F.coalesce(F.col("avail_tokens"), F.lit(0))
        .cast("long")
        .alias("avail_tokens"),
    )
    target = _target_tokens_col(stratum_col, targets)
    epochs = F.when(
        F.col("avail_tokens") > 0,
        F.round(F.col("target_tokens") / F.col("avail_tokens"), 6),
    )
    cap = F.floor(F.col("avail_tokens") * F.lit(float(max_epochs))).cast("bigint")
    return (
        full.withColumn("target_tokens", target)
        .withColumn("planned_epochs", epochs)
        .withColumn(
            "shortfall_tokens",
            F.greatest(F.col("target_tokens") - cap, F.lit(0).cast("bigint")),
        )
        .withColumn("over_epoch", F.col("shortfall_tokens") > 0)
        .select(
            stratum_col,
            "n_docs",
            "avail_tokens",
            "target_tokens",
            "planned_epochs",
            "over_epoch",
            "shortfall_tokens",
        )
        .orderBy(stratum_col)
    )


def mix_plan_sql(
    table: str,
    stratum_col: str,
    text_col: str,
    weights: dict[str, float],
    budget_tokens: int,
    max_epochs: float = 4.0,
) -> str:
    targets = _mix_targets(weights, budget_tokens)
    toks = token_count_sql(text_col)
    target = _target_tokens_sql_case(stratum_col, targets)
    strata = ", ".join(f"'{k}'" for k in sorted(weights))
    return f"""
WITH __agg AS (
  SELECT {stratum_col},
         COUNT(*) AS n_docs,
         CAST(SUM(CAST({toks} AS BIGINT)) AS BIGINT) AS avail_tokens
  FROM {table}
  GROUP BY {stratum_col}
),
__w AS (SELECT unnest([{strata}]) AS __s),
__full AS (
  SELECT COALESCE(a.{stratum_col}, w.__s) AS {stratum_col},
         CAST(COALESCE(a.n_docs, 0) AS BIGINT) AS n_docs,
         CAST(COALESCE(a.avail_tokens, 0) AS BIGINT) AS avail_tokens
  FROM __agg a FULL OUTER JOIN __w w ON a.{stratum_col} = w.__s
),
__plan AS (
  SELECT {stratum_col}, n_docs, avail_tokens,
         {target} AS target_tokens,
         CASE WHEN avail_tokens > 0
              THEN CASE WHEN ABS(({target}) / avail_tokens) >= 1e16 THEN CAST((({target}) / avail_tokens) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((({target}) / avail_tokens) * CAST(ABS(({target}) / avail_tokens) >= POWER(10.0, -(6+1)) AS INT) AS VARCHAR) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) END END AS planned_epochs,
         CAST(FLOOR(avail_tokens * CAST({float(max_epochs)!r} AS DOUBLE))
              AS BIGINT) AS __cap
  FROM __full
)
SELECT {stratum_col}, n_docs, avail_tokens, target_tokens, planned_epochs,
       GREATEST(target_tokens - __cap, CAST(0 AS BIGINT)) > 0 AS over_epoch,
       GREATEST(target_tokens - __cap, CAST(0 AS BIGINT)) AS shortfall_tokens
FROM __plan
ORDER BY {stratum_col}
"""


def stratified_split(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    holdout_frac: float = 0.1,
    salt: str = "split",
) -> DataFrame:
    """(id, stratum, split): deterministic train/holdout assignment with an
    EXACT per-stratum quota — floor(holdout_frac * |stratum|) rows land in
    'holdout', the rest in 'train' (the eval-set carve a training run
    needs; the hash-threshold filter above is only approximate per
    stratum). Ranking is by (md5(id:salt), id): content-hash order, so the
    assignment is reproducible under re-runs, engine changes, and row
    order — and adding a NEW stratum never perturbs existing ones.

    Scale shape: one shuffle on the stratum key (window rank + count);
    strata are the parallelism unit. A single viral stratum serializes its
    own rank — at 100 TB prefer more granular strata (source x shard) or
    the approximate zero-shuffle split when exact quotas aren't required.
    """
    from pyspark.sql import Window

    if not (0.0 <= holdout_frac <= 1.0):
        raise ValueError(f"holdout_frac must be in [0, 1], got {holdout_frac}")
    h = hash_fraction(id_col, salt)
    w = Window.partitionBy(stratum_col).orderBy(F.col("__h"), F.col(id_col))
    wc = Window.partitionBy(stratum_col)
    return (
        df.select(F.col(id_col), F.col(stratum_col), h.alias("__h"))
        .select(
            id_col,
            stratum_col,
            F.row_number().over(w).alias("__rn"),
            F.count(F.lit(1)).over(wc).alias("__n"),
        )
        .select(
            id_col,
            stratum_col,
            F.when(
                F.col("__rn") <= F.floor(F.col("__n") * F.lit(float(holdout_frac))),
                F.lit("holdout"),
            )
            .otherwise(F.lit("train"))
            .alias("split"),
        )
        .orderBy(id_col)
    )


def stratified_split_sql(
    table: str,
    id_col: str,
    stratum_col: str,
    holdout_frac: float = 0.1,
    salt: str = "split",
) -> str:
    h = hash_fraction_sql(id_col, salt)
    return f"""
SELECT {id_col}, {stratum_col},
       CASE WHEN __rn <= floor(__n * {float(holdout_frac)!r}) THEN 'holdout'
            ELSE 'train' END AS split
FROM (
  SELECT {id_col}, {stratum_col},
         row_number() OVER (PARTITION BY {stratum_col}
                            ORDER BY {h}, {id_col}) AS __rn,
         COUNT(*) OVER (PARTITION BY {stratum_col}) AS __n
  FROM {table}
)
ORDER BY {id_col}
"""


def split_accounting(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    holdout_frac: float = 0.1,
    salt: str = "split",
) -> DataFrame:
    """Per-stratum split report: (stratum, n_docs, n_holdout, n_train) —
    the quota audit (n_holdout == floor(frac * n_docs) by construction)."""
    assigned = stratified_split(df, id_col, stratum_col, holdout_frac, salt)
    return (
        assigned.groupBy(stratum_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("split") == "holdout").cast("bigint")).alias("n_holdout"),
            F.sum((F.col("split") == "train").cast("bigint")).alias("n_train"),
        )
        .orderBy(stratum_col)
    )


def split_accounting_sql(
    table: str,
    id_col: str,
    stratum_col: str,
    holdout_frac: float = 0.1,
    salt: str = "split",
) -> str:
    inner = stratified_split_sql(table, id_col, stratum_col, holdout_frac, salt)
    return f"""
SELECT {stratum_col},
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN split = 'holdout' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_holdout,
       CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_train
FROM ({inner})
GROUP BY {stratum_col}
ORDER BY {stratum_col}
"""


def epoch_shuffle(
    df: DataFrame, id_col: str, seed: str, n_shards: int = 8
) -> DataFrame:
    """(shard, pos, id): the deterministic global training-order shuffle.
    Every record is assigned a shard and a position within it as a pure
    function of (seed, id) — change the seed, get an independent
    permutation; re-run the job, get the identical one. This is the
    epoch-ordering pass a trainer consumes: readers stream shard files in
    pos order and the concatenation is a uniform permutation of the corpus.

    Scale shape: the shuffle key is md5(seed:id) — uniform by
    construction, so shards balance regardless of id skew. ONE exchange on
    the shard id, ONE within-partition sort for the position window; with
    n_shards ~ cluster parallelism this is exactly the
    repartitionByRange+sortWithinPartitions posture of the shard layout
    writer (operators/layout.py), expressed as an oracle-checkable query.
    No driver state, no global sort."""
    from pyspark.sql import Window

    b = int(n_shards)
    if b < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = F.md5(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
    )
    shard = F.pmod(
        F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint"), F.lit(b)
    )
    keyed = df.select(
        F.col(id_col).alias("__id"), key.alias("__key"), shard.alias("shard")
    )
    w = Window.partitionBy("shard").orderBy("__key", "__id")
    return (
        keyed.withColumn("pos", F.row_number().over(w).cast("long"))
        .select("shard", "pos", F.col("__id").alias(id_col))
        .orderBy("shard", "pos")
    )


def epoch_shuffle_sql(
    table: str, id_col: str, seed: str, n_shards: int = 8
) -> str:
    b = int(n_shards)
    if b < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = f"md5('{seed}:' || CAST({id_col} AS VARCHAR))"
    shard = f"(('0x' || substr({key}, 1, 8))::BIGINT % {b})"
    return f"""
SELECT {shard} AS shard,
       row_number() OVER (PARTITION BY {shard}
                          ORDER BY {key}, {id_col})::BIGINT AS pos,
       {id_col}
FROM {table}
ORDER BY shard, pos
"""


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight: Column,
    k: int,
    salt: str = "prio",
    weight_name: str = "weight",
) -> DataFrame:
    """(id, weight, priority): a weighted random sample WITHOUT
    replacement of exactly ``k`` rows (fewer only if the eligible corpus
    is smaller) — Efraimidis & Spirakis (IPL 2006) priority sampling.
    Each row draws priority = -ln(u) / w from its deterministic (id,
    salt) uniform u; the k SMALLEST priorities are the sample, and the
    inclusion probabilities are exactly the weighted-without-replacement
    ones. Rows with weight <= 0 are excluded (zero mass).

    Why this beats df.sample at scale: it is (1) weighted per-row, (2)
    exactly-k, (3) reproducible under partitioning/re-runs/appends (the
    draw is a pure row function), and (4) one TakeOrdered — per-partition
    heaps merged on the driver, no global sort, no second pass to fix the
    sample size. Priorities round to 9 dp with the id as tiebreak, so the
    boundary is engine-independent."""
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        + F.lit(1)
    ) / F.lit(float(1 << 32) + 1.0)
    pri = F.round(-F.log(u) / weight, 9)
    return (
        df.select(
            F.col(id_col).alias(id_col),
            F.round(weight, 9).alias(weight_name),
            pri.alias("priority"),
        )
        .where(F.col(weight_name) > 0)
        .orderBy("priority", id_col)
        .limit(int(k))
    )


def priority_sample_sql(
    table: str,
    id_col: str,
    weight_expr: str,
    k: int,
    salt: str = "prio",
    weight_name: str = "weight",
) -> str:
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    u = (
        f"((('0x' || substr(md5(CAST({id_col} AS VARCHAR) || ':{salt}'), 1, 8))"
        f"::BIGINT + 1) / {float(1 << 32) + 1.0!r})"
    )
    return f"""
SELECT {id_col}, CASE WHEN ABS({weight_expr}) >= 1e16 THEN CAST(({weight_expr}) AS DOUBLE) ELSE CAST(CAST(CAST(CAST(({weight_expr}) * CAST(ABS({weight_expr}) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS {weight_name},
       CASE WHEN ABS(-ln({u}) / ({weight_expr})) >= 1e16 THEN CAST((-ln({u}) / ({weight_expr})) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((-ln({u}) / ({weight_expr})) * CAST(ABS(-ln({u}) / ({weight_expr})) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS priority
FROM {table}
WHERE CASE WHEN ABS({weight_expr}) >= 1e16 THEN CAST(({weight_expr}) AS DOUBLE) ELSE CAST(CAST(CAST(CAST(({weight_expr}) * CAST(ABS({weight_expr}) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END > 0
ORDER BY priority, {id_col}
LIMIT {int(k)}
"""


def cap_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
    salt: str = "cap",
) -> DataFrame:
    """At most ``cap`` rows per group, chosen by a deterministic per-id
    hash draw — the web-pipeline "domain cap" (no single domain/source
    may dominate the mixture; C4 and FineWeb both cap per-host page
    counts). Output: the surviving rows with ``grp_rank`` (1-based
    position inside the group's hash order) attached.

    Plan: one window (rank over hash order) on the group key — a single
    group-keyed exchange; the draw is a pure (id, salt) function so any
    re-run, any partitioning, any engine elects the same survivors. A
    pathologically hot group costs one fat window partition: at 100 TB
    pre-aggregate per (group, id-hash-prefix) or use salted_group_agg's
    two-phase shape if one group holds a double-digit share of rows."""
    from pyspark.sql import Window

    if cap < 1:
        raise ValueError(f"need cap >= 1, got {cap}")
    w = Window.partitionBy(group_col).orderBy(
        hash_fraction(id_col, salt), F.col(id_col)
    )
    return (
        df.withColumn("grp_rank", F.row_number().over(w).cast("long"))
        .where(F.col("grp_rank") <= cap)
        .orderBy(group_col, "grp_rank")
    )


def cap_per_group_sql(
    table: str, group_col: str, id_col: str, cap: int, salt: str = "cap"
) -> str:
    if cap < 1:
        raise ValueError(f"need cap >= 1, got {cap}")
    u = hash_fraction_sql(id_col, salt)
    return f"""
SELECT * FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY {group_col} ORDER BY {u}, {id_col}
  ) AS BIGINT) AS grp_rank
  FROM {table}
)
WHERE grp_rank <= {int(cap)}
ORDER BY {group_col}, grp_rank
"""


def cap_accounting(
    df: DataFrame, group_col: str, id_col: str, cap: int, salt: str = "cap"
) -> DataFrame:
    """(group, n_rows, kept, dropped): what the cap would remove per
    group — the pre-flight report run before committing a cap value."""
    if cap < 1:
        raise ValueError(f"need cap >= 1, got {cap}")
    return (
        df.groupBy(F.col(group_col).alias("grp"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .select(
            "grp",
            "n_rows",
            F.least(F.col("n_rows"), F.lit(int(cap))).cast("long").alias("kept"),
            F.greatest(F.col("n_rows") - cap, F.lit(0)).cast("long").alias("dropped"),
        )
        .orderBy("grp")
    )


def cap_accounting_sql(
    table: str, group_col: str, id_col: str, cap: int, salt: str = "cap"
) -> str:
    if cap < 1:
        raise ValueError(f"need cap >= 1, got {cap}")
    return f"""
SELECT {group_col} AS grp, COUNT(*)::BIGINT AS n_rows,
       CAST(LEAST(COUNT(*), {int(cap)}) AS BIGINT) AS kept,
       CAST(GREATEST(COUNT(*) - {int(cap)}, 0) AS BIGINT) AS dropped
FROM {table} GROUP BY {group_col} ORDER BY grp
"""


# --- group-aware (leakage-free) splits --------------------------------------

_DEFAULT_FRACS = (("train", 0.8), ("val", 0.1), ("test", 0.1))


def _split_thresholds(fracs) -> list[tuple[str, float]]:
    """(name, cumulative-upper-bound) pairs with the EXACT float cums both
    dialects will compare against (the python float sum, repr-emitted, so
    0.8+0.1 -> 0.9000000000000001 identically in both plans)."""
    items = list(fracs.items()) if isinstance(fracs, dict) else list(fracs)
    if not items:
        raise ValueError("need at least one split")
    names = [n for n, _ in items]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate split names: {names}")
    if any(f <= 0 for _, f in items):
        raise ValueError(f"split fractions must be > 0: {items}")
    total = sum(f for _, f in items)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    out, cum = [], 0.0
    for name, f in items:
        cum += f
        out.append((name, cum))
    return out


def _split_col(group_col: str, fracs, salt: str) -> Column:
    """The split tag as a PURE scan expression of the group key — no
    join, no shuffle: any frame sharing the key computes the identical
    assignment independently (the leakage-free property is carried by
    the hash, not by a materialized assignment table)."""
    cums = _split_thresholds(fracs)
    u = hash_fraction(group_col, salt)
    # ascending when-chain: first matching threshold wins, mirroring the
    # SQL CASE branch order exactly
    expr = None
    for name, hi in cums[:-1]:
        cond = u < F.lit(hi)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    return (
        expr.otherwise(F.lit(cums[-1][0]))
        if expr is not None
        else F.lit(cums[-1][0])
    )


def _split_sql_case(group_col: str, fracs, salt: str) -> str:
    cums = _split_thresholds(fracs)
    u = hash_fraction_sql(group_col, salt)
    branches = "\n            ".join(
        f"WHEN {u} < {hi!r} THEN '{name}'" for name, hi in cums[:-1]
    )
    return f"CASE {branches}\n            ELSE '{cums[-1][0]}' END"


def group_split(
    df: DataFrame,
    group_col: str,
    fracs=None,
    salt: str = "gsplit",
) -> DataFrame:
    """Per-group split assignment: ``(grp, n_rows, split)`` ordered by
    group. Every row of a group lands in the SAME split (the leakage
    guard row-level splits cannot give: a user's history must not
    straddle train and eval), assigned by md5-hash bucket of the group
    key against the cumulative fraction thresholds.

    Scale shape: one aggregation on the group key; the tag itself is a
    scan expression (see ``_split_col``), so tagging the full fact table
    needs NO join against this frame."""
    fracs = fracs if fracs is not None else dict(_DEFAULT_FRACS)
    return (
        df.groupBy(F.col(group_col).alias("grp"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .select("grp", "n_rows", _split_col("grp", fracs, salt).alias("split"))
        .orderBy("grp")
    )


def group_split_sql(
    table: str, group_col: str, fracs=None, salt: str = "gsplit"
) -> str:
    fracs = fracs if fracs is not None else dict(_DEFAULT_FRACS)
    case = _split_sql_case("grp", fracs, salt)
    return f"""
SELECT grp, n_rows, {case} AS split
FROM (
  SELECT {group_col} AS grp, COUNT(*)::BIGINT AS n_rows
  FROM {table} GROUP BY {group_col}
)
ORDER BY grp
"""


def group_split_audit(
    df: DataFrame,
    group_col: str,
    fracs=None,
    salt: str = "gsplit",
) -> DataFrame:
    """The proof the split is leakage-free AND sized as requested:
    per-split ``(split, n_groups, n_rows, group_share, row_share,
    leaked_groups)`` ordered by split. ``leaked_groups`` (same value on
    every row, a 1-row broadcast) counts groups whose rows landed in
    more than one split — 0 by construction; the audit DEMONSTRATES it
    on the tagged output rather than assuming it, which is the entire
    job of an audit operator. ``group_share`` is measured against the
    requested fraction; hash-bucket noise shrinks as groups grow."""
    fracs = fracs if fracs is not None else dict(_DEFAULT_FRACS)
    tagged = df.select(
        F.col(group_col).alias("grp"),
        _split_col(group_col, fracs, salt).alias("split"),
    )
    per = tagged.groupBy("split").agg(
        F.count_distinct("grp").cast("long").alias("n_groups"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    tot = per.agg(
        F.sum("n_groups").cast("long").alias("__tg"),
        F.sum("n_rows").cast("long").alias("__tr"),
    )
    leaked = (
        tagged.groupBy("grp")
        .agg(F.count_distinct("split").alias("__ns"))
        .where(F.col("__ns") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("leaked_groups"))
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(leaked))
        .select(
            "split",
            "n_groups",
            "n_rows",
            (F.col("n_groups").cast("double") / F.col("__tg").cast("double")).alias(
                "group_share"
            ),
            (F.col("n_rows").cast("double") / F.col("__tr").cast("double")).alias(
                "row_share"
            ),
            "leaked_groups",
        )
        .orderBy("split")
    )


def group_split_audit_sql(
    table: str, group_col: str, fracs=None, salt: str = "gsplit"
) -> str:
    fracs = fracs if fracs is not None else dict(_DEFAULT_FRACS)
    case = _split_sql_case(group_col, fracs, salt)
    return f"""
WITH __t AS (
  SELECT {group_col} AS grp, {case} AS split FROM {table}
),
__p AS (
  SELECT split, COUNT(DISTINCT grp)::BIGINT AS n_groups,
         COUNT(*)::BIGINT AS n_rows
  FROM __t GROUP BY split
),
__tot AS (
  SELECT SUM(n_groups)::BIGINT AS tg, SUM(n_rows)::BIGINT AS tr FROM __p
),
__leak AS (
  SELECT COUNT(*)::BIGINT AS leaked_groups FROM (
    SELECT grp FROM __t GROUP BY grp HAVING COUNT(DISTINCT split) > 1
  )
)
SELECT p.split, p.n_groups, p.n_rows,
       CAST(p.n_groups AS DOUBLE) / CAST(t.tg AS DOUBLE) AS group_share,
       CAST(p.n_rows AS DOUBLE) / CAST(t.tr AS DOUBLE) AS row_share,
       l.leaked_groups
FROM __p p CROSS JOIN __tot t CROSS JOIN __leak l
ORDER BY p.split
"""


def time_split_audit(
    df: DataFrame,
    user_col: str = "user_id",
    ts_us: Column | None = None,
    train_permille: int = 800,
    embargo_us: int = 3_600_000_000,
) -> DataFrame:
    """Temporal train/test split with an embargo gap, plus the leakage
    accounting: ``(bucket, n_rows, n_users, users_also_in_train)``.

    The time-series counterpart of ``group_split``: random splits leak
    future information into training whenever rows are autocorrelated in
    time, so the evaluation-honest split is BY TIME — train strictly
    before a boundary, test strictly after boundary+embargo, and the
    embargo band dropped so that trailing windows computed on train rows
    (sessions, rolling stats, label horizons) cannot straddle the
    boundary (the "purging/embargo" discipline of de Prado 2018, ch. 7).

    The boundary is ``min + (max-min) * train_permille / 1000`` in pure
    int64 µs arithmetic (identical across engines — no float, no
    calendar).  ``users_also_in_train`` on the test row counts users
    appearing on BOTH sides: not an error (user-level overlap is
    expected in a time split), but the number an experimenter must know
    — those users' test rows are in-distribution, the rest measure
    cold-start generalization.  For train/embargo rows it is NULL.

    Plan: the min/max boundary rides a 1-row broadcast; ONE shuffle on
    the user key collapses per-user bucket counts; the report is a
    constant-width aggregation over the user frame.  Nothing row-sized
    crosses the driver at any scale.
    """
    t = (ts_us if ts_us is not None else F.expr("ts_ns div 1000")).cast(
        "long"
    )
    base = df.select(F.col(user_col).alias("__u"), t.alias("__us"))
    bounds = base.agg(
        F.min("__us").alias("__lo"), F.max("__us").alias("__hi")
    )
    # `div` keeps the boundary arithmetic in int64 (a `/` here would be
    # an IEEE division whose truncation can disagree with integer floor
    # near representation boundaries — the 2^53 class)
    tagged = base.crossJoin(F.broadcast(bounds)).select(
        "__u",
        "__us",
        F.expr(
            f"CAST(__lo + ((__hi - __lo) * {int(train_permille)}) div 1000 "
            "AS BIGINT)"
        ).alias("__split"),
    )
    per_user = tagged.groupBy("__u").agg(
        F.sum((F.col("__us") < F.col("__split")).cast("long"))
        .cast("long")
        .alias("__tr"),
        F.sum(
            (
                (F.col("__us") >= F.col("__split"))
                & (F.col("__us") < F.col("__split") + F.lit(int(embargo_us)))
            ).cast("long")
        )
        .cast("long")
        .alias("__em"),
        F.sum(
            (F.col("__us") >= F.col("__split") + F.lit(int(embargo_us))).cast(
                "long"
            )
        )
        .cast("long")
        .alias("__te"),
    )
    rep = per_user.agg(
        F.sum("__tr").cast("long").alias("r_train"),
        F.sum("__em").cast("long").alias("r_embargo"),
        F.sum("__te").cast("long").alias("r_test"),
        F.sum((F.col("__tr") > 0).cast("long")).cast("long").alias("u_train"),
        F.sum((F.col("__em") > 0).cast("long")).cast("long").alias("u_embargo"),
        F.sum((F.col("__te") > 0).cast("long")).cast("long").alias("u_test"),
        F.sum(((F.col("__tr") > 0) & (F.col("__te") > 0)).cast("long"))
        .cast("long")
        .alias("u_both"),
    )
    return rep.select(
        F.expr(
            "stack(3, 'embargo', r_embargo, u_embargo, CAST(NULL AS BIGINT), "
            "'test', r_test, u_test, u_both, "
            "'train', r_train, u_train, CAST(NULL AS BIGINT)) "
            "AS (bucket, n_rows, n_users, users_also_in_train)"
        )
    ).orderBy("bucket")


def time_split_audit_sql(
    table: str,
    user_col: str = "user_id",
    ts_us_sql: str = "epoch_us(ts)",
    train_permille: int = 800,
    embargo_us: int = 3_600_000_000,
) -> str:
    return f"""
WITH __b AS (
  SELECT {user_col} AS u, CAST({ts_us_sql} AS BIGINT) AS us FROM {table}
),
__bounds AS (
  SELECT MIN(us) AS lo, MAX(us) AS hi FROM __b
),
__tag AS (
  SELECT b.u, b.us,
         CAST(x.lo + ((x.hi - x.lo) * {int(train_permille)}) // 1000
              AS BIGINT) AS split
  FROM __b b CROSS JOIN __bounds x
),
__pu AS (
  SELECT u,
         CAST(SUM(CASE WHEN us < split THEN 1 ELSE 0 END) AS BIGINT) AS tr,
         CAST(SUM(CASE WHEN us >= split
                        AND us < split + {int(embargo_us)}
                   THEN 1 ELSE 0 END) AS BIGINT) AS em,
         CAST(SUM(CASE WHEN us >= split + {int(embargo_us)}
                   THEN 1 ELSE 0 END) AS BIGINT) AS te
  FROM __tag GROUP BY u
),
__rep AS (
  SELECT CAST(SUM(tr) AS BIGINT) AS r_train,
         CAST(SUM(em) AS BIGINT) AS r_embargo,
         CAST(SUM(te) AS BIGINT) AS r_test,
         CAST(SUM(CASE WHEN tr > 0 THEN 1 ELSE 0 END) AS BIGINT) AS u_train,
         CAST(SUM(CASE WHEN em > 0 THEN 1 ELSE 0 END) AS BIGINT) AS u_embargo,
         CAST(SUM(CASE WHEN te > 0 THEN 1 ELSE 0 END) AS BIGINT) AS u_test,
         CAST(SUM(CASE WHEN tr > 0 AND te > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS u_both
  FROM __pu
)
SELECT 'embargo' AS bucket, r_embargo AS n_rows, u_embargo AS n_users,
       CAST(NULL AS BIGINT) AS users_also_in_train FROM __rep
UNION ALL
SELECT 'test', r_test, u_test, u_both FROM __rep
UNION ALL
SELECT 'train', r_train, u_train, CAST(NULL AS BIGINT) FROM __rep
ORDER BY bucket
"""


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    total_n: int = 1000,
    round_to: int = 9,
) -> DataFrame:
    """(stratum, pop_n, sd, quota, alloc_n): optimal sample allocation
    across strata for a fixed budget (Neyman JRSS 1934): stratum h gets
    ``n · N_h·S_h / Σ N_h·S_h`` — more samples where the stratum is
    BIG or NOISY, the design that minimizes the variance of the
    stratified mean.  The survey-sampling complement to
    ``stratified_split`` (which allocates by share, not by variance).

    Fractional quotas are resolved to integers by LARGEST REMAINDER
    (Hamilton): floor every quota, then hand the leftover units to the
    largest remainders (ties broken by stratum name — a total order, so
    the integer allocation is engine-exact).  Strata with zero variance
    still receive their floor(quota) — a constant stratum needs ≥1
    probe only if its quota says so; callers wanting minimums clamp
    downstream.  alloc_n sums to exactly ``total_n`` whenever
    Σ N_h·S_h > 0.

    Engine parity: per-stratum moments follow the welch_t conventions
    ((18,6) entry quantize, exact decimal sums, _d2d hops); S_h is one
    sqrt of those (clamped at 0), quotas one shared IEEE expression,
    and the remainder ranking a window over the strata frame
    (stratum-count-sized).  One scan, no fact-table joins."""
    from bullet_storm_spark.operators.stats_tests import _MOMENT, _d2d, _div, _q6

    x = _q6(F.col(value_col).cast("double"))
    per = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(x).cast("long").alias("pop_n"),
        F.sum(x.cast(_MOMENT)).cast(_MOMENT).alias("__s"),
        F.sum((x * x).cast(_MOMENT)).cast(_MOMENT).alias("__q"),
    )
    n_d = F.col("pop_n").cast("double")
    s_d = _d2d(F.col("__s"))
    q_d = _d2d(F.col("__q"))
    var = _div(q_d - _div(s_d * s_d, n_d), n_d - F.lit(1.0))
    sd = F.when(
        F.col("pop_n") >= 2, F.sqrt(F.greatest(var, F.lit(0.0)))
    ).otherwise(F.lit(0.0))
    # the weight sum must be ORDER-INDEPENDENT (strata arrive in
    # engine-specific order): quantize each N_h·S_h through the _q6
    # text hop and sum in exact decimal; the quota keeps ONE shared
    # association, total · (w / W), in both dialects (review-caught:
    # (total·w)/W vs total·(w/W) differ in the last ulp and flip
    # largest-remainder ranks)
    strata = per.select(
        "stratum", "pop_n", F.round(sd, 9).alias("sd")
    ).withColumn(
        "__w", _q6(F.col("pop_n").cast("double") * F.col("sd")).cast(_MOMENT)
    )
    tot = strata.agg(F.sum("__w").cast(_MOMENT).alias("__wsum"))
    quoted = strata.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "pop_n",
        "sd",
        (
            F.lit(float(total_n))
            * F.try_divide(_d2d(F.col("__w")), _d2d(F.col("__wsum")))
        ).alias("__quota"),
    )
    w = Window.orderBy(
        F.desc(F.col("__quota") - F.floor(F.col("__quota"))), F.col("stratum")
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = quoted.select(
        "stratum",
        "pop_n",
        "sd",
        F.round(F.coalesce(F.col("__quota"), F.lit(0.0)), round_to)
        .alias("quota"),
        F.floor(F.coalesce(F.col("__quota"), F.lit(0.0)))
        .cast("long")
        .alias("__fl"),
        F.row_number().over(w).cast("long").alias("__rk"),
    ).withColumn(
        "__left",
        (F.lit(int(total_n)) - F.sum("__fl").over(wall)).cast("long"),
    )
    return ranked.select(
        "stratum",
        "pop_n",
        "sd",
        "quota",
        (
            F.col("__fl")
            + (F.col("__rk") <= F.col("__left")).cast("long")
        ).cast("long").alias("alloc_n"),
    ).orderBy("stratum")


def neyman_allocation_sql(
    table: str,
    stratum_sql: str,
    value_sql: str,
    total_n: int = 1000,
    round_to: int = 9,
) -> str:
    from bullet_storm_spark.operators.stats_tests import _d2d_sql, _q6_sql

    x = _q6_sql(f"CAST({value_sql} AS DOUBLE)")
    xw = f"CAST({x} AS DECIMAL(19,6))"
    s = _d2d_sql("s")
    q = _d2d_sql("q")
    var = (
        f"(({q} - {s} * {s} / CAST(pop_n AS DOUBLE))"
        f" / (CAST(pop_n AS DOUBLE) - 1.0))"
    )
    return f"""
WITH __m AS (
  SELECT {stratum_sql} AS stratum,
         COUNT({x})::BIGINT AS pop_n,
         CAST(SUM(CAST({x} AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS s,
         CAST(SUM({xw} * {xw}) AS DECIMAL(38,12)) AS q
  FROM {table} GROUP BY stratum
),
__sd AS (
  SELECT stratum, pop_n,
         CAST(CAST(CAST(CAST((CASE WHEN pop_n >= 2
                    THEN sqrt(GREATEST({var}, 0.0)) ELSE 0.0 END) * CAST(ABS(CASE WHEN pop_n >= 2
                    THEN sqrt(GREATEST({var}, 0.0)) ELSE 0.0 END) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) AS sd
  FROM __m
),
__w AS (
  SELECT *, CAST({_q6_sql("CAST(pop_n AS DOUBLE) * sd")} AS DECIMAL(38,12))
            AS w
  FROM __sd
),
__q AS (
  SELECT stratum, pop_n, sd,
         CAST({int(total_n)} AS DOUBLE)
           * ({_d2d_sql("w")}
              / NULLIF({_d2d_sql("CAST(SUM(w) OVER () AS DECIMAL(38,12))")},
                       0.0)) AS quota
  FROM __w
),
__r AS (
  SELECT stratum, pop_n, sd,
         CASE WHEN ABS(COALESCE(quota, 0.0)) >= 1e16 THEN CAST((COALESCE(quota, 0.0)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((COALESCE(quota, 0.0)) * CAST(ABS(COALESCE(quota, 0.0)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS quota,
         CAST(FLOOR(COALESCE(quota, 0.0)) AS BIGINT) AS fl,
         CAST(ROW_NUMBER() OVER (
            ORDER BY COALESCE(quota, 0.0) - FLOOR(COALESCE(quota, 0.0)) DESC,
                     stratum) AS BIGINT) AS rk,
         CAST({int(total_n)} - SUM(CAST(FLOOR(COALESCE(quota, 0.0))
              AS BIGINT)) OVER () AS BIGINT) AS lft
  FROM __q
)
SELECT stratum, pop_n, sd, quota,
       CAST(fl + CASE WHEN rk <= lft THEN 1 ELSE 0 END AS BIGINT) AS alloc_n
FROM __r ORDER BY stratum
"""


def class_balance(
    df: DataFrame,
    class_col: Column,
    id_col: str,
    salt: str = "balance",
) -> DataFrame:
    """Deterministic class-balanced downsample: every class keeps
    exactly the MINORITY class's row count, selected by md5 rank —
    ``(class, id)`` ordered by (class, id). The classifier-training
    prep for skewed label columns (a 95/5 mix trains a majority-class
    predictor); hash ranking makes the kept set reproducible across
    runs, engines and cluster layouts (the hash_fraction contract —
    no RNG, no sort instability).

    Per class, rows rank by (md5-uniform, id) — the id tiebreak makes
    the boundary exact — and ranks ≤ min-class-count survive. The
    min count rides a 1-row broadcast. One class-keyed rank window
    (the stratified-split shuffle), no other exchange."""
    base = df.select(
        class_col.alias("class"), F.col(id_col).alias("id")
    ).where(class_col.isNotNull())
    mins = base.groupBy("class").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    ).agg(F.min("__n").cast("long").alias("__keep"))
    w = Window.partitionBy("class").orderBy(
        hash_fraction("id", salt).asc(), F.col("id").asc()
    )
    ranked = base.withColumn("__rk", F.row_number().over(w))
    return (
        ranked.crossJoin(F.broadcast(mins))
        .where(F.col("__rk") <= F.col("__keep"))
        .select("class", "id")
        .orderBy("class", "id")
    )


def class_balance_sql(
    table: str, class_sql: str, id_col: str, salt: str = "balance"
) -> str:
    frac = hash_fraction_sql("id", salt)
    return f"""
WITH __b AS (
  SELECT ({class_sql}) AS class, {id_col} AS id FROM {table}
  WHERE ({class_sql}) IS NOT NULL
),
__keep AS (
  SELECT CAST(MIN(n) AS BIGINT) AS keep
  FROM (SELECT class, COUNT(*)::BIGINT AS n FROM __b GROUP BY class)
),
__r AS (
  SELECT class, id,
         ROW_NUMBER() OVER (PARTITION BY class
                            ORDER BY {frac} ASC, id ASC) AS rk
  FROM __b
)
SELECT class, id FROM __r, __keep
WHERE rk <= keep ORDER BY class, id
"""


def token_waterfill(
    df: DataFrame,
    stratum_col: str,
    text_col: str,
    budget_tokens: int,
    max_epochs: float = 4.0,
    round_to: int = 6,
) -> DataFrame:
    """Automatic token-budget allocation across sources by WATERFILLING:
    spread ``budget_tokens`` as evenly as possible across sources,
    capping each at ``max_epochs`` passes over its available tokens —
    the "no target proportions given" complement to :func:`mix_plan`
    (which checks a GIVEN mixture). Waterfilling is the max-min-fair
    allocation: every uncapped source gets the same waterline θ, every
    capped source gets its cap, with θ solving Σ min(capₛ, θ) = B.

    Output per source, ordered by stratum: ``(stratum, n_docs,
    avail_tokens, cap_tokens, capped, allocated, epochs_used,
    budget_share, unallocated_tokens)``. ``unallocated_tokens`` (same on
    every row) is max(B − Σ caps, 0) — nonzero means the corpus cannot
    absorb the budget under the epoch cap and the budget itself must
    shrink or the cap rise.

    Engine parity: the waterline is found with EXACT integer arithmetic
    — source r (caps ascending, stratum tie-break) is capped iff
    ``cap_r·(m−r+1) + Σ_{i<r} cap_i <= B`` (DECIMAL(38,0) products; no
    float enters the decision), then θ = (B − Σ capped) / n_uncapped is
    the single IEEE division both engines perform on identical integers.
    Scale posture: one corpus hash aggregation; everything after runs on
    the source-sized frame (bounded dimension — the support-sized window
    convention)."""
    if budget_tokens < 0:
        raise ValueError(f"need budget_tokens >= 0, got {budget_tokens}")
    if max_epochs <= 0:
        raise ValueError(f"need max_epochs > 0, got {max_epochs}")
    from bullet_storm_spark.functions.text import token_count
    from bullet_storm_spark.operators.stats_tests import _d2d, _div

    d = "decimal(38,0)"
    per = (
        df.select(
            F.col(stratum_col).alias("stratum"),
            token_count(text_col).cast("long").alias("__t"),
        )
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("__t").cast(d)).cast(d).alias("__avail"),
        )
        .select(
            "stratum",
            "n_docs",
            F.col("__avail").cast("long").alias("avail_tokens"),
            # cap = floor(avail * E): one double product on exact ints,
            # floored — the same IEEE op in both engines
            F.floor(
                F.col("__avail").cast("double") * F.lit(float(max_epochs))
            ).cast("long").alias("cap_tokens"),
        )
    )
    w_rank = Window.orderBy(F.asc("cap_tokens"), F.asc("stratum"))
    w_prev = w_rank.rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy()
    ranked = per.select(
        "*",
        F.row_number().over(w_rank).cast("long").alias("__r"),
        F.coalesce(
            F.sum(F.col("cap_tokens").cast(d)).over(w_prev), F.lit(0).cast(d)
        ).cast(d).alias("__cum_before"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("__m"),
    )
    b_lit = F.lit(int(budget_tokens)).cast(d)
    capped = (
        F.col("cap_tokens").cast(d) * (F.col("__m") - F.col("__r") + 1).cast(d)
        + F.col("__cum_before")
    ) <= b_lit
    tagged = ranked.select("*", capped.alias("capped"))
    totals = tagged.agg(
        F.sum(F.when(F.col("capped"), F.col("cap_tokens").cast(d)).otherwise(F.lit(0).cast(d)))
        .cast(d).alias("__capped_mass"),
        F.sum(F.when(~F.col("capped"), 1).otherwise(0)).cast("long").alias("__n_un"),
        F.sum(F.col("cap_tokens").cast(d)).cast(d).alias("__cap_total"),
    )
    j = tagged.crossJoin(F.broadcast(totals))
    theta = _div(
        _d2d(b_lit - F.col("__capped_mass")),
        F.col("__n_un").cast("double"),
    )
    alloc = F.when(F.col("capped"), F.col("cap_tokens").cast("double")).otherwise(theta)
    unalloc = F.greatest(
        _d2d(b_lit - F.col("__cap_total")), F.lit(0.0)
    ).cast("long")
    return j.select(
        "stratum",
        "n_docs",
        "avail_tokens",
        "cap_tokens",
        "capped",
        F.round(alloc, round_to).alias("allocated"),
        F.round(
            _div(alloc, F.col("avail_tokens").cast("double")), round_to
        ).alias("epochs_used"),
        F.round(
            _div(alloc, F.lit(float(budget_tokens))), round_to
        ).alias("budget_share"),
        unalloc.alias("unallocated_tokens"),
    ).orderBy("stratum")


def token_waterfill_sql(
    table: str,
    stratum_col: str,
    text_col: str,
    budget_tokens: int,
    max_epochs: float = 4.0,
    round_to: int = 6,
) -> str:
    if budget_tokens < 0:
        raise ValueError(f"need budget_tokens >= 0, got {budget_tokens}")
    if max_epochs <= 0:
        raise ValueError(f"need max_epochs > 0, got {max_epochs}")
    from bullet_storm_spark.functions.text import token_count_sql
    from bullet_storm_spark.operators.stats_tests import _d2d_sql

    def qround(e: str) -> str:
        return (
            f"CAST(CAST(CAST(CAST(({e}) * CAST(ABS({e}) >= POWER(10.0, "
            f"-({round_to}+1)) AS INT) AS VARCHAR) AS "
            f"DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE)"
        )

    d = "DECIMAL(38,0)"
    b = f"CAST({int(budget_tokens)} AS {d})"
    theta = (
        f"{_d2d_sql(f'{b} - t.capped_mass')} / NULLIF(CAST(t.n_un AS DOUBLE), 0.0)"
    )
    alloc = f"CASE WHEN r.capped THEN CAST(r.cap_tokens AS DOUBLE) ELSE {theta} END"
    return f"""
WITH __per AS (
  SELECT {stratum_col} AS stratum,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CAST({token_count_sql(text_col)}::BIGINT AS {d})) AS {d})
           AS avail
  FROM {table} GROUP BY stratum
),
__caps AS (
  SELECT stratum, n_docs,
         CAST(avail AS BIGINT) AS avail_tokens,
         CAST(FLOOR({_d2d_sql('avail')} * {float(max_epochs)!r}) AS BIGINT)
           AS cap_tokens
  FROM __per
),
__ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY cap_tokens ASC, stratum ASC)::BIGINT AS r,
         COALESCE(CAST(SUM(CAST(cap_tokens AS {d})) OVER (
             ORDER BY cap_tokens ASC, stratum ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS {d}),
           CAST(0 AS {d})) AS cum_before,
         COUNT(*) OVER ()::BIGINT AS m
  FROM __caps
),
__tag AS (
  SELECT *,
         (CAST(cap_tokens AS {d}) * CAST(m - r + 1 AS {d}) + cum_before) <= {b}
           AS capped
  FROM __ranked
),
__tot AS (
  SELECT CAST(SUM(CASE WHEN capped THEN CAST(cap_tokens AS {d})
                       ELSE CAST(0 AS {d}) END) AS {d}) AS capped_mass,
         SUM(CASE WHEN capped THEN 0 ELSE 1 END)::BIGINT AS n_un,
         CAST(SUM(CAST(cap_tokens AS {d})) AS {d}) AS cap_total
  FROM __tag
)
SELECT r.stratum, r.n_docs, r.avail_tokens, r.cap_tokens, r.capped,
       {qround(alloc)} AS allocated,
       {qround(f"({alloc}) / NULLIF(CAST(r.avail_tokens AS DOUBLE), 0.0)")}
         AS epochs_used,
       {qround(f"({alloc}) / NULLIF({float(budget_tokens)!r}, 0.0)")}
         AS budget_share,
       CAST(GREATEST({_d2d_sql(f'{b} - t.cap_total')}, 0.0) AS BIGINT)
         AS unallocated_tokens
FROM __tag r, __tot t
ORDER BY r.stratum
"""
