"""Batch behavioral analytics: sessionization, funnels, retention cohorts.

The reference engine answers "what is happening right now" (live windowed
queries); its users pair it with a batch stack for the behavioral questions
over the SAME event stream — where sessions start and end, how users move
through a staged funnel, whether cohorts come back. These are the three
canonical event-analytics shapes, and all three are pure window/groupBy
plans over the user key:

* ``sessionize``: gaps-and-islands over (user, time) — the batch twin of
  ``streaming/native.sessionize`` (applyInPandasWithState), same session
  semantics, but expressed as two windows + one groupBy so it is exactly
  oracle-checkable and runs as one shuffle on the user id;
* ``funnel``: ordered-stage conversion via iterated conditional-min
  aggregations — stage k's timestamp is the earliest qualifying event
  AFTER stage k-1's, within a horizon of stage 1; per-stage shuffles are
  user-keyed and reuse the same partitioning;
* ``retention_cohorts``: first-seen day × activity-day offset counts — two
  user-keyed aggregations and a broadcast cohort-size join.

Time is handled in MICROSECONDS (``ts_ns div 1000`` on the Spark side,
``epoch_us(ts)`` in DuckDB) — the resolution the two engines share for the
nanos-parquet events table (sources/tables.py); value sums accumulate
6-dp-rounded terms in DECIMAL(38,6) so results are partitioning-independent.
Nothing here is ever corpus-quadratic: every shuffle is keyed by user id or
(cohort, offset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_US_PER_DAY = 86_400_000_000


def _ts_us() -> F.Column:
    # `div` truncates toward zero: identical to DuckDB's epoch_us for the
    # positive-epoch data these operators target (pre-1970 timestamps are
    # out of scope, as documented for sources/tables.py)
    return F.expr("ts_ns div 1000")


def sessionize(
    df: DataFrame, gap_minutes: int = 30, round_to: int = 6
) -> DataFrame:
    """(user_id, session_idx, n_events, start_us, end_us, duration_us,
    total_value): per-user sessions split where consecutive events are
    more than ``gap_minutes`` apart. ``session_idx`` is 1-based in time
    order; ``total_value`` is the decimal-exact sum of 6dp-rounded event
    values."""
    gap_us = int(gap_minutes) * 60_000_000
    w = Window.partitionBy("user_id").orderBy("__us", "event_id")
    marked = (
        df.select("user_id", "event_id", "value", _ts_us().alias("__us"))
        .withColumn("__prev", F.lag("__us").over(w))
        .withColumn(
            "__new",
            F.when(
                F.col("__prev").isNull() | (F.col("__us") - F.col("__prev") > gap_us),
                1,
            ).otherwise(0),
        )
        .withColumn("session_idx", F.sum("__new").over(w))
    )
    return (
        marked.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("__us").alias("start_us"),
            F.max("__us").alias("end_us"),
            (F.max("__us") - F.min("__us")).alias("duration_us"),
            F.round(
                F.sum(F.round(F.col("value"), 6).cast("decimal(38,6)")).cast(
                    "double"
                ),
                round_to,
            ).alias("total_value"),
        )
        .orderBy("user_id", "session_idx")
    )


def sessionize_sql(table: str, gap_minutes: int = 30, round_to: int = 6) -> str:
    from bullet_storm_spark.operators.stats_tests import _qround_sql

    gap_us = int(gap_minutes) * 60_000_000
    # twin of F.round(F.sum(F.round(value, 6).cast(decimal(38,6)))
    # .cast(double), round_to): per-value exact 6dp round, decimal-exact
    # sum, one exact final round
    total_value = _qround_sql(
        f"CAST(SUM(CAST({_qround_sql('value', 6)} AS DECIMAL(38,6))) AS DOUBLE)",
        round_to,
    )
    return f"""
WITH __e AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS us FROM {table}
),
__marked AS (
  SELECT user_id, event_id, value, us,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS is_new
  FROM __e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
__sess AS (
  SELECT user_id, value, us,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id)
              AS BIGINT) AS session_idx
  FROM __marked
)
SELECT user_id, session_idx, COUNT(*)::BIGINT AS n_events,
       MIN(us) AS start_us, MAX(us) AS end_us,
       MAX(us) - MIN(us) AS duration_us,
       {total_value} AS total_value
FROM __sess GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""


def funnel(
    df: DataFrame,
    stages: list[str],
    horizon_hours: int = 72,
    round_to: int = 6,
) -> DataFrame:
    """(stage_idx, stage, n_users, conversion): ordered-funnel counts —
    a user converts through stage k if their earliest stage-k event is
    strictly AFTER their stage-(k-1) conversion time and within
    ``horizon_hours`` of their stage-1 time. ``conversion`` is
    n_users(stage k) / n_users(stage 1), rounded.

    Plan: one conditional-min aggregation per stage, each keyed by
    user_id (the same partitioning reused k times), then a k-row union.
    The per-stage frames carry one timestamp per user — never raw
    events past stage 1."""
    if len(stages) < 2:
        raise ValueError(f"need >= 2 funnel stages, got {stages}")
    horizon_us = int(horizon_hours) * 3_600_000_000
    ev = df.select("user_id", "event_type", _ts_us().alias("__us"))
    # stage 1: earliest occurrence per user
    cur = (
        ev.where(F.col("event_type") == stages[0])
        .groupBy("user_id")
        .agg(F.min("__us").alias("__t1"))
        .withColumn("__tprev", F.col("__t1"))
    )
    tagged = [
        cur.select(
            F.lit(1).alias("stage_idx"), F.lit(stages[0]).alias("stage"), "user_id"
        )
    ]
    for i, stage in enumerate(stages[1:], start=2):
        cur = (
            ev.where(F.col("event_type") == stage)
            .join(cur.select("user_id", "__t1", "__tprev"), "user_id")
            .where(
                (F.col("__us") > F.col("__tprev"))
                & (F.col("__us") <= F.col("__t1") + horizon_us)
            )
            .groupBy("user_id")
            .agg(
                F.first("__t1").alias("__t1"),
                F.min("__us").alias("__tprev"),
            )
        )
        tagged.append(
            cur.select(
                F.lit(i).alias("stage_idx"), F.lit(stage).alias("stage"), "user_id"
            )
        )
    # one lazy union -> one job; each branch recomputes its prefix chain
    # (k small; at scale persist the filtered event frame once first)
    allstages = tagged[0]
    for t in tagged[1:]:
        allstages = allstages.unionByName(t)
    per_stage = allstages.groupBy("stage_idx", "stage").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    base = per_stage.where(F.col("stage_idx") == 1).select(
        F.col("n_users").alias("__base")
    )
    return (
        per_stage.crossJoin(F.broadcast(base))
        .select(
            "stage_idx",
            "stage",
            "n_users",
            F.round(F.col("n_users") / F.col("__base"), round_to).alias("conversion"),
        )
        .orderBy("stage_idx")
    )


def funnel_sql(
    table: str,
    stages: list[str],
    horizon_hours: int = 72,
    round_to: int = 6,
) -> str:
    if len(stages) < 2:
        raise ValueError(f"need >= 2 funnel stages, got {stages}")
    horizon_us = int(horizon_hours) * 3_600_000_000
    ctes = [
        f"""__s1 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t1, MIN(epoch_us(ts)) AS tprev
  FROM {table} WHERE event_type = '{stages[0]}' GROUP BY user_id
)"""
    ]
    for i, stage in enumerate(stages[1:], start=2):
        ctes.append(
            f"""__s{i} AS (
  SELECT e.user_id, MIN(p.t1) AS t1, MIN(epoch_us(e.ts)) AS tprev
  FROM {table} e JOIN __s{i - 1} p ON e.user_id = p.user_id
  WHERE e.event_type = '{stage}'
    AND epoch_us(e.ts) > p.tprev
    AND epoch_us(e.ts) <= p.t1 + {horizon_us}
  GROUP BY e.user_id
)"""
        )
    selects = [
        f"SELECT {i} AS stage_idx, '{stage}' AS stage, "
        f"(SELECT COUNT(*) FROM __s{i})::BIGINT AS n_users"
        for i, stage in enumerate(stages, start=1)
    ]
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH {', '.join(ctes)},
__stages AS ({union})
SELECT stage_idx, stage, n_users,
       CASE WHEN ABS(n_users / (SELECT n_users FROM __stages WHERE stage_idx = 1)) >= 1e16 THEN CAST((n_users / (SELECT n_users FROM __stages WHERE stage_idx = 1)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((n_users / (SELECT n_users FROM __stages WHERE stage_idx = 1)) * CAST(ABS(n_users / (SELECT n_users FROM __stages WHERE stage_idx = 1)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS conversion
FROM __stages
WHERE n_users > 0  -- stages nobody reaches are omitted (Spark groupBy shape)
ORDER BY stage_idx
"""


def retention_cohorts(df: DataFrame, round_to: int = 6) -> DataFrame:
    """(cohort_day, day_offset, n_active, cohort_size, retention): users
    grouped by first-seen epoch-day; for each later activity day, how many
    of the cohort were active. Day arithmetic is integer epoch-days (the
    engines' shared resolution); ``retention`` = n_active / cohort_size
    rounded."""
    ev = df.select("user_id", F.expr(f"(ts_ns div 1000) div {_US_PER_DAY}").alias("__day"))
    first = ev.groupBy("user_id").agg(F.min("__day").alias("cohort_day"))
    sizes = first.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    active = (
        ev.distinct()
        .join(first, "user_id")
        .groupBy("cohort_day", (F.col("__day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    return (
        active.join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), round_to).alias(
                "retention"
            ),
        )
        .orderBy("cohort_day", "day_offset")
    )


def retention_cohorts_sql(table: str, round_to: int = 6) -> str:
    return f"""
WITH __e AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_US_PER_DAY} AS day FROM {table}
),
__first AS (
  SELECT user_id, MIN(day) AS cohort_day FROM __e GROUP BY user_id
),
__sizes AS (
  SELECT cohort_day, COUNT(*)::BIGINT AS cohort_size
  FROM __first GROUP BY cohort_day
),
__active AS (
  SELECT f.cohort_day, e.day - f.cohort_day AS day_offset,
         COUNT(*)::BIGINT AS n_active
  FROM __e e JOIN __first f ON e.user_id = f.user_id
  GROUP BY f.cohort_day, e.day - f.cohort_day
)
SELECT a.cohort_day, a.day_offset, a.n_active, s.cohort_size,
       CASE WHEN ABS(a.n_active / s.cohort_size) >= 1e16 THEN CAST((a.n_active / s.cohort_size) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((a.n_active / s.cohort_size) * CAST(ABS(a.n_active / s.cohort_size) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS retention
FROM __active a JOIN __sizes s ON a.cohort_day = s.cohort_day
ORDER BY a.cohort_day, a.day_offset
"""


def session_assignment(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(event_id, user_id, session_idx, event_in_session): every event
    tagged with its session (same gaps-and-islands split as sessionize)
    and its 1-based position within it — the per-event session-feature
    join table a training pipeline attaches to raw events. Same single
    user-keyed shuffle; the windows reuse one partitioning."""
    gap_us = int(gap_minutes) * 60_000_000
    w = Window.partitionBy("user_id").orderBy("__us", "event_id")
    marked = (
        df.select("user_id", "event_id", _ts_us().alias("__us"))
        .withColumn("__prev", F.lag("__us").over(w))
        .withColumn(
            "__new",
            F.when(
                F.col("__prev").isNull() | (F.col("__us") - F.col("__prev") > gap_us),
                1,
            ).otherwise(0),
        )
        .withColumn("session_idx", F.sum("__new").over(w))
    )
    w_sess = Window.partitionBy("user_id", "session_idx").orderBy(
        "__us", "event_id"
    )
    return (
        marked.withColumn(
            "event_in_session", F.row_number().over(w_sess).cast("long")
        )
        .select("event_id", "user_id", "session_idx", "event_in_session")
        .orderBy("event_id")
    )


def session_assignment_sql(table: str, gap_minutes: int = 30) -> str:
    gap_us = int(gap_minutes) * 60_000_000
    return f"""
WITH __e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM {table}
),
__marked AS (
  SELECT user_id, event_id, us,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS is_new
  FROM __e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
__sess AS (
  SELECT user_id, event_id, us,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id)
              AS BIGINT) AS session_idx
  FROM __marked
)
SELECT event_id, user_id, session_idx,
       row_number() OVER (PARTITION BY user_id, session_idx
                          ORDER BY us, event_id)::BIGINT AS event_in_session
FROM __sess ORDER BY event_id
"""


def transition_matrix(df: DataFrame, round_to: int = 6) -> DataFrame:
    """(from_type, to_type, cnt, prob): per-user consecutive event-type
    transition counts over the whole stream, with row-normalized
    probabilities — the first-order Markov behavior model (next-action
    prediction features, bot detection via improbable chains).
    ``prob`` = cnt / sum over the from_type row, rounded.

    Plan: one user-keyed lag window over (type) pairs, one (from, to)
    aggregation, one broadcast row-total join — the transition table is
    |types|² rows regardless of stream size."""
    w = Window.partitionBy("user_id").orderBy("__us", "event_id")
    pairs = (
        df.select("user_id", "event_id", "event_type", _ts_us().alias("__us"))
        .withColumn("__next", F.lead("event_type").over(w))
        .where(F.col("__next").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("__next").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("cnt").alias("__total"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "cnt",
            F.round(F.col("cnt") / F.col("__total"), round_to).alias("prob"),
        )
        .orderBy("from_type", "to_type")
    )


def transition_matrix_sql(table: str, round_to: int = 6) -> str:
    return f"""
WITH __e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM {table}
),
__pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) AS to_type
  FROM __e
),
__counts AS (
  SELECT from_type, to_type, COUNT(*)::BIGINT AS cnt
  FROM __pairs WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
),
__totals AS (
  SELECT from_type, SUM(cnt) AS total FROM __counts GROUP BY from_type
)
SELECT c.from_type, c.to_type, c.cnt,
       CASE WHEN ABS(c.cnt / t.total) >= 1e16 THEN CAST((c.cnt / t.total) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((c.cnt / t.total) * CAST(ABS(c.cnt / t.total) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS prob
FROM __counts c JOIN __totals t ON c.from_type = t.from_type
ORDER BY c.from_type, c.to_type
"""


def attribution(
    df: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    lookback_hours: int = 72,
) -> DataFrame:
    """(conv_event_id, user_id, conv_us, first_touch, last_touch,
    n_touches): marketing-style attribution — for every conversion event,
    the first- and last-touch channel among the user's qualifying touch
    events in the ``lookback_hours`` window strictly before the
    conversion, plus the touch count. Unattributed conversions keep NULL
    touches (the organic bucket).

    Plan: one user-keyed equi-join between the conversion and touch
    slices with the lookback as a join-time range predicate (pair volume
    is bounded by per-user activity within the window, never corpus-
    quadratic), then two row_number windows keyed by the conversion id.
    First/last election orders by (touch_us, touch_event_id) so ties are
    engine-independent."""
    if not touch_types:
        raise ValueError("attribution requires >= 1 touch type")
    lookback_us = int(lookback_hours) * 3_600_000_000
    conv = df.where(F.col("event_type") == conversion_type).select(
        F.col("event_id").alias("conv_event_id"),
        F.col("user_id"),
        _ts_us().alias("conv_us"),
    )
    touch = df.where(F.col("event_type").isin(*touch_types)).select(
        F.col("user_id"),
        F.col("event_type").alias("touch_type"),
        F.col("event_id").alias("touch_id"),
        _ts_us().alias("touch_us"),
    )
    j = conv.join(
        touch,
        (conv.user_id == touch.user_id)
        & (F.col("touch_us") < F.col("conv_us"))
        & (F.col("touch_us") >= F.col("conv_us") - lookback_us),
        "left",
    ).select(
        "conv_event_id", conv.user_id.alias("user_id"), "conv_us",
        "touch_type", "touch_id", "touch_us",
    )
    w_first = Window.partitionBy("conv_event_id").orderBy(
        F.asc_nulls_last("touch_us"), F.asc_nulls_last("touch_id")
    )
    w_last = Window.partitionBy("conv_event_id").orderBy(
        F.desc_nulls_last("touch_us"), F.desc_nulls_last("touch_id")
    )
    ranked = j.select(
        "conv_event_id", "user_id", "conv_us", "touch_type", "touch_id",
        F.row_number().over(w_first).alias("__rf"),
        F.row_number().over(w_last).alias("__rl"),
    )
    return (
        ranked.groupBy("conv_event_id")
        .agg(
            F.first("user_id").alias("user_id"),
            F.first("conv_us").alias("conv_us"),
            F.max(F.when(F.col("__rf") == 1, F.col("touch_type"))).alias(
                "first_touch"
            ),
            F.max(F.when(F.col("__rl") == 1, F.col("touch_type"))).alias(
                "last_touch"
            ),
            F.count("touch_id").cast("long").alias("n_touches"),
        )
        .orderBy("conv_event_id")
    )


def attribution_sql(
    table: str,
    conversion_type: str,
    touch_types: list[str],
    lookback_hours: int = 72,
) -> str:
    if not touch_types:
        raise ValueError("attribution requires >= 1 touch type")
    lookback_us = int(lookback_hours) * 3_600_000_000
    tt = ", ".join(f"'{t}'" for t in touch_types)
    return f"""
WITH __conv AS (
  SELECT event_id AS conv_event_id, user_id, epoch_us(ts) AS conv_us
  FROM {table} WHERE event_type = '{conversion_type}'
),
__touch AS (
  SELECT user_id, event_type AS touch_type, event_id AS touch_id,
         epoch_us(ts) AS touch_us
  FROM {table} WHERE event_type IN ({tt})
),
__j AS (
  SELECT c.conv_event_id, c.user_id, c.conv_us,
         t.touch_type, t.touch_id, t.touch_us
  FROM __conv c LEFT JOIN __touch t
    ON c.user_id = t.user_id
   AND t.touch_us < c.conv_us
   AND t.touch_us >= c.conv_us - {lookback_us}
),
__r AS (
  SELECT *,
         row_number() OVER (PARTITION BY conv_event_id
                            ORDER BY touch_us NULLS LAST,
                                     touch_id NULLS LAST) AS rf,
         row_number() OVER (PARTITION BY conv_event_id
                            ORDER BY touch_us DESC NULLS LAST,
                                     touch_id DESC NULLS LAST) AS rl
  FROM __j
)
SELECT conv_event_id, ANY_VALUE(user_id) AS user_id,
       ANY_VALUE(conv_us) AS conv_us,
       MAX(CASE WHEN rf = 1 THEN touch_type END) AS first_touch,
       MAX(CASE WHEN rl = 1 THEN touch_type END) AS last_touch,
       COUNT(touch_id)::BIGINT AS n_touches
FROM __r GROUP BY conv_event_id ORDER BY conv_event_id
"""


def state_intervals(df: DataFrame) -> DataFrame:
    """(user_id, interval_idx, state, valid_from_us, valid_to_us,
    n_events, is_current): SCD Type-2 state history per user — the event
    stream's ``event_type`` collapsed into validity intervals (consecutive
    same-type events merge; a type change closes the interval at the next
    interval's start). ``valid_to_us`` is NULL on each user's current
    interval. The dimension-table build every warehouse runs off an event
    stream.

    Plan: gaps-and-islands (lag + running sum) on the user key, one
    groupBy on (user, interval), one lead window for the interval chain —
    three stages, all partitioned by user_id, so the shuffle is one
    user-keyed exchange reused throughout."""
    w = Window.partitionBy("user_id").orderBy("__us", "event_id")
    # first-row detection uses row_number, and the state comparison is
    # null-safe: a NULL state forms its own interval instead of being
    # absorbed into the neighbor (and a run of NULLs merges)
    marked = (
        df.select("user_id", "event_id", F.col("event_type").alias("state"),
                  _ts_us().alias("__us"))
        .withColumn("__prev", F.lag("state").over(w))
        .withColumn(
            "__chg",
            F.when(
                (F.row_number().over(w) == 1)
                | ~F.col("__prev").eqNullSafe(F.col("state")),
                1,
            ).otherwise(0),
        )
        .withColumn("interval_idx", F.sum("__chg").over(w).cast("long"))
    )
    grouped = marked.groupBy("user_id", "interval_idx").agg(
        F.first("state").alias("state"),
        F.min("__us").alias("valid_from_us"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    w_next = Window.partitionBy("user_id").orderBy("interval_idx")
    return (
        grouped.withColumn(
            "valid_to_us", F.lead("valid_from_us").over(w_next)
        )
        .select(
            "user_id", "interval_idx", "state", "valid_from_us",
            "valid_to_us", "n_events",
            F.col("valid_to_us").isNull().alias("is_current"),
        )
        .orderBy("user_id", "interval_idx")
    )


def state_intervals_sql(table: str) -> str:
    return f"""
WITH __e AS (
  SELECT user_id, event_id, event_type AS state, epoch_us(ts) AS us
  FROM {table}
),
__m AS (
  SELECT user_id, event_id, state, us,
         CASE WHEN row_number() OVER w = 1
                OR lag(state) OVER w IS DISTINCT FROM state
              THEN 1 ELSE 0 END AS chg
  FROM __e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
__i AS (
  SELECT user_id, state, us,
         CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY us, event_id)
              AS BIGINT) AS interval_idx
  FROM __m
),
__g AS (
  SELECT user_id, interval_idx, ANY_VALUE(state) AS state,
         MIN(us) AS valid_from_us, COUNT(*)::BIGINT AS n_events
  FROM __i GROUP BY user_id, interval_idx
)
SELECT user_id, interval_idx, state, valid_from_us,
       lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY interval_idx)
         AS valid_to_us,
       n_events,
       (lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY interval_idx)
        IS NULL) AS is_current
FROM __g ORDER BY user_id, interval_idx
"""


def sequence_ngrams(
    df: DataFrame,
    n: int = 3,
    k: int = 25,
    min_count: int = 2,
) -> DataFrame:
    """Top-``k`` frequent order-``n`` event-type paths:
    ``(rank, path, cnt)`` where ``path`` is the '>'-joined sequence of
    ``n`` consecutive event types within one user's timeline — the
    order-n generalization of transition_matrix (n=2), i.e. the
    frequent-path miner behind funnel discovery and bot-chain
    detection. Ties break by path ASC; paths below ``min_count`` drop.

    Plan: one user-keyed window producing n-1 LEADs (the same single
    sort/exchange regardless of n), one hash aggregation on the path
    string, one path-count top-k window — integer counts throughout, no
    float surface at all. Scale: the shuffle carries (path, partial
    count) pairs; path cardinality is |event types|^n, a vocabulary —
    never row-scaled."""
    if n < 2:
        raise ValueError(f"need n >= 2, got {n}")
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    if min_count < 1:
        raise ValueError(f"need min_count >= 1, got {min_count}")
    w = Window.partitionBy("user_id").orderBy(
        _ts_us().asc(), F.col("event_id").asc()
    )
    steps = [F.col("event_type")] + [
        F.lead("event_type", i).over(w) for i in range(1, n)
    ]
    path = F.concat_ws(">", *steps)
    # EVERY step must be non-null: concat_ws silently skips NULLs, so a
    # NULL event_type mid-path would emit a collapsed shorter path that
    # collides with genuine (n-1)-grams (and diverge from the SQL twin,
    # whose || operator nulls the whole path)
    complete = steps[0].isNotNull()
    for st in steps[1:]:
        complete = complete & st.isNotNull()
    counts = (
        df.select(path.alias("path"), complete.alias("__ok"))
        .where(F.col("__ok"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )
    rank_w = Window.orderBy(F.desc("cnt"), F.asc("path"))
    return (
        counts.withColumn("rank", F.row_number().over(rank_w).cast("long"))
        .where(F.col("rank") <= k)
        .select("rank", "path", "cnt")
        .orderBy("rank")
    )


def sequence_ngrams_sql(
    table: str,
    n: int = 3,
    k: int = 25,
    min_count: int = 2,
) -> str:
    if n < 2:
        raise ValueError(f"need n >= 2, got {n}")
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    if min_count < 1:
        raise ValueError(f"need min_count >= 1, got {min_count}")
    leads = ", ".join(
        f"lead(event_type, {i}) OVER w AS s{i}" for i in range(1, n)
    )
    parts = " || '>' || ".join(["event_type"] + [f"s{i}" for i in range(1, n)])
    null_guards = "".join(
        f" AND s{i} IS NOT NULL" for i in range(1, n)
    )
    return f"""
WITH __s AS (
  SELECT event_type, {leads}
  FROM {table}
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC)
),
__p AS (
  SELECT {parts} AS path FROM __s
  WHERE event_type IS NOT NULL{null_guards}
),
__c AS (
  SELECT path, COUNT(*)::BIGINT AS cnt FROM __p GROUP BY path
  HAVING COUNT(*) >= {min_count}
),
__r AS (
  SELECT path, cnt, row_number() OVER (ORDER BY cnt DESC, path ASC) AS rank
  FROM __c
)
SELECT CAST(rank AS BIGINT) AS rank, path, cnt
FROM __r WHERE rank <= {k} ORDER BY rank
"""


def session_assoc_rules(
    df: DataFrame,
    gap_minutes: int = 30,
    min_support: int = 2,
    k: int = 50,
) -> DataFrame:
    """Association rules over session baskets (Agrawal SIGMOD'93 applied
    to event streams): for each directed event-type pair A→B
    co-occurring in a session, ``(rank, antecedent, consequent,
    support_ab, confidence, lift)`` — confidence = P(B-session |
    A-session), lift = confidence / P(B-session). Pairs below
    ``min_support`` sessions drop; top-``k`` by lift (ties: pair ASC).

    Plan: the gaps-and-islands session split (one user-keyed window),
    distinct (user, session, type) baskets, then a self-equi-join on the
    session key — pair volume is Σ basket_size², and baskets are
    bounded by the TYPE VOCABULARY (not by events), so the join never
    goes row-quadratic. Counts are integers; confidence/lift are
    closed-form ratios of identical integers — unrounded, deterministic.
    """
    if min_support < 1:
        raise ValueError(f"need min_support >= 1, got {min_support}")
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    gap_us = int(gap_minutes) * 60_000_000
    w = Window.partitionBy("user_id").orderBy(
        _ts_us().asc(), F.col("event_id").asc()
    )
    new = F.when(
        F.lag(_ts_us()).over(w).isNull()
        | (_ts_us() - F.lag(_ts_us()).over(w) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    tagged = df.select(
        "user_id",
        "event_type",
        F.sum(new).over(
            Window.partitionBy("user_id")
            .orderBy(_ts_us().asc(), F.col("event_id").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long").alias("session_idx"),
    )
    # the distinct basket table feeds FOUR consumers (the session total,
    # per-type support, and both self-join sides); each would re-run the
    # two user-keyed session windows over the full event table.
    # Materialize once — baskets are sessions × type-vocabulary, far
    # smaller than events (guide §3.3).
    items = (
        tagged.select("user_id", "session_idx", "event_type")
        .distinct()
        .localCheckpoint()
    )
    # total session count rides the plan as a 1-row broadcast — a
    # driver-side .count() here would be an eager action that runs the
    # session split twice and breaks lazy composition
    ns = (
        items.select("user_id", "session_idx")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("__ns"))
    )
    sup = items.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("__sup")
    )
    a = items.select(
        "user_id", "session_idx", F.col("event_type").alias("antecedent")
    )
    bb = items.select(
        "user_id", "session_idx", F.col("event_type").alias("consequent")
    )
    pairs = (
        a.join(bb, ["user_id", "session_idx"])
        .where(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).cast("long").alias("support_ab"))
        .where(F.col("support_ab") >= min_support)
    )
    scored = (
        pairs.join(
            sup.select(
                F.col("event_type").alias("antecedent"),
                F.col("__sup").alias("__sup_a"),
            ),
            "antecedent",
        )
        .join(
            F.broadcast(
                sup.select(
                    F.col("event_type").alias("consequent"),
                    F.col("__sup").alias("__sup_b"),
                )
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(ns))
        .select(
            "antecedent",
            "consequent",
            "support_ab",
            (
                F.col("support_ab").cast("double")
                / F.col("__sup_a").cast("double")
            ).alias("confidence"),
            (
                F.col("support_ab").cast("double")
                * F.col("__ns").cast("double")
                / (
                    F.col("__sup_a").cast("double")
                    * F.col("__sup_b").cast("double")
                )
            ).alias("lift"),
        )
    )
    rw = Window.orderBy(
        F.desc("lift"), F.asc("antecedent"), F.asc("consequent")
    )
    return (
        scored.withColumn("rank", F.row_number().over(rw).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "rank", "antecedent", "consequent", "support_ab",
            "confidence", "lift",
        )
        .orderBy("rank")
    )


def session_assoc_rules_sql(
    table: str,
    gap_minutes: int = 30,
    min_support: int = 2,
    k: int = 50,
) -> str:
    if min_support < 1:
        raise ValueError(f"need min_support >= 1, got {min_support}")
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    gap_us = int(gap_minutes) * 60_000_000
    return f"""
WITH __e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM {table}
),
__m AS (
  SELECT user_id, event_type,
         CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS is_new, us, event_id
  FROM __e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
__t AS (
  SELECT user_id, event_type,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_idx
  FROM __m
),
__items AS (SELECT DISTINCT user_id, session_idx, event_type FROM __t),
__ns AS (
  SELECT COUNT(*)::BIGINT AS n FROM
  (SELECT DISTINCT user_id, session_idx FROM __items)
),
__sup AS (
  SELECT event_type, COUNT(*)::BIGINT AS sup FROM __items GROUP BY event_type
),
__pairs AS (
  SELECT a.event_type AS antecedent, b.event_type AS consequent,
         COUNT(*)::BIGINT AS support_ab
  FROM __items a
  JOIN __items b ON a.user_id = b.user_id
                AND a.session_idx = b.session_idx
                AND a.event_type <> b.event_type
  GROUP BY antecedent, consequent
  HAVING COUNT(*) >= {min_support}
),
__scored AS (
  SELECT p.antecedent, p.consequent, p.support_ab,
         CAST(p.support_ab AS DOUBLE) / CAST(sa.sup AS DOUBLE) AS confidence,
         CAST(p.support_ab AS DOUBLE) * CAST(ns.n AS DOUBLE)
           / (CAST(sa.sup AS DOUBLE) * CAST(sb.sup AS DOUBLE)) AS lift
  FROM __pairs p
  JOIN __sup sa ON p.antecedent = sa.event_type
  JOIN __sup sb ON p.consequent = sb.event_type
  CROSS JOIN __ns ns
),
__r AS (
  SELECT *, row_number() OVER (ORDER BY lift DESC, antecedent ASC,
                               consequent ASC) AS rank
  FROM __scored
)
SELECT CAST(rank AS BIGINT) AS rank, antecedent, consequent, support_ab,
       confidence, lift
FROM __r WHERE rank <= {k} ORDER BY rank
"""


def interarrival_stats(df: DataFrame) -> DataFrame:
    """Per-event-type inter-arrival statistics over each user's timeline:
    ``(event_type, n_gaps, mean_gap_us, cv, burstiness)`` where gaps are
    the µs deltas between a user's consecutive events of that type, cv
    is σ/µ of the gaps, and burstiness is Goh & Barabási's
    ``B = (σ − µ)/(σ + µ)`` (EPL'08): −1 = perfectly periodic, 0 =
    Poisson, →1 = bursty. The bot/automation fingerprint (periodic
    traffic → B near −1) and the capacity-planning shape parameter.

    Plan: one (user, type)-keyed LAG window, then one hash aggregation
    per type. Gaps are exact integers; moment sums run in DECIMAL(38,0)
    with (19,0) factors and the string-hop conversion (gap² ~ 1e20
    overflows BIGINT) — closed-form float end, NULL stats at n < 2 or
    µ = 0."""
    w = Window.partitionBy("user_id", "event_type").orderBy(
        _ts_us().asc(), F.col("event_id").asc()
    )
    gap = (_ts_us() - F.lag(_ts_us()).over(w)).alias("__gap")
    g = (
        df.select("event_type", gap)
        .where(F.col("__gap").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.sum(F.col("__gap").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("__s"),
            F.sum(
                (
                    F.col("__gap").cast("decimal(19,0)")
                    * F.col("__gap").cast("decimal(19,0)")
                ).cast("decimal(38,0)")
            )
            .cast("decimal(38,0)")
            .alias("__q"),
        )
    )
    from bullet_storm_spark.operators.stats_tests import _d2d, _div

    n = F.col("n_gaps").cast("double")
    mean = _div(_d2d(F.col("__s")), n)
    var = _div(
        _d2d(F.col("__q")) - _div(_d2d(F.col("__s")) * _d2d(F.col("__s")), n),
        n - F.lit(1.0),
    )
    sd = F.when(var >= 0, F.sqrt(var))
    ok = (F.col("n_gaps") >= 2) & (mean > 0)
    return g.select(
        "event_type",
        "n_gaps",
        F.when(F.col("n_gaps") >= 1, mean).alias("mean_gap_us"),
        F.when(ok, _div(sd, mean)).alias("cv"),
        F.when(ok & (sd + mean > 0), _div(sd - mean, sd + mean)).alias(
            "burstiness"
        ),
    ).orderBy("event_type")


def interarrival_stats_sql(table: str) -> str:
    return """
WITH __e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM {table}
),
__g AS (
  SELECT event_type,
         us - lag(us) OVER (PARTITION BY user_id, event_type
                            ORDER BY us, event_id) AS gap
  FROM __e
),
__m AS (
  SELECT event_type, COUNT(*)::BIGINT AS n_gaps,
         CAST(SUM(CAST(gap AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,
         CAST(SUM(CAST(gap AS DECIMAL(19,0)) * CAST(gap AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS q
  FROM __g WHERE gap IS NOT NULL
  GROUP BY event_type
),
__d AS (
  SELECT event_type, n_gaps,
         CAST(CAST(s AS VARCHAR) AS DOUBLE) AS sd_,
         CAST(CAST(q AS VARCHAR) AS DOUBLE) AS qd_,
         CAST(n_gaps AS DOUBLE) AS nd_
  FROM __m
),
__c AS (
  SELECT event_type, n_gaps,
         sd_ / nd_ AS mean,
         CASE WHEN (qd_ - sd_ * sd_ / nd_) / (nd_ - 1.0) >= 0
               AND n_gaps >= 2
           THEN sqrt((qd_ - sd_ * sd_ / nd_) / (nd_ - 1.0)) END AS sdev
  FROM __d
)
SELECT event_type, n_gaps,
       CASE WHEN n_gaps >= 1 THEN mean END AS mean_gap_us,
       CASE WHEN n_gaps >= 2 AND mean > 0 THEN sdev / mean END AS cv,
       CASE WHEN n_gaps >= 2 AND mean > 0 AND sdev + mean > 0
         THEN (sdev - mean) / (sdev + mean) END AS burstiness
FROM __c ORDER BY event_type
""".format(table=table)


def markov_backtest(
    df: DataFrame,
    train_permille: int = 800,
    round_to: int = 9,
) -> DataFrame:
    """(prev_type, n_test, n_correct, accuracy): time-split backtest of
    the first-order Markov next-event predictor — the eval loop on top
    of ``transition_matrix``: fit argmax(next | prev) on the FIRST
    ``train_permille``/1000 of the time range, score exact-match
    accuracy on the held-out tail, plus an ``__all__`` row.  The honest
    version of "our transition matrix is predictive": a random-split
    eval would leak adjacent events across the cut (the time_split_audit
    rationale).

    Determinism: the boundary is the time_split integer-µs arithmetic;
    transitions are built per user with the (ts, event_id) tiebroken
    LAG; the predictor is argmax with (count DESC, type ASC) total-order
    ties; pairs CROSSING the boundary belong to neither side (both
    engines drop them identically — the LAG runs inside each split).

    Plan: two user-keyed window passes (train, test), one vocab²-sized
    count aggregation, a vocab-sized argmax window, one broadcast join
    of the predictor onto the test pairs.  Nothing row-sized leaves the
    executors.
    """
    from pyspark.sql import Window

    base = df.select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("ts_ns div 1000").alias("__us"),
    )
    bounds = base.agg(F.min("__us").alias("__lo"), F.max("__us").alias("__hi"))
    tagged = base.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        "event_id",
        "event_type",
        "__us",
        F.expr(
            f"CAST(__lo + ((__hi - __lo) * {int(train_permille)}) div 1000 "
            "AS BIGINT)"
        ).alias("__split"),
    )

    def pairs(part):
        w = Window.partitionBy("user_id").orderBy("__us", "event_id")
        return (
            part.withColumn("__prev", F.lag("event_type").over(w))
            .where(F.col("__prev").isNotNull())
            .select(
                F.col("__prev").alias("prev_type"),
                F.col("event_type").alias("next_type"),
            )
        )

    train = pairs(tagged.where(F.col("__us") < F.col("__split")))
    test = pairs(tagged.where(F.col("__us") >= F.col("__split")))
    counts = train.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    wp = Window.partitionBy("prev_type").orderBy(
        F.desc("__c"), F.col("next_type")
    )
    predictor = (
        counts.withColumn("__rk", F.row_number().over(wp))
        .where(F.col("__rk") == 1)
        .select("prev_type", F.col("next_type").alias("__pred"))
    )
    scored = test.join(F.broadcast(predictor), "prev_type", "left").select(
        "prev_type",
        (F.col("next_type") == F.col("__pred")).cast("long").alias("__hit"),
    )
    per_prev = scored.groupBy("prev_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
        .cast("long")
        .alias("n_correct"),
    )
    overall = scored.agg(
        F.lit("__all__").alias("prev_type"),
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
        .cast("long")
        .alias("n_correct"),
    )
    return (
        per_prev.unionByName(overall)
        .select(
            "prev_type",
            "n_test",
            "n_correct",
            F.round(
                F.try_divide(
                    F.col("n_correct").cast("double"),
                    F.col("n_test").cast("double"),
                ),
                round_to,
            ).alias("accuracy"),
        )
        .orderBy("prev_type")
    )


def markov_backtest_sql(
    table: str,
    train_permille: int = 800,
    round_to: int = 9,
) -> str:
    return f"""
WITH __b AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM {table}
),
__bounds AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM __b),
__tag AS (
  SELECT b.*, CAST(x.lo + ((x.hi - x.lo) * {int(train_permille)}) // 1000
              AS BIGINT) AS split
  FROM __b b CROSS JOIN __bounds x
),
__train AS (
  SELECT prev_type, next_type FROM (
    SELECT LAG(event_type) OVER (PARTITION BY user_id
             ORDER BY us, event_id) AS prev_type,
           event_type AS next_type
    FROM __tag WHERE us < split
  ) WHERE prev_type IS NOT NULL
),
__test AS (
  SELECT prev_type, next_type FROM (
    SELECT LAG(event_type) OVER (PARTITION BY user_id
             ORDER BY us, event_id) AS prev_type,
           event_type AS next_type
    FROM __tag WHERE us >= split
  ) WHERE prev_type IS NOT NULL
),
__cnt AS (
  SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM __train GROUP BY prev_type, next_type
),
__pred AS (
  SELECT prev_type, next_type AS pred FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY prev_type
               ORDER BY c DESC, next_type) AS rk
    FROM __cnt
  ) WHERE rk = 1
),
__sc AS (
  SELECT t.prev_type,
         CASE WHEN t.next_type = p.pred THEN 1 ELSE 0 END AS hit
  FROM __test t LEFT JOIN __pred p ON t.prev_type = p.prev_type
),
__pp AS (
  SELECT prev_type, CAST(COUNT(*) AS BIGINT) AS n_test,
         CAST(SUM(hit) AS BIGINT) AS n_correct
  FROM __sc GROUP BY prev_type
  UNION ALL
  SELECT '__all__', CAST(COUNT(*) AS BIGINT), CAST(SUM(hit) AS BIGINT)
  FROM __sc
)
SELECT prev_type, n_test, n_correct,
       CASE WHEN ABS(CAST(n_correct AS DOUBLE) / NULLIF(n_test, 0)) >= 1e16 THEN CAST((CAST(n_correct AS DOUBLE) / NULLIF(n_test, 0)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(n_correct AS DOUBLE) / NULLIF(n_test, 0)) * CAST(ABS(CAST(n_correct AS DOUBLE) / NULLIF(n_test, 0)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END
         AS accuracy
FROM __pp ORDER BY prev_type
"""


def ltv_curve(df: DataFrame, round_to: int = 9) -> DataFrame:
    """(cohort_day, day_offset, cohort_size, n_active, cum_value,
    ltv_per_user): cumulative lifetime value by cohort age — the
    monetized extension of ``retention_cohorts``: users grouped by
    first-seen epoch-day, each later day's total event value summed and
    CUMULATED along the cohort's age axis, normalized per cohort
    member.  Reading one cohort's row at age k answers "how much value
    has an average day-X signup generated within k days" — the curve a
    payback-period decision reads off directly.

    Parity: day arithmetic is integer epoch-days (the retention
    convention); per-(cohort, age) value sums quantize through the 6dp
    text hop and accumulate in DECIMAL(38,12) — the cumulative window
    then runs over EXACT decimals, so running totals are
    order-independent (the review-caught uplift-score class); the
    per-user division is one IEEE op on text-hopped totals.

    Plan: one user-keyed aggregation (first-seen), one
    (cohort, age)-keyed value aggregation, a cohort-sized broadcast,
    and the cumulative window over cohort-bounded age rows.
    """
    from bullet_storm_spark.operators.stats_tests import _MOMENT, _d2d, _q6

    ev = df.select(
        "user_id",
        F.expr(f"(ts_ns div 1000) div {_US_PER_DAY}").alias("__day"),
        F.col("value").cast("double").alias("__v"),
    )
    first = ev.groupBy("user_id").agg(F.min("__day").alias("cohort_day"))
    sizes = first.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    per_age = (
        ev.join(first, "user_id")
        .groupBy(
            "cohort_day",
            (F.col("__day") - F.col("cohort_day")).alias("day_offset"),
        )
        .agg(
            F.count_distinct(F.col("user_id")).cast("long").alias("n_active"),
            F.sum(_q6(F.col("__v")).cast(_MOMENT)).cast(_MOMENT).alias("__s"),
        )
    )
    w = Window.partitionBy("cohort_day").orderBy("day_offset").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        per_age.join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "cohort_size",
            "n_active",
            _d2d(F.sum("__s").over(w).cast(_MOMENT)).alias("cum_value"),
            F.round(
                F.try_divide(
                    _d2d(F.sum("__s").over(w).cast(_MOMENT)),
                    F.col("cohort_size").cast("double"),
                ),
                round_to,
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_day", "day_offset")
    )


def ltv_curve_sql(table: str, round_to: int = 9) -> str:
    from bullet_storm_spark.operators.stats_tests import _d2d_sql, _q6_sql

    v6 = _q6_sql("CAST(value AS DOUBLE)")
    cum = "CAST(SUM(a.s) OVER (PARTITION BY a.cohort_day ORDER BY a.day_offset " \
          "ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,12))"
    return f"""
WITH __e AS (
  SELECT user_id, epoch_us(ts) // {_US_PER_DAY} AS day,
         CAST({v6} AS DECIMAL(38,12)) AS v6
  FROM {table}
),
__f AS (
  SELECT user_id, MIN(day) AS cohort_day FROM __e GROUP BY user_id
),
__sz AS (
  SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_size
  FROM __f GROUP BY cohort_day
),
__a AS (
  SELECT f.cohort_day, e.day - f.cohort_day AS day_offset,
         CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active,
         CAST(SUM(e.v6) AS DECIMAL(38,12)) AS s
  FROM __e e JOIN __f f ON e.user_id = f.user_id
  GROUP BY 1, 2
)
SELECT a.cohort_day, CAST(a.day_offset AS BIGINT) AS day_offset,
       z.cohort_size, a.n_active,
       {_d2d_sql(cum)} AS cum_value,
       CASE WHEN ABS({_d2d_sql(cum)} / z.cohort_size) >= 1e16 THEN CAST(({_d2d_sql(cum)} / z.cohort_size) AS DOUBLE) ELSE CAST(CAST(CAST(CAST(({_d2d_sql(cum)} / z.cohort_size) * CAST(ABS({_d2d_sql(cum)} / z.cohort_size) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS ltv_per_user
FROM __a a JOIN __sz z ON a.cohort_day = z.cohort_day
ORDER BY a.cohort_day, a.day_offset
"""


def session_report(
    df: DataFrame, gap_minutes: int = 30, round_to: int = 9
) -> DataFrame:
    """One-row session health report over ``sessionize``'s output:
    ``(n_sessions, n_users, n_bounce, bounce_rate, avg_events,
    avg_duration_us, avg_value)`` — the engagement dashboard header.
    ``n_bounce`` counts single-event sessions (the classic bounce);
    averages are IEEE finishes over exact integer/decimal sums (event
    counts and durations are integers; session value is the 6dp-exact
    decimal sessionize already emits re-quantized via the text hop).

    Scale posture: sessionize's one user-keyed shuffle, then a 1-row
    reduction over the session frame."""
    s = sessionize(df, gap_minutes=gap_minutes)
    v6 = (
        F.col("total_value").cast("double").cast("string").cast("decimal(18,6)")
    )
    agg = s.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounce"),
        F.sum(F.col("n_events").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("__se"),
        F.sum(F.col("duration_us").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("__sd"),
        F.sum(v6.cast("decimal(38,6)")).cast("decimal(38,6)").alias("__sv"),
    )
    n_d = F.col("n_sessions").cast("double")
    d2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    return agg.select(
        "n_sessions",
        "n_users",
        "n_bounce",
        F.round(
            F.try_divide(F.col("n_bounce").cast("double"), n_d), round_to
        ).alias("bounce_rate"),
        F.round(F.try_divide(d2d("__se"), n_d), round_to).alias("avg_events"),
        F.round(F.try_divide(d2d("__sd"), n_d), round_to).alias(
            "avg_duration_us"
        ),
        F.round(F.try_divide(d2d("__sv"), n_d), round_to).alias("avg_value"),
    )


def session_report_sql(
    table: str, gap_minutes: int = 30, round_to: int = 9
) -> str:
    inner = sessionize_sql(table, gap_minutes=gap_minutes)
    d2d = lambda e: f"CAST(CAST({e} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    return f"""
WITH __s AS ({inner})
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounce,
       CAST(CAST(CAST(CAST((CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / NULLIF(CAST(COUNT(*) AS DOUBLE), 0.0)) * CAST(ABS(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / NULLIF(CAST(COUNT(*) AS DOUBLE), 0.0)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE)
         AS bounce_rate,
       CAST(CAST(CAST(CAST(({d2d('CAST(SUM(CAST(n_events AS DECIMAL(38,0))) AS DECIMAL(38,0))')}
             / NULLIF(CAST(COUNT(*) AS DOUBLE), 0.0)) * CAST(ABS({d2d('CAST(SUM(CAST(n_events AS DECIMAL(38,0))) AS DECIMAL(38,0))')}
             / NULLIF(CAST(COUNT(*) AS DOUBLE), 0.0)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE)
         AS avg_events,
       CAST(CAST(CAST(CAST(({d2d('CAST(SUM(CAST(duration_us AS DECIMAL(38,0))) AS DECIMAL(38,0))')}
             / NULLIF(CAST(COUNT(*) AS DOUBLE), 0.0)) * CAST(ABS({d2d('CAST(SUM(CAST(duration_us AS DECIMAL(38,0))) AS DECIMAL(38,0))')}
             / NULLIF(CAST(COUNT(*) AS DOUBLE), 0.0)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE)
         AS avg_duration_us,
       CAST(CAST(CAST(CAST(({d2d("CAST(SUM(CAST(CAST(CAST((CAST(total_value AS DOUBLE)) * CAST(ABS(CAST(total_value AS DOUBLE)) >= POWER(10.0, -(6+1)) AS INT) AS VARCHAR) AS DECIMAL(18,6)) AS DECIMAL(38,6))) AS DECIMAL(38,6))")}
             / NULLIF(CAST(COUNT(*) AS DOUBLE), 0.0)) * CAST(ABS({d2d("CAST(SUM(CAST(CAST(CAST((CAST(total_value AS DOUBLE)) * CAST(ABS(CAST(total_value AS DOUBLE)) >= POWER(10.0, -(6+1)) AS INT) AS VARCHAR) AS DECIMAL(18,6)) AS DECIMAL(38,6))) AS DECIMAL(38,6))")}
             / NULLIF(CAST(COUNT(*) AS DOUBLE), 0.0)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE)
         AS avg_value
FROM __s
"""


def rfm_segments(
    df: DataFrame, round_to: int = 6
) -> DataFrame:
    """Per-user RFM segmentation: ``(user_id, r_hours, frequency,
    monetary, r_score, f_score, m_score, rfm_code)`` ordered by user —
    the classic recency/frequency/monetary marketing segmentation
    (Hughes 1994 lineage) as one user collapse plus three quintile
    windows. ``r_hours`` is whole hours since the user's last event
    relative to the corpus's last event (integer epoch-µs arithmetic,
    no calendar functions); scores are NTILE(5) with 5 = best
    (most recent / most frequent / highest value) and ``rfm_code``
    concatenates them ("555" = the champions segment).

    Determinism: every NTILE runs over a fully tie-broken order
    (metric, then user_id) — both engines implement standard NTILE
    (equal buckets, earlier buckets take the remainder), so bucket
    boundaries are identical; monetary ORDERING uses the exact (38,12)
    decimal sum (no float compare), while the emitted monetary column
    is the rounded double.

    Scale posture: one user-keyed collapse (map-side combined), a 1-row
    corpus-max broadcast, then three range-exchange NTILEs
    (operators/ids.py partition-offset pattern) — parallel rank, never
    the single-task global window."""
    # the per-user collapse feeds TWO consumers (the corpus-max scalar
    # and the scoring base); materialize once — user-sized — so the
    # event table is aggregated once, not twice (guide §3.3)
    per = (
        df.groupBy("user_id")
        .agg(
            F.max(_ts_us()).alias("__last"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(
                F.round(F.col("value"), 6).cast("decimal(38,6)")
            ).cast("decimal(38,12)").alias("__m"),
        )
        .localCheckpoint()
    )
    gmax = per.agg(F.max("__last").alias("__gmax"))
    base = per.crossJoin(F.broadcast(gmax)).select(
        "user_id",
        F.expr("(__gmax - __last) div 3600000000").cast("long").alias("r_hours"),
        "frequency",
        "__m",
    )
    # quintiles via the range-exchange NTILE (operators/ids.py), never a
    # global single-task window — the user dimension is 10^8-10^9 rows at
    # 100 TB (VERDICT r8 item 4). Same tie-free orders as before, so the
    # emitted scores are bit-identical to the NTILE(5) twins in the SQL.
    from bullet_storm_spark.operators.ids import assign_ntile

    scored = assign_ntile(base, ["r_hours", "user_id"], 5, name="__q_r")
    scored = assign_ntile(scored, ["frequency", "user_id"], 5, name="__q_f")
    scored = assign_ntile(scored, ["__m", "user_id"], 5, name="__q_m")
    out = scored.select(
        "user_id",
        "r_hours",
        "frequency",
        F.round(F.col("__m").cast("string").cast("double"), round_to).alias(
            "monetary"
        ),
        (6 - F.col("__q_r")).cast("int").alias("r_score"),
        F.col("__q_f").cast("int").alias("f_score"),
        F.col("__q_m").cast("int").alias("m_score"),
    )
    return out.withColumn(
        "rfm_code",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    ).orderBy("user_id")


def rfm_segments_sql(table: str, round_to: int = 6) -> str:
    return f"""
WITH __per AS (
  SELECT user_id, MAX(epoch_us(ts)) AS last_us,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(CASE WHEN ABS(value) >= 1e16 THEN CAST((value) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((value) * CAST(ABS(value) >= POWER(10.0, -(6+1)) AS INT) AS VARCHAR) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) END AS DECIMAL(38,6))) AS DECIMAL(38,12))
           AS m
  FROM {table} GROUP BY user_id
),
__g AS (SELECT MAX(last_us) AS gmax FROM __per),
__b AS (
  SELECT user_id,
         CAST((g.gmax - p.last_us) // 3600000000 AS BIGINT) AS r_hours,
         frequency, m
  FROM __per p, __g g
),
__s AS (
  SELECT user_id, r_hours, frequency, m,
         6 - NTILE(5) OVER (ORDER BY r_hours ASC, user_id ASC) AS r_score,
         NTILE(5) OVER (ORDER BY frequency ASC, user_id ASC) AS f_score,
         NTILE(5) OVER (ORDER BY m ASC, user_id ASC) AS m_score
  FROM __b
)
SELECT user_id, r_hours, frequency,
       CASE WHEN ABS(CAST(CAST(m AS VARCHAR) AS DOUBLE)) >= 1e16 THEN CAST((CAST(CAST(m AS VARCHAR) AS DOUBLE)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(CAST(m AS VARCHAR) AS DOUBLE)) * CAST(ABS(CAST(CAST(m AS VARCHAR) AS DOUBLE)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS monetary,
       CAST(r_score AS INTEGER) AS r_score,
       CAST(f_score AS INTEGER) AS f_score,
       CAST(m_score AS INTEGER) AS m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
         || CAST(m_score AS VARCHAR) AS rfm_code
FROM __s ORDER BY user_id
"""


def entropy_rate(df: DataFrame, round_to: int = 9) -> DataFrame:
    """First-order Markov entropy rate of the event-type process — one
    row ``(n_states, n_transitions, entropy_rate, max_entropy,
    predictability)``: ``H = −Σᵢⱼ πᵢ pᵢⱼ ln pᵢⱼ`` over the
    :func:`transition_matrix` counts with πᵢ the from-state share, and
    ``predictability = 1 − H / ln(n_states)`` (0 = i.i.d.-uniform
    behavior, →1 = deterministic chains). The one-scalar behavioral
    summary of the full transition matrix: bot cohorts and broken
    clients collapse it toward 1, organic traffic sits mid-range —
    worth tracking per release next to the session report.

    Engine parity: the matrix is exact integers; each πᵢpᵢⱼ ln pᵢⱼ term
    = (cᵢⱼ/N)·ln(cᵢⱼ/Tᵢ) rounds to 9 dp and sums in DECIMAL(38,9)
    (order-free, the lm_score convention — ln is the one transcendental
    and it is quantized before any accumulation). Scale: the
    transition-matrix shape (one user-keyed lag window, |types|² frame),
    then a 1-row reduction."""
    w = Window.partitionBy("user_id").orderBy("__us", "event_id")
    counts = (
        df.select("user_id", "event_id", "event_type", _ts_us().alias("__us"))
        .withColumn("__next", F.lead("event_type").over(w))
        .where(F.col("__next").isNotNull())
        .groupBy(
            F.col("event_type").alias("__from"),
            F.col("__next").alias("__to"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    totals = counts.groupBy("__from").agg(
        F.sum("__c").cast("long").alias("__t")
    )
    grand = counts.agg(
        F.sum("__c").cast("long").alias("__n"),
        F.countDistinct("__from").cast("long").alias("__k"),
    )
    _q9 = lambda c: c.cast("double").cast("string").cast("decimal(18,9)")  # noqa: E731
    from bullet_storm_spark.operators.stats_tests import _d2d, _div

    term = _q9(
        _div(F.col("__c").cast("double"), F.col("__n").cast("double"))
        * F.log(
            _div(F.col("__c").cast("double"), F.col("__t").cast("double"))
        )
    )
    joined = counts.join(F.broadcast(totals), "__from").crossJoin(
        F.broadcast(grand)
    )
    agg = joined.agg(
        F.max("__k").alias("n_states"),
        F.max("__n").alias("n_transitions"),
        F.sum(term.cast("decimal(38,9)")).cast("decimal(38,9)").alias("__s"),
    )
    h = -_d2d(F.col("__s"))
    hmax = F.log(F.col("n_states").cast("double"))
    return agg.select(
        "n_states",
        "n_transitions",
        F.round(h, round_to).alias("entropy_rate"),
        F.round(hmax, round_to).alias("max_entropy"),
        F.round(F.lit(1.0) - _div(h, hmax), round_to).alias("predictability"),
    )


def entropy_rate_sql(table: str, round_to: int = 9) -> str:
    from bullet_storm_spark.operators.stats_tests import _d2d_sql, _qround_sql

    def q9(e: str) -> str:
        return (
            f"CAST(CAST(({e}) * CAST(ABS({e}) >= POWER(10.0, -10) AS INT)"
            f" AS VARCHAR) AS DECIMAL(18,9))"
        )

    term = q9(
        "(CAST(c.cnt AS DOUBLE) / CAST(g.n AS DOUBLE))"
        " * ln(CAST(c.cnt AS DOUBLE) / CAST(t.total AS DOUBLE))"
    )
    h = f"-{_d2d_sql('s')}"
    hmax = "ln(CAST(n_states AS DOUBLE))"
    return f"""
WITH __e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM {table}
),
__pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) AS to_type
  FROM __e
),
__counts AS (
  SELECT from_type, to_type, COUNT(*)::BIGINT AS cnt
  FROM __pairs WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
),
__totals AS (
  SELECT from_type, CAST(SUM(cnt) AS BIGINT) AS total
  FROM __counts GROUP BY from_type
),
__grand AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT from_type) AS BIGINT) AS k
  FROM __counts
),
__agg AS (
  SELECT MAX(g.k) AS n_states, MAX(g.n) AS n_transitions,
         CAST(SUM(CAST({term} AS DECIMAL(38,9))) AS DECIMAL(38,9)) AS s
  FROM __counts c
  JOIN __totals t ON c.from_type = t.from_type
  CROSS JOIN __grand g
)
SELECT n_states, n_transitions,
       {_qround_sql(h, round_to)} AS entropy_rate,
       {_qround_sql(hmax, round_to)} AS max_entropy,
       {_qround_sql(f"1.0 - ({h}) / NULLIF({hmax}, 0.0)", round_to)} AS predictability
FROM __agg
"""


def stickiness_report(df: DataFrame, window_days: int = 7, round_to: int = 9) -> DataFrame:
    """Daily engagement stickiness: ``(day, dau, wau, stickiness)``
    ordered by day — distinct active users per day, distinct active
    users over the trailing ``window_days`` (clipped at corpus start),
    and the DAU/WAU ratio (the standard "how habitual is usage" product
    scalar; 1/window_days = everyone shows up once a week, → 1 =
    everyone daily).

    Scale shape: a sliding DISTINCT cannot be summed from daily
    distincts, and a user-dimension window would be the single-task
    trap — instead each distinct (user, day) row EXPLODES to the
    ``window_days`` target days it contributes to (a bounded ×W map
    step), and WAU is one (user, target_day)-distinct aggregation —
    map-side shapes only, integer-exact counts, one IEEE division.
    Target days past the corpus end are dropped, and the report carries
    the days with at least one active user (dau >= 1 — the inner join
    on the DAU frame; a zero-DAU day inside an active week is absent,
    not a zero row)."""
    if window_days < 1:
        raise ValueError(f"need window_days >= 1, got {window_days}")
    from bullet_storm_spark.operators.stats_tests import _div

    user_days = df.select(
        "user_id",
        F.expr(f"(ts_ns div 1000) div {_US_PER_DAY}").cast("long").alias("__day"),
    ).distinct()
    bounds = user_days.agg(
        F.min("__day").alias("__d0"), F.max("__day").alias("__d1")
    )
    dau = user_days.groupBy(F.col("__day").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    contrib = (
        user_days.select(
            "user_id",
            F.explode(
                F.sequence(F.col("__day"), F.col("__day") + (window_days - 1))
            ).alias("__t"),
        )
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .where(F.col("__t") <= F.col("__d1"))
    )
    wau = contrib.groupBy(F.col("__t").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("wau")
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(
                _div(F.col("dau").cast("double"), F.col("wau").cast("double")),
                round_to,
            ).alias("stickiness"),
        )
        .orderBy("day")
    )


def stickiness_report_sql(table: str, window_days: int = 7, round_to: int = 9) -> str:
    if window_days < 1:
        raise ValueError(f"need window_days >= 1, got {window_days}")
    from bullet_storm_spark.operators.stats_tests import _qround_sql

    return f"""
WITH __ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_US_PER_DAY} AS day FROM {table}
),
__b AS (SELECT MAX(day) AS d1 FROM __ud),
__dau AS (
  SELECT day, COUNT(*)::BIGINT AS dau FROM __ud GROUP BY day
),
__wau AS (
  SELECT t AS day, COUNT(DISTINCT user_id)::BIGINT AS wau
  FROM (
    SELECT u.user_id, u.day + o.off AS t
    FROM __ud u, (SELECT UNNEST(range({int(window_days)})) AS off) o, __b b
    WHERE u.day + o.off <= b.d1
  )
  GROUP BY t
)
SELECT CAST(d.day AS BIGINT) AS day, d.dau, w.wau,
       {_qround_sql("CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE)", round_to)}
         AS stickiness
FROM __dau d JOIN __wau w ON d.day = w.day
ORDER BY day
"""
