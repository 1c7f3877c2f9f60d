"""Changepoint / anomaly detection over event-time series, dual-compiled.

CUSUM (Page 1954) is the standard sequential changepoint statistic: it
accumulates deviations from the in-control mean and flags when the
accumulation crosses a threshold. The textbook recursion
``S+_t = max(0, S+_{t-1} + (x_t - mu - slack))`` looks inherently
sequential — but it has a closed prefix form: with
``c_t = sum_{i<=t} (x_i - mu - slack)`` and the implicit ``S+_0 = 0``
start (i.e. the running min is clamped at zero),

    S+_t = c_t - min(0, min_{j <= t} c_j)   (and symmetrically S-_t
                                             from the negated series)

so the whole detector is a cumulative sum plus a running min — two
window frames, no recursion, no UDF. That is what makes it a
SPARK-NATIVE operator: per monitored key (here event_type) the series
lives in one window partition; cross-key parallelism is free, and at 100
TB you monitor millions of keys (user, shard, source) with one shuffle
on the key — the per-key series length (hours) is tiny by construction
because the FIRST aggregation collapses raw events to (key, bucket)
counts.

Engine parity: counts are integers; mu/sd derive from integer sums and
round once to 9 dp; EVERYTHING downstream is exact decimal arithmetic
(9-dp values recovered losslessly from their doubles, 2-dp knob
literals), so the cusum columns and the flag comparison carry no
rounding at all — the one decimal->double cast at the end is correctly
rounded identically in both engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

_US_PER_HOUR = 3_600_000_000


def _check_knobs(slack_k: float, threshold_h: float) -> None:
    for name, v in (("slack_k", slack_k), ("threshold_h", threshold_h)):
        if not 0 <= v < 100 or round(v, 2) != v:
            raise ValueError(
                f"{name} must be in [0, 100) and exact at 2 decimals, got {v}"
            )


def volume_cusum(
    df: DataFrame,
    key_col: str = "event_type",
    slack_k: float = 0.5,
    threshold_h: float = 4.0,
) -> DataFrame:
    """(key, hour, cnt, cusum_pos, cusum_neg, flag): hourly event counts
    per key with two-sided CUSUM statistics. ``slack_k`` and
    ``threshold_h`` are in units of the per-key population std (the
    usual k=0.5, h=4-5 operating point); ``flag`` is true where either
    side exceeds h*std. Both knobs must be exact at 2 decimals — they
    enter the EXACT decimal arithmetic the parity guarantee rests on."""
    _check_knobs(slack_k, threshold_h)
    observed = (
        df.select(
            F.col(key_col).alias("__key"),
            F.expr(f"(ts_ns div 1000) div {_US_PER_HOUR}").alias("hour"),
        )
        .groupBy("__key", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    # densify the per-key hour grid: hours with ZERO events must appear as
    # cnt=0 rows or the negative CUSUM side can never accumulate during a
    # total outage (a two-sided detector blind to drop-to-zero). The spine
    # is per-key min..max hour — bounded by the time range, not the data.
    spine = (
        observed.groupBy("__key")
        .agg(F.min("hour").alias("__h0"), F.max("hour").alias("__h1"))
        .select("__key", F.explode(F.sequence("__h0", "__h1")).alias("hour"))
    )
    hours = spine.join(observed, ["__key", "hour"], "left").select(
        "__key", "hour", F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt")
    )
    stats = hours.groupBy("__key").agg(
        F.round(F.avg("cnt"), 9).alias("__mu"),
        # population std from integer sums: sqrt(E[x^2] - E[x]^2)
        F.round(
            F.sqrt(
                F.avg(F.col("cnt") * F.col("cnt"))
                - F.avg("cnt") * F.avg("cnt")
            ),
            9,
        ).alias("__sd"),
    )
    w = Window.partitionBy("__key").orderBy("hour")
    wmin = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # ALL deviation arithmetic happens in exact DECIMAL: the 9-dp mu/sd
    # doubles cast back to decimal(18,9) losslessly (nearest double of a
    # 9-dp value is within 2^-50 of it), slack/threshold are 2-dp decimal
    # literals, so dev/cumsum/spos carry NO rounding at all. Rounding a
    # double anywhere here tie-splits between HALF_UP and half-even
    # engines — measured: slack_k * sd makes exact half-ulp ties in ~half
    # of all buckets because 0.5 * (odd 9th digit) lands on ...5.
    mu_d = F.col("__mu").cast("decimal(18,9)")
    sd_d = F.col("__sd").cast("decimal(18,9)")
    slack = F.lit(float(slack_k)).cast("decimal(4,2)")
    cnt_d = F.col("cnt").cast("decimal(18,3)")
    dev_pos = (cnt_d - mu_d - slack * sd_d).cast("decimal(38,11)")
    dev_neg = (-(cnt_d - mu_d) - slack * sd_d).cast("decimal(38,11)")
    # windows cannot nest: materialize the cumulative sums, then take the
    # running min in a second projection (both ride the SAME key-ordered
    # window partitioning — one shuffle, two window stages)
    cum = hours.join(F.broadcast(stats), "__key").select(
        "__key",
        "hour",
        "cnt",
        "__sd",
        F.sum(dev_pos).over(w).alias("__cpos"),
        F.sum(dev_neg).over(w).alias("__cneg"),
    )
    # clamp the running min with zero: S_t = c_t - min(0, min_{j<=t} c_j)
    # — without the clamp the statistic is understated by the first
    # cumulative deviation whenever the series OPENS in the anomalous
    # regime (prefix cumsum positive from t=1)
    zero = F.lit(0).cast("decimal(38,11)")
    s_pos = F.col("__cpos") - F.least(zero, F.min("__cpos").over(wmin))
    s_neg = F.col("__cneg") - F.least(zero, F.min("__cneg").over(wmin))
    thr = (
        F.lit(float(threshold_h)).cast("decimal(4,2)")
        * F.col("__sd").cast("decimal(18,9)")
    ).cast("decimal(38,11)")
    return (
        cum.select(
            F.col("__key").alias(key_col),
            "hour",
            "cnt",
            s_pos.cast("double").alias("cusum_pos"),
            s_neg.cast("double").alias("cusum_neg"),
            ((s_pos > thr) | (s_neg > thr)).alias("flag"),
        )
        .orderBy(key_col, "hour")
    )


def volume_cusum_sql(
    table: str,
    key_col: str = "event_type",
    slack_k: float = 0.5,
    threshold_h: float = 4.0,
) -> str:
    _check_knobs(slack_k, threshold_h)
    return f"""
WITH __observed AS (
  SELECT {key_col} AS key, epoch_us(ts) // {_US_PER_HOUR} AS hour,
         COUNT(*)::BIGINT AS cnt
  FROM {table} GROUP BY key, hour
),
__span AS (
  SELECT key, MIN(hour) AS h0, MAX(hour) AS h1 FROM __observed GROUP BY key
),
__spine AS (
  SELECT key, unnest(generate_series(h0, h1)) AS hour FROM __span
),
__hours AS (
  SELECT s.key, s.hour, COALESCE(o.cnt, 0)::BIGINT AS cnt
  FROM __spine s LEFT JOIN __observed o ON s.key = o.key AND s.hour = o.hour
),
__stats AS (
  SELECT key, CASE WHEN ABS(AVG(cnt)) >= 1e16 THEN CAST((AVG(cnt)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((AVG(cnt)) * CAST(ABS(AVG(cnt)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS mu,
         CASE WHEN ABS(sqrt(AVG(cnt * cnt) - AVG(cnt) * AVG(cnt))) >= 1e16 THEN CAST((sqrt(AVG(cnt * cnt) - AVG(cnt) * AVG(cnt))) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((sqrt(AVG(cnt * cnt) - AVG(cnt) * AVG(cnt))) * CAST(ABS(sqrt(AVG(cnt * cnt) - AVG(cnt) * AVG(cnt))) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS sd
  FROM __hours GROUP BY key
),
__dev AS (
  SELECT h.key, h.hour, h.cnt, s.mu, s.sd,
         CAST(CAST(h.cnt AS DECIMAL(18,3)) - CAST(s.mu AS DECIMAL(18,9))
              - CAST({float(slack_k)!r} AS DECIMAL(4,2))
                * CAST(s.sd AS DECIMAL(18,9)) AS DECIMAL(38,11)) AS dpos,
         CAST(-(CAST(h.cnt AS DECIMAL(18,3)) - CAST(s.mu AS DECIMAL(18,9)))
              - CAST({float(slack_k)!r} AS DECIMAL(4,2))
                * CAST(s.sd AS DECIMAL(18,9)) AS DECIMAL(38,11)) AS dneg
  FROM __hours h JOIN __stats s ON h.key = s.key
),
__cum AS (
  SELECT key, hour, cnt, sd,
         SUM(dpos) OVER w AS cpos,
         SUM(dneg) OVER w AS cneg
  FROM __dev
  WINDOW w AS (PARTITION BY key ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
__s AS (
  -- zero-clamped running min (S0 = 0); CASE instead of LEAST because
  -- DuckDB's LEAST(DECIMAL, DECIMAL) promotes to DOUBLE and breaks the
  -- exact-decimal parity contract
  SELECT key, hour, cnt, sd,
         cpos - CASE WHEN MIN(cpos) OVER w < 0 THEN MIN(cpos) OVER w
                     ELSE CAST(0 AS DECIMAL(38,11)) END AS spos,
         cneg - CASE WHEN MIN(cneg) OVER w < 0 THEN MIN(cneg) OVER w
                     ELSE CAST(0 AS DECIMAL(38,11)) END AS sneg
  FROM __cum
  WINDOW w AS (PARTITION BY key ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT key AS {key_col}, hour, cnt,
       CAST(spos AS DOUBLE) AS cusum_pos, CAST(sneg AS DOUBLE) AS cusum_neg,
       (spos > CAST(CAST({float(threshold_h)!r} AS DECIMAL(4,2))
                    * CAST(sd AS DECIMAL(18,9)) AS DECIMAL(38,11))
        OR sneg > CAST(CAST({float(threshold_h)!r} AS DECIMAL(4,2))
                       * CAST(sd AS DECIMAL(18,9)) AS DECIMAL(38,11)))
         AS flag
FROM __s ORDER BY {key_col}, hour
"""


def ks_drift(
    df: DataFrame,
    value_col: str,
    a_pred,
    b_pred,
) -> DataFrame:
    """One-row two-sample Kolmogorov-Smirnov drift test between the rows
    matching ``a_pred`` and ``b_pred``: (n_a, n_b, ks_num, ks_den, ks_d,
    at_value) where ks_d = max over the merged support of
    |F_a(x) - F_b(x)| and ``at_value`` is the smallest support point
    attaining it. This is the distribution-shift gate run between corpus
    slices (yesterday vs today, source A vs B) before trusting mixing
    weights or quality thresholds fit on the old slice.

    EXACT by integer cross-multiplication: |c_a/n_a - c_b/n_b| compares
    as |c_a*n_b - c_b*n_a| over the common denominator n_a*n_b — every
    comparison and the argmax are BIGINT arithmetic, so both engines
    agree bit-for-bit; the single ks_num/ks_den division to double at the
    end is correctly rounded identically.

    Scale shape: one conditional-count aggregation on the value (hot
    values spread by the upstream groupBy), one ordered window over the
    DISTINCT-value table (support-sized, not corpus-sized — pre-bucket
    the value for unbounded-support data, exactly as DISTRIBUTION PMF
    does), one 1-row argmax reduce."""
    counts = (
        df.select(
            F.col(value_col).alias("__v"),
            F.when(a_pred, 1).otherwise(0).alias("__a"),
            F.when(b_pred, 1).otherwise(0).alias("__b"),
        )
        .where((F.col("__a") == 1) | (F.col("__b") == 1))
        .groupBy("__v")
        .agg(
            F.sum("__a").cast("long").alias("__ca"),
            F.sum("__b").cast("long").alias("__cb"),
        )
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "__v",
        F.sum("__ca").over(w).alias("__cuma"),
        F.sum("__cb").over(w).alias("__cumb"),
    )
    totals = counts.agg(
        F.sum("__ca").cast("long").alias("n_a"),
        F.sum("__cb").cast("long").alias("n_b"),
    )
    diffs = cum.crossJoin(F.broadcast(totals)).select(
        "__v",
        "n_a",
        "n_b",
        F.abs(
            F.col("__cuma") * F.col("n_b") - F.col("__cumb") * F.col("n_a")
        ).alias("__num"),
    )
    return (
        diffs.orderBy(F.desc("__num"), "__v")
        .limit(1)
        .select(
            "n_a",
            "n_b",
            F.col("__num").alias("ks_num"),
            (F.col("n_a") * F.col("n_b")).alias("ks_den"),
            (F.col("__num") / (F.col("n_a") * F.col("n_b"))).alias("ks_d"),
            F.col("__v").alias("at_value"),
        )
    )


def ks_drift_sql(table: str, value_col: str, a_pred_sql: str, b_pred_sql: str) -> str:
    return f"""
WITH __counts AS (
  SELECT {value_col} AS v,
         SUM(CASE WHEN {a_pred_sql} THEN 1 ELSE 0 END)::BIGINT AS ca,
         SUM(CASE WHEN {b_pred_sql} THEN 1 ELSE 0 END)::BIGINT AS cb
  FROM {table}
  WHERE ({a_pred_sql}) OR ({b_pred_sql})
  GROUP BY v
),
__cum AS (
  SELECT v,
         CAST(SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS cuma,
         CAST(SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS cumb
  FROM __counts
),
__totals AS (
  SELECT SUM(ca)::BIGINT AS n_a, SUM(cb)::BIGINT AS n_b FROM __counts
),
__diffs AS (
  SELECT c.v, t.n_a, t.n_b,
         CAST(abs(c.cuma * t.n_b - c.cumb * t.n_a) AS BIGINT) AS num
  FROM __cum c CROSS JOIN __totals t
)
SELECT n_a, n_b, num AS ks_num, CAST(n_a * n_b AS BIGINT) AS ks_den,
       CAST(num AS DOUBLE) / (n_a * n_b) AS ks_d, v AS at_value
FROM __diffs ORDER BY num DESC, v LIMIT 1
"""


def robust_outliers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: float = 3.5,
    round_to: int = 6,
) -> DataFrame:
    """(key, n, med, mad, n_outliers, outlier_rate): per-key robust
    outlier accounting via the modified Z-score (Iglewicz & Hoaglin 1993):
    flag x where 0.6745 * |x - median| > k * MAD. Median/MAD resist the
    contamination that wrecks mean/stddev-based detectors — the standard
    pre-training numeric-column sanity pass.

    Plan: three scans, each ending in a small key-keyed aggregation
    (median pass, MAD pass over deviations, flag-count pass); the per-key
    median/MAD frames are key-cardinality-sized and broadcast back, so
    nothing shuffles the raw values twice. Median/MAD are 9dp-rounded
    before the threshold comparison so the flag boundary is
    engine-independent (exact percentile, linear interpolation — the
    quantile_cont definition, same as operators/group.py)."""
    v = F.col(value_col).cast("double")
    key = F.col(key_col).alias("key")
    base = df.select(key, v.alias("__v"))
    med = base.groupBy("key").agg(
        F.round(F.percentile(F.col("__v"), F.lit(0.5)), 9).alias("__med"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    with_med = base.join(F.broadcast(med), "key")
    mad = (
        with_med.select("key", F.abs(F.col("__v") - F.col("__med")).alias("__dev"))
        .groupBy("key")
        .agg(F.round(F.percentile(F.col("__dev"), F.lit(0.5)), 9).alias("__mad"))
    )
    flagged = (
        with_med.join(F.broadcast(mad), "key")
        .select(
            "key", "n", "__med", "__mad",
            (
                F.lit(0.6745) * F.abs(F.col("__v") - F.col("__med"))
                > F.lit(float(k)) * F.col("__mad")
            ).cast("long").alias("__out"),
        )
        .groupBy("key")
        .agg(
            F.first("n").alias("n"),
            F.round(F.first("__med"), round_to).alias("med"),
            F.round(F.first("__mad"), round_to).alias("mad"),
            F.sum("__out").cast("long").alias("n_outliers"),
        )
    )
    return flagged.select(
        "key", "n", "med", "mad", "n_outliers",
        F.round(F.col("n_outliers") / F.col("n"), round_to).alias("outlier_rate"),
    ).orderBy("key")


def robust_outliers_sql(
    table: str,
    key_col: str,
    value_col: str,
    k: float = 3.5,
    round_to: int = 6,
) -> str:
    return f"""
WITH __b AS (
  SELECT {key_col} AS key, CAST({value_col} AS DOUBLE) AS v FROM {table}
),
__med AS (
  SELECT key, CASE WHEN ABS(quantile_cont(v, 0.5)) >= 1e16 THEN CAST((quantile_cont(v, 0.5)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((quantile_cont(v, 0.5)) * CAST(ABS(quantile_cont(v, 0.5)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS med,
         COUNT(*)::BIGINT AS n
  FROM __b GROUP BY key
),
__mad AS (
  SELECT b.key, CASE WHEN ABS(quantile_cont(abs(b.v - m.med), 0.5)) >= 1e16 THEN CAST((quantile_cont(abs(b.v - m.med), 0.5)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((quantile_cont(abs(b.v - m.med), 0.5)) * CAST(ABS(quantile_cont(abs(b.v - m.med), 0.5)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS mad
  FROM __b b JOIN __med m ON b.key = m.key GROUP BY b.key
),
__f AS (
  SELECT b.key, m.n, m.med, d.mad,
         CASE WHEN 0.6745 * abs(b.v - m.med) > {float(k)!r} * d.mad
              THEN 1 ELSE 0 END AS is_out
  FROM __b b JOIN __med m ON b.key = m.key JOIN __mad d ON b.key = d.key
)
SELECT key, ANY_VALUE(n) AS n,
       CASE WHEN ABS(ANY_VALUE(med)) >= 1e16 THEN CAST((ANY_VALUE(med)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((ANY_VALUE(med)) * CAST(ABS(ANY_VALUE(med)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS med,
       CASE WHEN ABS(ANY_VALUE(mad)) >= 1e16 THEN CAST((ANY_VALUE(mad)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((ANY_VALUE(mad)) * CAST(ABS(ANY_VALUE(mad)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS mad,
       CAST(SUM(is_out) AS BIGINT) AS n_outliers,
       CASE WHEN ABS(CAST(SUM(is_out) AS DOUBLE) / ANY_VALUE(n)) >= 1e16 THEN CAST((CAST(SUM(is_out) AS DOUBLE) / ANY_VALUE(n)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((CAST(SUM(is_out) AS DOUBLE) / ANY_VALUE(n)) * CAST(ABS(CAST(SUM(is_out) AS DOUBLE) / ANY_VALUE(n)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END
         AS outlier_rate
FROM __f GROUP BY key ORDER BY key
"""


def chi2_drift(
    df: DataFrame,
    cat_col: str,
    a_pred: F.Column,
    b_pred: F.Column,
    round_to: int = 6,
) -> DataFrame:
    """(n_a, n_b, n_cats, chi2): two-sample chi-squared homogeneity
    statistic between slices A and B over a CATEGORICAL column — the
    pairing of ``ks_drift`` (numeric) for type/source/label drift.
    chi2 = sum over cells of (obs - exp)^2 / exp with expected counts
    from the pooled distribution; categories absent from one slice get
    obs=0 (never dropped — that IS the drift signal).

    Plan: one category-keyed conditional-count aggregation (category
    cardinality rows), then a 1-row total — nothing scales with row
    count past the first scan. Per-cell terms are 9dp-rounded and summed
    in DECIMAL so the statistic is partitioning/engine-independent."""
    counts = (
        df.where(a_pred | b_pred)
        .groupBy(F.col(cat_col).alias("__c"))
        .agg(
            F.sum(F.when(a_pred, 1).otherwise(0)).cast("long").alias("ca"),
            F.sum(F.when(b_pred, 1).otherwise(0)).cast("long").alias("cb"),
        )
    )
    tot = counts.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        F.count(F.lit(1)).cast("long").alias("n_cats"),
    )
    cells = counts.crossJoin(F.broadcast(tot))
    # expected cell count: (row total) * (col total) / grand total
    grand = (F.col("n_a") + F.col("n_b")).cast("double")
    ea = (F.col("ca") + F.col("cb")) * F.col("n_a") / grand
    eb = (F.col("ca") + F.col("cb")) * F.col("n_b") / grand
    term = F.round(
        (F.col("ca") - ea) * (F.col("ca") - ea) / ea
        + (F.col("cb") - eb) * (F.col("cb") - eb) / eb,
        9,
    ).cast("decimal(38,9)")
    return (
        cells.select("n_a", "n_b", "n_cats", term.alias("__t"))
        .groupBy("n_a", "n_b", "n_cats")
        .agg(F.round(F.sum("__t").cast("double"), round_to).alias("chi2"))
    )


def chi2_drift_sql(
    table: str,
    cat_col: str,
    a_pred_sql: str,
    b_pred_sql: str,
    round_to: int = 6,
) -> str:
    return f"""
WITH __counts AS (
  SELECT {cat_col} AS c,
         SUM(CASE WHEN {a_pred_sql} THEN 1 ELSE 0 END)::BIGINT AS ca,
         SUM(CASE WHEN {b_pred_sql} THEN 1 ELSE 0 END)::BIGINT AS cb
  FROM {table}
  WHERE ({a_pred_sql}) OR ({b_pred_sql})
  GROUP BY c
),
__tot AS (
  SELECT SUM(ca)::BIGINT AS n_a, SUM(cb)::BIGINT AS n_b,
         COUNT(*)::BIGINT AS n_cats
  FROM __counts
),
__cells AS (
  SELECT c.ca, c.cb, t.n_a, t.n_b, t.n_cats,
         (c.ca + c.cb) * t.n_a / CAST(t.n_a + t.n_b AS DOUBLE) AS ea,
         (c.ca + c.cb) * t.n_b / CAST(t.n_a + t.n_b AS DOUBLE) AS eb
  FROM __counts c CROSS JOIN __tot t
)
SELECT n_a, n_b, n_cats,
       CAST(CAST(CAST(CAST((CAST(SUM(CAST(CASE WHEN ABS((ca - ea) * (ca - ea) / ea + (cb - eb) * (cb - eb) / eb) >= 1e16 THEN CAST(((ca - ea) * (ca - ea) / ea + (cb - eb) * (cb - eb) / eb) AS DOUBLE) ELSE CAST(CAST(CAST(CAST(((ca - ea) * (ca - ea) / ea + (cb - eb) * (cb - eb) / eb) * CAST(ABS((ca - ea) * (ca - ea) / ea + (cb - eb) * (cb - eb) / eb) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END
         AS DECIMAL(38,9))) AS DOUBLE)) * CAST(ABS(CAST(SUM(CAST(CASE WHEN ABS((ca - ea) * (ca - ea) / ea + (cb - eb) * (cb - eb) / eb) >= 1e16 THEN CAST(((ca - ea) * (ca - ea) / ea + (cb - eb) * (cb - eb) / eb) AS DOUBLE) ELSE CAST(CAST(CAST(CAST(((ca - ea) * (ca - ea) / ea + (cb - eb) * (cb - eb) / eb) * CAST(ABS((ca - ea) * (ca - ea) / ea + (cb - eb) * (cb - eb) / eb) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END
         AS DECIMAL(38,9))) AS DOUBLE)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS chi2
FROM __cells GROUP BY n_a, n_b, n_cats
"""


def psi_drift(
    df: DataFrame,
    value_col: str,
    a_pred: F.Column,
    b_pred: F.Column,
    lo: float,
    hi: float,
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """(bin, p_a, p_b, psi_term, psi): population stability index between
    slices A (reference) and B (current) over a fixed [lo, hi) equal-width
    binning of ``value_col`` — the standard feature-drift monitor
    (PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted). Values outside
    [lo, hi) clamp into the edge bins so mass is never silently dropped;
    empty bins get the usual 0.5-count smoothing so the log term is
    finite. Every row repeats the total ``psi`` (sum of terms).

    Plan: one bin-keyed conditional-count aggregation over a scan
    expression bin index, a broadcast 1-row total, one n_bins-row window
    sum — nothing scales past the scan. Terms are 9dp-rounded and
    decimal-summed (engine-independent)."""
    if n_bins < 2:
        raise ValueError(f"need n_bins >= 2, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    width = (float(hi) - float(lo)) / n_bins
    v = F.col(value_col).cast("double")
    raw_bin = F.floor((v - F.lit(float(lo))) / F.lit(width)).cast("long")
    bin_idx = F.least(F.greatest(raw_bin, F.lit(0)), F.lit(int(n_bins - 1)))
    counts = (
        df.where(a_pred | b_pred)
        .select(bin_idx.alias("bin"), a_pred.alias("__a"), b_pred.alias("__b"))
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("__a"), 1).otherwise(0)).cast("long").alias("ca"),
            F.sum(F.when(F.col("__b"), 1).otherwise(0)).cast("long").alias("cb"),
        )
    )
    # densify: every bin 0..n_bins-1 appears even with zero mass
    spine = df.sparkSession.range(0, int(n_bins)).select(F.col("id").alias("bin"))
    dense = spine.join(counts, "bin", "left").select(
        "bin",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    tot = dense.agg(
        F.sum("ca").cast("double").alias("ta"), F.sum("cb").cast("double").alias("tb")
    )
    j = dense.crossJoin(F.broadcast(tot))
    # 0.5-count smoothing on empty cells keeps ln finite without moving
    # non-empty cells
    pa = F.when(F.col("ca") > 0, F.col("ca") / F.col("ta")).otherwise(
        F.lit(0.5) / F.col("ta")
    )
    pb = F.when(F.col("cb") > 0, F.col("cb") / F.col("tb")).otherwise(
        F.lit(0.5) / F.col("tb")
    )
    term = F.round((pa - pb) * F.log(pa / pb), 9)
    from pyspark.sql import Window

    w = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        j.select(
            "bin",
            F.round(pa, round_to).alias("p_a"),
            F.round(pb, round_to).alias("p_b"),
            F.round(term, round_to).alias("psi_term"),
            F.round(
                F.sum(term.cast("decimal(38,9)")).over(w).cast("double"), round_to
            ).alias("psi"),
        )
        .orderBy("bin")
    )


def psi_drift_sql(
    table: str,
    value_col: str,
    a_pred_sql: str,
    b_pred_sql: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    round_to: int = 6,
) -> str:
    if n_bins < 2:
        raise ValueError(f"need n_bins >= 2, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    width = (float(hi) - float(lo)) / n_bins
    return f"""
WITH __counts AS (
  SELECT LEAST(GREATEST(
           CAST(floor((CAST({value_col} AS DOUBLE) - {float(lo)!r})
                      / {width!r}) AS BIGINT), 0), {int(n_bins) - 1}) AS bin,
         SUM(CASE WHEN {a_pred_sql} THEN 1 ELSE 0 END)::BIGINT AS ca,
         SUM(CASE WHEN {b_pred_sql} THEN 1 ELSE 0 END)::BIGINT AS cb
  FROM {table}
  WHERE ({a_pred_sql}) OR ({b_pred_sql})
  GROUP BY bin
),
__dense AS (
  SELECT s.bin, COALESCE(c.ca, 0) AS ca, COALESCE(c.cb, 0) AS cb
  FROM (SELECT unnest(range(0, {int(n_bins)})) AS bin) s
  LEFT JOIN __counts c ON s.bin = c.bin
),
__tot AS (
  SELECT CAST(SUM(ca) AS DOUBLE) AS ta, CAST(SUM(cb) AS DOUBLE) AS tb
  FROM __dense
),
__p AS (
  SELECT d.bin,
         CASE WHEN d.ca > 0 THEN d.ca / t.ta ELSE 0.5 / t.ta END AS pa,
         CASE WHEN d.cb > 0 THEN d.cb / t.tb ELSE 0.5 / t.tb END AS pb
  FROM __dense d CROSS JOIN __tot t
),
__terms AS (
  SELECT bin, pa, pb, CASE WHEN ABS((pa - pb) * ln(pa / pb)) >= 1e16 THEN CAST(((pa - pb) * ln(pa / pb)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST(((pa - pb) * ln(pa / pb)) * CAST(ABS((pa - pb) * ln(pa / pb)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS term FROM __p
)
SELECT bin, CASE WHEN ABS(pa) >= 1e16 THEN CAST((pa) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((pa) * CAST(ABS(pa) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS p_a, CASE WHEN ABS(pb) >= 1e16 THEN CAST((pb) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((pb) * CAST(ABS(pb) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS p_b,
       CASE WHEN ABS(term) >= 1e16 THEN CAST((term) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((term) * CAST(ABS(term) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS psi_term,
       CAST(CAST(CAST(CAST((CAST((SELECT SUM(CAST(term AS DECIMAL(38,9))) FROM __terms)
             AS DOUBLE)) * CAST(ABS(CAST((SELECT SUM(CAST(term AS DECIMAL(38,9))) FROM __terms)
             AS DOUBLE)) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS psi
FROM __terms ORDER BY bin
"""


def centroid_drift(
    df: DataFrame,
    vec_col: str,
    a_pred: F.Column,
    b_pred: F.Column,
    round_to: int = 6,
) -> DataFrame:
    """(n_a, n_b, cos_centroids, l2_centroids): SEMANTIC drift between
    two corpus slices — cosine and L2 distance between the slices' mean
    embedding vectors. Completes the drift family: KS (numeric column),
    chi-squared (categorical), PSI (binned feature), and this for the
    representation space itself (a new crawl whose centroid swings away
    from the reference slice changed in meaning, not just in surface
    statistics — the SemDeDup/embedding-curation signal at corpus level).

    Plan: one posexplode to (dim, value), one dim-keyed aggregation with
    conditional decimal-exact sums per slice (64 rows out), one 1-row
    reduction computing the distances from 9dp-rounded per-dim means —
    partitioning/engine-independent end to end."""
    base = df.where(a_pred | b_pred).select(
        a_pred.alias("__a"),
        b_pred.alias("__b"),
        F.posexplode(F.col(vec_col)).alias("dim", "__v"),
    )
    # entry quantize via the TEXT hop: a direct float/double→decimal
    # cast rounds the shortest repr HALF_UP in Spark but the binary
    # value in DuckDB — divergence surfaced by the centroid_matrix
    # sibling (this operator had the same latent class)
    _vq9 = (
        F.col("__v").cast("double").cast("string").cast("decimal(18,9)")
    )
    dims = (
        base.groupBy("dim")
        .agg(
            F.sum(F.when(F.col("__a"), _vq9).cast("decimal(38,9)"))
            .alias("__sa"),
            F.sum(F.when(F.col("__b"), _vq9).cast("decimal(38,9)"))
            .alias("__sb"),
            F.sum(F.when(F.col("__a"), 1).otherwise(0)).cast("long").alias("__na"),
            F.sum(F.when(F.col("__b"), 1).otherwise(0)).cast("long").alias("__nb"),
        )
        .select(
            "dim", "__na", "__nb",
            F.round(F.col("__sa").cast("string").cast("double") / F.col("__na"), 9).alias("__ma"),
            F.round(F.col("__sb").cast("string").cast("double") / F.col("__nb"), 9).alias("__mb"),
        )
    )
    return dims.agg(
        F.max("__na").alias("n_a"),
        F.max("__nb").alias("n_b"),
        F.round(
            F.sum(F.col("__ma") * F.col("__mb"))
            / F.sqrt(F.sum(F.col("__ma") * F.col("__ma")))
            / F.sqrt(F.sum(F.col("__mb") * F.col("__mb"))),
            round_to,
        ).alias("cos_centroids"),
        F.round(
            F.sqrt(
                F.sum(
                    (F.col("__ma") - F.col("__mb"))
                    * (F.col("__ma") - F.col("__mb"))
                )
            ),
            round_to,
        ).alias("l2_centroids"),
    )


def centroid_drift_sql(
    table: str,
    vec_col: str,
    a_pred_sql: str,
    b_pred_sql: str,
    round_to: int = 6,
) -> str:
    return f"""
WITH __e AS (
  SELECT ({a_pred_sql}) AS a, ({b_pred_sql}) AS b,
         CAST(i - 1 AS INTEGER) AS dim,
         CAST(({vec_col})[i] AS DOUBLE) AS v
  FROM {table}, UNNEST(generate_series(1, len({vec_col}))) AS __u(i)
  WHERE ({a_pred_sql}) OR ({b_pred_sql})
),
__d AS (
  SELECT dim,
         CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         CAST(CAST(CAST(CAST((CAST(CAST(SUM(CAST(CASE WHEN a THEN
                 CAST(CAST((CAST(v AS DOUBLE)) * CAST(ABS(CAST(v AS DOUBLE)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(18,9))
               END AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE)
               / SUM(CASE WHEN a THEN 1 ELSE 0 END)) * CAST(ABS(CAST(CAST(SUM(CAST(CASE WHEN a THEN
                 CAST(CAST((CAST(v AS DOUBLE)) * CAST(ABS(CAST(v AS DOUBLE)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(18,9))
               END AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE)
               / SUM(CASE WHEN a THEN 1 ELSE 0 END)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) AS ma,
         CAST(CAST(CAST(CAST((CAST(CAST(SUM(CAST(CASE WHEN b THEN
                 CAST(CAST((CAST(v AS DOUBLE)) * CAST(ABS(CAST(v AS DOUBLE)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(18,9))
               END AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE)
               / SUM(CASE WHEN b THEN 1 ELSE 0 END)) * CAST(ABS(CAST(CAST(SUM(CAST(CASE WHEN b THEN
                 CAST(CAST((CAST(v AS DOUBLE)) * CAST(ABS(CAST(v AS DOUBLE)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(18,9))
               END AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE)
               / SUM(CASE WHEN b THEN 1 ELSE 0 END)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) AS mb
  FROM __e GROUP BY dim
)
SELECT MAX(na) AS n_a, MAX(nb) AS n_b,
       CASE WHEN ABS(SUM(ma * mb) / sqrt(SUM(ma * ma)) / sqrt(SUM(mb * mb))) >= 1e16 THEN CAST((SUM(ma * mb) / sqrt(SUM(ma * ma)) / sqrt(SUM(mb * mb))) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((SUM(ma * mb) / sqrt(SUM(ma * ma)) / sqrt(SUM(mb * mb))) * CAST(ABS(SUM(ma * mb) / sqrt(SUM(ma * ma)) / sqrt(SUM(mb * mb))) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS cos_centroids,
       CASE WHEN ABS(sqrt(SUM((ma - mb) * (ma - mb)))) >= 1e16 THEN CAST((sqrt(SUM((ma - mb) * (ma - mb)))) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((sqrt(SUM((ma - mb) * (ma - mb)))) * CAST(ABS(sqrt(SUM((ma - mb) * (ma - mb)))) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS l2_centroids
FROM __d
"""


def ewma_monitor(
    df: DataFrame,
    key_col: str = "event_type",
    lam_num: int = 1,
    lam_den: int = 5,
    limit_l: float = 3.0,
) -> DataFrame:
    """EWMA control chart over hourly event counts per key (Roberts
    Technometrics 1959; Lucas & Saccucci 1990): ``(key, hour, cnt, ewma,
    mu, sd, ucl, lcl, outside)`` on the densified hour spine, ordered by
    (key, hour). ``ewma`` is the recursion z_t = λ·x_t + (1−λ)·z_{t−1}
    seeded at z_0 = x_0 with λ = lam_num/lam_den; the control limits are
    the ASYMPTOTIC ones, μ ± L·σ·sqrt(λ/(2−λ)) (the steady-state form —
    the finite-t correction needs (1−λ)^{2t}, and a float pow is not
    portable across engines; for series longer than ~3/λ hours the two
    are indistinguishable, and flagging during the first hours of a
    monitor's life is noise anyway).

    Engine parity: the recursion runs in INTEGER fixed point — z carries
    nano-counts (×10⁹) and each step is
    ``z = (2·(lam_num·x·10⁹ + (lam_den−lam_num)·z) + lam_den)
    div (2·lam_den)`` (exact half-up rational rounding, pure int64) — a
    float recursion would compound 1-ulp divergence, and a windowed
    formulation reassociates (the km_survival lesson). The Spark side is
    one bounded applyInPandas loop per key; the DuckDB twin steps the
    identical integers through a recursive CTE. μ/σ follow the CUSUM
    9-dp moment convention; the final double conversions are text-hops
    of exact integers, so both engines compare identical doubles at the
    limit boundary.

    Scale posture (100 TB): the first aggregation collapses raw events
    to (key, hour) cells; the per-key sequential pass runs on the
    span-bounded spine (hours, not events), one shuffle on the key.
    Counts up to ~2·10⁹ per cell stay inside int64 in the recursion.
    """
    if lam_den < 1 or lam_num < 1 or lam_num >= lam_den:
        raise ValueError(f"need 0 < lam_num < lam_den, got {lam_num}/{lam_den}")
    if round(limit_l, 2) != limit_l:
        raise ValueError(f"limit_l must be exact at 2 decimals, got {limit_l}")
    scale = 10**9
    observed = (
        df.select(
            F.col(key_col).alias("__key"),
            F.expr(f"(ts_ns div 1000) div {_US_PER_HOUR}").alias("hour"),
        )
        .groupBy("__key", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    spine = (
        observed.groupBy("__key")
        .agg(F.min("hour").alias("__h0"), F.max("hour").alias("__h1"))
        .select("__key", F.explode(F.sequence("__h0", "__h1")).alias("hour"))
    )
    hours = spine.join(observed, ["__key", "hour"], "left").select(
        "__key", "hour", F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt")
    )
    # the ONE corpus-derived frame; moments + recursion both consume it
    hours = hours.localCheckpoint()
    stats = hours.groupBy("__key").agg(
        F.round(F.avg("cnt"), 9).alias("__mu"),
        F.round(
            F.sqrt(
                F.avg(F.col("cnt") * F.col("cnt"))
                - F.avg("cnt") * F.avg("cnt")
            ),
            9,
        ).alias("__sd"),
    )
    ln, ld = int(lam_num), int(lam_den)

    def rec(pdf):
        pdf = pdf.sort_values("hour", kind="mergesort").reset_index(drop=True)
        z, out = None, []
        for x in pdf["cnt"]:
            xi = int(x) * scale
            if z is None:
                z = xi
            else:
                # exact half-up rational rounding in pure ints — the
                # recursive-CTE twin runs these same integers
                z = (2 * (ln * xi + (ld - ln) * z) + ld) // (2 * ld)
            out.append(z)
        pdf["__z"] = out
        return pdf

    walked = hours.groupBy("__key").applyInPandas(
        rec, "__key string, hour long, cnt long, __z long"
    )
    lam = float(ln) / float(ld)
    width = F.lit(float(limit_l)) * F.col("__sd") * F.lit(
        math.sqrt(lam / (2.0 - lam))
    )
    ewma_d = F.col("__z").cast("string").cast("double") / F.lit(float(scale))
    return (
        walked.join(F.broadcast(stats), "__key")
        .select(
            F.col("__key").alias(key_col),
            "hour",
            "cnt",
            ewma_d.alias("ewma"),
            F.col("__mu").alias("mu"),
            F.col("__sd").alias("sd"),
            (F.col("__mu") + width).alias("ucl"),
            (F.col("__mu") - width).alias("lcl"),
            (
                (ewma_d > F.col("__mu") + width)
                | (ewma_d < F.col("__mu") - width)
            ).alias("outside"),
        )
        .orderBy(key_col, "hour")
    )


def ewma_monitor_sql(
    table: str,
    key_col: str = "event_type",
    lam_num: int = 1,
    lam_den: int = 5,
    limit_l: float = 3.0,
) -> str:
    if lam_den < 1 or lam_num < 1 or lam_num >= lam_den:
        raise ValueError(f"need 0 < lam_num < lam_den, got {lam_num}/{lam_den}")
    if round(limit_l, 2) != limit_l:
        raise ValueError(f"limit_l must be exact at 2 decimals, got {limit_l}")
    import math as _math

    ln, ld = int(lam_num), int(lam_den)
    lam = float(ln) / float(ld)
    factor = repr(_math.sqrt(lam / (2.0 - lam)))
    return f"""
WITH RECURSIVE __o AS (
  SELECT {key_col} AS key, epoch_us(ts) // {_US_PER_HOUR} AS hour,
         COUNT(*)::BIGINT AS cnt
  FROM {table} GROUP BY 1, 2
),
__spine AS (
  SELECT key, unnest(generate_series(h0, h1)) AS hour
  FROM (SELECT key, MIN(hour) AS h0, MAX(hour) AS h1 FROM __o GROUP BY key)
),
__h AS (
  SELECT s.key, s.hour, COALESCE(o.cnt, 0)::BIGINT AS cnt
  FROM __spine s LEFT JOIN __o o ON s.key = o.key AND s.hour = o.hour
),
__stats AS (
  SELECT key, CASE WHEN ABS(AVG(cnt)) >= 1e16 THEN CAST((AVG(cnt)) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((AVG(cnt)) * CAST(ABS(AVG(cnt)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS mu,
         CASE WHEN ABS(sqrt(AVG(cnt * cnt) - AVG(cnt) * AVG(cnt))) >= 1e16 THEN CAST((sqrt(AVG(cnt * cnt) - AVG(cnt) * AVG(cnt))) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((sqrt(AVG(cnt * cnt) - AVG(cnt) * AVG(cnt))) * CAST(ABS(sqrt(AVG(cnt * cnt) - AVG(cnt) * AVG(cnt))) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE) END AS sd
  FROM __h GROUP BY key
),
__nb AS (
  SELECT key, hour, cnt,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY hour) AS rn
  FROM __h
),
__rec AS (
  SELECT key, hour, cnt, rn, cnt * {10**9} AS z
  FROM __nb WHERE rn = 1
  UNION ALL
  SELECT b.key, b.hour, b.cnt, b.rn,
         (2 * ({ln} * b.cnt * {10**9} + {ld - ln} * r.z) + {ld}) // (2 * {ld})
  FROM __nb b JOIN __rec r ON b.key = r.key AND b.rn = r.rn + 1
),
__f AS (
  SELECT key, hour, cnt,
         CAST(CAST(z AS VARCHAR) AS DOUBLE) / {float(10**9)!r} AS ewma,
         mu, sd,
         mu + {float(limit_l)!r} * sd * {factor} AS ucl,
         mu - {float(limit_l)!r} * sd * {factor} AS lcl
  FROM __rec JOIN __stats USING (key)
)
SELECT key AS {key_col}, hour, cnt, ewma, mu, sd, ucl, lcl,
       (ewma > ucl OR ewma < lcl) AS outside
FROM __f
ORDER BY {key_col}, hour
"""


def binseg_changepoint(df: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Single best retrospective changepoint per key (one step of binary
    segmentation, Scott & Knott 1974 / the AMOC special case): over the
    densified hourly count series, the split maximizing the standardized
    between-segment separation

        stat(t) = sqrt(t·(n−t)/n) · |mean(x[..t]) − mean(x[t+1..])|

    computed for every prefix boundary from the integer PREFIX SUMS (one
    cumulative window — no per-split rescans). Output per key:
    ``(key, n_hours, split_hour, stat, mean_pre, mean_post)`` — the
    boundary is the LAST hour of the pre segment (absolute epoch hour),
    ties take the earliest split. CUSUM (volume_cusum) detects the shift
    online; this is the offline "when did it change" answer on the same
    series. Keys with fewer than 2 observed hours are omitted (no valid
    split exists).

    Engine parity: prefix sums are integers; each candidate's statistic
    is a fixed IEEE expression of those integers with identical
    association in both dialects, so the (stat DESC, t ASC) argmax picks
    the same split everywhere — no rounding needed anywhere (the
    deliberately-unrounded bootstrap convention).

    Scale posture (100 TB): one corpus collapse to (key, hour) cells;
    everything downstream is span-bounded per key (the cumulative window
    and the argmax both ride one key-ordered partition).
    """
    observed = (
        df.select(
            F.col(key_col).alias("__key"),
            F.expr(f"(ts_ns div 1000) div {_US_PER_HOUR}").alias("hour"),
        )
        .groupBy("__key", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    spine = (
        observed.groupBy("__key")
        .agg(F.min("hour").alias("__h0"), F.max("hour").alias("__h1"))
        .select("__key", F.explode(F.sequence("__h0", "__h1")).alias("hour"))
    )
    hours = spine.join(observed, ["__key", "hour"], "left").select(
        "__key", "hour", F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt")
    )
    w = Window.partitionBy("__key").orderBy("hour")
    wn = Window.partitionBy("__key")
    pre = hours.select(
        "__key",
        "hour",
        F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("__s"),
        F.row_number().over(w).cast("long").alias("__t"),
        F.count(F.lit(1)).over(wn).cast("long").alias("__n"),
        F.sum("cnt").over(wn).cast("long").alias("__tot"),
    ).where(F.col("__t") < F.col("__n"))
    t_d = F.col("__t").cast("double")
    n_d = F.col("__n").cast("double")
    m1 = F.col("__s").cast("double") / t_d
    m2 = (F.col("__tot") - F.col("__s")).cast("double") / (n_d - t_d)
    stat = F.sqrt((t_d * (n_d - t_d)) / n_d) * F.abs(m1 - m2)
    scored = pre.select(
        "__key",
        "hour",
        "__n",
        stat.alias("__stat"),
        m1.alias("__m1"),
        m2.alias("__m2"),
    )
    ranked = scored.withColumn(
        "__r",
        F.row_number().over(
            Window.partitionBy("__key").orderBy(
                F.desc_nulls_last("__stat"), F.asc("hour")
            )
        ),
    )
    return (
        ranked.where(F.col("__r") == 1)
        .select(
            F.col("__key").alias(key_col),
            F.col("__n").alias("n_hours"),
            F.col("hour").alias("split_hour"),
            F.col("__stat").alias("stat"),
            F.col("__m1").alias("mean_pre"),
            F.col("__m2").alias("mean_post"),
        )
        .orderBy(key_col)
    )


def binseg_changepoint_sql(table: str, key_col: str = "event_type") -> str:
    return f"""
WITH __o AS (
  SELECT {key_col} AS key, epoch_us(ts) // {_US_PER_HOUR} AS hour,
         COUNT(*)::BIGINT AS cnt
  FROM {table} GROUP BY 1, 2
),
__spine AS (
  SELECT key, unnest(generate_series(h0, h1)) AS hour
  FROM (SELECT key, MIN(hour) AS h0, MAX(hour) AS h1 FROM __o GROUP BY key)
),
__h AS (
  SELECT s.key, s.hour, COALESCE(o.cnt, 0)::BIGINT AS cnt
  FROM __spine s LEFT JOIN __o o ON s.key = o.key AND s.hour = o.hour
),
__p AS (
  SELECT key, hour,
         CAST(SUM(cnt) OVER (PARTITION BY key ORDER BY hour
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS s,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY hour)::BIGINT AS t,
         COUNT(*) OVER (PARTITION BY key)::BIGINT AS n,
         CAST(SUM(cnt) OVER (PARTITION BY key) AS BIGINT) AS tot
  FROM __h
),
__c AS (
  SELECT key, hour, n,
         sqrt((CAST(t AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(t AS DOUBLE)))
              / CAST(n AS DOUBLE))
           * abs(CAST(s AS DOUBLE) / CAST(t AS DOUBLE)
                 - CAST(tot - s AS DOUBLE)
                   / (CAST(n AS DOUBLE) - CAST(t AS DOUBLE))) AS stat,
         CAST(s AS DOUBLE) / CAST(t AS DOUBLE) AS m1,
         CAST(tot - s AS DOUBLE)
           / (CAST(n AS DOUBLE) - CAST(t AS DOUBLE)) AS m2
  FROM __p WHERE t < n
),
__r AS (
  SELECT key, hour, n, stat, m1, m2,
         ROW_NUMBER() OVER (PARTITION BY key
                            ORDER BY stat DESC NULLS LAST, hour ASC) AS r
  FROM __c
)
SELECT key AS {key_col}, n AS n_hours, hour AS split_hour, stat,
       m1 AS mean_pre, m2 AS mean_post
FROM __r WHERE r = 1
ORDER BY {key_col}
"""


def centroid_matrix(
    df: DataFrame,
    key_col: str,
    vec_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Pairwise centroid-cosine matrix across corpus slices:
    ``(key_a, key_b, n_a, n_b, cosine)`` for every unordered slice pair
    (key_a < key_b), ordered. The matrix view of ``centroid_drift``:
    which sources/labels occupy the same region of representation space
    — near-duplicate SOURCES (mirrors, syndication) show cosine ≈ 1
    before any pair of documents is compared, and a mixing plan that
    treats them as independent double-counts their distribution.

    Engine parity: per-(key, dim) means follow centroid_drift's
    decimal-sum + 9dp-round convention; the matrix sums (dot products,
    squared norms) additionally quantize each product to (18,9) via the
    text hop and accumulate in DECIMAL — the pair frame is big enough
    (keys²·dims) that a raw double sum could reassociate across
    partitions, which the 64-row drift frame never risked. Final cosine
    is one IEEE chain ``dot / sqrt(n2a) / sqrt(n2b)`` (identical
    association both sides), rounded at ``round_to``.

    Scale posture (100 TB): one posexplode pass collapses to (key, dim)
    cells — slices × dims, NOT corpus-sized; the pair join runs per dim
    over the slice count (keys²·dims rows, bounded by the slice
    vocabulary); norms broadcast back. The fact table shuffles once.
    """
    base = df.select(
        F.col(key_col).alias("__k"),
        F.posexplode(F.col(vec_col)).alias("dim", "__v"),
    ).where(F.col("__k").isNotNull())
    means = (
        base.groupBy("__k", "dim")
        .agg(
            # text-hop entry quantize: direct float→decimal casts round
            # differently across engines (HALF_UP shortest repr vs
            # binary) — this class produced 6dp cosine flips here
            F.sum(
                F.col("__v")
                .cast("double")
                .cast("string")
                .cast("decimal(18,9)")
                .cast("decimal(38,9)")
            ).alias("__s"),
            F.count(F.lit(1)).cast("long").alias("__n"),
        )
        .select(
            "__k",
            "dim",
            "__n",
            F.round(
                F.col("__s").cast("string").cast("double") / F.col("__n"), 9
            ).alias("__m"),
        )
        # the ONE corpus pass (posexplode + collapse); norms, m1 and m2
        # all consume this slices×dims frame — without the pin the
        # executed plan re-ran the explode aggregation 3x
        .localCheckpoint()
    )
    _q9 = lambda c: c.cast("string").cast("decimal(18,9)")
    norms = means.groupBy("__k").agg(
        F.max("__n").alias("__nvec"),
        F.sum(_q9(F.col("__m") * F.col("__m")).cast("decimal(38,9)"))
        .cast("decimal(38,9)")
        .alias("__n2"),
    )
    m1 = means.select(
        F.col("__k").alias("__ka"), "dim", F.col("__m").alias("__ma")
    )
    m2 = means.select(
        F.col("__k").alias("__kb"), "dim", F.col("__m").alias("__mb")
    )
    dots = (
        m1.join(m2, "dim")
        .where(F.col("__ka") < F.col("__kb"))
        .groupBy("__ka", "__kb")
        .agg(
            F.sum(_q9(F.col("__ma") * F.col("__mb")).cast("decimal(38,9)"))
            .cast("decimal(38,9)")
            .alias("__dot")
        )
    )
    na = norms.select(
        F.col("__k").alias("__ka"),
        F.col("__nvec").alias("n_a"),
        F.col("__n2").alias("__n2a"),
    )
    nb = norms.select(
        F.col("__k").alias("__kb"),
        F.col("__nvec").alias("n_b"),
        F.col("__n2").alias("__n2b"),
    )
    d2d = lambda c: c.cast("string").cast("double")
    return (
        dots.join(F.broadcast(na), "__ka")
        .join(F.broadcast(nb), "__kb")
        .select(
            F.col("__ka").alias("key_a"),
            F.col("__kb").alias("key_b"),
            "n_a",
            "n_b",
            F.round(
                F.try_divide(
                    F.try_divide(
                        d2d(F.col("__dot")), F.sqrt(d2d(F.col("__n2a")))
                    ),
                    F.sqrt(d2d(F.col("__n2b"))),
                ),
                round_to,
            ).alias("cosine"),
        )
        .orderBy("key_a", "key_b")
    )


def centroid_matrix_sql(
    table: str,
    key_col: str,
    vec_col: str,
    round_to: int = 6,
) -> str:
    q9 = lambda e: f"CAST(CAST(({e}) * CAST(ABS({e}) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(18,9))"
    d2d = lambda e: f"CAST(CAST({e} AS VARCHAR) AS DOUBLE)"
    return f"""
WITH __b AS (
  SELECT {key_col} AS k, u.dim - 1 AS dim, u.v
  FROM {table},
       LATERAL (SELECT unnest({vec_col}) AS v,
                       generate_subscripts({vec_col}, 1) AS dim) u
  WHERE {key_col} IS NOT NULL
),
__m AS (
  SELECT k, dim, COUNT(*)::BIGINT AS n,
         CAST(CAST(CAST(CAST((CAST(CAST(SUM(CAST(
                 CAST(CAST((CAST(v AS DOUBLE)) * CAST(ABS(CAST(v AS DOUBLE)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(18,9))
               AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE) / COUNT(*)) * CAST(ABS(CAST(CAST(SUM(CAST(
                 CAST(CAST((CAST(v AS DOUBLE)) * CAST(ABS(CAST(v AS DOUBLE)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(18,9))
               AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE) / COUNT(*)) >= POWER(10.0, -(9+1)) AS INT) AS VARCHAR) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE)
           AS m
  FROM __b GROUP BY k, dim
),
__norm AS (
  SELECT k, MAX(n)::BIGINT AS nvec,
         CAST(SUM(CAST({q9('m * m')} AS DECIMAL(38,9))) AS DECIMAL(38,9))
           AS n2
  FROM __m GROUP BY k
),
__dot AS (
  SELECT a.k AS ka, b.k AS kb,
         CAST(SUM(CAST({q9('a.m * b.m')} AS DECIMAL(38,9)))
              AS DECIMAL(38,9)) AS dot
  FROM __m a JOIN __m b ON a.dim = b.dim AND a.k < b.k
  GROUP BY a.k, b.k
)
SELECT d.ka AS key_a, d.kb AS key_b,
       na.nvec AS n_a, nb.nvec AS n_b,
       CAST(CAST(CAST(CAST(({d2d('d.dot')} / sqrt({d2d('na.n2')}) / sqrt({d2d('nb.n2')})) * CAST(ABS({d2d('d.dot')} / sqrt({d2d('na.n2')}) / sqrt({d2d('nb.n2')})) >= POWER(10.0, -({int(round_to)}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{int(round_to)})) AS VARCHAR) AS DOUBLE) AS cosine
FROM __dot d JOIN __norm na ON d.ka = na.k JOIN __norm nb ON d.kb = nb.k
ORDER BY key_a, key_b
"""


def cvm_drift(
    df: DataFrame,
    value_col: str,
    a_pred,
    b_pred,
    round_to: int = 9,
) -> DataFrame:
    """One-row two-sample Cramér–von Mises drift statistic between the
    rows matching ``a_pred`` and ``b_pred``: ``(n_a, n_b, cvm_t)``
    — the INTEGRATED-squared-difference companion to ``ks_drift``'s
    max-gap: KS sees the single worst point; CvM accumulates the whole
    ECDF discrepancy, so a broad mild shift that never produces one big
    gap still scores (Anderson, Ann. Math. Stat. 1962 two-sample form,
    evaluated at the pooled sample):

        T = (n·m/N²)·Σ_pooled (F_a(x) − F_b(x))²
          = Σ_v w_v·(c_a(v)·m − c_b(v)·n)² / (n·m·N²)

    where the sum runs over DISTINCT pooled values v with multiplicity
    w_v and cumulative per-slice counts — so every term is an exact
    BIGINT/DECIMAL product (the ks_drift cross-multiplication idea,
    squared) and the single numerator/denominator division at the end
    is the only IEEE step (the exact DECIMAL numerator stays internal —
    a Decimal output column degrades to object/float64 divergently in
    the two engines' pandas paths, the driver-canonicalizer hazard).
    The decimal holds to roughly n·m ≈ 10¹⁷ pair mass — a LOUD overflow, not a wrong
    answer, far past any per-slice support this operator should see
    un-bucketed (the ks_drift pre-bucketing contract applies).

    Scale shape: identical to ks_drift — one conditional-count
    aggregation, one support-sized cumulative window, one 1-row
    reduce."""
    ex = "decimal(38,0)"
    counts = (
        df.select(
            F.col(value_col).alias("__v"),
            F.when(a_pred, 1).otherwise(0).alias("__a"),
            F.when(b_pred, 1).otherwise(0).alias("__b"),
        )
        .where((F.col("__a") == 1) | (F.col("__b") == 1))
        .groupBy("__v")
        .agg(
            F.sum("__a").cast("long").alias("__ca"),
            F.sum("__b").cast("long").alias("__cb"),
        )
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        (F.col("__ca") + F.col("__cb")).cast(ex).alias("__w"),
        F.sum("__ca").over(w).cast("long").alias("__cuma"),
        F.sum("__cb").over(w).cast("long").alias("__cumb"),
    )
    totals = counts.agg(
        F.sum("__ca").cast("long").alias("n_a"),
        F.sum("__cb").cast("long").alias("n_b"),
    )
    diff = (
        F.col("__cuma").cast(ex) * F.col("n_b").cast(ex)
        - F.col("__cumb").cast(ex) * F.col("n_a").cast(ex)
    )
    agg = cum.crossJoin(F.broadcast(totals)).agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.sum(F.col("__w") * diff * diff).cast(ex).alias("t_num"),
    )
    n_d = F.col("n_a").cast("double")
    m_d = F.col("n_b").cast("double")
    nn = n_d + m_d
    return agg.select(
        "n_a",
        "n_b",
        F.round(
            F.try_divide(
                F.col("t_num").cast("string").cast("double"),
                (n_d * m_d) * (nn * nn),
            ),
            round_to,
        ).alias("cvm_t"),
    )


def cvm_drift_sql(
    table: str,
    value_col: str,
    a_pred_sql: str,
    b_pred_sql: str,
    round_to: int = 9,
) -> str:
    d = "DECIMAL(38,0)"
    return f"""
WITH __counts AS (
  SELECT {value_col} AS v,
         SUM(CASE WHEN {a_pred_sql} THEN 1 ELSE 0 END)::BIGINT AS ca,
         SUM(CASE WHEN {b_pred_sql} THEN 1 ELSE 0 END)::BIGINT AS cb
  FROM {table}
  WHERE ({a_pred_sql}) OR ({b_pred_sql})
  GROUP BY v
),
__cum AS (
  SELECT CAST(ca + cb AS {d}) AS w,
         CAST(SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS cuma,
         CAST(SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS cumb
  FROM __counts
),
__tot AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b
  FROM __counts
),
__agg AS (
  SELECT MAX(t.n_a) AS n_a, MAX(t.n_b) AS n_b,
         CAST(SUM(c.w * (CAST(c.cuma AS {d}) * t.n_b
                         - CAST(c.cumb AS {d}) * t.n_a)
                      * (CAST(c.cuma AS {d}) * t.n_b
                         - CAST(c.cumb AS {d}) * t.n_a)) AS {d}) AS t_num
  FROM __cum c, __tot t
)
SELECT n_a, n_b,
       CAST(CAST(CAST(CAST((CAST(CAST(t_num AS VARCHAR) AS DOUBLE)
             / ((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                   * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))))) * CAST(ABS(CAST(CAST(t_num AS VARCHAR) AS DOUBLE)
             / ((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                   * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))))) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) AS cvm_t
FROM __agg
"""
