"""Rolling-window statistics and the rolling z-score monitor.

The per-key moving aggregate is the workhorse of metrics monitoring:
"is this point anomalous against its own recent history?" — the
streaming cousin of robust_outliers (whole-history median/MAD) and the
local complement to CUSUM (global changepoint). ``rolling_stats``
computes trailing-frame n/mean/std per row; ``rolling_outliers`` keeps
the rows whose trailing z-score breaches a threshold.

Engine-parity design: a windowed SUM of doubles is NOT portable — Spark
evaluates sliding frames incrementally (add/remove) while DuckDB uses
segment-tree aggregation, so the float association differs and results
diverge in ulps. Values therefore quantize to DECIMAL(18,6) and the
frame sums run in DECIMAL(38,12) — exact under ANY association — with
the string-hop (_d2d) conversion and try_divide closed form at the end
(SCALING.md hazards #1-#5).

Scale: one shuffle on the key columns; each partition sorts once and
computes TWO running prefix sums — bounded sliding frames would make
Spark recompute each frame from scratch (O(n·frame) on the slow
unbounded-precision decimal path, measured 19.7 s at sf0.1), while the
prefix-sum + LAG(cum, W) differencing is O(n) and dropped the same
entry to 4.7 s (remaining cost: parallelism = #keys, 5 at the local
bench; a real corpus has many keys). State per key is O(1) during the
scan; exactness is untouched because the differencing is decimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from bullet_storm_spark.operators.common import hourly_cells, hourly_cells_sql
from bullet_storm_spark.operators.stats_tests import (
    _MOMENT,
    _VAL_DEC,
    _d2d,
    _div,
    _q6,
)


def rolling_stats(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    window_rows: int = 50,
) -> DataFrame:
    """Trailing-frame statistics per row: input columns plus
    ``(roll_n, roll_mean, roll_std, roll_z)`` over the frame
    ``window_rows - 1 PRECEDING .. CURRENT ROW`` within each key,
    ordered by ``order_cols`` (which must be a deterministic total
    order per key — include a unique id as the last column).
    ``roll_std`` is the sample std of the frame (NULL when roll_n < 2);
    ``roll_z`` compares the CURRENT value against the mean/std of the
    PRECEDING ``window_rows`` rows (frame shifted back one row), so a
    spike does not mask itself by inflating its own baseline; NULL
    until the preceding frame has >= 2 rows or when its std is 0."""
    if not key_cols:
        raise ValueError("rolling_stats needs >= 1 key column")
    if not order_cols:
        raise ValueError("rolling_stats needs >= 1 order column")
    if window_rows < 2:
        raise ValueError(f"need window_rows >= 2, got {window_rows}")
    v6 = _q6(F.col(value_col))
    base = df.where(F.col(value_col).isNotNull()).withColumn("__v6", v6)
    order = [F.col(c).asc() for c in order_cols]
    wseq = Window.partitionBy(*key_cols).orderBy(*order)
    cum = wseq.rowsBetween(Window.unboundedPreceding, 0)
    # PREFIX-SUM formulation: bounded sliding frames make Spark
    # recompute the aggregate per row (O(n·frame), and decimal sums run
    # on the slow unbounded-precision path — measured 19.7 s at sf0.1);
    # running UNBOUNDED-PRECEDING sums are incremental O(1)/row, and the
    # frame sum is cum − LAG(cum, W), an exact decimal subtraction.
    zero = F.lit(0).cast(_MOMENT)
    sq6 = (
        F.col("__v6").cast("decimal(19,6)")
        * F.col("__v6").cast("decimal(19,6)")
    ).cast(_MOMENT)
    wr = window_rows
    stats_src = (
        base.withColumn("__rn", F.row_number().over(wseq).cast("long"))
        .withColumn("__cx", F.sum(F.col("__v6").cast(_MOMENT)).over(cum).cast(_MOMENT))
        .withColumn("__cq", F.sum(sq6).over(cum).cast(_MOMENT))
    )
    lagd = lambda c, off: F.coalesce(  # noqa: E731
        F.lag(F.col(c), off).over(wseq), zero
    ).cast(_MOMENT)

    def frame(n_expr, sx_expr, sq_expr):
        nd = n_expr.cast("double")
        sx = _d2d(sx_expr.cast(_MOMENT))
        sq = _d2d(sq_expr.cast(_MOMENT))
        mean = _div(sx, nd)
        var = _div(sq - _div(sx * sx, nd), nd - F.lit(1.0))
        std = F.when(var >= 0, F.sqrt(var))
        return n_expr.cast("long"), mean, std

    n_cur, mean_cur, std_cur = frame(
        F.least(F.col("__rn"), F.lit(wr)),
        F.col("__cx") - lagd("__cx", wr),
        F.col("__cq") - lagd("__cq", wr),
    )
    n_prev_expr = F.least(F.col("__rn") - 1, F.lit(wr))
    n_prev, mean_prev, std_prev = frame(
        n_prev_expr,
        lagd("__cx", 1) - lagd("__cx", wr + 1),
        lagd("__cq", 1) - lagd("__cq", wr + 1),
    )
    z = F.when(
        (n_prev >= 2) & (std_prev > 0),
        _div(_d2d(F.col("__v6")) - mean_prev, std_prev),
    )
    return (
        stats_src.withColumn("roll_n", n_cur)
        .withColumn("roll_mean", mean_cur)
        .withColumn("roll_std", F.when(n_cur >= 2, std_cur))
        .withColumn("roll_z", z)
        .drop("__v6", "__rn", "__cx", "__cq")
    )


def rolling_stats_sql(
    table: str,
    key_cols: list[str],
    order_cols: list[str],
    value_sql: str,
    window_rows: int = 50,
    select_cols: list[str] | None = None,
) -> str:
    """DuckDB twin (same prefix-sum formulation as the Spark plan).
    ``select_cols`` are the pass-through input columns to emit
    (default: keys + order columns)."""
    if not key_cols:
        raise ValueError("rolling_stats needs >= 1 key column")
    if not order_cols:
        raise ValueError("rolling_stats needs >= 1 order column")
    if window_rows < 2:
        raise ValueError(f"need window_rows >= 2, got {window_rows}")
    keys = ", ".join(key_cols)
    order = ", ".join(f"{c} ASC" for c in order_cols)
    passthru = ", ".join(select_cols or (key_cols + order_cols))
    wr = window_rows
    m = "DECIMAL(38,12)"
    zero = f"CAST(0 AS {m})"

    def lagd(col: str, off: int) -> str:
        return f"CAST(COALESCE(lag({col}, {off}) OVER w, {zero}) AS {m})"

    def d2d(e: str) -> str:
        return f"CAST(CAST(CAST({e} AS {m}) AS VARCHAR) AS DOUBLE)"

    def closed(n: str, sx: str, sq: str, label: str) -> str:
        nd = f"CAST({n} AS DOUBLE)"
        mean = f"{sx} / {nd}"
        var = f"({sq} - {sx} * {sx} / {nd}) / ({nd} - 1.0)"
        if label == "cur":
            return (
                f"CAST({n} AS BIGINT) AS roll_n,\n"
                f"         {mean} AS roll_mean,\n"
                f"         CASE WHEN {var} >= 0 AND {n} >= 2"
                f" THEN sqrt({var}) END AS roll_std"
            )
        return (
            f"CASE WHEN {n} >= 2 AND {var} > 0\n"
            f"           THEN (CAST(CAST(v6 AS VARCHAR) AS DOUBLE)"
            f" - {mean}) / sqrt({var}) END AS roll_z"
        )

    cur_n = f"LEAST(rn, {wr})"
    cur_sx = d2d(f"cx - {lagd('cx', wr)}")
    cur_sq = d2d(f"cq - {lagd('cq', wr)}")
    prev_n = f"LEAST(rn - 1, {wr})"
    prev_sx = d2d(f"{lagd('cx', 1)} - {lagd('cx', wr + 1)}")
    prev_sq = d2d(f"{lagd('cq', 1)} - {lagd('cq', wr + 1)}")
    return f"""
WITH __b AS (
  SELECT *, CAST(CAST(CAST({value_sql} AS DOUBLE) AS VARCHAR)
                 AS DECIMAL(18,6)) AS v6
  FROM {table} WHERE ({value_sql}) IS NOT NULL
),
__c AS (
  SELECT {passthru}, v6,
         row_number() OVER w AS rn,
         CAST(SUM(CAST(v6 AS {m})) OVER (PARTITION BY {keys}
              ORDER BY {order} ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW) AS {m}) AS cx,
         CAST(SUM(CAST(CAST(v6 AS DECIMAL(19,6))
                       * CAST(v6 AS DECIMAL(19,6)) AS {m}))
              OVER (PARTITION BY {keys} ORDER BY {order}
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS {m}) AS cq
  FROM __b
  WINDOW w AS (PARTITION BY {keys} ORDER BY {order})
),
__s AS (
  SELECT {passthru}, v6,
         {closed(cur_n, cur_sx, cur_sq, "cur")},
         {closed(prev_n, prev_sx, prev_sq, "prev")}
  FROM __c
  WINDOW w AS (PARTITION BY {keys} ORDER BY {order})
)
SELECT * FROM __s
"""


def rolling_outliers(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    window_rows: int = 50,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Rows whose value breaches ``z_threshold`` trailing z-scores
    against the PRECEDING frame. Output: keys + order cols + value +
    roll_n/roll_mean/roll_z, ordered by keys then order cols."""
    if z_threshold <= 0:
        raise ValueError(f"need z_threshold > 0, got {z_threshold}")
    s = rolling_stats(df, key_cols, order_cols, value_col, window_rows)
    # emit the QUANTIZED value through the string hop, mirroring the SQL
    # twin's v6 — the raw double would differ from the (18,6) quantum
    q = _d2d(_q6(F.col(value_col)))
    return (
        s.where(F.abs(F.col("roll_z")) >= z_threshold)
        .select(
            *key_cols,
            *order_cols,
            q.alias("value"),
            "roll_n",
            "roll_mean",
            "roll_z",
        )
        .orderBy(*key_cols, *order_cols)
    )


def rolling_outliers_sql(
    table: str,
    key_cols: list[str],
    order_cols: list[str],
    value_sql: str,
    window_rows: int = 50,
    z_threshold: float = 3.0,
) -> str:
    if z_threshold <= 0:
        raise ValueError(f"need z_threshold > 0, got {z_threshold}")
    inner = rolling_stats_sql(
        table, key_cols, order_cols, value_sql, window_rows
    )
    keys = ", ".join(key_cols)
    order = ", ".join(order_cols)
    return f"""
WITH __r AS ({inner})
SELECT {keys}, {order}, CAST(CAST(v6 AS VARCHAR) AS DOUBLE) AS value,
       roll_n, roll_mean, roll_z
FROM __r
WHERE abs(roll_z) >= {z_threshold}
ORDER BY {keys}, {order}
"""


def rolling_median(
    df: DataFrame,
    key_col: str = "event_type",
    window_hours: int = 24,
    round_to: int = 9,
) -> DataFrame:
    """Trailing rolling MEDIAN of the hourly counts per key: ``(key,
    hour, cnt, roll_n, roll_median)`` over the frame ``window_hours−1
    PRECEDING .. CURRENT ROW`` of the densified hourly spine — the
    robust baseline ``rolling_stats``'s mean/std cannot give (one spike
    hour drags a 24 h mean by spike/24; the median ignores it
    entirely). Pair with rolling_stats' z for a spike detector whose
    baseline cannot be poisoned by the spikes it is hunting.

    Parity: both engines compute the exact interpolated percentile over
    the SAME integer frame (Spark ``percentile``, DuckDB
    ``quantile_cont`` — the identical (1−g)·a + g·b form on sorted
    values; probed bit-equal on integer counts, where g ∈ {0, ½} makes
    the interpolation exact). The frame is hour-ordered rows on the
    gap-free spine, so row frames equal time frames.

    Scale posture: one corpus collapse to calendar-bounded cells, one
    per-key ordered window (O(w log w) per row on bounded w)."""
    cells = hourly_cells(df, key_col)
    w = (
        Window.partitionBy("__key")
        .orderBy("hour")
        .rowsBetween(-(window_hours - 1), 0)
    )
    return (
        cells.select(
            F.col("__key").alias("key"),
            "hour",
            "cnt",
            F.count(F.lit(1)).over(w).cast("long").alias("roll_n"),
            F.round(
                F.expr("percentile(cnt, 0.5)").over(w), round_to
            ).alias("roll_median"),
        )
        .orderBy("key", "hour")
    )


def rolling_median_sql(
    table: str,
    key_col: str = "event_type",
    window_hours: int = 24,
    round_to: int = 9,
) -> str:
    return f"""
WITH {hourly_cells_sql(table, key_col)}
SELECT key, hour, cnt,
       CAST(COUNT(*) OVER w AS BIGINT) AS roll_n,
       CASE WHEN ABS(quantile_cont(cnt, 0.5) OVER w) >= 1e16 THEN CAST((quantile_cont(cnt, 0.5) OVER w) AS DOUBLE) ELSE CAST(CAST(CAST(CAST((quantile_cont(cnt, 0.5) OVER w) * CAST(ABS(quantile_cont(cnt, 0.5) OVER w) >= POWER(10.0, -({round_to}+1)) AS INT) AS VARCHAR) AS DECIMAL(38,{round_to})) AS VARCHAR) AS DOUBLE) END AS roll_median
FROM __cells
WINDOW w AS (PARTITION BY key ORDER BY hour
             ROWS BETWEEN {window_hours - 1} PRECEDING AND CURRENT ROW)
ORDER BY key, hour
"""
