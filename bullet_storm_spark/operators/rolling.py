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
evaluates both frame sums in a single window pass. The frame is
row-bounded (``window_rows``), so state per key is O(frame), never
O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

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
    base = df.where(F.col(value_col).isNotNull()).withColumn(
        "__v6", v6
    )
    order = [F.col(c).asc() for c in order_cols]
    cur = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(-(window_rows - 1), 0)
    )
    prev = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(-window_rows, -1)
    )

    def stats(w):
        n = F.count(F.col("__v6")).over(w).cast("long")
        sx = _d2d(F.sum(F.col("__v6").cast(_MOMENT)).over(w).cast(_MOMENT))
        sq = _d2d(
            F.sum(
                (
                    F.col("__v6").cast("decimal(19,6)")
                    * F.col("__v6").cast("decimal(19,6)")
                ).cast(_MOMENT)
            )
            .over(w)
            .cast(_MOMENT)
        )
        nd = n.cast("double")
        mean = _div(sx, nd)
        var = _div(sq - _div(sx * sx, nd), nd - F.lit(1.0))
        std = F.when(var >= 0, F.sqrt(var))
        return n, mean, std

    n_cur, mean_cur, std_cur = stats(cur)
    n_prev, mean_prev, std_prev = stats(prev)
    z = F.when(
        (n_prev >= 2) & (std_prev > 0),
        _div(_d2d(F.col("__v6")) - mean_prev, std_prev),
    )
    return (
        base.withColumn("roll_n", n_cur)
        .withColumn("roll_mean", mean_cur)
        .withColumn("roll_std", F.when(n_cur >= 2, std_cur))
        .withColumn("roll_z", z)
        .drop("__v6")
    )


def _stats_sql(frame: str, tag: str) -> str:
    # v6 is the quantized value; (19,6) widening before the square —
    # SCALING.md hazard #3
    return (
        f"COUNT(v6) OVER {frame} AS n_{tag},\n"
        f"         CAST(CAST(SUM(CAST(v6 AS DECIMAL(38,12))) OVER {frame}"
        f" AS VARCHAR) AS DOUBLE) AS sx_{tag},\n"
        f"         CAST(CAST(SUM(CAST(v6 AS DECIMAL(19,6))"
        f" * CAST(v6 AS DECIMAL(19,6))) OVER {frame}"
        f" AS VARCHAR) AS DOUBLE) AS sq_{tag}"
    )


def rolling_stats_sql(
    table: str,
    key_cols: list[str],
    order_cols: list[str],
    value_sql: str,
    window_rows: int = 50,
    select_cols: list[str] | None = None,
) -> str:
    """DuckDB twin. ``select_cols`` are the pass-through input columns
    to emit (default: keys + order columns)."""
    if not key_cols:
        raise ValueError("rolling_stats needs >= 1 key column")
    if not order_cols:
        raise ValueError("rolling_stats needs >= 1 order column")
    if window_rows < 2:
        raise ValueError(f"need window_rows >= 2, got {window_rows}")
    keys = ", ".join(key_cols)
    order = ", ".join(f"{c} ASC" for c in order_cols)
    passthru = ", ".join(select_cols or (key_cols + order_cols))
    wc = (
        f"(PARTITION BY {keys} ORDER BY {order} ROWS BETWEEN"
        f" {window_rows - 1} PRECEDING AND CURRENT ROW)"
    )
    wp = (
        f"(PARTITION BY {keys} ORDER BY {order} ROWS BETWEEN"
        f" {window_rows} PRECEDING AND 1 PRECEDING)"
    )
    return f"""
WITH __b AS (
  SELECT *, CAST(CAST(CAST({value_sql} AS DOUBLE) AS VARCHAR)
                 AS DECIMAL(18,6)) AS v6
  FROM {table} WHERE ({value_sql}) IS NOT NULL
),
__w AS (
  SELECT {passthru}, v6,
         {_stats_sql(wc, 'c')},
         {_stats_sql(wp, 'p')}
  FROM __b
),
__s AS (
  SELECT {passthru}, v6,
         CAST(n_c AS BIGINT) AS roll_n,
         sx_c / CAST(n_c AS DOUBLE) AS roll_mean,
         CASE WHEN (sq_c - sx_c * sx_c / CAST(n_c AS DOUBLE))
                   / (CAST(n_c AS DOUBLE) - 1.0) >= 0 AND n_c >= 2
           THEN sqrt((sq_c - sx_c * sx_c / CAST(n_c AS DOUBLE))
                     / (CAST(n_c AS DOUBLE) - 1.0)) END AS roll_std,
         CASE WHEN n_p >= 2
                AND (sq_p - sx_p * sx_p / CAST(n_p AS DOUBLE))
                    / (CAST(n_p AS DOUBLE) - 1.0) > 0
           THEN (CAST(CAST(v6 AS VARCHAR) AS DOUBLE)
                 - sx_p / CAST(n_p AS DOUBLE))
                / sqrt((sq_p - sx_p * sx_p / CAST(n_p AS DOUBLE))
                       / (CAST(n_p AS DOUBLE) - 1.0)) END AS roll_z
  FROM __w
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
