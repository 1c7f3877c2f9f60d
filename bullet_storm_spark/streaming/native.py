"""Native Structured Streaming compilation — the pure-Spark path for
long-running standing queries.

The registry engine (engine.py) multiplexes MANY short-lived Bullet queries
over one stream via foreachBatch; that is the reference's dynamic-query
model. For a STANDING query — one spec, runs forever — the idiomatic Spark
shape is better: compile it straight to `withWatermark` + `window()`
aggregation and let Spark's state store own window state, late-data
handling, and recovery (SURVEY.md §2.5 'Spark primitive' column; Structured
Streaming paper, SIGMOD 2018 — PAPERS.md).

Also here: a custom stateful operator the reference lacks —
`sessionize` builds per-key activity sessions with an inactivity gap via
``applyInPandasWithState`` (Arrow-batched, timeout-driven), the pattern to
copy for any custom stateful operator (record windows, per-key rate
tracking, ...) at cluster scale.
"""

from __future__ import annotations

from typing import Iterator, Tuple

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from bullet_storm_spark.operators.group import _agg_column
from bullet_storm_spark.plans.query import GroupBy, Query, Raw, TumblingWindow


def compile_streaming_query(
    query: Query,
    event_time_col: str = "ts",
    watermark_delay: str = "10 seconds",
):
    """Query (GroupBy or Raw, optional TumblingWindow) -> a function
    streaming DataFrame -> streaming DataFrame.

    TumblingWindow becomes an EVENT-TIME window (the streaming-native
    reading of the reference's processing-time windows): results carry
    window_start/window_end, late data within the watermark still lands in
    its window — strictly stronger semantics than the reference's
    tick-aligned clock, which it documents as lossy (SURVEY.md §7.3)."""

    def plan(stream_df: DataFrame) -> DataFrame:
        df = stream_df
        if query.filter is not None:
            df = df.where(query.filter.to_column())
        if query.projection.fields is not None:
            keep_time = [F.col(event_time_col)] if isinstance(query.window, TumblingWindow) else []
            df = df.select(
                *keep_time,
                *[
                    f.expression.to_column().alias(f.name)
                    for f in query.projection.fields
                ],
            )
        agg = query.aggregation
        if isinstance(agg, Raw):
            return df  # append-mode pass-through (RAW streaming)
        if not isinstance(agg, GroupBy):
            raise ValueError(
                "native streaming compilation supports RAW and GROUP "
                "aggregations; sketch-style aggregations run on the "
                "foreachBatch engine"
            )
        keys = [F.col(f).alias(agg.alias_of(f)) for f in agg.fields]
        if isinstance(query.window, TumblingWindow):
            df = df.withWatermark(event_time_col, watermark_delay)
            win = F.window(
                F.col(event_time_col), f"{query.window.emit_every_ms} milliseconds"
            )
            grouped = df.groupBy(win.alias("__w"), *keys)
            out = grouped.agg(*[_agg_column(op) for op in agg.operations])
            return out.select(
                F.col("__w.start").alias("window_start"),
                F.col("__w.end").alias("window_end"),
                *[F.col(agg.alias_of(f)) for f in agg.fields],
                *[F.col(op.alias) for op in agg.operations],
            )
        grouped = df.groupBy(*keys) if keys else df
        if keys:
            return grouped.agg(*[_agg_column(op) for op in agg.operations])
        return df.agg(*[_agg_column(op) for op in agg.operations])

    return plan


SESSION_SCHEMA = (
    "key string, session_start long, session_end long, n_events int, closed boolean"
)
_SESSION_STATE_SCHEMA = "start long, end long, n int"


def stream_dedup(
    stream_df: DataFrame,
    text_col: str,
    event_time_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup for continuous ingestion: drop any record
    whose normalized-content fingerprint was already seen within the
    watermark horizon (the streaming face of `operators.dedup.exact_dedup`;
    for near-dup at ingest see `operators.dedup.dedup_against_index`, which
    probes a persisted band index per micro-batch).

    Built on ``dropDuplicatesWithinWatermark`` so the dedup key does NOT
    need to include the event time: state holds one fingerprint per unique
    document and the store evicts entries older than the watermark —
    bounded state, no full-history growth. At cluster scale the state is
    hash-partitioned on the (uniform, md5) fingerprint: no skew, no
    broadcast, scales with unique-docs-per-horizon not stream volume."""
    from bullet_storm_spark.functions.text import fingerprint

    return (
        stream_df.withColumn("__fp", fingerprint(text_col))
        .withWatermark(event_time_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    lookback: str = "1 hour",
    lookahead: str = "0 seconds",
    watermark_delay: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: match right rows whose event time
    lies in ``[left_time - lookback, left_time + lookahead]`` for the same
    key — the streaming face of the batch as-of/range join extensions
    (e.g. purchases joined to the signups that preceded them within an
    hour).

    Both sides carry watermarks and the join predicate carries explicit
    time bounds, so Spark can EVICT state: each side buffers only
    ``watermark + lookback/lookahead`` of data per key, not the whole
    stream — the requirement for unbounded-stream joins at cluster scale.
    State is hash-partitioned on the join key; outer modes emit nulls only
    once the watermark proves no match can arrive."""
    l = left.withWatermark(left_time, watermark_delay).alias("l")
    r = right.withWatermark(right_time, watermark_delay).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_time}")
           >= F.col(f"l.{left_time}") - F.expr(f"INTERVAL {lookback}"))
        & (F.col(f"r.{right_time}")
           <= F.col(f"l.{left_time}") + F.expr(f"INTERVAL {lookahead}"))
    )
    return l.join(r, cond, how)


def stream_dedup_incremental(
    stream_df: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    out_path: str,
    checkpoint_path: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 1,
    threshold: float = 0.9,
):
    """Continuous NEAR-duplicate dedup for an ingest stream: every
    micro-batch probes the persisted MinHash band index
    (`operators.dedup.band_index` parquet), keeps only documents that
    duplicate nothing in the historical corpus and no earlier-id document
    within the batch, appends survivors to ``out_path`` and their band
    rows to the index — the day-over-day production dedup loop, run
    per-batch instead of per-day. Returns the StreamingQuery.

    Scale: the probe is a hash join on band_hash against the index —
    partition the index parquet by band_hash range at cluster scale and
    the join prunes; per-batch cost is O(batch x bands + collisions),
    never a corpus rescan. Exactly-once caveat: foreachBatch may re-run a
    batch after failure; the appends are idempotent only if downstream
    compaction dedups on (id) — or write with partitionBy(batch_id) and
    overwrite dynamic partitions for true idempotence.
    """
    from bullet_storm_spark.operators.dedup import band_index, dedup_against_index

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            idx = spark.read.parquet(index_path)
        except Exception:
            # first batch: empty index with the right schema
            idx = band_index(
                batch_df.limit(0), id_col, text_col, num_hashes, bands, shingle_n
            )
        survivors = dedup_against_index(
            batch_df, idx, id_col, text_col,
            num_hashes, bands, shingle_n, threshold,
        ).localCheckpoint()  # probe once; reused for both writes below
        survivors.write.mode("append").parquet(out_path)
        band_index(
            survivors, id_col, text_col, num_hashes, bands, shingle_n
        ).write.mode("append").parquet(index_path)

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def sessionize(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_ms: int = 30_000,
    use_timeout: bool = False,
):
    """Per-key session windows with an inactivity gap, as a custom stateful
    streaming operator (applyInPandasWithState).

    Emits a row per closed session: (key, session_start, session_end,
    n_events, closed). ``ts_col`` must be epoch-millis (cast upstream).
    State per key is three longs — constant memory per active key, spilled
    and checkpointed by the state store at cluster scale.

    use_timeout=True additionally closes idle sessions via a
    processing-time timeout (verified working); note that a query with
    processing-time timeouts never quiesces, so ``processAllAvailable`` /
    ``availableNow`` will not terminate — long-running deployments only.
    The default closes a session when a later event crosses the gap.
    """
    import pandas as pd

    def fn(
        key: Tuple[str], pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "session_start": [start],
                    "session_end": [end],
                    "n_events": [n],
                    "closed": [True],
                }
            )
            return
        times: list[int] = []
        for pdf in pdfs:
            times.extend(int(t) for t in pdf[ts_col])
        times.sort()
        if state.exists:
            start, end, n = state.get
        else:
            start, end, n = times[0], times[0], 0
        out_rows = []
        for t in times:
            if t - end > gap_ms and n > 0:
                out_rows.append((key[0], start, end, n, True))
                start, n = t, 0
            end = max(end, t)
            n += 1
        state.update((start, end, n))
        if use_timeout:
            state.setTimeoutDuration(gap_ms)
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=["key", "session_start", "session_end", "n_events", "closed"],
            )

    return (
        stream_df.select(
            F.col(key_col).cast("string").alias("key"), F.col(ts_col).alias(ts_col)
        )
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            _SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.ProcessingTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout,
        )
    )


def sliding_window_agg(
    stream_df: DataFrame,
    fields: list[str],
    operations: list,
    event_time_col: str = "ts",
    window_ms: int = 10_000,
    slide_ms: int = 5_000,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Sliding EVENT-TIME window aggregation — the window kind the
    reference lacks (it has tumbling time and sliding RECORD windows,
    `plans/query.py:260-278`; a sliding *time* window under Storm's tick
    clock would re-scan every buffered record per tick). In Spark it is
    one `window(col, windowDuration, slideDuration)` group-by: each event
    lands in ``window_ms / slide_ms`` overlapping windows, the state store
    owns per-window partial aggregates, and the watermark expires windows
    whose end passed — bounded state, late data within the delay still
    lands in every window that covers it.

    ``operations`` is the same GroupOperation list the batch GroupBy
    lowering uses, so the metric surface (COUNT/SUM/MIN/MAX/AVG)
    compiles identically in both engines.

    Scale shape: the shuffle key is (window, *fields) — slide multiplies
    state, not shuffle volume (window assignment is map-side); partial
    aggregation combines per partition before the exchange like any
    batch hash aggregate."""
    if window_ms <= 0 or slide_ms <= 0 or slide_ms > window_ms:
        raise ValueError(
            f"need 0 < slide_ms <= window_ms, got {slide_ms} / {window_ms}"
        )
    df = stream_df.withWatermark(event_time_col, watermark_delay)
    win = F.window(
        F.col(event_time_col),
        f"{window_ms} milliseconds",
        f"{slide_ms} milliseconds",
    )
    grouped = df.groupBy(win.alias("__w"), *[F.col(f) for f in fields])
    out = grouped.agg(*[_agg_column(op) for op in operations])
    return out.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *[F.col(f) for f in fields],
        *[F.col(op.alias) for op in operations],
    )


CUSUM_SCHEMA = (
    "key string, batch_events long, cusum_pos double, cusum_neg double, "
    "alarm boolean"
)


def _cusum_step(
    spos: float, sneg: float, x: float, mu: float, slack: float
) -> tuple[float, float]:
    """One CUSUM update (shared by the in-batch and the timeout-driven
    zero-count path; module-level so the silent-key transition is unit-
    testable — the timeout path can't be driven under availableNow)."""
    return (
        max(0.0, spos + (x - mu - slack)),
        max(0.0, sneg + (mu - x - slack)),
    )


def stream_cusum(
    stream_df: DataFrame,
    key_col: str,
    mu: float,
    sd: float,
    slack_k: float = 0.5,
    threshold_h: float = 4.0,
    silent_key_timeout_ms: int | None = None,
):
    """Live drift detection: per-key CUSUM over micro-batch event counts,
    the streaming twin of operators/anomaly.volume_cusum. The batch
    detector profiles history; this one watches the live stream against
    FROZEN control limits (``mu``/``sd`` fit offline — the production
    control-chart shape: limits move only when a human re-baselines, so
    an excursion cannot normalize itself into the model).

    Emits one row per (key, micro-batch): the batch's event count, both
    running CUSUM sides, and the alarm flag. State per key is two floats
    — constant memory per monitored key, checkpointed by the state store;
    a million monitored keys cost one shuffle on the key per batch.

    After an alarm fires the statistic keeps accumulating (alarm stays
    raised until re-baseline) — the reference's rate-limit posture
    (SURVEY.md §2.5): detect, surface, let the operator decide.

    A key that stops sending events entirely is otherwise INVISIBLE (the
    state function only runs for keys present in the batch, so a total
    outage never accumulates on the negative side — round-4 ADVICE).
    ``silent_key_timeout_ms`` arms a processing-time timeout per stateful
    key: when it fires, the key is scored as a zero-count pseudo-batch
    (batch_events = 0) and the timeout re-arms, so drop-to-zero alarms
    after ~mu/(mu - slack) timeouts. Same caveat as sessionize's
    use_timeout: a query with processing-time timeouts never quiesces, so
    availableNow/processAllAvailable tests exercise only the in-batch
    path — long-running deployments only.
    """
    import pandas as pd

    if sd <= 0:
        raise ValueError(f"need sd > 0, got {sd}")
    if silent_key_timeout_ms is not None and silent_key_timeout_ms <= 0:
        raise ValueError(
            f"need silent_key_timeout_ms > 0, got {silent_key_timeout_ms}"
        )
    slack = float(slack_k) * float(sd)
    thr = float(threshold_h) * float(sd)

    def fn(
        key: Tuple[str], pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        n = 0
        if not state.hasTimedOut:  # timeout => zero-count pseudo-batch
            for pdf in pdfs:
                n += len(pdf)
        if state.exists:
            spos, sneg = state.get
        else:
            spos, sneg = 0.0, 0.0
        spos, sneg = _cusum_step(spos, sneg, float(n), float(mu), slack)
        state.update((float(spos), float(sneg)))
        if silent_key_timeout_ms is not None:
            state.setTimeoutDuration(silent_key_timeout_ms)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "batch_events": [n],
                "cusum_pos": [round(spos, 9)],
                "cusum_neg": [round(sneg, 9)],
                "alarm": [spos > thr or sneg > thr],
            }
        )

    return (
        stream_df.select(F.col(key_col).cast("string").alias("key"))
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            CUSUM_SCHEMA,
            "cusum_pos double, cusum_neg double",
            "append",
            GroupStateTimeout.ProcessingTimeTimeout
            if silent_key_timeout_ms is not None
            else GroupStateTimeout.NoTimeout,
        )
    )


PSI_SCHEMA = (
    "key string, batch_rows long, total_rows long, psi double, alarm boolean"
)


def stream_psi(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
    ref_probs: "list[float]",
    lo: float,
    hi: float,
    alarm_at: float = 0.25,
):
    """Live feature-drift monitoring: per-key population stability index
    of the stream's ACCUMULATED value distribution against a FROZEN
    reference histogram — the streaming twin of
    ``operators/anomaly.psi_drift``, with the same production posture as
    ``stream_cusum``: the reference (``ref_probs`` over ``len(ref_probs)``
    equal-width bins spanning ``[lo, hi)``, fit offline from the training
    snapshot) moves only when a human re-baselines, so drift cannot
    normalize itself into the model.

    Emits one row per (key, micro-batch): the batch's row count, total
    rows observed, the PSI of the cumulative observed distribution vs the
    reference, and the alarm flag (industry thresholds: 0.1 drifting,
    0.25 shifted). Binning matches the batch operator: equal width,
    out-of-range values clamp into the edge bins, empty observed bins get
    0.5-count smoothing. State per key is ``n_bins`` longs — constant
    memory per monitored key, one shuffle on the key per batch; a million
    monitored (source, feature) keys is one exchange."""
    import math

    import pandas as pd

    n_bins = len(ref_probs)
    if n_bins < 2:
        raise ValueError(f"need >= 2 reference bins, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    if any(p <= 0 for p in ref_probs):
        raise ValueError("every reference bin probability must be > 0 "
                         "(smooth the reference when fitting it)")
    total_p = sum(ref_probs)
    if abs(total_p - 1.0) > 1e-6:
        raise ValueError(f"reference probabilities must sum to 1, got {total_p}")
    width = (float(hi) - float(lo)) / n_bins

    def fn(
        key: Tuple[str], pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        counts = list(state.get[0]) if state.exists else [0] * n_bins
        batch_rows = 0
        for pdf in pdfs:
            for v in pdf["__v"]:
                f = float(v)
                if f != f:  # NULL/NaN values are dropped, as in the
                    continue  # batch twin — never crash the monitor
                b = int((f - lo) // width)
                b = 0 if b < 0 else (n_bins - 1 if b >= n_bins else b)
                counts[b] += 1
                batch_rows += 1
        state.update((counts,))
        total = sum(counts)
        psi = 0.0
        if total > 0:
            for c, pr in zip(counts, ref_probs):
                po = (c if c > 0 else 0.5) / total
                psi += (po - pr) * math.log(po / pr)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "batch_rows": [batch_rows],
                "total_rows": [total],
                "psi": [round(psi, 9)],
                "alarm": [psi > alarm_at],
            }
        )

    return (
        stream_df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(value_col).cast("double").alias("__v"),
        )
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            PSI_SCHEMA,
            "counts array<bigint>",
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


ROLLZ_SCHEMA = (
    "key string, seq long, value double, prev_n long, roll_z double, "
    "alarm boolean"
)


def _q6_py(v: float) -> float:
    """Python twin of operators/stats_tests._q6: shortest decimal repr
    -> DECIMAL(18,6) HALF_UP -> float (the text hop). Python's round()
    is NOT equivalent — it rounds the binary value half-to-even
    (2.3456785 -> 2.345678 vs _q6's 2.345679; 5e-07 -> 0.0 vs
    0.000001), so using it here would silently break the streaming
    operators' batch-equivalence contract on tie values."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(float(v))).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )


def stream_rolling_z(
    stream_df: DataFrame,
    key_col: str,
    seq_col: str,
    value_col: str,
    window_rows: int = 50,
    z_threshold: float = 3.0,
):
    """Live per-key rolling z-score — the streaming twin of
    operators/rolling.rolling_stats: each arriving value is scored
    against the mean/std of the PRECEDING ``window_rows`` values of its
    key (self-excluding, same as the batch operator), then pushed into
    the bounded state deque. Emits one row per event with the z and the
    threshold flag; z is NULL until the key has >= 2 history values or
    while their std is 0.

    State per key is the last ``window_rows`` values (a bounded
    array<double> in the state store — O(window) per key, checkpointed).
    Rows within a micro-batch are processed in ``seq_col`` order;
    cross-batch order is the source's arrival order, so equivalence with
    the batch operator holds on an in-order replay (the sessionize
    equivalence contract; see
    test_rolling_z_stream_equals_batch_on_replayed_corpus)."""
    import math

    import pandas as pd

    if window_rows < 2:
        raise ValueError(f"need window_rows >= 2, got {window_rows}")
    if z_threshold <= 0:
        raise ValueError(f"need z_threshold > 0, got {z_threshold}")

    def fn(
        key: Tuple[str], pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        hist: list[float] = list(state.get[0]) if state.exists else []
        rows = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values("seq", kind="mergesort")
        for seq, v in zip(batch["seq"], batch["value"]):
            # quantize exactly like the batch side's _q6 (see _q6_py)
            x = _q6_py(v)
            n = len(hist)
            z = None
            if n >= 2:
                m = sum(hist) / n
                var = sum((h - m) ** 2 for h in hist) / (n - 1)
                if var > 0:
                    z = (x - m) / math.sqrt(var)
            rows.append(
                (
                    key[0],
                    int(seq),
                    x,
                    n,
                    z,
                    bool(z is not None and abs(z) >= z_threshold),
                )
            )
            hist.append(x)
            if len(hist) > window_rows:
                hist.pop(0)
        state.update((list(hist),))
        yield pd.DataFrame(
            rows,
            columns=["key", "seq", "value", "prev_n", "roll_z", "alarm"],
        )

    return (
        stream_df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(seq_col).cast("long").alias("seq"),
            F.col(value_col).cast("double").alias("value"),
        )
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            ROLLZ_SCHEMA,
            "vals array<double>",
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def stream_ewma(
    stream_df: DataFrame,
    key_col: str,
    seq_col: str,
    value_col: str,
    mu: float,
    sd: float,
    lam_num: int = 1,
    lam_den: int = 5,
    limit_l: float = 3.0,
):
    """Live EWMA control chart: per-key integer fixed-point EWMA over a
    stream of pre-aggregated observations (e.g. the hourly counts an
    upstream windowed aggregation emits), the streaming twin of
    ``operators/anomaly.ewma_monitor``. Control limits are FROZEN
    (``mu``/``sd`` fit offline, the stream_cusum/stream_psi posture:
    limits move only on human re-baseline).

    Emits one row per observation: ``(key, seq, cnt, z_n9, ewma,
    outside)``. Because the recursion state is an INTEGER (nano-count
    fixed point, the exact half-up steps of the batch operator), the
    streaming chart is BIT-equal to the batch chart on a replayed
    series — not approximately equal: int→double conversion is
    correctly rounded in both paths, so ewma and the flag are
    identical (the batch-equivalence test pins this). Observations are
    ordered by ``seq_col`` within each micro-batch; feed batches in
    order (the replay contract shared by every stream twin here).

    State per key is one integer + a count — constant memory,
    one key shuffle per batch.
    """
    import pandas as pd

    if lam_den < 1 or lam_num < 1 or lam_num >= lam_den:
        raise ValueError(f"need 0 < lam_num < lam_den, got {lam_num}/{lam_den}")
    if round(limit_l, 2) != limit_l:
        raise ValueError(f"limit_l must be exact at 2 decimals, got {limit_l}")
    if sd < 0:
        raise ValueError(f"need sd >= 0, got {sd}")
    import math as _math

    ln, ld = int(lam_num), int(lam_den)
    scale = 10**9
    lam = float(ln) / float(ld)
    width = float(limit_l) * float(sd) * _math.sqrt(lam / (2.0 - lam))
    ucl, lcl = float(mu) + width, float(mu) - width

    def fn(
        key: Tuple[str], pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        z, seen = state.get if state.exists else (None, 0)
        rows = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values("__seq", kind="mergesort")
        for seq, v in zip(batch["__seq"], batch["__v"]):
            xi = int(v) * scale
            if seen == 0:
                z = xi
            else:
                # the batch operator's exact half-up integer step
                z = (2 * (ln * xi + (ld - ln) * z) + ld) // (2 * ld)
            seen += 1
            ew = float(z) / float(scale)
            rows.append((key[0], int(seq), int(v), z, ew,
                         ew > ucl or ew < lcl))
        state.update((z, seen))
        yield pd.DataFrame(
            rows, columns=["key", "seq", "cnt", "z_n9", "ewma", "outside"]
        )

    return (
        stream_df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(seq_col).cast("long").alias("__seq"),
            F.col(value_col).cast("long").alias("__v"),
        )
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            "key string, seq long, cnt long, z_n9 long, ewma double, "
            "outside boolean",
            "z long, seen long",
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


TOPK_STREAM_SCHEMA = (
    "bucket long, n_batch long, items array<string>, "
    "ests array<long>, errs array<long>"
)
_TOPK_STATE_SCHEMA = (
    "keys array<string>, counts array<long>, errors array<long>, base long"
)


def stream_topk(
    stream_df: DataFrame,
    item_col: str,
    capacity: int = 64,
    n_buckets: int = 8,
    k: int = 10,
):
    """Streaming TOP K: per-bucket SpaceSaving summaries living in the
    state store — the streaming twin of operators/sketches.top_k_sketch
    and the live form of the reference's TOP K aggregation family
    (SURVEY.md §2.4: partial sketches in the filter stage, merged in the
    join stage — here the state store IS the merge point).

    Items hash into ``n_buckets`` state keys (md5 bucket — deterministic
    across engines and restarts, the sampling-draw convention); each
    bucket's state is one ``capacity``-counter SpaceSaving summary
    (``keys/counts/errors/base`` arrays — fixed-size, checkpointable).
    Every micro-batch folds the batch's exact per-item counts into the
    summary via ``offer`` and emits the bucket's current top-k with
    error bounds.  Reading side merges the ≤ n_buckets rows — each item
    lives in exactly ONE bucket, so cross-bucket merge is concatenation,
    not sketch union, and the no-false-negatives guarantee survives.

    Equivalence contract (test-pinned): with ``capacity`` ≥ the
    bucket's distinct-item count nothing ever evicts, estimates are
    EXACT counts, and a replay of any corpus matches the exact batch
    TOP K — the same exact-mode inheritance the batch sketch pins
    against the GROUP BY oracle."""
    import pandas as pd

    from bullet_storm_spark.operators.sketches import SpaceSavingSketch

    if capacity <= 0 or n_buckets <= 0 or k <= 0:
        raise ValueError("capacity, n_buckets and k must be positive")

    def fn(
        key: Tuple[int], pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        sk = SpaceSavingSketch(capacity)
        if state.exists:
            keys, counts, errors, base = state.get
            sk.counts = dict(zip(keys, counts))
            sk.errors = dict(zip(keys, errors))
            sk._base_error = base
        n_batch = 0
        for pdf in pdfs:
            n_batch += len(pdf)
            # exact in-batch combine first (one offer per distinct item)
            for item, cnt in pdf["item"].value_counts().items():
                sk.offer(item, int(cnt))
        ordered = list(sk.counts.keys())
        state.update(
            (
                ordered,
                [sk.counts[x] for x in ordered],
                [sk.errors[x] for x in ordered],
                sk._base_error,
            )
        )
        top = sk.top(k)
        yield pd.DataFrame(
            {
                "bucket": [key[0]],
                "n_batch": [n_batch],
                "items": [[t[0] for t in top]],
                "ests": [[t[1] for t in top]],
                "errs": [[t[2] for t in top]],
            }
        )

    # NULL items stringify to 'null' BEFORE bucketing — the reference's
    # TOP K convention (SURVEY §2.4, operators/top_k.NULL_RENDERING) and
    # the batch sketch's behavior; a raw NULL would count in n_batch but
    # vanish from value_counts() (pandas dropna), silently breaking the
    # exact-mode equivalence.  CONTRACT: a genuine string item "null"
    # therefore merges with NULL items into one counter — a deliberate
    # collision inherited from the reference (its TopK stringifies null
    # the same way), kept so stream and batch top-k stay replay-equal.
    # Callers needing the distinction must pre-map NULLs to their own
    # sentinel before the operator.
    item = F.coalesce(F.col(item_col).cast("string"), F.lit("null"))
    bucket = F.expr(
        f"CAST(conv(substring(md5(coalesce(CAST({item_col} AS STRING),"
        f" 'null')), 1, 8), 16, 10) AS BIGINT) % {int(n_buckets)}"
    )
    return (
        stream_df.select(
            bucket.alias("bucket"),
            item.alias("item"),
        )
        .groupBy("bucket")
        .applyInPandasWithState(
            fn,
            TOPK_STREAM_SCHEMA,
            _TOPK_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def stream_rolling_median(
    stream_df: DataFrame,
    key_col: str,
    seq_col: str,
    value_col: str,
    window_rows: int = 24,
):
    """Live trailing rolling MEDIAN per key over a stream of
    pre-aggregated observations — the streaming twin of
    ``operators/rolling.rolling_median`` (the spike-proof baseline: a
    burst cannot poison the very statistic hunting it, unlike the
    mean/std chart's baseline).

    Emits one row per observation: ``(key, seq, cnt, roll_n,
    roll_median)``. State per key is the last ``window_rows`` integer
    observations (a bounded deque) plus a count — constant memory, one
    key shuffle per batch. The median is the same (1−g)·a + g·b
    interpolation Spark's ``percentile`` and DuckDB's ``quantile_cont``
    evaluate; on integer inputs with g ∈ {0, ½} every step is exact in
    IEEE doubles, so a replayed series is BIT-equal to the batch
    operator (the stream_ewma equivalence contract — pinned by test).
    Observations are ordered by ``seq_col`` within each micro-batch;
    feed batches in order (the shared replay contract)."""
    import pandas as pd

    if window_rows < 1:
        raise ValueError(f"need window_rows >= 1, got {window_rows}")
    w = int(window_rows)

    def _median(sorted_vals) -> float:
        n = len(sorted_vals)
        h = (n - 1) * 0.5
        lo = int(h)
        hi = n - 1 - lo
        return (float(sorted_vals[lo]) + float(sorted_vals[hi])) / 2.0

    def fn(
        key: Tuple[str], pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        (vals,) = state.get if state.exists else ([],)
        vals = list(vals)
        rows = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values("__seq", kind="mergesort")
        for seq, v in zip(batch["__seq"], batch["__v"]):
            vals.append(int(v))
            if len(vals) > w:
                vals.pop(0)
            rows.append(
                (key[0], int(seq), int(v), len(vals), _median(sorted(vals)))
            )
        state.update((vals,))
        yield pd.DataFrame(
            rows, columns=["key", "seq", "cnt", "roll_n", "roll_median"]
        )

    return (
        stream_df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(seq_col).cast("long").alias("__seq"),
            F.col(value_col).cast("long").alias("__v"),
        )
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            "key string, seq long, cnt long, roll_n long, roll_median double",
            "vals array<long>",
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def stream_gap_detector(
    stream_df: DataFrame,
    key_col: str,
    seq_col: str,
):
    """Live dark-feed detector: per key, emit one row per GAP — a run
    of missing sequence slots between consecutive observed observations
    (the streaming twin of ``operators/diagnostics.gap_report``, which
    derives the same runs from zero cells on the densified offline
    spine). Feed it the observed (non-empty) hour cells an upstream
    windowed count emits; a jump from seq s to s' > s+1 means the feed
    was dark for s'−s−1 slots.

    Emits ``(key, gap_start, gap_len)`` per detected gap (append mode —
    a gap is known the moment the feed RESUMES; a still-dark feed has
    emitted nothing yet, which is exactly the offline report's
    min..max-span semantics). State per key is the last seen sequence —
    one integer. Replay equivalence with the batch report is pinned by
    test: replaying a key's observed hours yields gap runs whose count,
    total length and max length equal gap_report's (n_gaps, zero_hours,
    longest_gap)."""
    import pandas as pd

    def fn(
        key: Tuple[str], pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        (last,) = state.get if state.exists else (None,)
        rows = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values("__seq", kind="mergesort")
        for seq in batch["__seq"]:
            s = int(seq)
            if last is not None and s > last + 1:
                rows.append((key[0], last + 1, s - last - 1))
            last = s if last is None else max(last, s)
        state.update((last,))
        yield pd.DataFrame(rows, columns=["key", "gap_start", "gap_len"])

    return (
        stream_df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(seq_col).cast("long").alias("__seq"),
        )
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            "key string, gap_start long, gap_len long",
            "last long",
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


TRANSITIONS_STREAM_SCHEMA = (
    "user_id long, from_type string, to_type string, cnt long"
)
_TRANSITIONS_STATE_SCHEMA = "last_type string, last_us long, last_id long"


def stream_transitions(stream_df: DataFrame):
    """Streaming per-user event-type transition deltas — the live feed
    for :func:`operators.behavior.transition_matrix` /
    :func:`operators.behavior.entropy_rate`: each micro-batch emits
    ``(user_id, from_type, to_type, cnt)`` for the consecutive pairs it
    completed, INCLUDING the pair that straddles the batch boundary (the
    user's final event of the previous batch carries over in one row of
    state: last type + its (us, event_id) order key). Downstream folds
    the deltas with a plain SUM — transition counts are additive — and
    applies the batch entropy/probability formulas.

    Equivalence contract (test-pinned): replaying a corpus in batches
    that respect per-user event-time order (in-batch disorder is fine —
    each batch sorts on (us, event_id) before pairing) and summing the
    emitted deltas reproduces the batch ``transition_matrix`` counts
    exactly. Cross-batch LATE arrivals — events whose (us, event_id)
    order key is at or before the carried state's — would pair in the
    wrong order, so they are DROPPED from pairing and surfaced as one
    ``(user_id, '__late__', '__late__', n_dropped)`` marker row per
    batch (ADVICE r9: the stored order key now enforces the contract it
    exists to order against; downstream sums can filter or alert on the
    marker). Front the operator with a watermark if the source reorders
    across batches and late loss matters. Bounded state: one
    (string, long, long) row per user, regardless of history length."""
    import pandas as pd

    def fn(
        key: Tuple[int], pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        rows = []
        for pdf in pdfs:
            rows.append(pdf)
        batch = pd.concat(rows, ignore_index=True) if rows else pd.DataFrame(
            columns=["us", "event_id", "event_type"]
        )
        batch = batch.sort_values(
            ["us", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        n_late = 0
        seq = list(batch["event_type"])
        if state.exists:
            last_type, last_us, last_id = state.get
            if len(batch):
                fresh = (batch["us"] > last_us) | (
                    (batch["us"] == last_us) & (batch["event_id"] > last_id)
                )
                n_late = int((~fresh).sum())
                if n_late:
                    batch = batch[fresh].reset_index(drop=True)
                    seq = list(batch["event_type"])
            seq = [last_type] + seq
        counts: dict = {}
        for a, b in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
        if len(batch):
            tail = batch.iloc[-1]
            state.update(
                (str(tail["event_type"]), int(tail["us"]), int(tail["event_id"]))
            )
        out = [
            (key[0], a, b, c) for (a, b), c in sorted(counts.items())
        ]
        if n_late:
            out.append((key[0], "__late__", "__late__", n_late))
        yield pd.DataFrame(
            out, columns=["user_id", "from_type", "to_type", "cnt"]
        )

    return (
        stream_df.select(
            "user_id",
            F.expr("(ts_ns div 1000)").alias("us"),
            "event_id",
            "event_type",
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            TRANSITIONS_STREAM_SCHEMA,
            _TRANSITIONS_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


FIRST_SEEN_SCHEMA = "id long, fingerprint string, keep boolean, saturation double"
_FIRST_SEEN_STATE_SCHEMA = "bloom binary, n_set long"


def stream_first_seen(
    stream_df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 1 << 16,
    hashes: int = 4,
    groups: int = 16,
    saturation_limit: float | None = None,
) -> DataFrame:
    """Streaming ingest-time first-seen dedup with an UNBOUNDED horizon
    and BOUNDED state — the third member of the dedup-at-ingest family:
    ``stream_dedup`` is exact within the watermark horizon (state
    evicts, an old doc re-ingested after the horizon passes again);
    ``stream_dedup_incremental`` is near-dup against a persisted band
    index; this one never forgets and never grows — each record's
    whitespace/case-fold fingerprint (the same ``functions/text.
    fingerprint`` key, computed JVM-side) is checked against a per-group
    Bloom filter carried in state; output ``(id, fingerprint, keep,
    saturation)`` with ``keep`` true for the first sighting ACROSS
    batches and the first occurrence (by id, over the WHOLE micro-batch
    — the group's Arrow chunks are concatenated and sorted once before
    the scan, so a duplicate pair split across chunks still resolves to
    the lowest id) within a batch. One ``bits/8``-byte state cell per
    group, deterministic bit positions (md5 slices of the fingerprint —
    partitioning/replay-identical).

    Bloom-exactness contract — this is NOT symmetric exact dedup: no
    false KEEPs ever (a set bit never clears), but a filter false
    positive DROPS a never-seen record, which is silent data loss if the
    filter is under-sized. The false-drop probability is the standard
    ``(1 - e^(-k*n/m))^k``; size ``bits`` for the expected distinct
    count per group (fingerprints spread uniformly over ``groups`` by
    their first hex byte — with the default 2^16 bits it reaches ~1%
    around 3.3k distinct docs per group). With ``bits`` sized 10x the
    corpus the replay equals the batch operator's keep set exactly
    (test-pinned).

    SATURATION IS SURFACED, not silent (advice r10): every output row
    carries the group filter's estimated false-drop probability
    (computed from the tracked insert count ``n_set`` after the row's
    batch), so a dashboard threshold on ``max(saturation)`` sees an
    under-sized filter while the keeps are still trustworthy; and when
    ``saturation_limit`` is set, the operator raises loudly (failing
    the streaming query) the moment any group's estimate crosses it —
    re-size ``bits``/``groups`` and replay rather than ingest through a
    saturated filter."""
    if bits < 8 or bits & (bits - 1):
        raise ValueError(f"bits must be a power of two >= 8, got {bits}")
    if not 1 <= hashes <= 16:
        raise ValueError(f"need 1 <= hashes <= 16, got {hashes}")
    if saturation_limit is not None and not 0 < saturation_limit <= 1:
        raise ValueError(
            f"need 0 < saturation_limit <= 1, got {saturation_limit}"
        )
    import math

    import pandas as pd

    from bullet_storm_spark.functions.text import fingerprint

    nbytes = bits // 8
    k = hashes

    def fn(
        key: Tuple[int], pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        if state.exists:
            blob, n_set = state.get
            bloom = bytearray(blob)
        else:
            bloom = bytearray(nbytes)
            n_set = 0

        def positions(fp_hex: str):
            # k deterministic positions from md5 hex slices: 8 hex chars
            # (32 bits) per hash, stride 6 so 16 hashes fit in 2x md5;
            # the fingerprint IS an md5, so slices are already uniform
            for j in range(k):
                yield int(fp_hex[j * 6 : j * 6 + 8].ljust(8, "0"), 16) % (
                    nbytes * 8
                )

        # concatenate the group's Arrow chunks and sort ONCE: the
        # "first occurrence by id within a batch" contract must hold
        # across chunk boundaries (state groups are bounded, so the
        # concat is too)
        chunks = list(pdfs)
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else (chunks[0] if chunks else pd.DataFrame({"id": [], "fp": []}))
        )
        pdf = pdf.sort_values("id", kind="mergesort")
        keeps = []
        for fp in pdf["fp"]:
            pos = list(positions(fp))
            seen = all(bloom[p >> 3] & (1 << (p & 7)) for p in pos)
            if not seen:
                for p in pos:
                    bloom[p >> 3] |= 1 << (p & 7)
                n_set += 1
            keeps.append(not seen)
        # estimated false-drop probability at the END of this batch —
        # the group's saturation readout, one exp per batch
        sat = (1.0 - math.exp(-k * n_set / (nbytes * 8.0))) ** k
        if saturation_limit is not None and sat > saturation_limit:
            raise ValueError(
                f"stream_first_seen bloom saturated: group {key[0]} holds "
                f"{n_set} inserts in {nbytes * 8} bits -> estimated "
                f"false-drop rate {sat:.4f} > limit {saturation_limit}. "
                "New documents are now being dropped as duplicates at "
                "that rate; re-size bits/groups and replay."
            )
        if len(pdf):
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_list(),
                    "fingerprint": pdf["fp"].to_list(),
                    "keep": keeps,
                    "saturation": [sat] * len(pdf),
                }
            )
        state.update((bytes(bloom), int(n_set)))

    fp = fingerprint(text_col)
    return (
        stream_df.select(
            F.col(id_col).cast("long").alias("id"),
            fp.alias("fp"),
            # group on the fingerprint's first hex byte: uniform spread,
            # and every duplicate lands in the SAME group/state cell
            (F.conv(F.substring(fp, 1, 2), 16, 10) % groups)
            .cast("int")
            .alias("grp"),
        )
        .groupBy("grp")
        .applyInPandasWithState(
            fn,
            FIRST_SEEN_SCHEMA,
            _FIRST_SEEN_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
