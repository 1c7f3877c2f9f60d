"""Property-based testing of the round-4-session operators against
pure-Python references: sessionization, duplicated spans, KS drift, and
priority sampling must match a brute-force implementation on ARBITRARY
inputs, not just the handcrafted fixtures."""

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from bullet_storm_spark.operators import anomaly, behavior, sampling, spans

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --- sessionize vs sequential reference -------------------------------------

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),          # user
        st.integers(min_value=0, max_value=500),        # minutes
    ),
    min_size=1,
    max_size=40,
)


@SETTINGS
@given(evs=events_strategy)
def test_sessionize_matches_reference(spark, evs):
    rows = [
        (i, u, float(i), m * 60_000_000 * 1000)  # ns
        for i, (u, m) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, value double, ts_ns long"
    )
    got = {
        (r.user_id, r.session_idx): (r.n_events, r.start_us, r.end_us)
        for r in behavior.sessionize(df, gap_minutes=30).collect()
    }
    # reference: per user, sort by (us, event_id), split on >30min gaps
    ref = {}
    by_user = {}
    for i, (u, m) in enumerate(evs):
        by_user.setdefault(u, []).append((m * 60_000_000, i))
    for u, lst in by_user.items():
        lst.sort()
        idx, start, end, n = 0, None, None, 0
        for us, _ in lst:
            if start is None:
                idx, start, end, n = 1, us, us, 1
            elif us - end > 30 * 60_000_000:
                ref[(u, idx)] = (n, start, end)
                idx, start, end, n = idx + 1, us, us, 1
            else:
                end, n = us, n + 1
        ref[(u, idx)] = (n, start, end)
    assert got == ref


# --- duplicated spans vs brute-force reference ------------------------------

docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
        min_size=0,
        max_size=12,
    ),
    min_size=1,
    max_size=8,
)


@SETTINGS
@given(docs=docs_strategy)
def test_duplicated_spans_match_reference(spark, docs):
    n = 3
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in spans.duplicated_spans(df, "doc_id", "text", ngram=n).collect():
        got.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    # reference: count each positional n-gram corpus-wide, mark covered
    # positions of duplicated ones, merge adjacent/overlapping ranges
    from collections import Counter

    grams = Counter()
    for toks in docs:
        for i in range(len(toks) - n + 1):
            grams[tuple(toks[i : i + n])] += 1
    ref = {}
    for d, toks in enumerate(docs):
        covered = set()
        for i in range(len(toks) - n + 1):
            if grams[tuple(toks[i : i + n])] >= 2:
                covered.update(range(i, i + n))
        if not covered:
            continue
        out, run = [], None
        for p in sorted(covered):
            if run and p <= run[1] + 1:
                run[1] = p
            else:
                if run:
                    out.append(tuple(run))
                run = [p, p]
        out.append(tuple(run))
        ref[d] = out
    assert got == ref


# --- KS drift vs brute force ------------------------------------------------

ks_strategy = st.lists(
    st.tuples(st.integers(0, 1), st.integers(-5, 5)), min_size=2, max_size=60
).filter(lambda xs: any(g == 0 for g, _ in xs) and any(g == 1 for g, _ in xs))


@SETTINGS
@given(xs=ks_strategy)
def test_ks_drift_matches_reference(spark, xs):
    rows = [(i, float(v), g) for i, (g, v) in enumerate(xs)]
    df = spark.createDataFrame(rows, "id long, v double, g int")
    out = anomaly.ks_drift(df, "v", F.col("g") == 0, F.col("g") == 1).collect()[0]
    a = sorted(v for g, v in xs if g == 0)
    b = sorted(v for g, v in xs if g == 1)
    support = sorted(set(a) | set(b))
    best, best_at = -1, None
    for x in support:
        ca = sum(1 for v in a if v <= x)
        cb = sum(1 for v in b if v <= x)
        num = abs(ca * len(b) - cb * len(a))
        if num > best:
            best, best_at = num, x
    assert out.ks_num == best
    assert out.at_value == float(best_at)
    assert out.n_a == len(a) and out.n_b == len(b)


# --- priority sample is the k smallest priorities ---------------------------

@SETTINGS
@given(
    weights=st.lists(st.floats(0.5, 8.0), min_size=5, max_size=40),
    k=st.integers(1, 10),
)
def test_priority_sample_matches_reference(spark, weights, k):
    rows = [(i, round(w, 3)) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [
        r.doc_id
        for r in sampling.priority_sample(df, "doc_id", F.col("w"), k=k).collect()
    ]
    # reference: identical md5-derived u and priority formula
    import hashlib

    def pri(i, w):
        h = int(hashlib.md5(f"{i}:prio".encode()).hexdigest()[:8], 16)
        u = (h + 1) / (float(1 << 32) + 1.0)
        return round(-math.log(u) / round(w, 9), 9)

    ref = sorted(
        ((pri(i, w), i) for i, w in rows if round(w, 9) > 0),
    )[: k]
    assert got == [i for _, i in ref]
