"""r9 operator invariants: Nelson-Aalen, log-rank, Lorenz curve,
vocabulary richness, LSH band planning. Cross-engine exactness is the
oracle gate's job (scripts/oracle_check.py); these pin the mathematical
invariants each statistic must satisfy on any input."""

import math

from pyspark.sql import functions as F

from bullet_storm_spark.operators.concentration import lorenz_curve
from bullet_storm_spark.operators.dedup import lsh_band_plan
from bullet_storm_spark.operators.survival import logrank_test, nelson_aalen
from bullet_storm_spark.operators.vocab import vocabulary_richness
from bullet_storm_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_nelson_aalen_invariants(spark):
    rows = nelson_aalen(load_table(spark, SF, "events")).collect()
    assert rows, "no event times"
    prev_h = 0.0
    for r in rows:
        assert r.n_events >= 1 and r.n_risk >= r.n_events
        assert 0 < r.hazard_term <= 1.0
        assert r.cum_hazard >= prev_h  # cumulative hazard is nondecreasing
        prev_h = r.cum_hazard
        assert r.cum_var <= r.cum_hazard + 1e-12  # d/n^2 <= d/n termwise
    # first row: H = first term exactly (decimal accumulation)
    assert math.isclose(rows[0].cum_hazard, rows[0].hazard_term, rel_tol=1e-9)


def test_logrank_matches_pooled_counts(spark):
    df = load_table(spark, SF, "events")
    from bullet_storm_spark.operators.sampling import hash_fraction

    out = logrank_test(df, hash_fraction("user_id", "logrank-v1") < 0.5).collect()
    assert len(out) == 1
    r = out[0]
    assert r.chi2 is None or r.chi2 >= 0.0
    assert r.var_sum > 0 and r.n_event_times >= 1
    # observed totals must equal the pooled churn count from the KM frame
    from bullet_storm_spark.operators.survival import km_survival

    km = km_survival(df).collect()
    assert r.obs_a + r.obs_b == sum(k.n_events for k in km)
    # expectation totals match observation totals in a pooled sense:
    # sum(E_a) close to obs share under H0 magnitudes (sanity, not a test
    # of significance)
    assert 0 < r.exp_a < r.obs_a + r.obs_b


def test_lorenz_curve_is_a_lorenz_curve(spark):
    rows = lorenz_curve(load_table(spark, SF, "events"), "user_id").collect()
    assert [r.point for r in rows] == list(range(1, 11))
    shares = [r.cum_share for r in rows]
    assert all(b >= a for a, b in zip(shares, shares[1:]))  # nondecreasing
    assert math.isclose(shares[-1], 1.0, rel_tol=1e-9)  # all mass at p=10
    # convexity of the ascending-order curve: bottom half owns less than
    # its population share
    assert shares[4] <= 0.5 + 1e-9
    # counts are exact: last cut covers every actor
    per = (
        load_table(spark, SF, "events")
        .groupBy("user_id").count().count()
    )
    assert rows[-1].n_keys_le == per


def test_vocabulary_richness_invariants(spark):
    docs = load_table(spark, SF, "documents")
    rows = vocabulary_richness(docs, "source", "text").collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_types <= r.n_tokens
        assert 0 <= r.n_hapax <= r.n_types and 0 <= r.n_dis <= r.n_types
        assert 0.0 <= r.hapax_ratio <= 1.0
        assert 0.0 <= r.simpson_d <= 1.0
        assert r.yule_k >= 0.0
    # hand-check one tiny frame: "a a b" -> N=3, V=2, tf = {a:2, b:1}
    tiny = spark.createDataFrame([("s", "a a b")], "source string, text string")
    t = vocabulary_richness(tiny, "source", "text").collect()[0]
    assert (t.n_tokens, t.n_types, t.n_hapax, t.n_dis) == (3, 2, 1, 1)
    assert math.isclose(t.simpson_d, (2 * 1) / (3 * 2), rel_tol=1e-9)
    assert math.isclose(t.yule_k, 1e4 * (5 - 3) / 9.0, rel_tol=1e-9)


def test_lsh_band_plan_workload_grows_with_bands(spark):
    docs = load_table(spark, SF, "documents")
    rows = lsh_band_plan(docs, "doc_id", "text", num_hashes=16, shingle_n=3).collect()
    assert [r.bands for r in rows] == [2, 4, 8, 16]
    # fixed H: more bands = fewer rows per band = looser filter = at
    # least as many candidate pairs (monotone workload), and the
    # estimated threshold knee must fall
    pairs = [r.n_candidate_pairs for r in rows]
    assert all(b >= a for a, b in zip(pairs, pairs[1:]))
    ests = [r.est_threshold for r in rows]
    assert all(b < a for a, b in zip(ests, ests[1:]))
    for r in rows:
        assert r.bands * r.rows_per_band == 16
        assert r.max_bucket >= 1 and r.n_buckets >= 1


def test_token_waterfill_math(spark):
    from bullet_storm_spark.operators.sampling import token_waterfill

    # three sources: 10 / 100 / 1000 tokens, epoch cap 2x -> caps
    # 20/200/2000; budget 1000: a and b cap out (20 + 200 — the even
    # share exceeds both caps at every waterline stage), c takes the
    # remaining 780 uncapped (θ = 780 < 2000)
    rows = [("a", " ".join(["t"] * 10)), ("b", " ".join(["t"] * 100)),
            ("c", " ".join(["t"] * 1000))]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {
        r.stratum: r
        for r in token_waterfill(
            df, "source", "text", budget_tokens=1000, max_epochs=2.0
        ).collect()
    }
    assert out["a"].capped and out["a"].allocated == 20.0
    assert out["b"].capped and out["b"].allocated == 200.0
    assert not out["c"].capped and out["c"].allocated == 780.0
    assert out["b"].epochs_used == 2.0 and out["c"].epochs_used == 0.78
    assert sum(r.allocated for r in out.values()) == 1000.0
    assert all(r.unallocated_tokens == 0 for r in out.values())
    # budget exceeding total capacity: everyone capped, remainder reported
    out2 = {
        r.stratum: r
        for r in token_waterfill(
            df, "source", "text", budget_tokens=10_000, max_epochs=2.0
        ).collect()
    }
    assert all(r.capped for r in out2.values())
    assert all(r.unallocated_tokens == 10_000 - 2220 for r in out2.values())
    assert sum(r.allocated for r in out2.values()) == 2220.0


def test_stickiness_invariants(spark):
    from bullet_storm_spark.operators.behavior import stickiness_report

    rows = stickiness_report(load_table(spark, SF, "events")).collect()
    assert rows
    for r in rows:
        assert 1 <= r.dau <= r.wau          # the window contains the day
        assert 0.0 < r.stickiness <= 1.0
    # a single-day corpus: dau == wau == distinct users, stickiness 1.0
    one = spark.createDataFrame(
        [(u, u * 1_000_000_000) for u in range(7)], "user_id long, ts_ns long"
    )
    r = stickiness_report(one).collect()
    assert len(r) == 1 and r[0].dau == r[0].wau == 7 and r[0].stickiness == 1.0


def test_entropy_rate_known_chain(spark):
    import math

    from bullet_storm_spark.operators.behavior import entropy_rate

    # deterministic alternating chain a->b->a->...: H = 0, predictability 1
    rows = [
        (i, 1, "a" if i % 2 == 0 else "b", i * 1_000_000_000)
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_ns long"
    )
    r = entropy_rate(df).collect()[0]
    assert r.n_states == 2 and r.entropy_rate == 0.0
    assert math.isclose(r.predictability, 1.0, rel_tol=1e-9)


def test_shipping_delay_nonnegative(spark):
    import __spark_entry__ as e

    rows = e.queries()["join_shipping_delay"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_items > 0
        assert 0 <= r.mean_delay_days <= r.max_delay_days
        assert 0 <= r.median_delay_days <= r.max_delay_days
