#!/usr/bin/env python
"""Weak-scaling (data-scaling) curve for the heaviest pair/ANN families
(VERDICT r9 item 2): measure sec AND output cardinality vs sf at sf0.1
(driver testdata) and sf0.3/1/3 (scripts/gen_scaledata.py, same
generative process) and fit the scaling exponent b in t = a * sf^b.

Output cardinality rides along because the corpus itself makes some
entries OUTPUT-bound, not plan-bound: the driver's documents table is a
31-word salad, so near-dup pair density is real and the pair-join
OUTPUT grows super-linearly with sf (first measured live — at sf3 one
simhash band bucket produced a single shuffle task that wrote for 10+
minutes). For those entries the honest linearity metric is
sec / output-row (flat = the engine is linear in the work it is asked
to produce), and the sf range is capped where the OUTPUT explodes
(`max_sf` per entry) — at 100 TB nobody materializes quadratic pair
lists; the banded plan bounds candidates and the lsh_band_plan entry is
the pre-flight that says so before a sweep.

Entries come straight from __spark_entry__.queries() so the measured
plan IS the graded plan. Steady rule mirrors bench.py: re-run until the
two smallest agree within 10% (max 4 runs), report the min.

Usage: python scripts/weak_scaling.py [out.json]
"""
from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

# (entry, max_sf): simhash pairs capped at sf1 — its OUTPUT is
# quadratic on the tiny-vocab corpus (measured: sf3 emits a single
# multi-GB bucket shuffle), which measures the corpus, not the plan
# embed_cos_histogram is also capped: at FIXED hyperplane count its
# candidate-pair stage is inherently quadratic in corpus size (measured
# sf0.1->0.3: 3.4 s -> 27.9 s) — the 100 TB posture is to grow the
# plane count with n (or sample buckets), which changes the statistic;
# the curve documents the fixed-parameter behavior honestly instead
ENTRIES = [
    ("dedup_simhash_pairs", 1.0),
    ("dedup_minhash_lsh_pairs_3gram", 1.0),  # 3-gram shingles: distinctive
    # signatures, so pair output stays near-linear on this corpus
    ("embed_cos_histogram", 1.0),
    ("embed_cos_histogram_capped", 3.0),  # the r10 fix: bounded pair stage
    ("ann_quantized_arrow", 3.0),
    # r11: curves for two newly budget-guarded families. winnow: df_cap
    # bounds the worst fingerprint bucket but candidate volume is still
    # Sigma C(df,2) over kept fps; tfidf: the posting-list join over
    # mid-frequency terms (fixed df_cap=100 keeps only the rare tail as
    # the corpus grows, so wall should stay agg-dominated ~linear)
    ("dedup_winnow_pairs", 3.0),
    ("sim_tfidf_pairs", 3.0),
]
POINTS = [
    (0.1, "/root/testdata/sf0.1"),
    (0.3, "/root/repo/.scaledata/sf0.3"),
    (1.0, "/root/repo/.scaledata/sf1"),
    (3.0, "/root/repo/.scaledata/sf3"),
]


def steady(fn) -> tuple[float, int, list[float]]:
    runs = []
    rows = 0
    while True:
        t0 = time.perf_counter()
        rows = fn()
        runs.append(time.perf_counter() - t0)
        s = sorted(runs)
        if len(runs) >= 2 and s[1] <= s[0] * 1.10:
            return s[0], rows, runs
        if len(runs) >= 4:
            return s[0], rows, runs


def fit_exponent(pts: list[tuple[float, float]]) -> float:
    xs = [math.log(x) for x, _ in pts]
    ys = [math.log(t) for _, t in pts]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return num / den


def main() -> None:
    import bullet_storm_spark as bss
    import __spark_entry__ as entry

    spark = bss.get_spark(
        app_name="weak-scaling", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    dest = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/WEAK_SCALING.json"
    out: dict = {}
    try:  # resume: points already measured (same harness) are kept
        out = {
            k: {"points": v.get("points", {})}
            for k, v in json.load(open(dest)).items()
        }
    except (OSError, ValueError):
        pass
    for name, max_sf in ENTRIES:
        prior = out.get(name, {}).get("points", {})
        series: list[tuple[float, float, int]] = []
        for sf, d in POINTS:
            if sf > max_sf:
                continue
            key = f"sf{sf:g}"
            if key in prior:
                series.append((sf, prior[key]["sec"], prior[key]["out_rows"]))
                continue
            fn = lambda: qs[name](spark, d).count()  # noqa: E731
            fn()  # warm plan + codegen + page cache
            t, rows, runs = steady(fn)
            series.append((sf, t, rows))
            print(
                f"# {name} sf{sf:g}: {t:.2f}s rows={rows} "
                f"{['%.2f' % r for r in runs]}",
                file=sys.stderr,
                flush=True,
            )
        out[name] = {
            "points": {
                f"sf{sf:g}": {"sec": round(t, 3), "out_rows": rows}
                for sf, t, rows in series
            },
            "time_vs_sf_exponent": round(
                fit_exponent([(sf, t) for sf, t, _ in series]), 3
            ),
            "rows_vs_sf_exponent": round(
                fit_exponent([(sf, max(r, 1)) for sf, _, r in series]), 3
            ),
        }
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
