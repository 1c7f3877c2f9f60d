#!/usr/bin/env python
"""Measure individual declared queries: steady wall time (same
two-smallest-within-10% rule as bench.py), optionally dump
.explain('formatted') to a file.

Usage:
  python scripts/bench_one.py NAME [NAME ...] [--plans DIR] [--suffix S]
         [--noop] [--runs-cap N]

Timing uses df.count() (the bench.py contract) unless --noop, which times
a noop-sink write (guide §1.4) to include every column's computation.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from bullet_storm_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    plans_dir = None
    suffix = "plan"
    noop = "--noop" in sys.argv
    cap = 6
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--plans":
            plans_dir = argv[i + 1]
            args.remove(argv[i + 1])
        if a == "--suffix":
            suffix = argv[i + 1]
            args.remove(argv[i + 1])
        if a == "--runs-cap":
            cap = int(argv[i + 1])
            args.remove(argv[i + 1])

    spark = get_spark(app_name="bench-one")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    warm_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.01")
    out = {}
    for name in args:
        fn = queries[name]
        spark.sparkContext.setJobDescription(name)
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = fn(spark, SF_DIR)
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        # warm: compile codegen at sf0.01 twice (bench.py methodology)
        try:
            fn(spark, warm_dir).count()
            fn(spark, warm_dir).count()
        except Exception:
            pass
        runs = []
        while True:
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            if noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            runs.append(time.perf_counter() - t0)
            s = sorted(runs)
            if len(runs) >= 2 and s[1] <= s[0] * 1.10:
                break
            if len(runs) >= cap:
                break
        out[name] = min(runs)
        print(f"{name}: {min(runs):.3f}s rows={n} runs={[round(r,2) for r in runs]}",
              flush=True)
    print("TOTAL", round(sum(out.values()), 3))
    spark.stop()


if __name__ == "__main__":
    main()
