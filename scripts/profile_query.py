#!/usr/bin/env python
"""Profile declared queries stage-by-stage: run each query once (after a
warm run) with the Spark UI enabled, then dump per-stage metrics from the
UI REST API — task count, executor run time, input/shuffle volumes —
sorted by executor time. The fastest way to spot a single-task stage or
an interpreted-expression hotspot (guide §7.1).

Usage: python scripts/profile_query.py NAME [NAME ...]
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from bullet_storm_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark(
        app_name="profile-query",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4099/api/v1/applications/{app_id}"

    def stages():
        with urllib.request.urlopen(f"{base}/stages?status=complete") as r:
            return json.load(r)

    for name in names:
        fn = queries[name]
        fn(spark, SF_DIR).count()  # warm codegen
        seen = {s["stageId"] for s in stages()}
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        wall = time.perf_counter() - t0
        time.sleep(0.5)
        new = [s for s in stages() if s["stageId"] not in seen]
        new.sort(key=lambda s: -s["executorRunTime"])
        print(f"\n=== {name}: wall {wall:.2f}s, {len(new)} stages ===")
        for s in new[:14]:
            print(
                f"  stage {s['stageId']:>4} tasks={s['numCompleteTasks']:>3} "
                f"exec={s['executorRunTime']/1e3:7.2f}s "
                f"cpu={s.get('executorCpuTime',0)/1e9:7.2f}s "
                f"in={s['inputBytes']>>10}K sh_r={s['shuffleReadBytes']>>10}K "
                f"sh_w={s['shuffleWriteBytes']>>10}K  {s['name'][:60]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
