#!/usr/bin/env python
"""Strong-scaling curve: the same sf0.1 workload at increasing local[N]
parallelism, one fresh JVM per point (master is fixed per session).

Measures the three shuffle-heavy shapes whose scaling behavior the 100 TB
design notes argue from: the MinHash LSH pair pipeline (explode + two
shuffles), the SimHash pipeline (wide aggregate + banded join), and the
sparse TF-IDF similarity join (posting self-join). Each point reports the
steady (second-run) time; writes one JSON line per point.

Usage: python scripts/scaling_curve.py [out.jsonl]
"""

from __future__ import annotations

import json
import subprocess
import sys

CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import bullet_storm_spark as bss
from bullet_storm_spark.operators import dedup, vocab
from bullet_storm_spark.sources.tables import load_table

n = int(sys.argv[1])
only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 and sys.argv[2] else None
spark = bss.get_spark(app_name=f"scale-{n}", master=f"local[{n}]",
                      shuffle_partitions=max(n, 4))
spark.sparkContext.setLogLevel("ERROR")
docs = load_table(spark, "/root/testdata/sf0.1", "documents")
docs = docs.persist(); docs.count()

def run(name, fn):
    if only is not None and name not in only:
        return name, None
    fn().count()              # warm plan + codegen
    t0 = time.perf_counter(); fn().count(); dt = time.perf_counter() - t0
    return name, round(dt, 3)

out = dict([
    run("minhash_lsh_pairs", lambda: dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=64, bands=16, shingle_n=3,
        threshold=0.5)),
    run("simhash_pairs", lambda: dedup.simhash_pairs(
        docs, "doc_id", "text", shingle_n=3, max_hamming=3)),
    run("tfidf_pairs", lambda: vocab.tfidf_pairs(
        docs, "doc_id", "text", df_cap=100, min_sim=0.3)),
    run("winnow_pairs", lambda: __import__(
        "bullet_storm_spark.operators.winnow", fromlist=["winnow"]
    ).winnow_neardup_pairs(
        docs, "doc_id", "text", k=8, w=16, min_shared=4, df_cap=30)),
    # r6: the 3-stage entity-resolution pipeline (the heaviest bench
    # entry: linkage join + pointer-jumping components + survivorship)
    run("link_resolve", lambda: (lambda L: L.resolve_entities(
        load_table(spark, "/root/testdata/sf0.1", "customer"),
        "c_custkey", ["c_nationkey", "c_mktsegment"],
        [L.Comparator("c_name", "levenshtein", weight=2.0, scale=4.0),
         L.Comparator("c_acctbal", "abs_diff", weight=1.0, scale=500.0)],
        threshold=1.5, survivor_col="c_acctbal"))(
        __import__("bullet_storm_spark.operators.linkage",
                   fromlist=["linkage"]))),
    # r6 late additions: the (doc,token) two-shuffle entropy shape and
    # the scan-regex + single-agg URL dedup shape
    run("token_entropy", lambda: __import__(
        "bullet_storm_spark.operators.quality", fromlist=["quality"]
    ).token_entropy(docs, "doc_id", "text")),
    run("url_dedup", lambda: (lambda U, F: U.url_dedup_report(
        docs.select("doc_id", F.expr(
            "'https://' || source || '.example.com/a/' "
            "|| CAST(doc_id % 40 AS STRING) "
            "|| CASE WHEN doc_id % 4 = 0 THEN '?utm_source=x' ELSE '' END"
        ).alias("url")), "doc_id", "url"))(
        __import__("bullet_storm_spark.operators.urls", fromlist=["urls"]),
        __import__("pyspark.sql.functions", fromlist=["functions"]))),
])
out = {k: v for k, v in out.items() if v is not None}
print("RESULT " + json.dumps({"cores": n, **out}))
spark.stop()
"""


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/dev/stdout"
    only = sys.argv[2] if len(sys.argv) > 2 else ""
    results = []
    for n in (1, 2, 4, 8, 16, 32):
        proc = subprocess.run(
            [sys.executable, "-c", CHILD, str(n), only],
            capture_output=True, text=True, timeout=1800,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(f"cores={n} FAILED:\n{proc.stderr[-2000:]}", file=sys.stderr)
            continue
        rec = json.loads(line[0][len("RESULT "):])
        results.append(rec)
        print(json.dumps(rec), flush=True)
    if out_path != "/dev/stdout":
        with open(out_path, "w") as f:
            for rec in results:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
