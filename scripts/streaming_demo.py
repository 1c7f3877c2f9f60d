#!/usr/bin/env python
"""End-to-end streaming demo: a live file-backed stream, BQL queries
submitted mid-flight THROUGH THE OUT-OF-PROCESS SPOOL (a separate client
process drops JSON files; the engine drains them per micro-batch, the
QuerySpout/PubSub shape), windowed emissions, a cross-process kill
signal, and a JSONL result sink — the whole reference lifecycle on one
screen.

Usage: python scripts/streaming_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bullet_storm_spark import get_spark
from bullet_storm_spark.sources.tables import load_table
from bullet_storm_spark.streaming import (
    FileControlChannel,
    QueryRegistry,
    StreamingEngine,
)
from bullet_storm_spark.streaming.sinks import JsonlResultSink


def client_process(spool: str, code: str) -> None:
    """Run control-plane actions in a SEPARATE OS process (no engine
    object in hand — just the spool directory path)."""
    subprocess.run(
        [
            sys.executable,
            "-c",
            "from bullet_storm_spark.streaming import FileControlClient\n"
            f"client = FileControlClient({spool!r})\n" + code,
        ],
        check=True,
        env={**os.environ, "PYTHONPATH": REPO},
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="bullet-storm-spark-demo", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    workdir = tempfile.mkdtemp(prefix="bss-demo-")
    src = os.path.join(workdir, "stream")
    spool = os.path.join(workdir, "spool")
    os.makedirs(src)
    sink_path = os.path.join(workdir, "results.jsonl")
    print(f"stream dir: {src}\ncontrol:    {spool}\nresults:    {sink_path}")

    engine = StreamingEngine(
        spark,
        registry=QueryRegistry(storage_dir=os.path.join(workdir, "registry")),
        channel=FileControlChannel(spool),
    )
    engine.on_result(JsonlResultSink(sink_path))
    engine.on_result(lambda qid, clip: print(f"  -> [{qid}] {clip.to_json()[:140]}"))

    events = load_table(spark, sf_dir, "events").drop("ts", "ts_ns")
    half1 = events.where("event_id % 2 = 0")
    half2 = events.where("event_id % 2 = 1")

    print("\n== submit standing queries (BQL) from a separate process ==")
    queries = {
        "purchases": "SELECT COUNT(*) AS cnt, SUM(value) AS revenue "
        "FROM STREAM(600000, TIME) WHERE event_type = 'purchase' "
        "WINDOWING EVERY(400, TIME)",
        "top-types": "SELECT TOP(3, event_type) AS cnt FROM STREAM(600000, TIME)",
        "big-raw": "SELECT * FROM STREAM(600000, TIME) WHERE value > 300 LIMIT 5",
    }
    for qid, bql in queries.items():
        print(f"  {qid}: {bql}")
    client_process(
        spool,
        "".join(f"client.submit({qid!r}, {bql!r})\n" for qid, bql in queries.items()),
    )

    stream = spark.readStream.schema(half1.schema).parquet(src)
    query = engine.attach(
        stream, trigger_ms=200, checkpoint_dir=os.path.join(workdir, "ckpt")
    )
    try:
        print("\n== feed first half of the stream ==")
        half1.write.mode("append").parquet(src)
        query.processAllAvailable()
        time.sleep(0.5)  # let a window close

        print("\n== feed second half ==")
        half2.write.mode("append").parquet(src)
        query.processAllAvailable()

        print("\n== kill the top-k query mid-flight (separate process) ==")
        client_process(spool, "client.kill('top-types')\n")
        half1.limit(0).write.mode("append").parquet(src)  # tick the engine
        query.processAllAvailable()
    finally:
        query.stop()

    print("\n== engine stats ==")
    for k, v in engine.stats().items():
        print(f"  {k}: {v}")
    print("\n== final states of live queries ==")
    for qid, rq in engine.registry.queries.items():
        print(f"  {qid}: {rq.state.result()[:3]}")
    n_lines = sum(1 for _ in open(sink_path))
    print(f"\n{n_lines} results written to {sink_path}")
    spark.stop()


if __name__ == "__main__":
    main()
