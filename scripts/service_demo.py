#!/usr/bin/env python
"""Engine-as-a-service demo: every external surface at once.

One process hosts: the streaming engine attached to a live file stream
with its OUT-OF-PROCESS spool control plane (any process can submit/kill
standing queries), the DRPC-style HTTP front door for synchronous batch
queries, the JSONL result sink, and a metrics consumer printing lifecycle
counters. Client actions (spool submissions, HTTP POSTs) all run from
SEPARATE processes — nothing holds the engine object.

Usage: python scripts/service_demo.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bullet_storm_spark import get_spark
from bullet_storm_spark.http_server import serve_background
from bullet_storm_spark.sources.tables import load_table, load_tables
from bullet_storm_spark.streaming import FileControlChannel, StreamingEngine
from bullet_storm_spark.streaming.sinks import JsonlResultSink


def client(spool: str, code: str) -> str:
    out = subprocess.run(
        [sys.executable, "-c", code.replace("@SPOOL@", repr(spool))],
        check=True,
        capture_output=True,
        text=True,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    return out.stdout.strip()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="bullet-storm-spark-service", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="bss-service-")
    spool = os.path.join(workdir, "spool")
    src = os.path.join(workdir, "stream")
    os.makedirs(src)

    # batch surface: registered tables + HTTP front door
    tables = load_tables(spark, sf_dir)
    server, _ = serve_background(spark, sorted(tables))
    port = server.server_address[1]
    print(f"HTTP front door: http://127.0.0.1:{port}  spool: {spool}")

    # streaming surface: engine + spool + sink + metrics consumer
    engine = StreamingEngine(spark, channel=FileControlChannel(spool))
    engine.on_result(JsonlResultSink(os.path.join(workdir, "results.jsonl")))
    counters: dict[str, float] = {}
    engine.add_metrics_consumer(
        lambda name, key, v: counters.__setitem__(name, counters.get(name, 0) + v)
    )
    events = load_table(spark, sf_dir, "events").drop("ts", "ts_ns")
    stream = spark.readStream.schema(events.schema).parquet(src)
    query = engine.attach(stream, trigger_ms=200)

    try:
        print("\n== client 1 (separate process): submit a standing query ==")
        client(
            spool,
            "from bullet_storm_spark.streaming import FileControlClient\n"
            "FileControlClient(@SPOOL@).submit('watch-purchases',\n"
            "  'SELECT COUNT(*) AS cnt FROM STREAM(600000, TIME) '\n"
            "  \"WHERE event_type = 'purchase'\")\n",
        )
        events.write.mode("append").parquet(src)
        query.processAllAvailable()

        print("== client 2 (separate process): synchronous HTTP query ==")
        body = client(
            spool,
            "import json, urllib.request\n"
            "req = urllib.request.Request(\n"
            f"    'http://127.0.0.1:{port}/query',\n"
            "    data=json.dumps({'id': 'http-1', 'bql':\n"
            "        'SELECT o_orderpriority, COUNT(*) AS cnt FROM orders '\n"
            "        'GROUP BY o_orderpriority ORDER BY cnt DESC'}).encode())\n"
            "print(urllib.request.urlopen(req, timeout=120).read().decode())\n",
        )
        print("  ->", body[:160])

        print("== client 1 kills its standing query ==")
        client(
            spool,
            "from bullet_storm_spark.streaming import FileControlClient\n"
            "FileControlClient(@SPOOL@).kill('watch-purchases')\n",
        )
        events.limit(0).write.mode("append").parquet(src)
        query.processAllAvailable()
    finally:
        query.stop()
        server.shutdown()

    standing = [
        (i, c.records, c.meta.get("signal")) for i, c in engine.results
    ]
    print("\nstanding-query results:", standing)
    print("lifecycle counters:", {k: v for k, v in sorted(counters.items())})
    spark.stop()


if __name__ == "__main__":
    main()
