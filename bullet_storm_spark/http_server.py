"""DRPC-flavored HTTP front door.

The reference exposes a synchronous request/response path over DRPC: a
client POSTs a query to a network endpoint and receives the single final
result (/root/reference src/main/java/com/yahoo/bullet/storm/drpc/
DRPCPubSub.java:24-87, DRPCQueryResultPubscriber.java:88-140 — an HTTP
connector under the hood; one response per query, windowing disabled,
DRPCConfig.java:96-98). This module is that front door on stdlib
``http.server`` around ``api.execute`` — no extra dependencies.

Endpoints:
* ``POST /query``  — body ``{"bql": "SELECT ..."}`` or
  ``{"query": {...plans/serde dict...}}``, optional ``"id"``. Responds
  with the Clip JSON (single final response). Windowed queries are
  rejected 400, the DRPC constraint.
* ``GET /health``  — liveness + registered table names.

Server model: requests execute on the embedded SparkSession serially per
connection; the driver is the natural bottleneck exactly as the
reference's DRPC servers were the fan-in point. Long-lived standing
queries belong on the StreamingEngine's spool channel, not here.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from bullet_storm_spark import api
from bullet_storm_spark.bql import parse


DEFAULT_MAX_INFLIGHT = 50  # the reference bounds DRPC at 50 uncommitted
#                            messages (src/main/resources/
#                            bullet_storm_defaults.yaml:220-223,
#                            M/drpc/DRPCConfig.java:40,59); beyond the cap
#                            we shed load with 429 instead of queueing
#                            unbounded work onto the one driver


def make_server(
    spark: SparkSession,
    tables: list[str],
    host: str = "127.0.0.1",
    port: int = 0,
    max_inflight: int = DEFAULT_MAX_INFLIGHT,
) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server. ``port=0`` picks a free port
    (``server.server_address[1]`` reports it). Tables must already be
    registered as temp views (sources.tables.load_tables). At most
    ``max_inflight`` queries execute concurrently; excess POSTs are
    refused with 429 + Retry-After rather than queued."""

    inflight = threading.Semaphore(max_inflight)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args) -> None:  # quiet by default
            pass

        def _respond(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:
            if self.path == "/health":
                self._respond(200, {"status": "ok", "tables": tables})
            else:
                self._respond(404, {"error": "unknown path"})

        def do_POST(self) -> None:
            if self.path != "/query":
                self._respond(404, {"error": "unknown path"})
                return
            if not inflight.acquire(blocking=False):
                self.send_response(429)
                self.send_header("Retry-After", "1")
                body = json.dumps(
                    {"error": f"too many in-flight queries (max {max_inflight})"}
                ).encode("utf-8")
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            try:
                self._do_query()
            finally:
                inflight.release()

        def _do_query(self) -> None:
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                if "bql" in payload:
                    query = parse(payload["bql"])
                elif "query" in payload:
                    from bullet_storm_spark.plans.serde import query_from_dict

                    query = query_from_dict(payload["query"])
                else:
                    self._respond(400, {"error": "provide 'bql' or 'query'"})
                    return
                clip = api.execute(
                    query, spark=spark, query_id=payload.get("id", "http-query")
                )
            except ValueError as e:  # bad BQL / windowed query -> client error
                self._respond(400, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001 — execution failure
                self._respond(500, {"error": str(e)[:500]})
                return
            self._respond(200, json.loads(clip.to_json()))

    return ThreadingHTTPServer((host, port), Handler)


def serve_background(
    spark: SparkSession,
    tables: list[str],
    host: str = "127.0.0.1",
    port: int = 0,
    max_inflight: int = DEFAULT_MAX_INFLIGHT,
) -> tuple[ThreadingHTTPServer, threading.Thread]:
    """Start the server on a daemon thread; returns (server, thread).
    Stop with ``server.shutdown()``."""
    server = make_server(spark, tables, host, port, max_inflight)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, thread
