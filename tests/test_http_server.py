"""HTTP front door integration: POST a query, receive the Clip — the
DRPC request/response contract (single final response, windows rejected)."""

import json
import urllib.request
import urllib.error

import pytest

from bullet_storm_spark.http_server import serve_background
from bullet_storm_spark.sources.tables import load_tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def server(spark):
    tables = load_tables(spark, SF, register_views=True)
    srv, _thread = serve_background(spark, sorted(tables))
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        f"{url}/query",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, json.loads(resp.read())


def test_health(server):
    with urllib.request.urlopen(f"{server}/health", timeout=10) as resp:
        body = json.loads(resp.read())
    assert body["status"] == "ok" and "events" in body["tables"]


def test_post_bql_returns_clip(server):
    status, body = _post(
        server,
        {
            "id": "h1",
            "bql": "SELECT event_type, COUNT(*) AS cnt FROM events "
            "GROUP BY event_type",
        },
    )
    assert status == 200
    assert body["meta"]["query_id"] == "h1"
    counts = {r["event_type"]: r["cnt"] for r in body["records"]}
    assert len(counts) == 5 and all(c > 0 for c in counts.values())


def test_post_serde_query_returns_clip(server):
    from bullet_storm_spark.plans.query import Query, Raw
    from bullet_storm_spark.plans.serde import query_to_dict

    status, body = _post(
        server, {"query": query_to_dict(Query(source="region", aggregation=Raw(size=3)))}
    )
    assert status == 200 and len(body["records"]) == 3


def test_windowed_query_rejected_400(server):
    try:
        _post(
            server,
            {"bql": "SELECT COUNT(*) AS c FROM STREAM(60000, TIME) "
             "WINDOWING EVERY(1000, TIME)"},
        )
        raise AssertionError("windowed query must be rejected")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "window" in json.loads(e.read())["error"].lower()


def test_bad_payload_400(server):
    try:
        _post(server, {"nope": 1})
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_inflight_cap_sheds_429(spark, monkeypatch):
    """The reference bounds DRPC at 50 uncommitted messages
    (bullet_storm_defaults.yaml:220-223); our front door sheds load past
    max_inflight with 429 instead of queueing onto the driver. Driven
    deterministically: execute blocks on an event while extra requests
    arrive."""
    import threading

    from bullet_storm_spark import api
    from bullet_storm_spark.http_server import serve_background

    release = threading.Event()
    entered = threading.Semaphore(0)

    class _FakeClip:
        def to_json(self):
            return json.dumps({"records": [], "meta": {}})

    def blocking_execute(query, spark=None, query_id=None):
        entered.release()
        assert release.wait(timeout=30)
        return _FakeClip()

    monkeypatch.setattr(api, "execute", blocking_execute)
    srv, _thread = serve_background(spark, ["events"], max_inflight=2)
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        results = {}

        def post(i):
            try:
                results[i] = _post(url, {"bql": "SELECT COUNT(*) AS c FROM events"})[0]
            except urllib.error.HTTPError as e:
                results[i] = e.code

        threads = [threading.Thread(target=post, args=(i,)) for i in (1, 2)]
        for t in threads:
            t.start()
        # both occupants are inside execute before the probe fires
        assert entered.acquire(timeout=30) and entered.acquire(timeout=30)
        post(3)
        assert results[3] == 429
        release.set()
        for t in threads:
            t.join(timeout=30)
        assert results[1] == 200 and results[2] == 200
        # slots released: the next request is admitted again
        post(4)
        assert results[4] == 200
    finally:
        release.set()
        srv.shutdown()
