"""The `python -m bullet_storm_spark` CLI is a user-facing surface: run it
as a real subprocess (fresh interpreter, no test fixtures) and check the
Clip JSON contract plus the --oracle twin printout."""

import json
import subprocess
import sys


def test_cli_runs_bql_and_prints_clip():
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "bullet_storm_spark",
            "--oracle",
            "SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert "-- DuckDB twin --" in out and "GROUP BY" in out
    # the last non-empty line is the Clip JSON
    payload = json.loads([l for l in out.strip().splitlines() if l.strip()][-1])
    assert "records" in payload and len(payload["records"]) > 0
    assert all("event_type" in r and "cnt" in r for r in payload["records"])
    assert sum(r["cnt"] for r in payload["records"]) > 0
