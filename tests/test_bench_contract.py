"""bench.py is a driver-invoked contract: it must emit exactly one JSON
line with the agreed shape. Run it as a real subprocess at the smallest SF
so contract breakage (imports, entry drift, JSON shape) fails CI here
rather than in the driver."""

import json
import os
import pytest
import subprocess
import sys


@pytest.mark.slow
def test_bench_emits_contract_json():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_CPUS"] = "4"
    proc = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        capture_output=True,
        text=True,
        # the headline list keeps growing (130+ entries, cold+warm each);
        # 420s tipped over at ~130 entries on a busy machine
        timeout=1400,
        env=env,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"expected ONE json line, got: {lines}"
    payload = json.loads(lines[0])
    assert payload["unit"] == "sec" and payload["value"] > 0
    assert payload["sf"] == "0.001"
    assert len(payload["queries"]) >= 20
    assert all(v >= 0 for v in payload["queries"].values())
