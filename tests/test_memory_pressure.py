"""Streaming-under-pressure proof: the heavyweight pipelines complete and
stay CORRECT with the object store capped far below the streamed data size
(spilling allowed, OOM not) — the regime a 100-TB cluster actually runs in.

Launches tools/stress_capped.py in a fresh subprocess (it owns its own
capped Ray session; the pytest session's Ray stays untouched). The full
sf1.6 / 2 GiB numbers live in BASELINE.md; this gate runs the same code at
sf0.1 with a 0.5 GiB cap to stay CI-sized."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_capped_object_store_run():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "stress_capped.py"),
         "--sf", "0.1", "--cap-gib", "0.5", "--cpus", "8",
         "--docs-dir", "/root/testdata/sf0.01"],
        capture_output=True, text=True, timeout=900, cwd=REPO)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["ok"] is True
    assert res["flagship_rows_ok"] and res["flagship_rows"] == 600_000
    assert res["roundtrip_ok"] and res["glt_ok"] and res["fuzzy_ok"]
