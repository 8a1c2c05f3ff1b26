"""`spark-submit --py-files` packaging proof as part of the green gate.

The north rule's run mode is spark-submit on a multi-executor cluster; this
drives tools/submit_smoke.py end-to-end: package zip -> staged raw events +
schema registry -> `spark-submit --master local-cluster[2,2,2048] --py-files
dms.zip tools/submit_replay.py` executed from OUTSIDE the repo (executor JVMs
must import the engine from the zip) -> reopen the written table from a fresh
session -> per-row sha256(content) equality against the LWW oracle.

Kept to one modest run (~2 min including two executor JVMs): packaging bugs
(missing submodule, path-dependent import, driver-only file access) fail
here and nowhere else in the suite.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_py_files_replay_matches_sha256():
    env = dict(os.environ, SUBMIT_SMOKE_EVENTS="8000")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "submit_smoke.py")],
        capture_output=True, text=True, env=env, timeout=600,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert proc.returncode == 0 and lines, proc.stderr[-2000:]
    res = json.loads(lines[-1])
    assert res["ok"] is True
    assert res["sha256_mismatches"] == 0
    assert res["rows"] > 0
