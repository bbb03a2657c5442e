"""The north_rule's deployment form: the engine packaged as a zip and run
under ``spark-submit --py-files`` (client mode, local master standing in
for the cluster manager).  One subprocess smoke per suite run."""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_pagerank():
    out = subprocess.run(
        ["sh", str(REPO / "scripts" / "submit_smoke.sh"), "pagerank"],
        capture_output=True,
        text=True,
        timeout=240,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["algo"] == "pagerank"
    assert res["rows"] == 200  # sf0.001 co-occurrence vertex count
    assert res["supersteps"] >= 1
