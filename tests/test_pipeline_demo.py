"""The end-to-end example must keep running — it is the composition
contract (every stage's API, in the documented order)."""

from __future__ import annotations

import subprocess
import sys


def test_pipeline_demo_runs_all_stages():
    out = subprocess.run(
        [sys.executable, "examples/pipeline_demo.py", "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    for stage in (
        "ingest", "quality screen", "exact dedup", "near dedup",
        "decontaminate", "bpe tokenize", "pack + shard",
    ):
        assert stage in out.stdout, out.stdout
