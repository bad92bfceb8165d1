"""Example-scripts smoke: every runnable example executes end-to-end at
sf0.001 in a subprocess (own SparkSession). Examples are the repo's
user-facing surface and they rot silently — the analytics example's first
run surfaced a real z-order DATE bug — so they run under test."""

import subprocess
import sys

import pytest

EXAMPLES = [
    ("word_count.py", []),
    ("dedup_pipeline.py", ["/root/testdata/sf0.001", "/tmp/_ex_dedup"]),
    ("analytics_rollup.py", ["/root/testdata/sf0.001", "/tmp/_ex_rollup"]),
    ("leaderboard_streaming.py", []),
    ("target_domain_selection.py", ["/root/testdata/sf0.001", "/tmp/_ex_select"]),
    ("mixture_layout.py", ["/root/testdata/sf0.001", "/tmp/_ex_layout"]),
    ("traffic_monitor.py", ["/root/testdata/sf0.001", "/tmp/_ex_traffic"]),
    ("image_curation.py", ["/tmp/_ex_imgcur"]),
    ("audio_curation.py", ["/tmp/_ex_audcur"]),
]


@pytest.mark.parametrize("script,args", EXAMPLES, ids=[e[0] for e in EXAMPLES])
def test_example_runs(script, args):
    proc = subprocess.run(
        [sys.executable, f"examples/{script}", *args],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
