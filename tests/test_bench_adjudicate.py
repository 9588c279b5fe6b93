"""tools/bench_adjudicate.py: burst classification over synthetic records.

Pure-python (no Spark): the tool mechanizes the r13 comparison protocol —
per-query mins vs a reference family, with deviations classified
ambient-suspect when a neighboring calibration-track sample shows
elevated loadavg or calibration time.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

TOOL = Path(__file__).resolve().parent.parent / "tools" / "bench_adjudicate.py"


def run_tool(tmp_path, cur, refs, extra=()):
    cp = tmp_path / "cur.json"
    cp.write_text(json.dumps(cur))
    ref_paths = []
    for i, r in enumerate(refs):
        rp = tmp_path / f"ref{i}.json"
        rp.write_text(json.dumps(r))
        ref_paths.append(str(rp))
    out = subprocess.run(
        [sys.executable, str(TOOL), str(cp), *ref_paths, *extra],
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout)


def test_burst_near_deviation_reads_ambient_and_quiet_reads_investigate(tmp_path):
    cur = {
        "queries": {"a": 3.0, "b": 3.0, "c": 0.9},
        "ended_at": {"a": 100.0, "b": 400.0, "c": 150.0},
        "calibration": {
            "noise_index": 0.85,
            # sample at 90s: hot loadavg; sample at 390s: quiet; cal
            # values identical so only the load channel distinguishes them
            "track": [[90.0, 0.6, 12.0], [390.0, 0.6, 3.0]],
        },
    }
    ref = {"queries": {"a": 1.0, "b": 1.0, "c": 1.0}}
    out = run_tool(tmp_path, cur, [ref])
    verdicts = {d["query"]: d["verdict"] for d in out["deviations"]}
    assert verdicts == {"a": "ambient-suspect", "b": "investigate"}
    # c at 0.9x is not a deviation at all
    assert out["n_deviations"] == 2 and out["n_ambient_suspect"] == 1


def test_elevated_calibration_sample_flags_burst_without_load(tmp_path):
    cur = {
        "queries": {"a": 3.0},
        "ended_at": {"a": 100.0},
        "calibration": {
            "noise_index": 0.9,
            # no load channel (old records): the 0.9 sample is >1.15x the
            # run's own 0.5 median — hot by the calibration channel
            "track": [[90.0, 0.9], [300.0, 0.5], [500.0, 0.5]],
        },
    }
    ref = {"queries": {"a": 1.0}}
    out = run_tool(tmp_path, cur, [ref])
    assert out["deviations"][0]["verdict"] == "ambient-suspect"


def test_reference_is_min_across_family_and_driver_records(tmp_path):
    cur = {
        "queries": {"a": 2.0},
        "ended_at": {"a": 10.0},
        "calibration": {"noise_index": 0.8, "track": []},
    }
    # driver-record shape ({"parsed": ...}) mixes with full records
    refs = [
        {"parsed": {"queries": {"a": 4.0}}},
        {"queries": {"a": 0.8}},
    ]
    out = run_tool(tmp_path, cur, refs)
    assert out["deviations"][0]["ref_min"] == 0.8
    assert out["deviations"][0]["ratio"] == 2.5
