"""Burst-adjudicated bench comparison (r13).

Single-run bench totals on this shared host are not comparable: ambient
load arrives in mid-run bursts that inflate whatever queries are in
flight (BASELINE.md r13 row — a different contiguous HEADLINE span per
run, 1.5-9x, while endpoint calibration reads ~0.8). The honest
comparison protocol is per-query mins plus burst classification, which
this tool mechanizes over the sentinel fields bench.py records:

- ``calibration.track`` — [offset_sec, calibration_sec, loadavg_1min]
  samples every CAL_EVERY queries;
- ``ended_at`` — each query's wall-clock offset into the run.

A query whose time deviates from the reference is classified
``ambient-suspect`` when a neighboring track sample (within
``--window`` seconds of its end offset) shows an elevated calibration
time or loadavg, else ``investigate``. The calibration scan
under-responds to contention that hits multi-stage queries (measured:
cal <= 0.75 while loadavg spiked to 13.1 during a 1.5-3.2x burst), so
loadavg is the primary burst signal and calibration the secondary.

Usage:
    python tools/bench_adjudicate.py CURRENT.json REF.json [REF2.json ...]
        [--ratio 1.5] [--abs 0.5] [--window 60] [--load 7] [--cal 1.15]

REF files may be full bench records ({"queries": ...}) or driver
records ({"parsed": {"queries": ...}}); the per-query reference is the
MIN across all refs that carry the query.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d["queries"]
    if "parsed" in d and d["parsed"] and "queries" in d["parsed"]:
        return d["parsed"]["queries"]
    raise SystemExit(f"{path}: no queries map found")


def burst_windows(track, load_floor: float, cal_ratio: float):
    """Offsets whose sample shows elevated load or calibration.

    ``cal_ratio`` is relative to the run's own median calibration sample
    (self-normalizing: an idle run's samples sit tightly together).
    """
    if not track:
        return []
    cal_med = statistics.median(s[1] for s in track)
    hot = []
    for s in track:
        off, cal = s[0], s[1]
        load1 = s[2] if len(s) > 2 and s[2] is not None else 0.0
        if load1 >= load_floor or cal >= cal_ratio * cal_med:
            hot.append(off)
    return hot


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("current")
    p.add_argument("refs", nargs="+")
    p.add_argument("--ratio", type=float, default=1.5)
    p.add_argument("--abs", dest="abs_", type=float, default=0.5)
    p.add_argument("--window", type=float, default=60.0)
    p.add_argument("--load", type=float, default=7.0)
    p.add_argument("--cal", type=float, default=1.15)
    args = p.parse_args(argv)

    with open(args.current) as f:
        cur = json.load(f)
    cur_q = cur["queries"]
    ended = cur.get("ended_at", {})
    track = cur.get("calibration", {}).get("track", [])
    hot = burst_windows(track, args.load, args.cal)

    ref: dict[str, float] = {}
    for rp in args.refs:
        for q, v in load_queries(rp).items():
            if q not in ref or v < ref[q]:
                ref[q] = v

    rows = []
    for q, v in cur_q.items():
        r = ref.get(q)
        if not r:
            continue
        if v / r <= args.ratio or v - r <= args.abs_:
            continue
        off = ended.get(q)
        near_hot = off is not None and any(
            abs(off - h) <= args.window for h in hot
        )
        rows.append(
            {
                "query": q,
                "ref_min": r,
                "current": v,
                "ratio": round(v / r, 2),
                "ended_at": off,
                "verdict": "ambient-suspect" if near_hot else "investigate",
            }
        )
    rows.sort(key=lambda x: -x["ratio"])
    out = {
        "noise_index": cur.get("calibration", {}).get("noise_index"),
        "hot_track_offsets": hot,
        "n_deviations": len(rows),
        "n_ambient_suspect": sum(1 for x in rows if x["verdict"] == "ambient-suspect"),
        "deviations": rows,
    }
    json.dump(out, sys.stdout, indent=1)
    print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
