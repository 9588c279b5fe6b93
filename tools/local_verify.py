"""Verify one registered query against its DuckDB oracle at sf0.01 —
the full local replica of the driver compare — and on success record it
in ``LOCAL_VERIFY.json`` so the coverage ledger downgrades an open red
row to "fix locally verified, pending re-drive".

Run from the repo root (TZ pinned to the driver's non-UTC shape)::

    TZ=Asia/Kolkata python tools/local_verify.py inverted_index

The record carries the round it supersedes (the query's latest red) and
the verifying commit; it expires automatically once the driver writes a
newer record for the query (see coverage_ledger.open_reds).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_VERIFY_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    sys.path.insert(0, REPO)
    if sys.argv[1] == "--prune":
        from tools import coverage_ledger as cl

        dead = cl.prune_local_verify()
        print(f"pruned {len(dead)} superseded entries: {', '.join(dead) or '—'}")
        return 0
    names = sys.argv[1:]
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import __spark_entry__ as entrymod
    from tools import coverage_ledger as cl
    from oracle_util import compare, duckdb_con

    from pyspark.sql import SparkSession

    # plain session, like the driver (no repo session conf)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    folded = cl.fold(cl.load_rounds())
    con = duckdb_con(SF_DIR)
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
        capture_output=True, text=True,
    ).stdout.strip()
    path = os.path.join(REPO, "LOCAL_VERIFY.json")
    as_of = max(cl.load_rounds(), default=0)
    for name in names:
        if name not in queries:
            print(f"{name}: not a registered query")
            return 2
        sql = oracles.get(name)
        if sql is None:
            print(f"{name}: rows-only query — no oracle to verify against")
            return 2
        df = queries[name](spark, SF_DIR)
        compare(df, con, sql)  # raises on any mismatch
        reds = folded.get(name, {}).get("red") or [0]
        # write incrementally so a later name's mismatch doesn't discard
        # earlier passes (r11 ADVICE)
        records = json.load(open(path)) if os.path.exists(path) else {}
        records[name] = {
            "fixed_after_round": max(reds),
            "as_of_round": as_of,
            "commit": commit,
            "sf_dir": SF_DIR,
            "tz": os.environ.get("TZ", ""),
        }
        with open(path, "w") as f:
            json.dump(records, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"{name}: hash-green vs oracle at {SF_DIR} (commit {commit})")
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
