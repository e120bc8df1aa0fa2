#!/usr/bin/env python3
"""Overlay a targeted (SPARK_GRAFT_BENCH_ONLY) sweep onto a full base
sweep JSON — the per-query top-up the slope protocol allows when only
a handful of queries changed plans since the base leg was measured
(VERDICT r16 item 1/3: the sf1 leg keeps its full-sweep rows for
untouched queries; changed/new queries get fresh rows measured at the
current HEAD). The output records exactly which rows were patched so
the overlay is self-describing, never silent.

Usage: merge_bench.py <base.json> <patch.json> <out.json>
  patch.json is the one-line {"metric": ...} JSON a filtered
  graft.Bench run prints to stdout (filtered runs do not update
  bench_last.json).
"""
import json
import sys


def main() -> int:
    base = json.load(open(sys.argv[1]))
    patch = json.load(open(sys.argv[2]))
    out = dict(base)
    queries = dict(base["queries"])
    queries.update(patch["queries"])
    out["queries"] = queries
    out["value"] = round(sum(queries.values()), 3)
    out["failed"] = sorted(set(base.get("failed", [])) |
                           set(patch.get("failed", [])))
    out["patched_queries"] = sorted(patch["queries"].keys())
    out["patched_from"] = {"base": sys.argv[1], "patch": sys.argv[2]}
    with open(sys.argv[3], "w") as fh:
        json.dump(out, fh)
    print(f"merged {len(patch['queries'])} patched rows over "
          f"{len(base['queries'])} base rows -> {sys.argv[3]} "
          f"(total {out['value']}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
