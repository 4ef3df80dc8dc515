#!/usr/bin/env python3
"""Produce bench_floors.json from a clean bench_detail.json.

The floors file is the per-query clean-history referee that Bench.scala's
floor cross-check reads (SPARK_GRAFT_BENCH_FLOORS, default
bench_floors.json): any clean-probed sample whose time exceeds 3x its
floor is treated as suspect (mid-sample contention the probe brackets
cannot see -- the r11 q120 false negative: 26.97s recorded taint:false vs
2.03s isolated).

Only queries whose recorded minimum is trustworthy contribute a floor:
not tainted, not floor_exceeded, not min_overstated, and no failed
sample produced the min. Regenerate after any round whose idle run is
0-tainted; stale floors are safe (the check only fires above 3x).

Usage: tools/make_floors.py [bench_detail.json] [bench_floors.json]
"""
import json
import sys


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "bench_detail.json"
    dst = sys.argv[2] if len(sys.argv) > 2 else "bench_floors.json"
    with open(src) as f:
        detail = json.load(f)
    if detail.get("corrupted_run"):
        print(f"refusing: {src} marks itself corrupted_run", file=sys.stderr)
        return 1
    floors = {}
    skipped = []
    for name, q in detail["queries"].items():
        short = name.split("_", 1)[0]
        ok = (
            not q.get("tainted")
            and not q.get("floor_exceeded")
            and not q.get("min_overstated")
            and not any(q.get("failed", []))
        )
        if ok:
            floors[short] = round(q["sec"], 3)
        else:
            skipped.append(short)
    if skipped:
        print(f"skipped (untrustworthy min): {','.join(skipped)}",
              file=sys.stderr)
    out = {"sf": detail.get("sf", ""), "source": src,
           "note": "per-query clean idle minima; Bench flags any run >3x",
           "floors": dict(sorted(floors.items()))}
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {len(floors)} floors -> {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
