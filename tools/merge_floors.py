#!/usr/bin/env python3
"""Min-merge new clean bench minima into bench_floors.json.

make_floors.py REPLACES the floors file from one run; round-over-round
the convention (r12+) is to MERGE: a floor only ever moves DOWN (a
cleaner minimum was observed) or appears (a new query). Raising a floor
requires deliberately editing the file with the host blamed in writing.

Sources: one or more bench_detail.json files (full runs or
SPARK_GRAFT_BENCH_ONLY subsets). Only trustworthy minima contribute —
not tainted, not floor_exceeded, not min_overstated, no failed sample —
the make_floors.py rule.

Usage: tools/merge_floors.py bench_detail.json [more_detail.json ...]
"""
import json
import sys


def main() -> int:
    dst = "bench_floors.json"
    with open(dst) as f:
        out = json.load(f)
    floors = out["floors"]
    changed = []
    for src in sys.argv[1:]:
        with open(src) as f:
            detail = json.load(f)
        if detail.get("corrupted_run"):
            # r19: warn but keep going. A MIN-merge is contention-safe
            # by direction: interference only ever inflates a sample,
            # so a clean-probed minimum from a partly-contended run is
            # still a true lower bound; the per-query tainted/
            # floor_exceeded/min_overstated/failed filters below remain
            # the gate. The whole-file skip mattered when this tool
            # could REPLACE floors; for pure min-merging it only threw
            # away legitimate clean minima (subset runs trip the >25%
            # flag on a tiny denominator).
            print(f"warning {src}: corrupted_run - merging per-query "
                  "clean minima only", file=sys.stderr)
        sf = detail.get("sf", "")
        if sf.split("/")[-1] != out.get("sf", "").split("/")[-1]:
            print(f"skipping {src}: sf {sf!r} != floors sf", file=sys.stderr)
            continue
        corrupted = bool(detail.get("corrupted_run"))
        for name, q in detail["queries"].items():
            short = name.split("_", 1)[0]
            ok = (not q.get("tainted") and not q.get("floor_exceeded")
                  and not q.get("min_overstated")
                  and not any(q.get("failed", [])))
            if not ok:
                continue
            new = round(q["sec"], 3)
            old = floors.get(short)
            # r20 (ADVICE): a corrupted run may only LOWER existing
            # floors, never seed a first-time floor — a query with no
            # prior floor has no floor_exceeded gate, and the probe
            # brackets can miss mid-sample contention, so an inflated
            # initial floor would enter and only ever ratchet down,
            # weakening the 3x-floor taint check from then on.
            if old is None and corrupted:
                print(f"skipping first-time floor {short} from corrupted "
                      f"run {src}", file=sys.stderr)
                continue
            if old is None or new < old:
                floors[short] = new
                changed.append(f"{short} {old}->{new}")
    out["floors"] = dict(sorted(floors.items()))
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"merged: {', '.join(changed) if changed else 'no changes'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
