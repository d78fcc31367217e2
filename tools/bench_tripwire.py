#!/usr/bin/env python3
"""Per-query cold-time regression tripwire.

The r9 judge found q78's isolated cold time had doubled vs r8 with no
code change on its path — visible only by comparing rounds by hand.
This tool makes that comparison a builder-side gate:

    # compare a fresh bench against the checked-in baseline
    python3 tools/bench_tripwire.py BENCH_full.json

    # refresh the baseline after an intentional change (quiet box!)
    python3 tools/bench_tripwire.py BENCH_full.json --update
    # --update refuses when regressions tripped in the same run;
    # add --force to bake in an intentional slowdown



A query trips when its cold time exceeds RATIO x baseline AND the
absolute growth exceeds ABS_FLOOR seconds (sub-second jitter on cheap
queries is not a regression). New queries (no baseline entry) are
listed informationally and added on --update. Exit 1 on any trip, so
the check can gate a commit.

The baseline (tools/bench_baseline.json) must come from a quiet run:
check `uptime` first — this box carries +-3 s noise under load, and a
driver-suite BENCH_full is load-inflated vs isolated reruns (the r9
lesson: in-suite q198 read 20.7 s vs 11.6 s isolated).
"""
import json
import sys
from pathlib import Path

RATIO = 2.0        # trip when cold >= RATIO * baseline ...
ABS_FLOOR = 2.0    # ... and the absolute delta exceeds this (seconds)

BASELINE = Path(__file__).parent / "bench_baseline.json"


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    update = "--update" in sys.argv
    bench_path = Path(args[0]) if args else Path("BENCH_full.json")
    bench = json.loads(bench_path.read_text())
    cold = bench["queries"]

    if not BASELINE.exists():
        if update:
            BASELINE.write_text(json.dumps(
                {"source": str(bench_path), "queries": cold},
                indent=1, sort_keys=True) + "\n")
            print(f"baseline initialized from {bench_path}: {len(cold)} queries")
            return 0
        print(f"no baseline at {BASELINE}; run with --update on a quiet box first")
        return 1

    base = json.loads(BASELINE.read_text())["queries"]
    trips, new = [], []
    for name, t in sorted(cold.items()):
        b = base.get(name)
        if b is None:
            new.append(name)
        elif b > 0 and t >= RATIO * b and t - b >= ABS_FLOOR:
            trips.append((name, b, t))

    for name, b, t in trips:
        print(f"TRIP  {name}: {b:.1f}s -> {t:.1f}s ({t / b:.1f}x)")
    if new:
        print(f"new queries (no baseline): {', '.join(new)}")
    gone = sorted(set(base) - set(cold))
    if gone:
        print(f"queries in baseline but not in this run: {', '.join(gone)}")

    if update:
        if trips and "--force" not in sys.argv:
            print(f"{len(trips)} regression(s) tripped — refusing to bake "
                  "them into the baseline; re-run with --update --force "
                  "if the slowdown is intentional")
            return 1
        BASELINE.write_text(json.dumps(
            {"source": str(bench_path), "queries": cold},
            indent=1, sort_keys=True) + "\n")
        print(f"baseline updated from {bench_path}: {len(cold)} queries")
        return 0

    if trips:
        print(f"{len(trips)} regression(s) vs {BASELINE.name}")
        return 1
    print(f"ok: {len(cold)} queries within {RATIO}x of baseline "
          f"(+{ABS_FLOOR}s floor)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
