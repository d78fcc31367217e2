#!/usr/bin/env python3
"""Per-query cold-time regression tripwire with isolated re-run
adjudication.

The r9 judge found q78's isolated cold time had doubled vs r8 with no
code change on its path — visible only by comparing rounds by hand.
This tool makes that comparison a builder-side gate:

    # compare a fresh bench against the checked-in baseline;
    # cold-tripped rows are re-run ISOLATED and adjudicated on the
    # isolated numbers (requires sbt; ~1 min startup + the rows)
    python3 tools/bench_tripwire.py BENCH_full.json

    # telemetry-only mode: no re-run; any cold trip is fatal
    python3 tools/bench_tripwire.py BENCH_full.json --no-rerun

    # refresh the baseline after an intentional change (quiet box!)
    python3 tools/bench_tripwire.py BENCH_full.json --update
    # --update refuses when regressions tripped in the same run;
    # add --force to bake in an intentional slowdown

Why re-run instead of trusting the in-suite number: cold-only
thresholds false-tripped 2 of 4 same-HEAD r16 driver runs, each on a
DISJOINT row set, and every trip burned a judge adjudication cycle —
the accused rows measured 0.8-1.4x on a quiet box. Replaying those
runs against per-query warm times and slot load averages (both in
the artifact since r16) shows NO single-run formula separates the
noise: this box's warm rows inflate up to 4x under load (the
GC-eviction mode Bench.scala documents), and even slots with 1-min
load <= 3.4 carried 2x cold noise. The one method that was
dispositive every time is the judge's own: re-run the accused row in
isolation (SPARK_GRAFT_BENCH_ONLY) and believe that number. So the
tripwire now does exactly that, in one batched Bench invocation, and
reports TRIP only for rows whose ISOLATED cold still exceeds
RATIO x baseline (+ABS_FLOOR). In-suite telemetry (warm, load) is
printed as context on every accused row.

A query trips only when the absolute growth also exceeds ABS_FLOOR
seconds (sub-second jitter on cheap queries is not a regression).
New queries (no baseline entry) are listed informationally and added
on --update. Exit 1 on any adjudicated trip.

The baseline (tools/bench_baseline.json) must come from a quiet run:
check `uptime` first — this box carries +-3 s noise under load, and a
driver-suite BENCH_full is load-inflated vs isolated reruns (the r9
lesson: in-suite q198 read 20.7 s vs 11.6 s isolated).
"""
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

RATIO = 2.0        # trip when cold >= RATIO * baseline ...
ABS_FLOOR = 2.0    # ... and the absolute delta exceeds this (seconds)
# Isolated-re-run warm confirmation: the re-run's COLD row carries an
# inherent upward bias vs an in-suite baseline (a 2-row warmup cannot
# match 300 queries of JIT/codegen warmth — q127 measured 2.2x even on
# a quiet box with zero code change), but its WARM row is a fully
# warmed JVM vs the baseline's fully warmed JVM: measured 1.4-1.7x
# noise for healthy rows vs 3x+ for a real regression.
WARM_RATIO = 1.5
WARM_FLOOR = 1.0

BASELINE = Path(__file__).parent / "bench_baseline.json"
REPO = Path(__file__).parent.parent


def cold_trip(base: float, t: float) -> bool:
    return base > 0 and t >= RATIO * base and t - base >= ABS_FLOOR


# Sacrificial rows prepended to every isolated re-run (then ignored):
# Bench runs queries name-sorted, so the batch's FIRST row pays the
# JVM's JIT/codegen warmup that a mid-suite slot never sees — measured
# on this box as q127 reading 5.7 s isolated-first vs 4.4 s behind two
# warmups vs 2.5 s mid-suite. Both sort before every qNNN row.
WARMUP_ROWS = ["q01_agg_pricing", "q11_counts"]


def rerun_isolated(names, sf_dir, rerun_cmd=None):
    """Re-run `names` through one batched Bench invocation with
    SPARK_GRAFT_BENCH_ONLY; returns {name: isolated_cold} or None if
    the re-run could not produce an artifact (caller stays
    conservative). `rerun_cmd` overrides the sbt command — the test
    seam (a stub can fabricate any isolated outcome)."""
    out = Path(tempfile.mkstemp(prefix="tripwire_rerun_", suffix=".json")[1])
    warmups = [w for w in WARMUP_ROWS if w not in names]
    env = dict(os.environ,
               SPARK_GRAFT_BENCH_ONLY=",".join(warmups + sorted(names)),
               SPARK_GRAFT_BENCH_OUT=str(out),
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=env_cpus())
    cmd = rerun_cmd or "sbt -batch 'runMain graft.Bench'"
    print(f"re-running {len(names)} accused row(s) isolated: "
          f"{', '.join(sorted(names))}", flush=True)
    try:
        rc = subprocess.run(cmd, shell=True, env=env, cwd=REPO,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL, timeout=1800).returncode
        if rc != 0 or not out.exists():
            return None
        return json.loads(out.read_text())
    except (subprocess.TimeoutExpired, OSError, json.JSONDecodeError):
        return None
    finally:
        if out.exists():
            out.unlink()


def env_cpus() -> str:
    return os.environ.get("SPARK_GRAFT_CPUS",
                          str(os.cpu_count() or 4))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    update = "--update" in sys.argv
    no_rerun = "--no-rerun" in sys.argv
    rerun_cmd = None
    if "--rerun-cmd" in sys.argv:
        rerun_cmd = sys.argv[sys.argv.index("--rerun-cmd") + 1]
        args = [a for a in args if a != rerun_cmd]
    bench_path = Path(args[0]) if args else Path("BENCH_full.json")
    bench = json.loads(bench_path.read_text())
    cold = bench["queries"]
    warm = bench.get("queries_warm", {})
    load = bench.get("load_avg", {})

    if not BASELINE.exists():
        if update:
            BASELINE.write_text(json.dumps(
                {"source": str(bench_path), "queries": cold,
                 "queries_warm": warm},
                indent=1, sort_keys=True) + "\n")
            print(f"baseline initialized from {bench_path}: {len(cold)} queries")
            return 0
        print(f"no baseline at {BASELINE}; run with --update on a quiet box first")
        return 1

    baseline = json.loads(BASELINE.read_text())
    base = baseline["queries"]
    base_warm = baseline.get("queries_warm", {})
    accused, new = [], []
    for name, t in sorted(cold.items()):
        b = base.get(name)
        if b is None:
            new.append(name)
        elif cold_trip(b, t):
            accused.append((name, b, t))

    for name, b, t in accused:
        w, bw, la = warm.get(name), base_warm.get(name), load.get(name)
        ctx = []
        if w is not None:
            ctx.append(f"warm {w:.1f}s" +
                       (f" vs base {bw:.1f}s" if bw is not None else ""))
        if la is not None:
            ctx.append(f"slot load {la:.1f}")
        print(f"ACCUSED  {name}: {b:.1f}s -> {t:.1f}s ({t / b:.1f}x)"
              + (f"  [{'; '.join(ctx)}]" if ctx else ""))

    trips = []
    exonerated = set()
    if accused and not no_rerun:
        iso = rerun_isolated([n for n, _, _ in accused],
                             bench.get("sf", "/root/testdata/sf0.1"),
                             rerun_cmd)
        if iso is None:
            print("isolated re-run FAILED — keeping all accused rows as "
                  "trips (conservative)")
            trips = [(n, b, t, "re-run unavailable") for n, b, t in accused]
        else:
            iso_q = iso.get("queries", {})
            iso_w = iso.get("queries_warm", {})
            iso_load = iso.get("load_avg", {})
            for name, b, t in accused:
                it = iso_q.get(name)
                iw = iso_w.get(name)
                bw = base_warm.get(name)
                ld = iso_load.get(name)
                ldtxt = f", slot load {ld:.1f}" if ld is not None else ""
                if it is None:
                    trips.append((name, b, t, "row missing from re-run"))
                elif not cold_trip(b, it):
                    exonerated.add(name)
                    print(f"EXONERATED  {name}: isolated cold {it:.1f}s "
                          f"({it / b:.1f}x baseline{ldtxt}) — in-suite "
                          f"{t:.1f}s was box contention")
                elif (iw is not None and bw is not None and bw > 0 and
                      not (iw >= WARM_RATIO * bw and iw - bw >= WARM_FLOOR)):
                    exonerated.add(name)
                    print(f"EXONERATED  {name}: isolated cold {it:.1f}s "
                          f"still {it / b:.1f}x (partial-run JIT bias) but "
                          f"isolated WARM {iw:.1f}s vs base {bw:.1f}s is "
                          f"healthy{ldtxt}")
                else:
                    warmtxt = (f", warm {iw:.1f}s vs base {bw:.1f}s"
                               if iw is not None and bw is not None else "")
                    trips.append((name, b, it,
                                  f"isolated re-run confirms ({it:.1f}s"
                                  f"{warmtxt}{ldtxt}) — if that load is "
                                  "high, re-adjudicate on a quiet box"))
    elif accused:
        # no-rerun / update mode: conservative, any cold trip is fatal
        trips = [(n, b, t, "telemetry-only mode") for n, b, t in accused]

    for name, b, t, why in trips:
        print(f"TRIP  {name}: {b:.1f}s -> {t:.1f}s ({t / b:.1f}x) — {why}")
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
        # keep per-query warm minima across updates (min ~= quiet box)
        merged_warm = dict(base_warm)
        for name, w in warm.items():
            old = merged_warm.get(name)
            merged_warm[name] = w if old is None else min(old, w)
        merged_warm = {n: w for n, w in merged_warm.items() if n in cold}
        # rows the isolated re-run exonerated keep their OLD baseline
        # cold — baking the load-inflated in-suite number would loosen
        # the wire exactly where contention already fooled it once
        merged_cold = dict(cold)
        for name in exonerated:
            if name in base:
                merged_cold[name] = base[name]
        BASELINE.write_text(json.dumps(
            {"source": str(bench_path), "queries": merged_cold,
             "queries_warm": merged_warm},
            indent=1, sort_keys=True) + "\n")
        print(f"baseline updated from {bench_path}: {len(cold)} queries")
        return 0

    if trips:
        print(f"{len(trips)} regression(s) vs {BASELINE.name}")
        return 1
    note = (f" ({len(accused)} accused row(s) exonerated by isolated re-run)"
            if accused else "")
    print(f"ok: {len(cold)} queries within {RATIO}x of baseline "
          f"(+{ABS_FLOOR}s floor){note}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
