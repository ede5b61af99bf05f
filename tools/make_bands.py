#!/usr/bin/env python3
"""Build BANDS.json — the machine-readable per-query bench band table —
from same-code bench run history (BENCH_RUNS.jsonl, one full-run JSON
object per line, appended by graft.Bench) or from explicit BENCH_FULL
-style files passed as arguments.

Usage:
  python3 tools/make_bands.py [--last N] [--max-load L] [run.json ...]

With no file arguments, reads BENCH_RUNS.jsonl in the CWD and uses the
last N (default 4) runs. Each query's band is the per-query UNION over
every selected run that ran it (its "n" records how many), so a run set
spanning a query-surface change still bands the newest queries; a note
is printed when the selected runs disagree on the query set. Unparseable
history lines (e.g. a torn line from a crashed run) are skipped with a
warning, never fatal. --max-load L drops runs whose recorded
jvm.load_avg_start exceeds L (contaminated-by-contention runs out of the
band; runs predating the telemetry field always pass the filter).

Output: BANDS.json =
  {"n_runs": k, "sf": "...", "queries": {name: {"lo": s, "hi": s,
   "n": k, "cpu_lo": s, "cpu_hi": s}}}

Adjudication is tools/verify_local.py --bands <bench.json> [BANDS.json].
"""
import json
import sys


def load_runs(args):
    files, last, max_load = [], 4, None
    it = iter(args)
    for a in it:
        if a == "--last":
            last = int(next(it))
        elif a == "--max-load":
            max_load = float(next(it))
        else:
            files.append(a)
    if files:
        runs = [json.load(open(f)) for f in files]
    else:
        runs = []
        for i, line in enumerate(open("BENCH_RUNS.jsonl"), 1):
            if not line.strip():
                continue
            try:
                runs.append(json.loads(line))
            except json.JSONDecodeError as ex:
                print(f"warning: skipping unparseable BENCH_RUNS.jsonl "
                      f"line {i}: {ex}", file=sys.stderr)
    if max_load is not None:
        kept = [r for r in runs
                if r.get("jvm", {}).get("load_avg_start", 0) <= max_load]
        if len(kept) < len(runs):
            print(f"note: --max-load {max_load} dropped "
                  f"{len(runs) - len(kept)} run(s)", file=sys.stderr)
        runs = kept
    return runs if files else runs[-last:]


def main(argv):
    runs = load_runs(argv)
    if len(runs) < 2:
        print(f"need >= 2 runs for a band, got {len(runs)}", file=sys.stderr)
        return 1
    # per-QUERY union: a query's band comes from every selected run
    # that ran it (n records how many), so a run set that spans a
    # query-surface change still bands the newest queries instead of
    # dropping whole runs. Note drift so the reader knows.
    sets = {frozenset(r["queries"]) for r in runs}
    if len(sets) > 1:
        print(f"note: {len(sets)} distinct query sets across the "
              f"selected runs; bands are per-query unions", file=sys.stderr)
    names = sorted(set().union(*sets))
    queries = {}
    for name in names:
        walls = [r["queries"][name] for r in runs
                 if name in r["queries"] and r["queries"][name] >= 0]
        cpus = [r.get("queries_cpu_sec", {}).get(name, -1) for r in runs]
        cpus = [c for c in cpus if c >= 0]
        if not walls:
            continue
        queries[name] = {
            "lo": min(walls), "hi": max(walls), "n": len(walls),
            "cpu_lo": min(cpus) if cpus else -1,
            "cpu_hi": max(cpus) if cpus else -1,
        }
    # total band over the CLEAN totals when present (flagged rows
    # replaced by their in-run second readings) — the number
    # verify_local --bands adjudicates
    totals = [r.get("value_clean", r["value"]) for r in runs]
    out = {"n_runs": len(runs), "sf": runs[-1].get("sf", ""),
           "total_lo": min(totals),
           "total_hi": max(totals),
           "queries": queries}
    with open("BANDS.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    wide = sorted(queries.items(),
                  key=lambda kv: kv[1]["hi"] - kv[1]["lo"], reverse=True)
    print(f"BANDS.json: {len(queries)} queries over {len(runs)} runs; "
          f"total [{out['total_lo']}, {out['total_hi']}]s; widest bands:")
    for name, b in wide[:8]:
        print(f"  {name}: [{b['lo']}, {b['hi']}] cpu [{b['cpu_lo']}, "
              f"{b['cpu_hi']}]")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
