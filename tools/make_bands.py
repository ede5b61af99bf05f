#!/usr/bin/env python3
"""Build BANDS.json — the machine-readable per-query bench band table —
from same-code bench run history (BENCH_RUNS.jsonl, one full-run JSON
object per line, appended by graft.Bench) or from explicit BENCH_FULL
-style files passed as arguments.

Usage:
  python3 tools/make_bands.py [--last N] [run.json ...]

With no file arguments, reads BENCH_RUNS.jsonl in the CWD and uses the
last N (default 4) runs. Only runs with identical query SETS are merged
(the band is a same-code statement); if the latest runs disagree on the
query set, the majority set among the selected runs wins and mismatched
runs are dropped with a note.

Output: BANDS.json =
  {"n_runs": k, "sf": "...", "queries": {name: {"lo": s, "hi": s,
   "n": k, "cpu_lo": s, "cpu_hi": s}}}

Adjudication is tools/verify_local.py --bands <bench.json> [BANDS.json].
"""
import json
import sys


def load_runs(args):
    files, last = [], 4
    it = iter(args)
    for a in it:
        if a == "--last":
            last = int(next(it))
        else:
            files.append(a)
    if files:
        return [json.load(open(f)) for f in files]
    runs = [json.loads(line)
            for line in open("BENCH_RUNS.jsonl") if line.strip()]
    return runs[-last:]


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
    out = {"n_runs": len(runs), "sf": runs[-1].get("sf", ""),
           "total_lo": min(r["value"] for r in runs),
           "total_hi": max(r["value"] for r in runs),
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
