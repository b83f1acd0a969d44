#!/usr/bin/env python3
"""Min-of-N local bench snapshot with a per-entry noise envelope.

Runs graft.Bench N times (default 3) at the given SF dir, takes the
per-entry MIN (the machine's ±25% swing is one-sided: contention only
ever adds time), and records each entry's min→max SPREAD across the runs
as `variance`. The spread is the signal/noise boundary VERDICT r5 item 4
asked for: a mover whose delta is inside its own measured spread is
machine noise, not a regression, and bench_regress.py --variance gates on
exactly that.

Usage:
  python3 scripts/bench_min3.py /root/testdata/sf0.1 BENCH_local_r06.json [N]

Writes the min-of-N snapshot in the same shape as Bench's
target/bench_local.json plus {"method": "min-of-N", "variance": {...}}.
"""
import json, os, subprocess, sys


def main():
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    runs = []
    for i in range(n):
        # default 32 threads, but let the caller override (the sf10 spot
        # recipe runs 24 threads + 96g driver to keep the heap headroom)
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
                   SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"))
        r = subprocess.run(
            ["sbt", "-batch", "runMain graft.Bench"],
            env=env, capture_output=True, text=True, cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))))
        if r.returncode != 0:
            sys.exit(f"bench run {i+1} failed rc={r.returncode}:\n{r.stdout[-2000:]}")
        doc = json.load(open(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "target", "bench_local.json")))
        runs.append(doc)
        print(f"run {i+1}/{n}: total {doc['value']}s", flush=True)
    names = sorted(runs[0]["queries"])
    mins = {q: round(min(r["queries"][q] for r in runs), 3) for q in names}
    spread = {q: round(max(r["queries"][q] for r in runs) -
                       min(r["queries"][q] for r in runs), 3) for q in names}
    out = {
        "metric": "total",
        "value": round(sum(mins.values()), 3),
        "unit": "sec",
        "queries": mins,
        "sf": runs[0].get("sf"),
        "method": f"min-of-{n}",
        "variance": spread,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}: {len(mins)} entries, "
          f"min-total {out['value']}s, "
          f"median spread {sorted(spread.values())[len(spread)//2]}s")


if __name__ == "__main__":
    main()
