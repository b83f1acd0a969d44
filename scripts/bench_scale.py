#!/usr/bin/env python3
"""Build BENCH_local_sf1.json: per-entry sf1 seconds, sf0.1 baseline
seconds, and the scale ratio — the artifact VERDICT r4 item 3 asks for.

Usage:
  python3 scripts/bench_scale.py <sf1_bench.json> <sf01_bench.json> <out.json>

Both inputs are Bench's full-name 3-decimal target/bench_local.json
shape. Entries are flagged when they scale worse than DATA_FACTOR x
(after subtracting a fixed per-entry job-overhead floor, which dominates
sub-second entries and is NOT data-dependent).
"""
import json, sys

DATA_FACTOR = 10.0
OVERHEAD_S = 0.25  # fixed per-entry floor: scheduler + codegen + job setup


def main():
    sf1_f, sf01_f, out_f = sys.argv[1], sys.argv[2], sys.argv[3]
    sf1 = json.load(open(sf1_f))
    sf01 = json.load(open(sf01_f))
    q1, q0 = sf1["queries"], sf01["queries"]
    rows = {}
    flagged = []
    for name in sorted(q1):
        if name not in q0:
            continue
        t1, t0 = q1[name], q0[name]
        # effective data-driven ratio: strip the fixed floor from both legs
        eff0 = max(t0 - OVERHEAD_S, 0.001)
        eff1 = max(t1 - OVERHEAD_S, 0.001)
        ratio = round(t1 / t0, 2) if t0 > 0 else None
        eff_ratio = round(eff1 / eff0, 2)
        rows[name] = {"sf1_s": t1, "sf01_s": t0, "ratio": ratio,
                      "eff_ratio": eff_ratio}
        # super-linear = data-driven cost grew faster than the data, with
        # slack for shuffle-partition granularity and timing noise; only
        # meaningful when the sf1 leg does real data work (> 1s over floor)
        if eff1 > 1.0 and eff_ratio > DATA_FACTOR * 1.6:
            flagged.append(name)
            rows[name]["superlinear"] = True
    out = {
        "sf1_total_s": sf1["value"],
        "sf01_total_s": sf01["value"],
        "data_factor": DATA_FACTOR,
        "overhead_floor_s": OVERHEAD_S,
        "superlinear_flagged": flagged,
        "queries": rows,
    }
    json.dump(out, open(out_f, "w"), indent=1)
    print(f"total {sf01['value']}s -> {sf1['value']}s "
          f"({sf1['value']/sf01['value']:.2f}x for {DATA_FACTOR}x data)")
    for n in flagged:
        print(f"SUPERLINEAR {n}: {rows[n]}")
    top = sorted(rows.items(), key=lambda kv: -kv[1]["sf1_s"])[:10]
    for n, r in top:
        print(f"{n:24s} sf0.1 {r['sf01_s']:7.3f}s  sf1 {r['sf1_s']:8.3f}s  x{r['ratio']}")


if __name__ == "__main__":
    main()
