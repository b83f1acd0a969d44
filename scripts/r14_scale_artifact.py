#!/usr/bin/env python3
"""Build SCALE_r14.json — the canonical engine-scaling figure (r13
verdict item 7): min-of-2 CLEAN walls (no SPARK_GRAFT_LOG_PAIRS count()
job) for d2/d13/d14 on the density-CONTROLLED perturbed corpora
(sf1p/sf10p), where cross-SF wall ratios measure ENGINE scaling rather
than the rotated corpus's quadratic densification.

Usage: r14_scale_artifact.py <sf1p_bench.json> <sf10p_bench.json> <out.json>
"""
import json
import sys


def main():
    sf1p = json.load(open(sys.argv[1]))
    sf10p = json.load(open(sys.argv[2]))
    entries = {}
    for name in sorted(sf1p["queries"]):
        a, b = sf1p["queries"][name], sf10p["queries"][name]
        entries[name] = {
            "sf1p_s": a, "sf10p_s": b,
            "wall_ratio_for_10x_data": round(b / a, 2),
            "sf1p_spread_s": sf1p.get("variance", {}).get(name),
            "sf10p_spread_s": sf10p.get("variance", {}).get(name),
        }
    doc = {
        "question": ("does the ENGINE scale linearly in data when candidate "
                     "density is held constant? (the control experiment that "
                     "separates engine scaling from ScaleGen's rotated-corpus "
                     "quadratic densification, PAIRS_r13.json)"),
        "corpus": ("ScaleGen 'perturb' mode: per-copy bijective token "
                   "renaming preserves every within-copy similarity exactly "
                   "while cross-copy bigram Jaccard ~0.06 stays far below "
                   "the 16x4 LSH S-curve -> constant candidate density at "
                   "every factor; r14 adds a fail-fast if a source token "
                   "already carries '~' (the rename must stay a bijection)"),
        "method": ("min-of-2 full clean runs per decade (no pair-logging "
                   "job, unlike the r13 single logged runs), "
                   "SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g, "
                   "SPARK_GRAFT_BENCH_ONLY=d2,d13,d14"),
        "entries": entries,
        "conclusion": None,  # filled below
    }
    ratios = [e["wall_ratio_for_10x_data"] for e in entries.values()]
    doc["conclusion"] = (
        f"wall ratios {min(ratios)}-{max(ratios)}x for 10x data — "
        + ("SUB-linear: the dedup engines scale better than the data on "
           "constant-density corpora; the rotated corpus's 76x pair growth "
           "was the whole r12 scale story" if max(ratios) <= 10 else
           "SUPER-LINEAR entry present — investigate before the next round"))
    json.dump(doc, open(sys.argv[3], "w"), indent=1, sort_keys=False)
    print(f"wrote {sys.argv[3]}: " + ", ".join(
        f"{n}={e['wall_ratio_for_10x_data']}x" for n, e in entries.items()))


if __name__ == "__main__":
    main()
