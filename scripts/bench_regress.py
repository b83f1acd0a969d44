#!/usr/bin/env python3
"""Per-entry bench regression gate.

Compares two bench artifacts (driver BENCH_r{N}.json, or the raw one-line
JSON graft.Bench prints / writes to target/bench_local.json) and flags
per-entry regressions above a threshold, so round-over-round perf claims
are a scripted check instead of a by-hand diff.

Usage:
  python3 scripts/bench_regress.py BASELINE CURRENT [--threshold 1.5]
                                   [--min-seconds 0.5]

Exit code 1 if any entry regressed more than the threshold (entries
faster than --min-seconds in the baseline are reported but never fatal —
sub-second timings are dominated by scheduling noise).

When the BASELINE carries a per-entry "variance" map (bench_min3.py's
min→max spread across its runs), an entry is additionally noise-exempt
while its delta stays inside 2× its own measured spread — the
signal/noise boundary VERDICT r5 item 4 asked for: d7's 2.2× driver
swing sat entirely inside a ±1 s machine envelope that a bare ratio
threshold cannot see.

Both file shapes are accepted:
  - driver artifact: {"n":…,"rc":…,"tail":"…json line…"} (the JSON line
    is recovered from the tail; a truncated head is tolerated)
  - raw line: {"metric":"total","value":…,"queries":{…},"sf":…}
"""

import argparse
import json
import re
import sys


def short_id(name):
    """Canonical entry id: the prefix before the first underscore.

    Round ≤3 artifacts carry full names ("q4_join_shuffle"); round ≥4
    stdout lines carry short ids ("q4") so the whole line fits the
    driver's bounded tail. The prefix is unique across the suite, so
    canonicalizing both sides makes every artifact shape comparable.
    """
    return name.split("_", 1)[0]


def load_queries(path):
    """Returns (timings, total, variance, errored): `errored` is the set
    of entries the bench recorded as "err" (graft.Bench emits that — and
    exits nonzero — when an entry throws instead of timing the failure).
    """
    text = open(path).read()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        doc = {"tail": text}
    if isinstance(doc, dict) and "queries" in doc:
        raw = doc["queries"]
        errored = {short_id(k) for k, v in raw.items()
                   if not isinstance(v, (int, float))}
        qs = {short_id(k): v for k, v in raw.items()
              if isinstance(v, (int, float))}
        if len(qs) + len(errored) != len(raw):
            sys.exit(f"{path}: short-id collision would silently merge entries")
        var = {short_id(k): v for k, v in doc.get("variance", {}).items()}
        return qs, float(doc.get("value", sum(qs.values()))), var, errored
    # driver artifact: the bench line lives (possibly truncated) in "tail"
    tail = doc.get("tail", "") if isinstance(doc, dict) else ""
    m = re.search(r'"queries":\{([^}]*)\}', tail)
    pairs = {}
    if m:
        body = m.group(1)
    else:
        # head of the line cut off: salvage every "name":sec pair in the tail
        body = tail
    for name, sec in re.findall(r'"([a-z]\w+)":([0-9.]+)', body):
        if name not in ("value", "sf", "n", "rc", "cpus", "errors"):
            sid = short_id(name)
            if sid in pairs:
                sys.exit(f"{path}: short-id collision on {sid!r} "
                         "would silently merge entries")
            pairs[sid] = float(sec)
    errored = {short_id(n) for n in re.findall(r'"([a-z]\w+)":"err"', body)}
    tm = re.search(r'"metric":"total","value":([0-9.]+)', tail)
    total = float(tm.group(1)) if tm else sum(pairs.values())
    if not pairs and not errored:
        sys.exit(f"could not recover any per-query timings from {path}")
    return pairs, total, {}, errored


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline")
    ap.add_argument("current")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="fatal regression ratio (default 1.5x)")
    ap.add_argument("--min-seconds", type=float, default=0.5,
                    help="baseline entries faster than this are noise-exempt")
    ap.add_argument("--duckdb-baseline", default=None,
                    help="BASELINE_duckdb.json: additionally gate CURRENT "
                         "against absolute DuckDB wall-times (use ONLY "
                         "with a CURRENT measured at the same SF dir the "
                         "baseline was)")
    ap.add_argument("--ratio", type=float, default=2.0,
                    help="fatal Spark/DuckDB ratio for comparable entries")
    ap.add_argument("--abs-ceiling", type=float, default=30.0,
                    help="fatal absolute per-entry Spark seconds")
    args = ap.parse_args()

    base, base_total, base_var, base_err = load_queries(args.baseline)
    cur, cur_total, _, cur_err = load_queries(args.current)

    common = sorted(set(base) & set(cur))
    print(f"baseline: {len(base)} entries ({base_total:.1f}s total)  "
          f"current: {len(cur)} entries ({cur_total:.1f}s total)  "
          f"common: {len(common)}")
    for name in sorted(set(cur) - set(base) - cur_err):
        print(f"  NEW     {name:<22} {cur[name]:7.2f}s")

    fatal = []
    # An entry that USED to run and now errors — or silently vanished from
    # the current artifact — is the worst kind of regression (BENCH_r07
    # recorded fail-fast latencies as 10x "speedups"). Always fatal, no
    # noise exemption.
    for name in sorted((set(base) - set(cur)) | (set(base) & cur_err)):
        why = "ERRORED" if name in cur_err else "VANISHED"
        print(f"  {why} {name:<22} was {base[name]:7.2f}s  [FATAL]")
        fatal.append(name)
    for name in common:
        b, c = base[name], cur[name]
        ratio = c / b if b > 0 else float("inf")
        if ratio > args.threshold:
            envelope = 2 * base_var.get(name, 0.0)
            in_noise = envelope > 0 and (c - b) <= envelope
            if b < args.min_seconds:
                tag = "regress(noise-exempt)"
            elif in_noise:
                tag = "regress(in-envelope)"
            else:
                tag = "REGRESS"
            extra = f"  [spread ±{base_var[name]:.2f}s]" if name in base_var else ""
            print(f"  {tag:<22} {name:<22} {b:7.2f}s -> {c:7.2f}s  ({ratio:.2f}x){extra}")
            if b >= args.min_seconds and not in_noise:
                fatal.append(name)
        elif ratio < 1 / args.threshold and b >= args.min_seconds:
            print(f"  improved               {name:<22} {b:7.2f}s -> {c:7.2f}s  ({ratio:.2f}x)")

    bt = sum(base[n] for n in common)
    ct = sum(cur[n] for n in common)
    if bt > 0:
        print(f"common-entry total: {bt:.1f}s -> {ct:.1f}s ({ct/bt:.2f}x)")

    # absolute single-node gate: BASELINE.json's "within 2x of BASELINE
    # at the same scale factor", against DuckDB's measured wall-times.
    # Comparable = the oracle itself did >= 0.5 s of work (below that the
    # Spark figure is the local-mode per-job scheduling floor, which
    # amortizes away on a cluster); cause-annotated entries are exempt
    # from the ratio but still under the absolute ceiling.
    if args.duckdb_baseline:
        doc = json.load(open(args.duckdb_baseline))
        duck = {short_id(k): v for k, v in doc["queries"].items()
                if isinstance(v, (int, float))}
        causes = {short_id(k) for k in doc.get("causes", {})}
        dcommon = sorted(set(duck) & set(cur))
        cd = sum(duck[n] for n in dcommon if duck[n] >= 0.5)
        cs = sum(cur[n] for n in dcommon if duck[n] >= 0.5)
        print(f"duckdb gate: {len(dcommon)} common entries; comparable "
              f"subset {cs:.1f}s vs duckdb {cd:.1f}s ({cs/cd:.2f}x)")
        for n in dcommon:
            d, s = duck[n], cur[n]
            if s > args.abs_ceiling:
                print(f"  CEILING  {n:<22} spark {s:7.2f}s > "
                      f"{args.abs_ceiling}s  [FATAL]")
                fatal.append(n)
            elif d >= 0.5 and n not in causes and s / d > args.ratio:
                print(f"  RATIO    {n:<22} duckdb {d:7.2f}s -> spark "
                      f"{s:7.2f}s ({s/d:.1f}x > {args.ratio}x)  [FATAL]")
                fatal.append(n)
        if cd > 0 and cs / cd > args.ratio:
            print(f"  RATIO    comparable-subset total {cs/cd:.2f}x > "
                  f"{args.ratio}x  [FATAL]")
            fatal.append("subset-total")
    if fatal:
        print(f"FATAL: {len(fatal)} entries regressed >{args.threshold}x, "
              f"errored, or vanished: {', '.join(fatal)}")
        sys.exit(1)
    print("no fatal regressions")


if __name__ == "__main__":
    main()
