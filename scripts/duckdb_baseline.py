#!/usr/bin/env python3
"""Measure the absolute DuckDB baseline the 2x metric demands.

BASELINE.json's metric says "BENCH within 2x of BASELINE at the same
scale factor", but no absolute number existed through round 8 — grading
was round-over-round only. This script records DuckDB's wall-time per
oracle entry (min-of-3, same machine, same parquet) as
BASELINE_duckdb.json, and renders BASELINE.md with the Spark-vs-DuckDB
ratio table when given a Spark bench artifact.

The comparison is honest-but-asymmetric by construction: DuckDB runs
the ORACLE formulation (single-node vectorized, no scheduling), Spark
runs the engine entry (distributed plan, 32-way parallelism overhead at
toy scale). Entries over the ratio threshold are listed with a cause;
the gate lives in bench_regress.py --duckdb-baseline.

Usage:
  measure:  duckdb_baseline.py measure <sfDir> <verifyOutDir> <out.json>
  report:   duckdb_baseline.py report <baseline.json> <spark_bench.json>
            <out.md> [--threshold 2.0]
"""
import json
import os
import re
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def short_id(name):
    return name.split("_", 1)[0]


def measure(sf_dir, out_dir, out_json):
    # Pinned measurement regime (r13 verdict item 3): the default-config
    # oracle column drifted 3-4x across host reboots on identical data
    # (d4/d9 flipped weak on oracle-side drift alone; d12's 30x swing
    # polluted the grand total the other way). Pin what is pinnable:
    #   - threads=8: HOST_CANARY shows 8t matches 32t in speed with far
    #     less run-to-run variance on heavy parallel hash aggregates;
    #   - memory_limit pinned (spill to a fixed temp dir) so out-of-core
    #     behavior is the same run-to-run;
    #   - 5 runs per entry; entries whose max/min spread exceeds 2x take
    #     the MEDIAN (min-of-N is systematically biased toward the lucky
    #     mode on a bimodal host), stable entries keep the min (one-sided
    #     contention noise argument). All 5 raw runs are recorded.
    import statistics
    import duckdb
    threads = int(os.environ.get("DUCKDB_THREADS", "8"))
    mem = os.environ.get("DUCKDB_MEM", "48GB")
    n_runs = int(os.environ.get("DUCKDB_RUNS", "5"))
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    con.execute(f"SET memory_limit='{mem}'")
    spill = os.environ.get("DUCKDB_TMP", "/tmp/duckspill")
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    times, detail, stat = {}, {}, {}
    for name in sorted(oracles):
        runs = []
        for _ in range(n_runs):
            t0 = time.monotonic()
            try:
                con.execute(oracles[name]).fetchall()
            except Exception as e:
                times[name] = f"err: {type(e).__name__}"
                runs = None
                break
            runs.append(round(time.monotonic() - t0, 3))
        if runs is not None:
            spread = max(runs) / max(min(runs), 1e-3)
            bimodal = spread > 2.0
            chosen = statistics.median(runs) if bimodal else min(runs)
            times[name] = round(chosen, 3)
            detail[name] = runs
            stat[name] = "median" if bimodal else "min"
            print(f"{name:<24} {chosen:7.3f}s  ({stat[name]}, "
                  f"runs {['%.3f' % r for r in runs]})")
        else:
            print(f"{name:<24} {times[name]}")
    doc = {"sf_dir": sf_dir, "engine": "duckdb",
           "runs": f"pinned {threads}t/{mem}: min-of-{n_runs}, "
                   "median when spread > 2x",
           "queries": times, "runs_detail": detail, "stat": stat,
           "total": round(sum(v for v in times.values()
                              if isinstance(v, float)), 3)}
    json.dump(doc, open(out_json, "w"), indent=1, sort_keys=True)
    print(f"wrote {out_json} (total {doc['total']}s, "
          f"{sum(1 for s in stat.values() if s == 'median')} median entries)")


def load_spark(path):
    text = open(path).read()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        doc = {"tail": text}
    if "queries" in doc:
        return {k: v for k, v in doc["queries"].items()
                if isinstance(v, (int, float))}
    pairs = {}
    for name, sec in re.findall(r'"([a-z]\w+)":([0-9.]+)', doc.get("tail", "")):
        if name not in ("value", "sf", "n", "rc", "cpus"):
            pairs[name] = float(sec)
    return pairs


MIN_DUCK = 0.5  # below this the oracle did sub-second work: the Spark
# side of such an entry measures the local-mode job-scheduling floor
# (~0.3-1 s x #jobs), not throughput — the quantity that VANISHES on a
# real cluster where per-partition work dominates. Those entries are
# ratio-exempt and capped absolutely instead (see bench_regress.py).


def report(baseline_json, spark_json, out_md, threshold):
    base = json.load(open(baseline_json))
    duck = {short_id(k): v for k, v in base["queries"].items()
            if isinstance(v, (int, float))}
    full_name = {short_id(k): k for k in base["queries"]}
    spark = {short_id(k): v for k, v in load_spark(spark_json).items()}
    causes = base.get("causes", {})
    common = sorted(set(duck) & set(spark))
    rows = []
    for sid in common:
        d, s = duck[sid], spark[sid]
        rows.append((full_name[sid], d, s, s / d if d > 0 else float("inf")))
    rows.sort(key=lambda r: -r[3])
    comparable = [r for r in rows if r[1] >= MIN_DUCK]
    over = [r for r in comparable if r[3] > threshold]
    unexplained = [r for r in over if r[0] not in causes]
    dtot = sum(r[1] for r in rows)
    stot = sum(r[2] for r in rows)
    cd = sum(r[1] for r in comparable)
    cs = sum(r[2] for r in comparable)
    with open(out_md, "w") as f:
        f.write("# BASELINE — absolute single-node numbers "
                "(DuckDB oracle wall-time)\n\n")
        f.write(f"Measured on `{base['sf_dir']}` ({base['runs']}, same "
                "machine as the Spark bench). Spark column is the "
                f"engine's per-entry bench at the same SF "
                f"(`{os.path.basename(spark_json)}`).\n\n")
        f.write(f"**Comparable subset (oracle itself does >= {MIN_DUCK} s "
                f"of single-node work, {len(comparable)} entries): DuckDB "
                f"{cd:.1f}s, Spark {cs:.1f}s = {cs/cd:.2f}x — the 2x "
                "metric's denominator.** Grand totals over all "
                f"{len(rows)} common entries: DuckDB {dtot:.1f}s, Spark "
                f"{stot:.1f}s ({stot/dtot:.2f}x).\n\n")
        f.write("Entries where the oracle finishes in sub-second time are "
                "ratio-exempt by rule: there the Spark figure measures "
                "local-mode job scheduling (a fixed per-job cost that "
                "amortizes away at cluster scale), and three entry "
                "classes do work the oracle never performs — INVARIANT "
                "oracles (s3/s6/s9 read a recall fixture while Spark "
                "trains the index), WRITE-PATH entries (q64/q67/q69/q70/"
                "q72/q65/q68/a1/a3/a5 materialize parquet/warehouse "
                "state while the oracle recomputes the final frame), and "
                "REAL-DECODE entries (m1/m4/m5 drive actual codecs). The "
                "gate (bench_regress.py --duckdb-baseline) enforces "
                f"ratio <= {threshold}x on the comparable subset minus "
                "cause-annotated entries, plus an absolute per-entry "
                "ceiling everywhere.\n\n")
        if over:
            f.write(f"## Comparable entries over {threshold}x "
                    "(cause-annotated)\n\n")
            f.write("| entry | duckdb s | spark s | ratio | cause |\n")
            f.write("|---|---|---|---|---|\n")
            for name, d, s, r in over:
                f.write(f"| {name} | {d:.3f} | {s:.3f} | {r:.1f}x | "
                        f"{causes.get(name, 'UNEXPLAINED')} |\n")
            f.write("\n")
        f.write("## All common entries\n\n")
        f.write("| entry | duckdb s | spark s | ratio | comparable |\n"
                "|---|---|---|---|---|\n")
        for name, d, s, r in rows:
            f.write(f"| {name} | {d:.3f} | {s:.3f} | {r:.1f}x | "
                    f"{'yes' if d >= MIN_DUCK else 'no'} |\n")
    print(f"wrote {out_md}: {len(rows)} entries, {len(comparable)} "
          f"comparable, {len(over)} over {threshold}x "
          f"({len(unexplained)} UNEXPLAINED)")
    return len(unexplained)


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    cmd = sys.argv[1]
    if cmd == "measure":
        measure(sys.argv[2], sys.argv[3], sys.argv[4])
    elif cmd == "report":
        threshold = 2.0
        if "--threshold" in sys.argv:
            i = sys.argv.index("--threshold")
            threshold = float(sys.argv[i + 1])
        report(sys.argv[2], sys.argv[3], sys.argv[4], threshold)
    else:
        sys.exit(__doc__)


if __name__ == "__main__":
    main()
