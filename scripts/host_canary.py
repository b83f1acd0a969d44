#!/usr/bin/env python3
"""Host-health canary for the r12 measurement-environment pathology.

The rebooted r12 host degraded DuckDB's heavy parallel hash aggregates
catastrophically at 32 threads (d12's oracle: 2.9 s healthy, 100-340 s
sick) while 8 threads stayed ~linear. Run the same probe — d12's oracle
at threads=32 vs threads=8 on the same sf1 parquet — BEFORE any
baseline sweep, so the round's ratios are stamped with the host state
they were measured under instead of discovered sick after the fact.

Usage: host_canary.py <sf1Dir> <verifyOutDir> [out.json]
  (verifyOutDir must hold oracle_sql.json from graft.Verify)
"""
import json, os, sys, time

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def run_once(sf_dir, sql, threads):
    import duckdb
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    t0 = time.monotonic()
    con.execute(sql).fetchall()
    dt = time.monotonic() - t0
    con.close()
    return round(dt, 3)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    out_json = sys.argv[3] if len(sys.argv) > 3 else None
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    sql = oracles["d12_line_dedup"]
    # fresh connection per run: the r12 pathology escalated run-over-run
    # within one connection, so a shared one would conflate the two
    t8 = [run_once(sf_dir, sql, 8) for _ in range(2)]
    t32 = [run_once(sf_dir, sql, 32) for _ in range(2)]
    # guard the denominator: on a tiny sf dir the 8-thread probe can
    # round to 0.000 s and a bare division crashes instead of verdicting
    ratio = round(min(t32) / max(min(t8), 1e-3), 2)
    # r11-healthy: 32t beat or matched 8t (2.9 s vs ~9 s). Sick: 32t is
    # 10-100x WORSE than 8t. Flag anything where 32t loses by >3x.
    # Separately report run-to-run instability: min-of-N on a bimodal
    # host systematically flatters whichever engine drew the fast mode
    # (r13 saw this probe swing 54-202 s same-day), so a wide spread is
    # its own finding even when the 32t/8t ratio looks fine.
    allruns = t8 + t32
    bimodal = max(allruns) > 2 * max(min(allruns), 1e-3)
    if min(t32) > 3 * max(min(t8), 1e-3):
        verdict = "SICK"
    elif bimodal:
        verdict = ("not-32-thread-pathological; still bimodal "
                   "(run-to-run spread > 2x — min-of-N is biased here, "
                   "prefer median-of-5 for heavy oracles)")
    else:
        verdict = "healthy"
    doc = {"probe": "d12_line_dedup oracle", "sf_dir": sf_dir,
           "threads8_s": t8, "threads32_s": t32,
           "ratio_32_over_8": ratio,
           "spread_max_over_min": round(max(allruns) / max(min(allruns), 1e-3), 2),
           "verdict": verdict}
    print(json.dumps(doc, indent=1))
    if out_json:
        json.dump(doc, open(out_json, "w"), indent=1)


if __name__ == "__main__":
    main()
