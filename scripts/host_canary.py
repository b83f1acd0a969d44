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
    ratio = round(min(t32) / min(t8), 2)
    # r11-healthy: 32t beat or matched 8t (2.9 s vs ~9 s). Sick: 32t is
    # 10-100x WORSE than 8t. Flag anything where 32t loses by >3x.
    verdict = "SICK" if min(t32) > 3 * min(t8) else "healthy"
    doc = {"probe": "d12_line_dedup oracle", "sf_dir": sf_dir,
           "threads8_s": t8, "threads32_s": t32,
           "ratio_32_over_8": ratio, "verdict": verdict}
    print(json.dumps(doc, indent=1))
    if out_json:
        json.dump(doc, open(out_json, "w"), indent=1)


if __name__ == "__main__":
    main()
