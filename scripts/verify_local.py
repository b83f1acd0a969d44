#!/usr/bin/env python3
"""Local twin of the driver's correctness gate: compare graft.Verify's
parquet dumps against each oracleSql run in DuckDB on the same testdata.

Usage:
  python3 scripts/verify_local.py <sfDir> <verifyOutDir> [entry ...]

Run `sbt "runMain graft.Verify <sfDir> <verifyOutDir>"` first. With no
entry args every oracle in oracle_sql.json is checked. Compare rule =
driver's: columns sorted by name, every value canonicalized to text,
rows sorted, exact match.
"""
import duckdb, glob, json, os, sys


def rows_of(con, sql):
    # pandas canonicalization, same as the driver / verify skill: columns
    # sorted by name, floats rounded (repr noise), stringify, rows sorted —
    # a raw-fetchall compare false-fails on datetime.date vs midnight
    # datetime.datetime, which pandas coerces identically
    df = con.execute(sql).df()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    df = df.astype(str).sort_values(by=list(df.columns)).reset_index(drop=True)
    return list(df.columns), [tuple(r) for r in df.itertuples(index=False)]


def main():
    # optional: --json PATH writes a per-entry result artifact (the
    # committed VERIFY_sf*.json evidence files)
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    # Bound the oracle runner: an uncapped DuckDB hits the container's
    # OOM killer on the heaviest sf10 oracles (rc=137 mid-sweep, losing
    # the whole artifact). A memory cap + disk spill turns that into a
    # slower-but-finishing run. Override with DUCKDB_MEM.
    mem = os.environ.get("DUCKDB_MEM", "48GB")
    con.execute(f"SET memory_limit='{mem}'")
    spill = os.environ.get("DUCKDB_TMP", "/tmp/duckspill")
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(t)[: -len(".parquet")]
        src = f"{t}/*.parquet" if os.path.isdir(t) else t
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    failed = []
    results = {}
    for name in sorted(oracles):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            failed.append((name, "no spark dump"))
            results[name] = {"match": False, "err": "no spark dump"}
            print(f"FAIL {name}: no spark dump at {spark_dir}")
            continue
        try:
            scols, srows = rows_of(
                con, f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            ocols, orows = rows_of(con, oracles[name])
        except Exception as e:
            failed.append((name, str(e)))
            results[name] = {"match": False, "err": str(e)[:200]}
            print(f"FAIL {name}: {e}")
            continue
        results[name] = {"match": True, "rows": len(srows), "err": None}
        if [c.lower() for c in scols] != [c.lower() for c in ocols]:
            failed.append((name, f"schema {scols} vs {ocols}"))
            results[name] = {"match": False, "err": f"schema {scols} vs {ocols}"}
            print(f"FAIL {name}: schema {scols} vs {ocols}")
        elif len(srows) != len(orows):
            failed.append((name, f"rows {len(srows)} vs {len(orows)}"))
            results[name] = {"match": False,
                             "err": f"rows {len(srows)} vs {len(orows)}"}
            print(f"FAIL {name}: rows {len(srows)} vs {len(orows)}")
        elif srows != orows:
            diff = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
            failed.append((name, "values"))
            results[name] = {"match": False, "err": f"values (first row #{diff})"}
            print(f"FAIL {name}: first differing row #{diff}:\n  spark  {srows[diff]}\n  oracle {orows[diff]}")
        else:
            print(f"ok   {name} ({len(srows)} rows)")
    if json_out:
        summary = {"sf_dir": sf_dir, "checked": len(results),
                   "green": sum(1 for r in results.values() if r["match"]),
                   "entries": results}
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    print(f"\n{'FAILED ' + str(len(failed)) if failed else 'ALL GREEN'} "
          f"of {len(only) if only else len(oracles)} checked")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
