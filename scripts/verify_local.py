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
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(t)[: -len(".parquet")]
        src = f"{t}/*.parquet" if os.path.isdir(t) else t
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    failed = []
    for name in sorted(oracles):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            failed.append((name, "no spark dump"))
            print(f"FAIL {name}: no spark dump at {spark_dir}")
            continue
        try:
            scols, srows = rows_of(
                con, f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            ocols, orows = rows_of(con, oracles[name])
        except Exception as e:
            failed.append((name, str(e)))
            print(f"FAIL {name}: {e}")
            continue
        if [c.lower() for c in scols] != [c.lower() for c in ocols]:
            failed.append((name, f"schema {scols} vs {ocols}"))
            print(f"FAIL {name}: schema {scols} vs {ocols}")
        elif len(srows) != len(orows):
            failed.append((name, f"rows {len(srows)} vs {len(orows)}"))
            print(f"FAIL {name}: rows {len(srows)} vs {len(orows)}")
        elif srows != orows:
            diff = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
            failed.append((name, "values"))
            print(f"FAIL {name}: first differing row #{diff}:\n  spark  {srows[diff]}\n  oracle {orows[diff]}")
        else:
            print(f"ok   {name} ({len(srows)} rows)")
    print(f"\n{'FAILED ' + str(len(failed)) if failed else 'ALL GREEN'} "
          f"of {len(only) if only else len(oracles)} checked")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
