#!/usr/bin/env python3
"""DuckDB side of the differential fuzz gate (FuzzSpec drives this).

Reads a {name: sql} JSON corpus, runs every query verbatim over the
parquet tables, and writes {name: {"cols": [...], "rows": [[...]]}}
with the SAME canonicalization FuzzSpec applies to the Spark results:
columns sorted by name, values stringified (None -> "NULL", bools
lowercased), rows sorted lexicographically.

Usage: fuzz_oracle.py <corpus.json> <sf_dir> <out.json>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings",
          "edges"]  # edges: OpGen's graph-family fuzz corpus


def canon_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "true" if v else "false"
    return str(v)


def main():
    corpus_path, sf_dir, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    import os
    for t in TABLES:
        # tolerate generated corpora dirs: Spark writes directory
        # parquet, and an operator-fuzz corpus contains only the tables
        # its family reads
        p = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(p):
            continue
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    corpus = json.load(open(corpus_path))
    out = {}
    for name, sql in sorted(corpus.items()):
        try:
            cur = con.execute(sql)
            cols = [d[0] for d in cur.description]
            rows = cur.fetchall()
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            canon_rows = sorted(
                [canon_val(r[i]) for i in order] for r in rows)
            out[name] = {"cols": sorted(cols), "rows": canon_rows}
        except Exception as e:  # surface engine errors as comparable data
            out[name] = {"error": f"{type(e).__name__}: {e}"}
    json.dump(out, open(out_path, "w"))
    print(f"fuzz_oracle: {len(out)} queries -> {out_path}")


if __name__ == "__main__":
    main()
