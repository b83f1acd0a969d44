#!/usr/bin/env python3
"""Carry the cause-annotation dict from one BASELINE_duckdb.json into a
freshly measured one (duckdb_baseline.py measure writes no causes), so
report-mode can render the over-threshold table without re-typing the
annotations every round.

Usage: merge_causes.py <old_with_causes.json> <fresh_measure.json> <out.json>
Causes are carried verbatim; stale entries (no longer over threshold)
are harmless — report-mode only prints causes for entries actually over.
"""
import json, sys


def main():
    old_f, new_f, out_f = sys.argv[1], sys.argv[2], sys.argv[3]
    old = json.load(open(old_f))
    new = json.load(open(new_f))
    new["causes"] = old.get("causes", {})
    json.dump(new, open(out_f, "w"), indent=1, sort_keys=True)
    print(f"wrote {out_f} with {len(new['causes'])} causes carried")


if __name__ == "__main__":
    main()
