#!/usr/bin/env python3
"""Merge a delta sweep's per-entry results into a committed VERIFY_*.json.

The full multi-decade sweeps are expensive (an sf10 pass is ~an hour),
so entries added after a full sweep are swept alone (graft.Verify takes
entry-name args) and merged here. The merged artifact stays honest:
sf_dir must match, counts are recomputed from the merged entry map, and
a red delta entry makes the merged file red.

Usage: python3 scripts/merge_verify.py VERIFY_sf10.json delta.json
"""
import json
import sys


def main():
    base_path, delta_path = sys.argv[1], sys.argv[2]
    base = json.load(open(base_path))
    delta = json.load(open(delta_path))
    if base["sf_dir"] != delta["sf_dir"]:
        sys.exit(f"sf_dir mismatch: {base['sf_dir']} vs {delta['sf_dir']}")
    base["entries"].update(delta["entries"])
    base["checked"] = len(base["entries"])
    base["green"] = sum(1 for r in base["entries"].values() if r["match"])
    with open(base_path, "w") as f:
        json.dump(base, f, indent=1, sort_keys=True)
    print(f"{base_path}: checked={base['checked']} green={base['green']}")
    sys.exit(0 if base["green"] == base["checked"] else 1)


if __name__ == "__main__":
    main()
