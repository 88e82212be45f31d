#!/usr/bin/env python3
"""Fold an ISOLATED ScaleCheck re-measure into the committed SCALING.json.

The scale harness's own notes (scripts/baseline_notes.md, round 9/17/18)
document that rows timed late in a long ScaleCheck JVM inflate by tens of
percent (accumulated JIT state, shuffle dirs, GC pressure), and the
standing protocol is: re-check surprising ratios in an ISOLATED fresh-JVM
run before believing them. An isolated run restricted with
SPARK_GRAFT_SCALE_KEYS writes a SCALING.json holding only those keys'
rows; this script replaces the matching rows of the FULL artifact with the
isolated re-measures and stamps each replaced row's `diagnosis` with the
provenance (both numbers stay visible: the full-run value is recorded in
the diagnosis string).

Usage:
  python3 scripts/merge_scaling.py FULL_JSON ISOLATED_JSON LANE KEY [KEY...]

LANE is the SCALING.json lane field to merge (e.g. third_decade_banded,
entries, forced_distributed). Writes FULL_JSON in place.
Driver-side tooling only.
"""
import json, sys


def main():
    if len(sys.argv) < 5:
        sys.exit("usage: merge_scaling.py FULL ISOLATED LANE KEY [KEY...]")
    full_path, iso_path, lane = sys.argv[1:4]
    keys = sys.argv[4:]
    full = json.load(open(full_path))
    iso = json.load(open(iso_path))
    if lane not in full or lane not in iso:
        sys.exit(f"lane {lane} missing ({lane in full=} {lane in iso=})")
    for k in keys:
        if k not in iso[lane]:
            sys.exit(f"{k} not in isolated {lane}")
        old = full[lane].get(k)
        row = dict(iso[lane][k])
        prior = (f"isolated fresh-JVM re-measure replaces the full-run row "
                 f"(end-of-run JVM inflation, see baseline_notes round 9/17); "
                 f"full-run value was {old['big']:.1f}s ratio {old['ratio']:.2f}"
                 if old else "isolated fresh-JVM measure (no full-run row)")
        row["diagnosis"] = (row.get("diagnosis", "").rstrip("; ") + "; " + prior
                            ).lstrip("; ")
        full[lane][k] = row
        print(f"[merge] {lane}/{k}: ratio {old and old.get('ratio')} -> "
              f"{row['ratio']} (ok={row['ratio'] <= row['bound']})")
    json.dump(full, open(full_path, "w"))
    print(f"wrote {full_path}")


if __name__ == "__main__":
    main()
