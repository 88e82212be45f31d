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

Round-20 advice hardening:
 - CONTROL ROWS: re-measuring only the flagged rows biases the artifact
   toward green (passing rows keep their possibly-equally-inflated full-run
   timings). Include at least one PASSING key from the same lane in the
   isolated run and pass it here too — its rows splice in under the same
   provenance rule, so the isolated run re-measures a control alongside
   every failure. The script WARNS (not errors, to keep old invocations
   replayable) when every spliced key's full-run row was over-bound.
 - Old-row fields are read with .get() (a prior row without big/ratio no
   longer KeyErrors).
 - The write is ATOMIC (tmp file + os.replace) so a crash mid-write cannot
   corrupt the committed artifact.

Usage:
  python3 scripts/merge_scaling.py FULL_JSON ISOLATED_JSON LANE KEY [KEY...]

LANE is the SCALING.json lane field to merge (e.g. third_decade_banded,
entries, forced_distributed). Writes FULL_JSON in place.
Driver-side tooling only.
"""
import json, os, sys


def main():
    if len(sys.argv) < 5:
        sys.exit("usage: merge_scaling.py FULL ISOLATED LANE KEY [KEY...]")
    full_path, iso_path, lane = sys.argv[1:4]
    keys = sys.argv[4:]
    full = json.load(open(full_path))
    iso = json.load(open(iso_path))
    if lane not in full or lane not in iso:
        sys.exit(f"lane {lane} missing ({lane in full=} {lane in iso=})")
    had_passing_control = False
    for k in keys:
        if k not in iso[lane]:
            sys.exit(f"{k} not in isolated {lane}")
        old = full[lane].get(k)
        if old and old.get("ratio") is not None and old.get("bound") is not None \
                and old["ratio"] <= old["bound"]:
            had_passing_control = True
        row = dict(iso[lane][k])
        old_big = old.get("big") if old else None
        old_ratio = old.get("ratio") if old else None
        prior = (f"isolated fresh-JVM re-measure replaces the full-run row "
                 f"(end-of-run JVM inflation, see baseline_notes round 9/17); "
                 f"full-run value was "
                 f"{'%.1f' % old_big if old_big is not None else '?'}s ratio "
                 f"{'%.2f' % old_ratio if old_ratio is not None else '?'}"
                 if old else "isolated fresh-JVM measure (no full-run row)")
        row["diagnosis"] = (row.get("diagnosis", "").rstrip("; ") + "; " + prior
                            ).lstrip("; ")
        full[lane][k] = row
        print(f"[merge] {lane}/{k}: ratio {old_ratio} -> "
              f"{row['ratio']} (ok={row['ratio'] <= row['bound']})")
    if not had_passing_control:
        print("[merge] WARNING: every spliced key was over-bound in the full "
              "run — include a passing control key from the same lane in the "
              "isolated run (round-20 advice) so the re-measure is symmetric.")
    tmp = full_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(full, f)
    os.replace(tmp, full_path)
    print(f"wrote {full_path}")


if __name__ == "__main__":
    main()
