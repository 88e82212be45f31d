#!/usr/bin/env python3
"""Machine-readable sf1 correctness artifact (round 16 — verdict item #2).

Produces CORRECTNESS_sf1.json in the driver's CORRECTNESS_r{N}.json shape,
plus a `lane_parity` field per key: whether the forced-distributed Verify
dump is cell-for-cell identical to the default-lane dump (the at-scale
plans inherit the default lane's oracle exactness through it).

Each key's DuckDB oracle replay runs in a SUBPROCESS with a wall-clock
budget and a scoped temp dir (the heavy approximate oracles can spill
tens of GB at sf1 — round-15 notes); a key whose replay exceeds the
budget or errors is recorded `oracle: "infeasible"` with the reason and
still carries its lane-parity verdict. That keeps the artifact honest:
every key is either hash-exact against DuckDB at sf1, or explicitly
marked with WHY the replay (DuckDB-side, not engine-side) is infeasible.

Regenerate with exactly:

  SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify testdata-gen/sf1 /tmp/sf1_default"
  SPARK_GRAFT_VERIFY_FORCE_DISTRIBUTED=1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Verify testdata-gen/sf1 /tmp/sf1_forced"
  python3 scripts/sf1_correctness.py testdata-gen/sf1 \
    /tmp/sf1_default /tmp/sf1_forced CORRECTNESS_sf1.json [timeout_s] [key ...]

SAMPLED sub-corpus mode (round 17 — verdict item #2): the keys whose
full-sf1 replay is DuckDB-infeasible get a DIRECT check on sf1 DATA via
a deterministic source-id band of the sf1 corpus — (id // factor) %% 10
== 3, i.e. 10%% of SOURCE ids with ALL their caesar/rotation copies, so
the band preserves the per-copy isomorphism (within-copy near-dup
density, cross-copy disjointness) at a size the replay afford. Band
rows merge into the existing entries as `sampled` sub-objects:

  python3 scripts/sf1_correctness.py --make-band testdata-gen/sf1 \
    testdata-gen/sf1band 10
  SPARK_GRAFT_VERIFY_ONLY=<keys> SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Verify testdata-gen/sf1band /tmp/sf1b_default"
  SPARK_GRAFT_VERIFY_ONLY=<keys> SPARK_GRAFT_VERIFY_FORCE_DISTRIBUTED=1 ... \
    sbt -batch "runMain graft.Verify testdata-gen/sf1band /tmp/sf1b_forced"
  python3 scripts/sf1_correctness.py --sampled testdata-gen/sf1band \
    /tmp/sf1b_default /tmp/sf1b_forced CORRECTNESS_sf1.json [timeout_s] [key ...]

Driver-side tooling only (duckdb/pandas are not Scala dependencies).
"""
import json, math, os, shutil, subprocess, sys

# The sf1 scale-point key set: the data-bound board keys (BENCH_sf1.json)
# plus the adaptive-parameter entries the round-16 work touched.
DEFAULT_KEYS = [
    "bm25_search", "corpus_assemble", "corpus_clean", "dedup_bloom",
    "dedup_minhash", "dedup_minhash_best", "dedup_minhash_keep",
    "dedup_simhash", "dsir_select", "duplicate_passages", "embed_neardup",
    "gram_coverage", "graph_pagerank", "hard_negatives", "heavy_hitters",
    "hybrid_search", "knn_graph", "knn_graph_probe", "ngram_containment",
    "ngram_jaccard", "ngram_jaccard_inverted", "q31_reachability",
    "segment_dedup", "semantic_dedup", "snapshot_diff", "spell_correct",
    "text_bigram_logprob", "text_lsh_clusters", "winnow_fingerprint",
    "ann_pq", "snapshot_diff",
]


def connect(sf):
    import duckdb
    con = duckdb.connect()
    con.execute("SET threads TO 8")
    tmp = os.path.abspath(".tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute("SET max_temp_directory_size='60GiB'")
    import glob
    for p in glob.glob(f"{sf}/*.parquet"):
        t = os.path.basename(p).replace(".parquet", "")
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    return con


def norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def cells_equal(a, b):
    if a is b:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
    except (TypeError, ValueError):
        pass
    return a == b


def frames_equal(s, o):
    if sorted(s.columns) != sorted(o.columns) or len(s) != len(o):
        return False
    s, o = norm(s), norm(o)
    for col in s.columns:
        for a, b in zip(s[col].tolist(), o[col].tolist()):
            if not cells_equal(a, b):
                return False
    return True


def run_one(sf, out, key):
    """Subprocess entry: replay one oracle and compare. Exit 0 = exact."""
    con = connect(sf)
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    spark_df = con.execute(
        f"SELECT * FROM read_parquet('{out}/{key}/*.parquet')").df()
    ora_df = con.execute(oracles[key]).df()
    res = {
        "rows_match": len(spark_df) == len(ora_df),
        "schema_match": sorted(spark_df.columns) == sorted(ora_df.columns),
        "spark_rows": len(spark_df),
        "oracle_rows": len(ora_df),
    }
    res["hash_match"] = (res["rows_match"] and res["schema_match"]
                         and frames_equal(spark_df, ora_df))
    print(json.dumps(res))
    sys.exit(0 if res["hash_match"] else 3)


def make_band(src, dst, factor, mod=10, keep=1, residue=3):
    """Materialize the deterministic source-id band of a scaled dir:
    keep/mod of SOURCE ids with all their per-copy replicas, residues
    starting at `residue` ((((s % mod) - residue + mod) % mod) < keep).
    The historical sf1 call (mod=10, keep=1, residue=3) keeps exactly
    s % 10 == 3 and stays byte-compatible. sf10 bands: factor=100 (two
    composed stages); mod=100 keep=1 residue=66 -> 1% (the
    DuckDB-replayable correctness band — residue 66 is the ONE mod-100
    class where BOTH endpoints of planted text near-dup pairs survive,
    so dedup_minhash/ngram_jaccard stay non-vacuous; round-18 verdict
    #2); mod=10 keep=4 -> 40% (the largest slice whose
    engaged-escalation candidate mass fits this host's disk)."""
    import duckdb, glob
    con = duckdb.connect()
    os.makedirs(dst, exist_ok=True)
    for table, idc in (("documents", "doc_id"), ("embeddings", "vec_id")):
        p = f"{src}/{table}.parquet"
        r = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{r}') "
            f"WHERE ((({idc} // {factor}) % {mod}) - {residue} + {mod}) % {mod} < {keep}) "
            f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')").fetchone()[0]
        print(f"[band] {table}: {n} rows -> {dst}/{table}.parquet")


def main():
    if sys.argv[1] == "--run-one":
        run_one(sys.argv[2], sys.argv[3], sys.argv[4])
        return
    if sys.argv[1] == "--make-band":
        # mod and keep must come TOGETHER (a lone extra arg silently became
        # mod with keep defaulting to 1 — a differently-sized band with no
        # error); residue is an optional 7th
        if len(sys.argv) not in (5, 7, 8):
            sys.exit("usage: --make-band SRC DST FACTOR [MOD KEEP [RESIDUE]]")
        extra = [int(a) for a in sys.argv[5:8]]
        make_band(sys.argv[2], sys.argv[3], int(sys.argv[4]), *extra)
        return
    sampled = sys.argv[1] == "--sampled"
    if sampled:
        del sys.argv[1]
    sf, default_out, forced_out, result_path = sys.argv[1:5]
    rest = sys.argv[5:]
    timeout = int(rest[0]) if rest and rest[0].isdigit() else 1800
    keys = [k for k in rest if not k.isdigit()] or DEFAULT_KEYS
    keys = list(dict.fromkeys(keys))
    con = connect(sf)
    results = {}
    if os.path.exists(result_path):
        results = json.load(open(result_path))
    for key in keys:
        entry = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "spark_rows": None, "oracle_rows": None,
                 "lane_parity": None, "err": None}
        d_dir, f_dir = f"{default_out}/{key}", f"{forced_out}/{key}"
        if not os.path.isdir(d_dir):
            entry["err"] = "missing default-lane dump"
            results[key] = entry
            continue
        s_df = con.execute(f"SELECT * FROM read_parquet('{d_dir}/*.parquet')").df()
        entry["spark_rows"] = len(s_df)
        if os.path.isdir(f_dir):
            f_df = con.execute(f"SELECT * FROM read_parquet('{f_dir}/*.parquet')").df()
            entry["lane_parity"] = frames_equal(s_df, f_df)
        # oracle replay in a subprocess with a wall budget + scoped temp
        shutil.rmtree(".tmp", ignore_errors=True)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run-one",
                 sf, default_out, key],
                capture_output=True, text=True, timeout=timeout)
            if proc.returncode in (0, 3) and proc.stdout.strip():
                entry.update(json.loads(proc.stdout.strip().splitlines()[-1]))
            else:
                tail = (proc.stderr or "").strip().splitlines()[-1:]
                entry["err"] = f"oracle infeasible: {' '.join(tail) or 'replay failed'}"
        except subprocess.TimeoutExpired:
            entry["err"] = f"oracle infeasible: replay exceeded {timeout}s (DuckDB side)"
        shutil.rmtree(".tmp", ignore_errors=True)
        if sampled:
            # merge as a sub-object of the FULL-sf1 entry: the full row keeps
            # its honest infeasibility reason, the band row adds the direct
            # sf1-DATA check the reason was missing
            full = results.setdefault(key, {})
            full["sampled"] = dict(entry, band=f"source-id band 10% of {sf}")
        else:
            results[key] = entry
        state = ("EXACT" if entry.get("hash_match")
                 else entry.get("err") or "MISMATCH")
        tag = "sf1 sampled" if sampled else "sf1"
        print(f"[{tag}] {key}: {state} lane_parity={entry['lane_parity']}",
              flush=True)
        json.dump(results, open(result_path, "w"), indent=2, sort_keys=True)
    json.dump(results, open(result_path, "w"), indent=2, sort_keys=True)
    scope = ({k: v.get("sampled", {}) for k, v in results.items() if k in keys}
             if sampled else results)
    bad = [k for k, v in scope.items()
           if v.get("hash_match") is False or
           (v.get("err") and "infeasible" not in v["err"])]
    print(f"[sf1] done: {len(results)} keys, "
          f"{sum(1 for v in results.values() if v.get('hash_match'))} exact, "
          f"{sum(1 for v in results.values() if v.get('err'))} infeasible/err, "
          f"{sum(1 for v in results.values() if v.get('lane_parity'))} lane-parity, "
          f"{sum(1 for v in results.values() if v.get('sampled', {}).get('hash_match'))} sampled-exact")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
