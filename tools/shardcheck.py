#!/usr/bin/env python3
"""Topic-sharded concurrent oracle compare — the r14 sf10 methodology
(BASELINE §r14) as a committed tool: N check.py workers, each over a
disjoint slice of the query surface, each with its OWN DuckDB spill dir
(two in-memory DuckDBs sharing one temp_directory corrupt each other's
spill files), merged into one driver-shaped JSON.

Usage:
  python3 tools/shardcheck.py <sfDir> <verifyOutDir> <jsonOut> [nShards]

Env (per-shard budgets, divided from the caller's intent):
  GRAFT_DUCK_THREADS  threads per shard (default 8)
  GRAFT_DUCK_MEM      memory per shard (default 20GB)
  GRAFT_DUCK_TMP_MAX  spill cap per shard (default 12GB)
"""
import sys, os, json, shutil, subprocess, tempfile

HEAVY = [
    # known-expensive oracle twins at scale (sf10 measurements): spread
    # them round-robin so no shard serializes two recursive-CTE solves
    "q54_dedup_clusters", "q103_dedup_retrieval", "q65_training_export",
    "q56_curation", "q84_leakfree_split", "q68_cluster_keeper",
    "q67_dup_rate_by_source", "q27_ngram_jaccard", "q20_minhash_neardup",
    "q107_stream_state", "q92_ivfpq_ann", "q93_served_pqann",
]


def main():
    sfdir, outdir, json_out = sys.argv[1], sys.argv[2], sys.argv[3]
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    here = os.path.dirname(os.path.abspath(__file__))
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    # order: heavy first (round-robin spreads them), then the rest
    ordered = [q for q in HEAVY if q in names] + \
              [q for q in names if q not in HEAVY]
    shards = [ordered[i::n] for i in range(n)]
    work = tempfile.mkdtemp(prefix="shardcheck-")
    procs = []
    for i, qs in enumerate(shards):
        sd = os.path.join(work, f"shard{i}")
        os.makedirs(sd)
        for q in qs:
            os.symlink(os.path.join(outdir, q), os.path.join(sd, q))
        with open(os.path.join(sd, "oracle_sql.json"), "w") as f:
            json.dump({q: oracle[q] for q in qs if q in oracle}, f)
        env = dict(os.environ)
        env.setdefault("GRAFT_DUCK_THREADS", "8")
        env.setdefault("GRAFT_DUCK_MEM", "20GB")
        env.setdefault("GRAFT_DUCK_TMP_MAX", "12GB")
        env["GRAFT_DUCK_TMP"] = os.path.join(work, f"ducktmp{i}")
        log = open(os.path.join(work, f"shard{i}.log"), "w")
        procs.append((i, subprocess.Popen(
            [sys.executable, os.path.join(here, "check.py"), sfdir, sd,
             "--json", os.path.join(work, f"shard{i}.json")],
            stdout=log, stderr=subprocess.STDOUT, env=env), log))
    merged, fail = {}, 0
    for i, p, log in procs:
        rc = p.wait()
        log.close()
        print(f"shard{i}: rc={rc}")
        sys.stdout.flush()
        shard_json = os.path.join(work, f"shard{i}.json")
        if os.path.exists(shard_json):
            merged.update(json.load(open(shard_json)))
        else:  # a crashed shard must read as failures, not silence
            for q in shards[i]:
                merged[q] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": None,
                             "oracle_rows": None,
                             "err": f"shard{i} crashed (rc={rc})"}
        print(open(os.path.join(work, f"shard{i}.log")).read())
    # A query that crashed in Verify has NO output dir, lands in no shard,
    # and would otherwise be silently absent from the merged JSON —
    # check.py's own tail loop flags exactly this case; mirror it here so
    # the sharded gate cannot silently pass a regressed query (r15 advisor).
    for q in sorted(oracle):
        if q not in merged:
            print(f"{q:28s} FAIL missing output dir (query crashed in Verify?)")
            merged[q] = {"rows_match": False, "schema_match": False,
                         "hash_match": False, "spark_rows": None,
                         "oracle_rows": None,
                         "err": "missing output dir (query crashed in Verify?)"}
    for q, r in sorted(merged.items()):
        if not (r.get("hash_match") or r.get("hash_match") is None):
            fail += 1
    with open(json_out, "w") as f:
        json.dump(dict(sorted(merged.items())), f, indent=1)
    shutil.rmtree(work, ignore_errors=True)
    print(f"\n{'ALL OK' if fail == 0 else f'{fail} FAILURES'} "
          f"({len(merged)} queries, {n} shards)")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
