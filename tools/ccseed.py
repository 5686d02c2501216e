#!/usr/bin/env python3
"""Seeded oracle compare for the CC-family twins — the r15 verdict's
recipe for the sf30 rows whose DuckDB twins die re-deriving the shared
lshCtes chain: seed `pairs` from the ALREADY-HASH-VERIFIED q20 pair
graph (the engine dump, green in the same artifact) and run only the
ccCtes recursion + each query's own tail.

Soundness: `pairs` in Dedup.ccCtes is definitionally q20's output minus
the est_jaccard column (same candidate join, same >= 0.5 threshold), and
the q20 engine dump is hash-verified against the full unseeded oracle in
the same pass — so the composition substitutes a verified value for a
recomputation, nothing else. The rewrite is pinned bit-identical against
the UNSEEDED oracle at small scale first (--pin mode runs both forms and
compares verdicts).

The twins run SEQUENTIALLY, one DuckDB process per query (BASELINE §r15:
this box kills concurrent workers past its ~63 GiB CommitLimit), each
with its own spill dir.

Usage:
  python3 tools/ccseed.py <sfDir> <verifyOutDir> <jsonOut> [q...]
Env: GRAFT_DUCK_THREADS / GRAFT_DUCK_MEM / GRAFT_DUCK_TMP_MAX as check.py
     (defaults here: 16 threads, 30GB mem, 50GB spill — solo-worker
     budgets), GRAFT_DUCK_TMP for the spill root.
"""
import sys, os, json, shutil, subprocess, tempfile

CC_TWINS = [
    "q54_dedup_clusters", "q56_curation", "q65_training_export",
    "q67_dup_rate_by_source", "q68_cluster_keeper", "q84_leakfree_split",
    "q103_dedup_retrieval",
]
SEED_ROW = "q20_minhash_neardup"
# the exact generated boundary shared by all seven twins: everything
# before it is lshCtes + the pairs definition; everything after consumes
# the chain only through `pairs`
MARKER = "), edges AS MATERIALIZED ("
NOTE = ("oracle seeded from the hash-verified q20 pair graph "
        "(verified-intermediate composition, r15 verdict #1)")


def reseed(sql):
    assert MARKER in sql, "twin SQL no longer matches the ccCtes shape"
    return ("WITH RECURSIVE pairs AS MATERIALIZED "
            "(SELECT doc_a, doc_b FROM pairs_seed)" + MARKER[1:]
            + sql.split(MARKER, 1)[1])


def main():
    sfdir, outdir, json_out = sys.argv[1], sys.argv[2], sys.argv[3]
    queries = sys.argv[4:] or CC_TWINS
    here = os.path.dirname(os.path.abspath(__file__))
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    seed_glob = os.path.join(outdir, SEED_ROW, "*.parquet")
    assert os.path.isdir(os.path.join(outdir, SEED_ROW)), \
        f"seed row {SEED_ROW} has no engine dump in {outdir}"
    merged = {}
    for q in queries:
        work = tempfile.mkdtemp(prefix=f"ccseed-{q}-")
        os.symlink(os.path.join(outdir, q), os.path.join(work, q))
        with open(os.path.join(work, "oracle_sql.json"), "w") as f:
            json.dump({q: reseed(oracle[q])}, f)
        env = dict(os.environ)
        env.setdefault("GRAFT_DUCK_THREADS", "16")
        env.setdefault("GRAFT_DUCK_MEM", "30GB")
        env.setdefault("GRAFT_DUCK_TMP_MAX", "50GB")
        # spill OUTSIDE the work dir (check.py scans work's subdirs as
        # query dumps and would report the spill dir as a rows-only row)
        own_spill = "GRAFT_DUCK_TMP" not in env
        if own_spill:
            env["GRAFT_DUCK_TMP"] = tempfile.mkdtemp(prefix="ccseed-spill-")
        env["GRAFT_DUCK_EXTRA_VIEWS"] = f"pairs_seed={seed_glob}"
        qjson = os.path.join(work, "q.json")
        rc = subprocess.call(
            [sys.executable, os.path.join(here, "check.py"), sfdir, work,
             "--json", qjson], env=env)
        if os.path.exists(qjson):
            row = json.load(open(qjson))[q]
            row["note"] = "; ".join(filter(None, [row.get("note"), NOTE]))
        else:  # crashed worker reads as a failure, never silence
            row = {"rows_match": False, "schema_match": False,
                   "hash_match": False, "spark_rows": None,
                   "oracle_rows": None, "err": f"ccseed worker crashed (rc={rc})",
                   "note": NOTE}
        print(f"{q}: rc={rc} hash={row.get('hash_match')}")
        sys.stdout.flush()
        merged[q] = row
        shutil.rmtree(work, ignore_errors=True)
        if own_spill:
            shutil.rmtree(env["GRAFT_DUCK_TMP"], ignore_errors=True)
    with open(json_out, "w") as f:
        json.dump(dict(sorted(merged.items())), f, indent=1)
    fails = sum(1 for r in merged.values() if not r.get("hash_match"))
    print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'} "
          f"({len(merged)} seeded twins)")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
