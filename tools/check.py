#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify output
parquet against DuckDB oracle SQL on the same fixture tables.
Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, duckdb, pandas as pd, numpy as np

# optional: --json <path> emits a driver-shaped per-query report
# ({name: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
# err}}) so the committed cluster-gate artifact reads like the driver's
# CORRECTNESS_r*.json.
args = [a for a in sys.argv[1:]]
json_out = None
if "--json" in args:
    i = args.index("--json"); json_out = args[i+1]; del args[i:i+2]
sfdir, outdir = args[0], args[1]
report = {}
con = duckdb.connect()
# Large-fixture runs: bound DuckDB's parallelism/memory so a multi-hour
# recursive-CTE oracle doesn't starve concurrent engine benches
# (GRAFT_DUCK_THREADS=8 GRAFT_DUCK_MEM=32GB tools/check.py sf1dir out).
if os.environ.get("GRAFT_DUCK_THREADS"):
    con.sql(f"SET threads={int(os.environ['GRAFT_DUCK_THREADS'])}")
if os.environ.get("GRAFT_DUCK_MEM"):
    con.sql(f"SET memory_limit='{os.environ['GRAFT_DUCK_MEM']}'")
# GRAFT_DUCK_TMP: give the in-memory connection a spill directory — an
# in-memory DuckDB cannot offload otherwise, and the sf10 CC-closure
# oracles exceed any reasonable memory_limit without one.
if os.environ.get("GRAFT_DUCK_TMP"):
    tmp = os.environ["GRAFT_DUCK_TMP"]
    os.makedirs(tmp, exist_ok=True)
    con.sql(f"SET temp_directory='{tmp}'")
    con.sql("SET max_temp_directory_size='%s'"
            % os.environ.get("GRAFT_DUCK_TMP_MAX", "40GB"))
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
# GRAFT_DUCK_EXTRA_VIEWS: "name=/abs/glob.parquet;name2=..." — extra views
# over already-hash-verified engine dumps, so an oracle twin can be seeded
# from a verified intermediate instead of re-deriving an hour-class shared
# chain per query (the r15 verdict's CC-twin recipe; tools/ccseed.py is
# the only writer of this env var and asserts the seed row's own hash).
for spec in filter(None, os.environ.get("GRAFT_DUCK_EXTRA_VIEWS", "").split(";")):
    vname, vpath = spec.split("=", 1)
    con.sql(f"CREATE VIEW {vname} AS SELECT * FROM '{vpath}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name in sorted(os.listdir(outdir)):
    p = os.path.join(outdir, name)
    if not os.path.isdir(p):
        continue
    got = pd.read_parquet(p)
    if name not in oracle:
        print(f"{name:28s} rows-only: {len(got)} rows")
        report[name] = {"rows_match": len(got) >= 0, "schema_match": None,
                        "hash_match": None, "spark_rows": len(got),
                        "oracle_rows": None, "err": None}
        continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name:28s} ORACLE ERROR: {e}")
        report[name] = {"rows_match": False, "schema_match": False,
                        "hash_match": False, "spark_rows": len(got),
                        "oracle_rows": None, "err": f"oracle: {e}"[:300]}
        fail += 1
        continue
    # driver-style: sort columns by name, compare values
    got = got[sorted(got.columns)].reset_index(drop=True)
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    # list/array cells (posting lists etc.) are unhashable for the row
    # sort — stringify them, same as the driver's value-hash does
    for df in (got, exp):
        for c in df.columns:
            if df[c].dtype == object and df[c].map(
                    lambda v: isinstance(v, (list, np.ndarray))).any():
                df[c] = df[c].map(
                    lambda v: str(list(v)) if isinstance(v, (list, np.ndarray)) else str(v))
    ok = True
    msgs = []
    notes = []  # benign annotations (e.g. row order) — never in err
    if list(got.columns) != list(exp.columns):
        ok = False; msgs.append(f"cols {list(got.columns)} vs {list(exp.columns)}")
    elif len(got) != len(exp):
        ok = False; msgs.append(f"rows {len(got)} vs {len(exp)}")
    else:
        # sort rows to be order-insensitive, then exact compare
        gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        for c in got.columns:
            g, e = gs[c], es[c]
            if str(g.dtype) != str(e.dtype):
                ok = False
                msgs.append(f"dtype[{c}] {g.dtype} vs {e.dtype}")
            try:
                if g.dtype.kind == 'f':
                    same = np.allclose(g.values.astype(float), e.values.astype(float), rtol=0, atol=0, equal_nan=True)
                    exact = same
                elif g.dtype == e.dtype and g.dtype.kind in 'iub':
                    # SAME-dtype integer/bool columns compare natively —
                    # astype(str) on a 30M-row column materializes tens of
                    # GB of python strings and MemoryErrors at sf30 (r15).
                    # Mixed kinds (bool-vs-int True==1, int64/uint64
                    # promoting to float64 above 2^53) fall through to the
                    # exact string compare (r15 advisor).
                    exact = np.array_equal(g.values, e.values)
                else:
                    exact = g.astype(str).equals(e.astype(str))
            except Exception as ex:
                exact = False
                msgs.append(f"cmp[{c}]: {type(ex).__name__} {ex}")
            if not exact:
                ok = False
                msgs.append(f"VALUES differ in {c}: got {gs[c].head(3).tolist()} exp {es[c].head(3).tolist()}")
        # also check row order as produced (driver may be order-sensitive)
        for c in got.columns:
            g, e = got[c], exp[c]
            try:
                if g.dtype.kind == 'f':
                    o = np.allclose(g.values.astype(float), e.values.astype(float), rtol=0, atol=0, equal_nan=True)
                elif g.dtype == e.dtype and g.dtype.kind in 'iub':
                    o = np.array_equal(g.values, e.values)
                else:
                    o = g.astype(str).equals(e.astype(str))
            except Exception:
                o = False
            if not o:
                notes.append(f"(row-order differs in {c})")
                break
    status = "OK " if ok else "FAIL"
    if not ok: fail += 1
    print(f"{name:28s} {status} rows={len(got)} {'; '.join(msgs + notes)}")
    # err carries FAILURE text only — a strict `err != null` parser must
    # never miscount an all-green row; benign annotations go to `note`.
    report[name] = {"rows_match": len(got) == len(exp),
                    "schema_match": list(got.columns) == list(exp.columns),
                    "hash_match": ok, "spark_rows": len(got),
                    "oracle_rows": len(exp),
                    "err": ("; ".join(msgs))[:300] or None,
                    "note": ("; ".join(notes))[:300] or None}
# A query that crashed in Verify leaves no output dir — that is a failure,
# not a skip (otherwise a regressed query silently passes the gate).
for name in sorted(oracle):
    if not os.path.isdir(os.path.join(outdir, name)):
        fail += 1
        print(f"{name:28s} FAIL missing output dir (query crashed in Verify?)")
        report[name] = {"rows_match": False, "schema_match": False,
                        "hash_match": False, "spark_rows": None,
                        "oracle_rows": None,
                        "err": "missing output dir (query crashed in Verify?)"}
if json_out:
    with open(json_out, "w") as f:
        json.dump(report, f, indent=1)
print(f"\n{'ALL OK' if fail==0 else f'{fail} FAILURES'}")
sys.exit(1 if fail else 0)
