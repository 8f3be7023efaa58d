#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Reads /tmp/verify_out/<name> (spark parquet dirs) + oracle_sql.json,
runs each oracle SQL in DuckDB with tables registered from the sf dir,
and compares: row count, schema (column names+types after sorting by
name), and per-value equality.
"""
import atexit, duckdb, glob, json, math, os, shutil, sys, tempfile

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
# optional third arg: write a driver-shaped per-query JSON artifact
json_out = sys.argv[3] if len(sys.argv) > 3 else None
records = {}

con = duckdb.connect()
# Parallel sweeps at sf10: DuckDB's default memory budget is ~80% of
# PHYSICAL RAM *per process*, so 8 workers replaying the exact-ANN
# ground-truth CTE chains get OOM-killed by the kernel instead of
# spilling. Cap each worker explicitly (spill beats SIGKILL).
_mem = os.environ.get("GRAFT_DUCKDB_MEM")
if _mem:
    con.sql(f"SET memory_limit='{_mem}'")
_thr = os.environ.get("GRAFT_DUCKDB_THREADS")
if _thr:
    con.sql(f"SET threads={int(_thr)}")
# spill location defaults to a RELATIVE ".tmp" — parallel workers
# sharing a cwd clobber each other's spill files (observed as
# "Could not read enough bytes from file .tmp/duckdb_temp_storage").
# Set it UNCONDITIONALLY (any parallel run hits this, not just the
# mem/thread-capped sweeps), via mkdtemp, and remove it at exit so a
# worker killed mid-spill doesn't leak multi-GB temp files. Stale dirs
# from SIGKILLed workers (atexit never runs) are swept at startup.
for _stale in glob.glob(f"{tempfile.gettempdir()}/duckspill_*"):
    try:
        _pid = int(os.path.basename(_stale).split("_")[1])
        if not os.path.exists(f"/proc/{_pid}"):
            shutil.rmtree(_stale, ignore_errors=True)
    except (ValueError, IndexError, OSError):
        pass
_spill = tempfile.mkdtemp(prefix=f"duckspill_{os.getpid()}_")
atexit.register(shutil.rmtree, _spill, ignore_errors=True)
con.sql(f"SET temp_directory='{_spill}'")
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f)[:-8]
    # a table may be a single parquet file (driver testdata) or a
    # spark-written directory of part files (the regenerated sf1 dirs)
    src = f"{f}/*.parquet" if os.path.isdir(f) else f
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# optional comma-separated filter (same contract as SPARK_GRAFT_ONLY)
_only = os.environ.get("GRAFT_ONLY")
if _only:
    keep = set(_only.split(","))
    oracle = {k: v for k, v in oracle.items() if k in keep}
fails = []
for name, sql in sorted(oracle.items()):
    spark_dir = f"{outdir}/{name}"
    records[name] = {"rows_match": False, "schema_match": False,
                     "hash_match": False, "spark_rows": None,
                     "oracle_rows": None, "err": None}
    if not os.path.isdir(spark_dir):
        print(f"{name}: MISSING spark output"); fails.append(name)
        records[name]["err"] = "missing spark output"; continue
    try:
        sdf = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
    except Exception as e:
        print(f"{name}: spark read error {e}"); fails.append(name)
        records[name]["err"] = f"spark read error {e}"; continue
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR {e}"); fails.append(name)
        records[name]["err"] = f"oracle sql error {e}"; continue
    # sort columns by name
    sdf = sdf[sorted(sdf.columns)]
    odf = odf[sorted(odf.columns)]
    ok = True
    if list(sdf.columns) != list(odf.columns):
        print(f"{name}: COLUMN MISMATCH spark={list(sdf.columns)} oracle={list(odf.columns)}"); ok = False
    elif len(sdf) != len(odf):
        print(f"{name}: ROWCOUNT spark={len(sdf)} oracle={len(odf)}"); ok = False
    else:
        st = [str(t) for t in sdf.dtypes]; ot = [str(t) for t in odf.dtypes]
        if st != ot:
            print(f"{name}: DTYPE MISMATCH spark={st} oracle={ot}")
            ok = False  # still check values below
        # value compare
        for c in sdf.columns:
            a, b = sdf[c].tolist(), odf[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                same = (x == y) or (x is None and y is None)
                if isinstance(x, float) and isinstance(y, float):
                    # sign-of-zero sensitive, like the driver's value hash:
                    # -0.0 == 0.0 under ==, but the bit patterns differ and
                    # a hash-based compare fails (the round-7 emb_covariance
                    # red cell: DuckDB round(-3.5e-7, 6) = -0.0, Spark +0.0)
                    same = (math.isnan(x) and math.isnan(y)) or (
                        x == y and math.copysign(1.0, x) == math.copysign(1.0, y))
                if not same:
                    print(f"{name}: VALUE row {i} col {c}: spark={x!r} oracle={y!r}")
                    ok = False
                    break
            if not ok: break
    print(f"{name}: {'OK rows=' + str(len(sdf)) if ok else 'FAIL'}")
    records[name].update({
        "spark_rows": int(len(sdf)), "oracle_rows": int(len(odf)),
        "rows_match": len(sdf) == len(odf),
        "schema_match": list(sdf.columns) == list(odf.columns)
            and [str(t) for t in sdf.dtypes] == [str(t) for t in odf.dtypes],
        "hash_match": bool(ok)})
    if not ok: fails.append(name)
print()
print(f"=== {len(oracle) - len(fails)}/{len(oracle)} oracle queries match; failures: {fails}")
if json_out:
    with open(json_out, "w") as f:
        json.dump(records, f, indent=1, sort_keys=True)
    print(f"wrote {json_out}")
