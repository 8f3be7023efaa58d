#!/usr/bin/env python3
"""Compare-boundary integral-magnitude audit (round-13 directive #3).

The cdc_status_dwell failure class: an exact integral that exceeds 2^53
crossing the engine/oracle compare boundary as DECIMAL/HUGEINT/BIGINT is
hash-fragile — the driver's value-hasher normalizes Spark decimal128 and
DuckDB HUGEINT differently (same family as the round-10 media_image_phash
HUGEINT and the round-7 -0.0 lessons). Such columns must cross as exact
integer TEXT (or be rescaled to fit well under 2^53 at every SF).

This tool scans every query output in a graft.Verify out-dir and reports
any non-string integral column (BIGINT/INTEGER/DECIMAL/HUGEINT) whose
max |value| exceeds 2^53, after an optional linear extrapolation
multiplier for early warning from small-SF runs (sums/counts scale at
most linearly in rows; id-envelope columns are constant, so linear is
conservative). DOUBLE columns above 2^53 are reported as info only —
doubles compare through 6-dp rounding by design, not exact-integer hash.

Usage: audit_boundary.py <verify_outdir> [extrapolation_multiplier] [json_out]
Exit 1 if any flagged column exists at multiplier 1 (i.e. measured, not
extrapolated, beyond-2^53 integral on the boundary).
"""
import duckdb, glob, json, os, sys

OUTDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
MULT = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
JSON_OUT = sys.argv[3] if len(sys.argv) > 3 else None
LIMIT = 2 ** 53

INTEGRAL = ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "HUGEINT",
            "UBIGINT", "UINTEGER", "DECIMAL")

con = duckdb.connect()
flagged, info, scanned = [], [], 0
for d in sorted(glob.glob(f"{OUTDIR}/*")):
    if not os.path.isdir(d):
        continue
    name = os.path.basename(d)
    try:
        rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        cols = list(zip(rel.columns, [str(t) for t in rel.types]))
    except Exception as e:
        flagged.append({"query": name, "column": None,
                        "err": f"unreadable: {e}"})
        continue
    scanned += 1
    for c, t in cols:
        tu = t.upper()
        is_int = any(tu.startswith(p) for p in INTEGRAL)
        if not is_int and not tu.startswith(("DOUBLE", "FLOAT")):
            continue
        try:
            if is_int:
                # Compare in the column's NATIVE integer/decimal type inside
                # DuckDB and fetch the max as VARCHAR: a CAST AS DOUBLE rounds
                # 2^53+1 down to exactly 2^53 and evades the strict check —
                # precisely the boundary this tool exists to flag.
                over, mx_s = con.sql(
                    f'SELECT max(abs("{c}")) > {LIMIT}, '
                    f'CAST(max(abs("{c}")) AS VARCHAR) '
                    f"FROM '{d}/*.parquet'").fetchone()
                mx = None if mx_s is None else float(mx_s)
            else:
                over, mx_s = None, None
                mx = con.sql(
                    f'SELECT max(abs("{c}")) '
                    f"FROM '{d}/*.parquet'").fetchone()[0]
        except Exception as e:
            flagged.append({"query": name, "column": c, "type": t,
                            "err": f"max scan failed: {e}"})
            continue
        if mx is None:
            continue
        if is_int and (over or mx * MULT > LIMIT):
            flagged.append({"query": name, "column": c, "type": t,
                            "max_abs": mx_s, "extrapolated": mx * MULT,
                            "measured_over": bool(over)})
        elif not is_int and mx > LIMIT:
            info.append({"query": name, "column": c, "type": t,
                         "max_abs": mx})

result = {"outdir": OUTDIR, "multiplier": MULT, "limit": LIMIT,
          "queries_scanned": scanned, "flagged": flagged,
          "double_info": info}
print(json.dumps(result, indent=1, sort_keys=True))
if JSON_OUT:
    with open(JSON_OUT, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
measured = [f for f in flagged if f.get("measured_over") or f.get("err")]
sys.exit(1 if measured else 0)
