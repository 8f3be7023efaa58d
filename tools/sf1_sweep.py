#!/usr/bin/env python3
"""Per-query-timeout wrapper around compare_oracle.py for the sf1 sweep.

One pathological oracle CTE (the quadratic dedup pair chains at 10x
rows) must not sink the whole artifact: each query's DuckDB replay runs
in its own subprocess under a hard timeout, and timeouts are recorded
explicitly as err="oracle timeout ..." so the artifact distinguishes
"engine wrong" from "DuckDB couldn't replay the oracle at this scale in
the time budget" (the engine side was already verified green at
sf0.1/sf0.01 for those queries).

Usage: sf1_sweep.py <sfdir> <verify_outdir> <json_out> [timeout_s]
"""
import atexit, json, os, subprocess, sys, tempfile

sfdir, outdir, json_out = sys.argv[1], sys.argv[2], sys.argv[3]
timeout = int(sys.argv[4]) if len(sys.argv) > 4 else 1200
# advertise the sweep to graft.Bench (see sweep_parallel.py)
_lock = os.path.join(tempfile.gettempdir(), "graft_oracle_sweep.lock")
with open(_lock, "w") as _f:
    _f.write(f"{os.getpid()} {' '.join(sys.argv)}\n")
atexit.register(lambda: os.path.exists(_lock) and os.remove(_lock))
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# resume: entries already recorded in json_out (from a prior partial
# run) are kept as-is and skipped
records = {}
if os.path.exists(json_out):
    records = json.load(open(json_out))
    print(f"resuming past {len(records)} recorded queries", flush=True)
done = 0
for name in sorted(oracle):
    if name in records:
        done += 1
        continue
    tmp = tempfile.mktemp(suffix=".json")
    env = dict(os.environ, GRAFT_ONLY=name)
    try:
        r = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "compare_oracle.py"),
             sfdir, outdir, tmp],
            env=env, timeout=timeout, capture_output=True, text=True)
        rec = json.load(open(tmp)) if os.path.exists(tmp) else {}
        records[name] = rec.get(name, {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None,
            "err": f"compare crashed: {r.stdout[-200:]}"})
    except subprocess.TimeoutExpired:
        records[name] = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None,
            "err": f"oracle timeout ({timeout}s) replaying the oracle SQL "
                   f"in DuckDB at this SF"}
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    done += 1
    with open(json_out, "w") as f:
        json.dump(records, f, indent=1, sort_keys=True)
    st = records[name]
    tag = ("OK" if st["hash_match"] else
           ("TIMEOUT" if st["err"] and "timeout" in st["err"] else "FAIL"))
    print(f"[{done}/{len(oracle)}] {name}: {tag}", flush=True)

with open(json_out, "w") as f:
    json.dump(records, f, indent=1, sort_keys=True)
ok = sum(1 for r in records.values() if r["hash_match"])
to = sum(1 for r in records.values()
         if r["err"] and "timeout" in (r["err"] or ""))
print(f"=== {ok}/{len(records)} hash-match; {to} oracle-timeouts; fails: "
      f"{[k for k, r in records.items() if not r['hash_match'] and not (r['err'] and 'timeout' in r['err'])]}")
