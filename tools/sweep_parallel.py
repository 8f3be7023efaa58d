#!/usr/bin/env python3
"""Parallel twin of sf1_sweep.py: K worker processes, each replaying one
query's oracle in its own compare_oracle.py subprocess under a hard
timeout. Motivation: the sf10 DuckDB replays are dominated by a handful
of single-thread-bound CTE chains (the exact ANN ground truths, the
minhash signature chains) — serially they add up to tens of hours, in
parallel the wall is the slowest query. Same record format and the same
resume semantics as sf1_sweep.py (entries already in json_out are kept
and skipped), so the two tools are interchangeable mid-run.

Usage: sweep_parallel.py <sfdir> <verify_outdir> <json_out> [timeout_s] [workers]
"""
import json, os, subprocess, sys, tempfile
import multiprocessing as mp

SFDIR, OUTDIR, JSON_OUT = sys.argv[1], sys.argv[2], sys.argv[3]
TIMEOUT = int(sys.argv[4]) if len(sys.argv) > 4 else 600
WORKERS = int(sys.argv[5]) if len(sys.argv) > 5 else 5
HERE = os.path.dirname(os.path.abspath(__file__))

# Bench/sweep mutual-exclusion signal (round 14): two rounds of board
# inflation traced to oracle sweeps sharing the host with the official
# bench. The sweep advertises itself via a lock file; graft.Bench stamps
# its presence into the bench JSON so a contended run is diagnosable.
LOCK = os.path.join(tempfile.gettempdir(), "graft_oracle_sweep.lock")


def _take_lock():
    with open(LOCK, "w") as f:
        f.write(f"{os.getpid()} {' '.join(sys.argv)}\n")
    import atexit
    atexit.register(lambda: os.path.exists(LOCK) and os.remove(LOCK))


def run_one(name):
    tmp = tempfile.mktemp(suffix=".json")
    env = dict(os.environ, GRAFT_ONLY=name)
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "compare_oracle.py"),
             SFDIR, OUTDIR, tmp],
            env=env, timeout=TIMEOUT, capture_output=True, text=True)
        rec = json.load(open(tmp)) if os.path.exists(tmp) else {}
        out = rec.get(name, {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None,
            "err": f"compare crashed: {r.stdout[-200:]}"})
    except subprocess.TimeoutExpired:
        out = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None,
            "err": f"oracle timeout ({TIMEOUT}s) replaying the oracle SQL "
                   f"in DuckDB at this SF"}
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return name, out


def main():
    _take_lock()
    oracle = json.load(open(f"{OUTDIR}/oracle_sql.json"))
    records = {}
    if os.path.exists(JSON_OUT):
        records = json.load(open(JSON_OUT))
        print(f"resuming past {len(records)} recorded queries", flush=True)
    todo = [n for n in sorted(oracle) if n not in records]
    done = len(records)
    with mp.Pool(WORKERS) as pool:
        for name, rec in pool.imap_unordered(run_one, todo):
            records[name] = rec
            done += 1
            with open(JSON_OUT, "w") as f:
                json.dump(records, f, indent=1, sort_keys=True)
            st = records[name]
            tag = ("OK" if st["hash_match"] else
                   ("TIMEOUT" if st.get("err") and "timeout" in st["err"]
                    else "FAIL"))
            print(f"[{done}/{len(oracle)}] {name}: {tag}", flush=True)


if __name__ == "__main__":
    main()
