#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfdir> <outdir>"), then this script compares each
<outdir>/<name> parquet against the DuckDB oracle in <outdir>/oracle_sql.json.

Usage: python3 scripts/check_correctness.py [sfdir] [outdir]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

def _connect():
    c = duckdb.connect()
    for p in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        # driver testdata tables are single files; ScaleProbe gate corpora
        # are Spark-written DIRECTORIES named <table>.parquet — glob inside
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        c.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    return c

con = _connect()

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

# Verify.scala writes declared.json (every SparkEntry.queries key) and
# failed.json (name -> exception message). A query that fails or silently
# produces no output dir must show as a FAIL row, never vanish from the
# denominator.
def _load(fname, default):
    p = os.path.join(outdir, fname)
    return json.load(open(p)) if os.path.exists(p) else default

declared = _load("declared.json", [])
failed = _load("failed.json", {})

out_dirs = sorted(d for d in os.listdir(outdir)
                  if os.path.isdir(os.path.join(outdir, d)))
results = {}
for name in declared:
    if name in failed:
        results[name] = f"QUERY-FAIL {failed[name]}"
    elif name not in out_dirs:
        results[name] = "NO-OUTPUT (declared but no result dir and no failure record)"
for name in out_dirs:
    if declared and name not in declared:
        results[name] = "UNDECLARED (output dir with no SparkEntry.queries key)"

import time
for name in out_dirs:
    if name in results:
        continue
    # live progress: big gate corpora make some oracles minutes-long —
    # without this line a stuck run is indistinguishable from a slow one
    print(f"[run ] {name}", file=sys.stderr, flush=True)
    _t0 = time.time()
    path = os.path.join(outdir, name)
    try:
        spark_df = pd.read_parquet(path)
    except Exception as e:
        results[name] = f"SPARK-READ-FAIL {e}"
        continue
    if name not in oracle:
        results[name] = f"rows-only: {len(spark_df)} rows"
        continue
    try:
        # bound each oracle: at gate-corpus scale a handful of DuckDB
        # rewrites (e.g. shingle self-joins) can run for hours; interrupt
        # and record ORACLE-TIMEOUT instead of wedging the whole gate
        import threading
        _done = threading.Event()
        _lock = threading.Lock()
        _fired = [False]  # the killer ACTUALLY interrupted (set under _lock)
        _TO = float(os.environ.get("ORACLE_TIMEOUT_SEC", "900"))
        # The killer re-checks _done UNDER THE LOCK before interrupting, and
        # the query thread sets _done under the same lock the moment
        # fetchdf() returns (r13 ADVICE: the old Event-only handshake had a
        # window between fetchdf() returning and _done.set()). That narrows
        # but does not CLOSE the race — _done is only set after control
        # reaches the finally block, so the killer can still interrupt a
        # query that already completed (r14 ADVICE). The handshake therefore
        # also RECORDS whether the killer fired (_fired, under the lock);
        # whenever it did — timeout, late interrupt after success, anything —
        # the shared connection is rebuilt below so a lingering cancel flag
        # can never abort the NEXT oracle.
        def _killer():
            if not _done.wait(_TO):
                with _lock:
                    if not _done.is_set():
                        _fired[0] = True
                        try: con.interrupt()
                        except Exception: pass
        threading.Thread(target=_killer, daemon=True).start()
        # the oracle clock starts HERE, not at _t0: _t0 predates the
        # pd.read_parquet of the Spark output, and on big gate corpora a
        # slow parquet read would inflate the elapsed time and misclassify
        # a genuine oracle error as ORACLE-TIMEOUT (r14 ADVICE)
        _q0 = time.time()
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        finally:
            with _lock:
                _done.set()
            if _fired[0]:
                # the interrupt went out (whether or not the query beat it):
                # rebuild the connection so no lingering cancel can taint
                # the next oracle (r14 ADVICE — previously only the
                # ORACLE-TIMEOUT classification path rebuilt)
                try: con.close()
                except Exception: pass
                con = _connect()
    except Exception as e:
        # classify by ELAPSED TIME from the oracle start, not by
        # substring-matching the message (r13 ADVICE): any exception
        # surfacing after the deadline on this connection is the interrupt;
        # anything earlier is a real failure.
        kind = "ORACLE-TIMEOUT" if time.time() - _q0 >= _TO \
            else f"ORACLE-FAIL {type(e).__name__}"
        results[name] = f"{kind}: {str(e)[:200]}"
        continue
    s = spark_df[sorted(spark_df.columns)]
    d = duck_df[sorted(duck_df.columns)]
    if list(s.columns) != list(d.columns):
        results[name] = f"SCHEMA-MISMATCH spark={list(s.columns)} duck={list(d.columns)}"
        continue
    if len(s) != len(d):
        results[name] = f"ROWCOUNT-MISMATCH spark={len(s)} duck={len(d)}"
        continue
    # Mirror the driver's row-sort: it sort_values's BY ALL COLUMNS before
    # hashing, and that step CRASHES on array/map-typed columns
    # (TypeError: unhashable type 'numpy.ndarray' — round-10 verdict:
    # q_agg_collect / q_agg_histogram recorded `err` on the driver while
    # this checker's in-order compare passed them). Replicate the sort so
    # any driver-only crash class is red locally too.
    try:
        s = s.sort_values(by=list(s.columns), kind="mergesort").reset_index(drop=True)
        d = d.sort_values(by=list(d.columns), kind="mergesort").reset_index(drop=True)
    except Exception as e:
        results[name] = (f"SORT-FAIL {type(e).__name__}: {e} (driver sorts by all "
                         f"columns before hashing; array/map-typed output columns "
                         f"crash it — serialize with array_join)")
        continue
    # normalize: timestamps to naive strings, floats exact (both rounded)
    # The driver's hash is DTYPE-SENSITIVE: an int64 Spark column vs a
    # float64 oracle column (DuckDB HUGEINT window sums render as float64
    # in pandas) hash-mismatches even when every value is elementwise
    # equal (round-8 verdict: q_events_anomaly / q_events_markov). Mirror
    # that here: an integer/float kind split between the two sides is a
    # FAIL before any value compare, so an uncast HUGEINT can never pass
    # locally and fail remotely.
    bad = None
    for c in s.columns:
        sv, dv = s[c], d[c]
        sk, dk = sv.dtype.kind, dv.dtype.kind
        num = set("iuf")
        if sk in num and dk in num and (sk == "f") != (dk == "f"):
            bad = (f"DTYPE-MISMATCH col={c} spark={sv.dtype} duck={dv.dtype} "
                   f"(driver hash is dtype-sensitive: wrap the oracle "
                   f"expression in CAST(... AS BIGINT)?)")
            break
        if str(sv.dtype).startswith("datetime") or str(dv.dtype).startswith("datetime"):
            sv = pd.to_datetime(sv).dt.tz_localize(None) if getattr(sv.dtype, "tz", None) else pd.to_datetime(sv)
            dv = pd.to_datetime(dv).dt.tz_localize(None) if getattr(dv.dtype, "tz", None) else pd.to_datetime(dv)
            sv, dv = sv.astype(str), dv.astype(str)
        try:
            eq = (sv.values == dv.values) | (pd.isna(sv.values) & pd.isna(dv.values))
        except Exception:
            eq = sv.astype(str).values == dv.astype(str).values
        if not eq.all():
            i = int((~eq).argmax())
            bad = f"VALUE-MISMATCH col={c} row={i} spark={sv.iloc[i]!r} duck={dv.iloc[i]!r} (dtypes {sv.dtype}/{dv.dtype})"
            break
    results[name] = bad or "OK"
    print(f"[done] {name}: {results[name][:60]} ({time.time()-_t0:.1f}s)",
          file=sys.stderr, flush=True)

n_ok = sum(1 for v in results.values() if v == "OK")
n_rows_only = sum(1 for v in results.values() if str(v).startswith("rows-only"))
for k, v in results.items():
    flag = "PASS" if v == "OK" else ("INFO" if str(v).startswith("rows-only") else "FAIL")
    print(f"[{flag}] {k}: {v}")
print(f"\n{n_ok} oracle-matched, {n_rows_only} rows-only, "
      f"{len(results) - n_ok - n_rows_only} failed, of {len(results)}")
