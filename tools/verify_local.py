#!/usr/bin/env python3
"""Local clone of the driver's correctness gate.

Usage:  python3 tools/verify_local.py <sfDir> <verifyOutDir>

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran and wrote
<name>/ parquet dirs + oracle_sql.json under <outDir>. For each query:
run the oracle SQL in DuckDB over views named after the parquet tables,
load the Spark parquet output, sort columns by name, sort rows, and compare
cell-by-cell (exact, with a float report so near-misses are visible).
"""
import json, math, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        # normalize timestamp-ish columns to us for comparison
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        # normalize integer WIDTH (int32 vs int64): the driver's hash gate
        # accepts Spark's int32 year() against DuckDB's int64 (proven green
        # in CORRECTNESS_r02) — only int-vs-float kind differences fail it
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")
    return df

def cells_equal(a, b):
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b

def fresh_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written table = directory of part files
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con

def oracle_df(sf_dir, sql, q):
    """Run one oracle in a forked child (fresh process, fresh DuckDB):
    a native crash in DuckDB then marks ONE query instead of killing the
    whole gate — observed as an occasional allocator segfault ~60
    queries into a shared connection under concurrent memory pressure
    (r15; exit via the queue keeps the parent loop alive)."""
    con = fresh_con(sf_dir)
    q.put(con.execute(sql).fetchdf())

def main(sf_dir, out_dir, name_re=None, json_out=None):
    import multiprocessing as mp
    ctx = mp.get_context("fork")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    # driver-format record per query (rows/schema/hash tri-check)
    results = {}
    def record(name, rows_m, schema_m, hash_m, sr=None, orr=None, err=None):
        results[name] = {"rows_match": rows_m, "schema_match": schema_m,
                         "hash_match": hash_m, "spark_rows": sr,
                         "oracle_rows": orr, "err": err}
        if json_out:  # incremental: a crash preserves completed rows
            with open(json_out, "w") as f:
                json.dump(results, f, indent=2, sort_keys=True)
    import re
    for name in sorted(oracles):
        if name_re and not re.search(name_re, name):
            continue
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output at {spark_dir}", flush=True)
            record(name, False, False, False, err="no spark output")
            n_fail += 1
            continue
        try:
            got = norm(pd.read_parquet(spark_dir))
            q = ctx.Queue()
            child = ctx.Process(target=oracle_df, args=(sf_dir, oracles[name], q))
            child.start()
            exp = None
            while exp is None:
                try:
                    exp = q.get(timeout=10)
                except Exception:
                    if not child.is_alive():
                        raise RuntimeError(
                            f"oracle subprocess died (exitcode={child.exitcode})")
            child.join()
            exp = norm(exp)
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}", flush=True)
            record(name, False, False, False, err=str(e)[:500])
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} oracle={list(exp.columns)}", flush=True)
            record(name, len(got) == len(exp), False, False, len(got), len(exp))
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}", flush=True)
            record(name, False, True, False, len(got), len(exp))
            n_fail += 1
            continue
        # Driver's hash is type-sensitive (int64 30 != float64 30.0, e.g.
        # DuckDB widening integer sum() to HUGEINT -> float64); enforce
        # dtype equality here so the local gate matches the driver.
        bad_types = [(c, str(got[c].dtype), str(exp[c].dtype))
                     for c in got.columns if str(got[c].dtype) != str(exp[c].dtype)]
        if bad_types:
            print(f"FAIL {name}: dtype mismatch (spark vs oracle):", flush=True)
            for c, g, e in bad_types[:5]:
                print(f"   col={c} spark={g} oracle={e}")
            record(name, True, False, False, len(got), len(exp))
            n_fail += 1
            continue
        mismatches = []
        for c in got.columns:
            gv, ev = got[c].tolist(), exp[c].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if not cells_equal(a, b):
                    mismatches.append((c, i, a, b))
                    if len(mismatches) >= 5:
                        break
            if len(mismatches) >= 5:
                break
        if mismatches:
            print(f"FAIL {name}: {len(mismatches)}+ cell mismatches, e.g.:", flush=True)
            for c, i, a, b in mismatches[:5]:
                print(f"   col={c} row={i} spark={a!r} oracle={b!r}")
            record(name, True, True, False, len(got), len(exp))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows, {len(got.columns)} cols)", flush=True)
            record(name, True, True, True, len(got), len(exp))
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None,
                  sys.argv[4] if len(sys.argv) > 4 else None))
