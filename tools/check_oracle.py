#!/usr/bin/env python3
"""Local pre-validation of SparkEntry queries vs the DuckDB oracle.

Mimics the driver's t2 gate: for each query output parquet written by
graft.Verify, run the matching SQL from oracle_sql.json in DuckDB over the
same source tables, sort columns by name, sort rows, and compare values.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [oracleTimeoutSec]

With a timeout (used for the sf1 scale gate), an oracle query that
exceeds it is interrupted and reported as DNF — an engine-only row, not
a failure: the engine result exists and the oracle simply cannot finish
at that scale (DuckDB is interrupted via con.interrupt() from a timer
thread; the connection is then recycled).
"""
import json, math, os, sys, threading
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def _kval(x):
    # total order across None / NaN / typed values: class marker first,
    # then type name (values of equal type names are mutually comparable)
    if x is None:
        return (2, "", "")
    if isinstance(x, float) and math.isnan(x):
        return (1, "", "")
    return (0, str(type(x)), x)

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple(_kval(x) for x in t))

def cmp_vals(a, b):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
            return a == b  # exact: the whole point of decimal-safe queries
    return a == b

def main(sf_dir, out_dir, timeout_sec=None):
    def connect():
        c = duckdb.connect()
        for t in TABLES:
            # scaled stores write <table>.parquet as a DIRECTORY of
            # per-replica files (scan-parallelism at the Spark side);
            # driver stores ship single files — glob accordingly
            p = f"{sf_dir}/{t}.parquet"
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
        return c
    # Two connections: oracle SQL runs on its own connection so a timer
    # interrupt can never land on an engine-parquet read, and the oracle
    # connection is recycled whenever the timer FIRED (not only when the
    # query observed the interrupt) — if the query finishes just as the
    # timer fires, the interrupt stays latched on the connection and would
    # abort the next query run on it.
    eng_con = duckdb.connect()
    ora_con = connect()

    def run_oracle(sql):
        nonlocal ora_con
        if timeout_sec is None:
            return ora_con.execute(sql).arrow(), False
        fired = threading.Event()
        def _interrupt():
            fired.set()
            ora_con.interrupt()
        timer = threading.Timer(timeout_sec, _interrupt)
        timer.start()
        try:
            tbl, dnf = ora_con.execute(sql).arrow(), False
        except duckdb.InterruptException:
            tbl, dnf = None, True
        finally:
            timer.cancel()
        if fired.is_set():
            try:
                ora_con.close()
            except Exception:
                pass
            ora_con = connect()
        return tbl, dnf

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_dnf = 0
    for name, sql in sorted(oracle.items()):
        try:
            # single execution per side, via Arrow: value rows keep exact
            # nullable-integer types (pandas would coerce BIGINT-with-NULLs
            # to float64, rounding values above 2^53 on BOTH sides and
            # masking real diffs), while the pandas-kind probe below still
            # sees the driver's coercion via to_pandas() — no re-execution
            # (expensive oracles like d07's recursive closure must not run
            # twice)
            sel = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            g_at = eng_con.execute(sel).arrow()
            e_at, dnf = run_oracle(sql)
            if dnf:
                print(f"DNF  {name}: oracle exceeded {timeout_sec}s "
                      f"(engine rows: {g_at.num_rows}) — engine-only row")
                n_dnf += 1
                continue
            g_df = g_at.to_pandas()
            e_df = e_at.to_pandas()
            def rows_of(at):
                cols = [c.to_pylist() for c in at.columns]
                return [tuple(c[i] for c in cols) for i in range(at.num_rows)]
            g_rows, g_cols = rows_of(g_at), list(g_at.column_names)
            e_rows, e_cols = rows_of(e_at), list(e_at.column_names)
        except Exception as ex:
            print(f"FAIL {name}: exec error: {ex}")
            n_fail += 1
            continue
        # Representation strictness: the driver hashes through pandas, where
        # e.g. a DuckDB HUGEINT sum becomes float64 (99111 -> 99111.0) while
        # Spark's int64 stays int64 — values compare equal as Python ints yet
        # hash-mismatch there. Integer-width diffs (int32 vs int64) are fine
        # (round 1 showed the driver passes them); only int-vs-float or
        # numeric-vs-object kind changes are flagged.
        def kind(dt):
            s = str(dt)
            if s.startswith(("int", "uint", "Int", "UInt")):
                return "int"
            if s.startswith(("float", "Float")):
                return "float"
            return s
        g_dt = {c: kind(g_df[c].dtype) for c in g_df.columns}
        e_dt = {c: kind(e_df[c].dtype) for c in e_df.columns}
        dt_bad = {c: (g_dt.get(c), e_dt.get(c))
                  for c in set(g_dt) | set(e_dt) if g_dt.get(c) != e_dt.get(c)}
        if dt_bad:
            print(f"FAIL {name}: pandas value-kind mismatch (spark, duck): {dt_bad}")
            n_fail += 1
            continue
        gc, gr = norm(g_rows, g_cols)
        ec, er = norm(e_rows, e_cols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_fail += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} != {len(er)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(gr, er)):
            if not all(cmp_vals(x, y) for x, y in zip(a, b)):
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    dnf_note = f", {n_dnf} oracle-DNF" if n_dnf else ""
    print(f"\n{n_pass} pass, {n_fail} fail{dnf_note}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    to = float(sys.argv[3]) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], to))
