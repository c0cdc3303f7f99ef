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
import functools
import json, math, os, subprocess, sys
import duckdb

print = functools.partial(print, flush=True)  # line-wise progress when piped

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

def main(sf_dir, out_dir, timeout_sec=None, only=None):
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
    # Engine-parquet reads get their own connection; oracle SQL runs
    # either on a long-lived oracle connection (no timeout) or in a
    # KILLABLE SUBPROCESS per query (timeout set). In-process
    # con.interrupt() is not a reliable timeout: DuckDB checks the
    # interrupt flag at operator checkpoints, and a long non-cooperative
    # phase (observed: a sizewise-quadratic self-join grinding past 15 min
    # and 50 GB after the 300 s timer fired) never reaches one — only
    # SIGKILL on a worker process bounds the wall for real.
    eng_con = duckdb.connect()
    ora_con = None if timeout_sec is not None else connect()

    worker_src = r"""
import os, sys
import duckdb
sf_dir, out_path, sql = sys.argv[1], sys.argv[2], sys.stdin.read()
con = duckdb.connect()
for t in %r:
    p = f"{sf_dir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
con.execute(f"COPY ({sql.rstrip().rstrip(';')}) TO '{out_path}' (FORMAT PARQUET)")
""" % (TABLES,)

    def run_oracle_file(name, sql):
        """Executes the oracle SQL in a killable worker; returns
        (parquet_path, dnf)."""
        out_path = f"{out_dir}/_oracle_{name}.parquet"
        if os.path.exists(out_path):
            os.remove(out_path)
        proc = subprocess.Popen(
            [sys.executable, "-c", worker_src, sf_dir, out_path],
            stdin=subprocess.PIPE, stdout=subprocess.DEVNULL,
            stderr=subprocess.PIPE)
        try:
            _, err = proc.communicate(sql.encode(), timeout=timeout_sec)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.communicate()
            return None, True
        if proc.returncode != 0:
            raise RuntimeError(
                f"oracle worker failed: {err.decode(errors='replace')[-500:]}")
        return out_path, False

    # Driver-transport probe: the driver's hash gate canonicalizes some
    # numeric types through a float64-lossy path (observed r12: a
    # DECIMAL(38,0) column with values ~6e16 — exact on both sides here —
    # hash-mismatched in the driver because one side's transport rounded
    # past 2^53). Value-exact comparison below cannot see that class, so
    # any non-integer numeric column (decimal/float) whose magnitude
    # exceeds 2^53 is a FAIL: emit an int64-safe form instead (modular
    # reduction to BIGINT, or scale-to-long with bounded magnitude).
    LOSSY_MAX = 2.0 ** 53

    def lossy_cols_arrow(at):
        import pyarrow as pa
        import pyarrow.compute as pc
        bad = {}
        for cname, col in zip(at.column_names, at.columns):
            t = col.type
            if pa.types.is_decimal(t) or pa.types.is_floating(t):
                try:
                    m = pc.max(pc.abs(col.cast(pa.float64()))).as_py()
                except Exception:
                    vals = (abs(float(v)) for v in col.to_pylist()
                            if v is not None)
                    m = max(vals, default=None)
                if m is not None and m > LOSSY_MAX:
                    bad[cname] = (str(t), m)
        return bad

    def lossy_cols_duck(src):
        bad = {}
        desc = eng_con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()
        probes = [(cname, typ) for cname, typ, *_ in desc
                  if typ.upper().startswith(("DECIMAL", "DOUBLE", "FLOAT",
                                             "HUGEINT", "UHUGEINT"))]
        for cname, typ in probes:
            m = eng_con.execute(
                f"SELECT max(abs(CAST(\"{cname}\" AS DOUBLE))) FROM {src}"
            ).fetchone()[0]
            if m is not None and m > LOSSY_MAX:
                bad[cname] = (typ, m)
        return bad

    # Above this many engine rows, python-tuple normalization is the
    # bottleneck (observed: a 74.5M-row range-join output at the 10x gate
    # costing 50+ GB and tens of minutes in pure python). Large outputs
    # compare natively in DuckDB instead: row count + an order-independent
    # per-row hash checksum over every column's canonical VARCHAR form.
    # Type-LAX by construction (int32 and int64 render identically) but
    # value-exact (DuckDB renders doubles shortest-roundtrip).
    LARGE_ROWS = 2_000_000

    def cksum(src):
        cols = eng_con.execute(f"SELECT * FROM {src} LIMIT 0").arrow().column_names
        expr = ", ".join(
            f"COALESCE(CAST(\"{c}\" AS VARCHAR), chr(1))" for c in sorted(cols))
        n, h = eng_con.execute(
            f"SELECT count(*), sum(hash(concat_ws(chr(31), {expr}))) "
            f"FROM {src}").fetchone()
        return (tuple(sorted(cols)), n, h)

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
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
            eng_src = f"read_parquet('{out_dir}/{name}/*.parquet')"
            if timeout_sec is not None:
                n_eng = eng_con.execute(
                    f"SELECT count(*) FROM {eng_src}").fetchone()[0]
                out_path, dnf = run_oracle_file(name, sql)
                if dnf:
                    print(f"DNF  {name}: oracle exceeded {timeout_sec}s "
                          f"(engine rows: {n_eng}) — engine-only row")
                    n_dnf += 1
                    continue
                ora_src = f"read_parquet('{out_path}')"
                if n_eng > LARGE_ROWS:
                    lossy = {**lossy_cols_duck(eng_src),
                             **lossy_cols_duck(ora_src)}
                    if lossy:
                        os.remove(out_path)
                        print(f"FAIL {name}: lossy-transport risk — "
                              f"non-int64 numeric values > 2^53: {lossy}")
                        n_fail += 1
                        continue
                    g_ck, e_ck = cksum(eng_src), cksum(ora_src)
                    os.remove(out_path)
                    if g_ck == e_ck:
                        print(f"PASS {name} ({n_eng} rows, checksum compare)")
                        n_pass += 1
                    else:
                        print(f"FAIL {name}: checksum mismatch "
                              f"(spark {g_ck[1:]} vs duck {e_ck[1:]}, "
                              f"cols {g_ck[0]} vs {e_ck[0]})")
                        n_fail += 1
                    continue
                g_at = eng_con.execute(f"SELECT * FROM {eng_src}").arrow()
                e_at = eng_con.execute(f"SELECT * FROM {ora_src}").arrow()
                os.remove(out_path)
            else:
                g_at = eng_con.execute(f"SELECT * FROM {eng_src}").arrow()
                e_at, dnf = ora_con.execute(sql).arrow(), False
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
        lossy = {**lossy_cols_arrow(g_at), **lossy_cols_arrow(e_at)}
        if lossy:
            print(f"FAIL {name}: lossy-transport risk — non-int64 numeric "
                  f"values > 2^53: {lossy}")
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
    names = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    sys.exit(main(sys.argv[1], sys.argv[2], to, names))
