#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>

Reads each query's parquet dump (written by graft.Verify), runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over the same
testdata parquet tables, and compares: schema (column names), row count,
and exact values (columns sorted by name, rows in emitted order and also
as sorted multisets — we require BOTH to match so either driver
convention passes).
"""
import sys, json, glob, os, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    # Bounded-memory gate: the driver's DuckDB runs memory-constrained
    # (the round-8 v12 oracle OOM'd there while passing unbounded here),
    # so the local stand-in enforces a hard cap + a spill dir — an
    # oracle that needs more than this is a bug in the SQL's shape
    # (e.g. un-materialized CTE re-inlining), not a driver flake.
    con.execute("SET memory_limit='4GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        pq_dir = os.path.join(out_dir, name)
        if not glob.glob(os.path.join(pq_dir, "*.parquet")):
            results[name] = "MISSING spark output"
            continue
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{pq_dir}/*.parquet')")
            spark_cols = [d[0] for d in spark_rel.description]
            spark_rows = spark_rel.fetchall()
        except Exception as e:
            results[name] = f"SPARK READ FAIL: {e}"
            continue
        try:
            duck_rel = con.execute(sql)
            duck_cols = [d[0] for d in duck_rel.description]
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            results[name] = f"ORACLE SQL FAIL: {str(e)[:200]}"
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            results[name] = f"SCHEMA MISMATCH spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
            continue
        # reorder columns by sorted name
        sidx = [spark_cols.index(c) for c in sorted(spark_cols)]
        didx = [duck_cols.index(c) for c in sorted(duck_cols)]
        s = [tuple(norm(r[i]) for i in sidx) for r in spark_rows]
        d = [tuple(norm(r[i]) for i in didx) for r in duck_rows]
        if len(s) != len(d):
            results[name] = f"ROWCOUNT MISMATCH spark={len(s)} duck={len(d)}"
            continue
        # Driver-style pandas compare: a DuckDB HUGEINT output column
        # (e.g. an uncast SUM(BIGINT), or // over one) becomes float64 in
        # pandas and hash-mismatches the Spark int64 even when Python-level
        # values compare equal (the r03 x24 red row). Nullable BIGINT is
        # fine — both sides go float64 identically — so flag on the
        # declared DuckDB type, not the pandas dtype.
        try:
            bad_t = [r[0] for r in con.execute(f"DESCRIBE {sql}").fetchall()
                     if r[1] in ("HUGEINT", "UHUGEINT")
                     or r[1].startswith("DECIMAL")]
        except Exception:
            bad_t = []
        if bad_t:
            results[name] = f"DTYPE RISK: cols {bad_t} are {'HUGEINT/DECIMAL'} in DuckDB -> non-int64/f64 in a pandas compare (cast in oracle SQL)"
            continue
        if s == d:
            results[name] = "OK"
        elif sorted(map(repr, s)) == sorted(map(repr, d)):
            results[name] = "OK-unordered (row order differs!)"
        else:
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(s, d)) if a != b][:3]
            results[name] = f"VALUE MISMATCH first_diffs={bad}"
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    for name, v in results.items():
        mark = "✓" if v.startswith("OK") else "✗"
        print(f"{mark} {name}: {v}")
    print(f"\n{n_ok}/{len(results)} oracle-checked queries pass")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
