#!/usr/bin/env python3
"""Local dev harness mirroring the driver's DuckDB oracle compare.

Usage: python3 scripts/check_oracle.py <sfdir> <verify_outdir>

Reads <verify_outdir>/oracle_sql.json + per-query result parquet dirs
(written by `sbt "runMain graft.Verify <sfdir> <outdir>"`), runs each
oracle SQL in DuckDB against the same parquet tables, and compares
values cell-by-cell after sorting columns by name (and rows, for
robustness). Reports exact / close / mismatch per query.

Dev-only tooling — NOT part of the shipped library.
"""
import glob
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def compare(name, spark_rows, duck_rows, spark_cols, duck_cols):
    if sorted(spark_cols) != sorted(duck_cols):
        return f"SCHEMA MISMATCH spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return f"ROWCOUNT MISMATCH spark={len(spark_rows)} duck={len(duck_rows)}"
    # reorder columns by sorted name
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]

    # sort rows with non-float cells as the primary keys: float cells
    # that differ by 1 ulp across engines must not reorder rows and
    # misalign the zip below
    def row_key(t):
        exact = tuple(str(x) for x in t if not isinstance(x, float))
        floats = tuple(round(x, 6) if isinstance(x, float) else 0.0 for x in t)
        return (exact, floats)

    s_rows = sorted([tuple(r[i] for i in s_idx) for r in spark_rows], key=row_key)
    d_rows = sorted([tuple(r[i] for i in d_idx) for r in duck_rows], key=row_key)

    # the driver hashes STRINGIFIED values, so int 99111 vs float 99111.0
    # (DuckDB HUGEINT degraded through pandas) is a real mismatch even
    # though == says otherwise — compare type class first
    def kind(x):
        t = type(x).__name__
        if "bool" in t:
            return "b"
        if "int" in t:
            return "i"
        if "float" in t:
            return "f"
        return "o"

    n_exact = n_close = 0
    worst = 0.0
    for sr, dr in zip(s_rows, d_rows):
        for sv, dv in zip(sr, dr):
            if sv is not None and dv is not None and kind(sv) != kind(dv):
                return (f"TYPE MISMATCH {type(sv).__name__} vs "
                        f"{type(dv).__name__} (e.g. {sv!r} != {dv!r})")
            if sv == dv or (sv is None and dv is None):
                n_exact += 1
            elif isinstance(sv, float) and isinstance(dv, float) and \
                    (math.isclose(sv, dv, rel_tol=1e-9, abs_tol=1e-9)):
                n_close += 1
                worst = max(worst, abs(sv - dv))
            else:
                return f"VALUE MISMATCH e.g. {sv!r} != {dv!r} (row {sr} vs {dr})"
    if n_close:
        return f"CLOSE ({n_close} cells float-close, worst |d|={worst:.3e})"
    return "EXACT"


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"{name:28s} NO SPARK OUTPUT")
            failures += 1
            continue
        try:
            srel = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            spark_cols = [d[0] for d in srel.description]
            spark_rows = srel.fetchall()
            drel = con.execute(sql)
            duck_cols = [d[0] for d in drel.description]
            # mirror the driver: it round-trips DuckDB results through
            # pandas, where HUGEINT (e.g. SUM over ints) degrades to
            # float64 and breaks hash parity with Spark's LONG — going
            # through .df() here makes the local check catch that
            duck_rows = [tuple(r) for r in
                         con.execute(sql).df().itertuples(index=False)]
        except Exception as exc:
            print(f"{name:28s} ERROR {exc}")
            failures += 1
            continue
        verdict = compare(name, spark_rows, duck_rows, spark_cols, duck_cols)
        tag = "" if verdict.startswith(("EXACT", "CLOSE")) else " <<< FAIL"
        if tag:
            failures += 1
        print(f"{name:28s} {verdict} ({len(spark_rows)} rows){tag}")
    # rows-only queries
    all_dirs = {d.rstrip('/').split('/')[-1] for d in glob.glob(f"{outdir}/*/")}
    for name in sorted(all_dirs - set(oracle)):
        try:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{outdir}/{name}/*.parquet')").fetchone()[0]
            print(f"{name:28s} rows-only: {n} rows{'' if n > 0 else ' <<< EMPTY'}")
            if n == 0:
                failures += 1
        except Exception as exc:
            print(f"{name:28s} rows-only ERROR {exc}")
            failures += 1
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
