#!/usr/bin/env python3
"""Dev-loop oracle checker — mimics the driver's t2 gate locally.

Usage: python3 dev/check.py [sf_dir] [verify_out_dir]

Reads <out>/oracle_sql.json, runs each SQL in DuckDB over the sf
parquet tables, and compares against the Spark parquet dump in
<out>/<name>/. Columns are sorted by name before compare (the driver
does the same); row order is preserved (queries end in a total order).

This is dev tooling only — the shipped engine is the Scala library.
"""
import duckdb, glob, json, sys

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = 0
    fails = []
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            fails.append((name, f"oracle error: {str(e).splitlines()[0]}"))
            continue
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            fails.append((name, "no spark output"))
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        exp = exp[sorted(exp.columns)].reset_index(drop=True)
        got = got[sorted(got.columns)].reset_index(drop=True)
        if list(exp.columns) != list(got.columns):
            fails.append((name, f"schema: oracle {list(exp.columns)} vs spark {list(got.columns)}"))
            continue
        if len(exp) != len(got):
            fails.append((name, f"rows: oracle {len(exp)} vs spark {len(got)}"))
            continue
        e_str = exp.astype(str)
        g_str = got.astype(str)
        if not e_str.equals(g_str):
            mask = (e_str != g_str)
            bad_cols = [c for c in exp.columns if mask[c].any()]
            c0 = bad_cols[0]
            i0 = mask[c0].idxmax()
            fails.append((name, f"values differ in {bad_cols}; first at row {i0} col {c0}: "
                                f"oracle={e_str[c0][i0]!r} spark={g_str[c0][i0]!r}"))
            continue
        n_ok += 1
        print(f"  OK   {name} ({len(exp)} rows)")
    for name, why in fails:
        print(f"  FAIL {name}: {why}")
    # queries without oracle: report coverage only
    spark_dirs = {d.rstrip('/').split('/')[-1] for d in glob.glob(f"{out}/*/")}
    no_oracle = sorted(spark_dirs - set(oracle))
    if no_oracle:
        print(f"  (no oracle, rows-only): {no_oracle}")
    print(f"== {n_ok}/{len(oracle)} oracle-matched, {len(fails)} failed ==")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
