#!/usr/bin/env python3
"""Dev-loop oracle checker — dtype-faithful replica of the driver's t2 gate.

Usage: python3 dev/check.py [sf_dir] [verify_out_dir]

The real driver reads the Spark parquet dump via pyarrow/pandas
(DECIMAL -> decimal.Decimal objects, ARRAY -> numpy arrays) but the
DuckDB oracle via con.fetchdf (DECIMAL -> float64).  Round 1's checker
read BOTH sides through DuckDB, normalizing away exactly the
representation split the driver fails on — 74/74 locally vs 49/94 at
the gate.  This version replicates the driver's two read paths:

  spark side : pandas.read_parquet (pyarrow engine)
  oracle side: duckdb .fetchdf()

then sorts rows the way the driver does (sort_values over all columns —
this is also what CRASHES on unhashable numpy-array cells, so we
replicate the crash as a failure), compares astype(str) frames, and
reports dtype mismatches as warnings.

This is dev tooling only — the shipped engine is the Scala library.
"""
import duckdb, glob, json, sys
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def read_spark(files):
    """Driver-faithful read of the Spark dump: pyarrow -> pandas."""
    return pd.concat([pd.read_parquet(f, engine="pyarrow") for f in files],
                     ignore_index=True)


def driver_sort(df, name, fails):
    """Replicate the driver's row sort; a crash here is a real failure
    (unhashable array/map cells crash its sorter even for oracle-exempt
    queries)."""
    try:
        return df.sort_values(by=list(df.columns), kind="mergesort")\
                 .reset_index(drop=True)
    except Exception as e:
        fails.append((name, f"driver-sorter crash: {type(e).__name__}: {e}"))
        return None


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    # big-SF probes (the sf1 run): bound DuckDB's memory so an
    # iterative-CTE oracle spills instead of ballooning past the box
    # (observed: 80 GB RSS on graph_components at sf1), and subset the
    # run so a resume after an interrupt doesn't repay finished queries
    import os
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
        con.execute(f"SET temp_directory='/tmp/graft_duck_spill'")
    subset = os.environ.get("GRAFT_CHECK_SUBSET")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    if subset:
        keep = {s.strip() for s in subset.split(",") if s.strip()}
        oracle = {k: v for k, v in oracle.items() if k in keep}
    n_ok = 0
    fails, warns = [], []
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
        got = read_spark(files)
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            fails.append((name, f"schema: oracle {list(exp.columns)} vs spark {list(got.columns)}"))
            continue
        if len(exp) != len(got):
            fails.append((name, f"rows: oracle {len(exp)} vs spark {len(got)}"))
            continue
        exp = driver_sort(exp, name, fails)
        got = driver_sort(got, name, fails)
        if exp is None or got is None:
            continue
        e_dt = [str(t) for t in exp.dtypes]
        g_dt = [str(t) for t in got.dtypes]
        if e_dt != g_dt:
            diff = [(c, a, b) for c, a, b in zip(exp.columns, e_dt, g_dt) if a != b]
            warns.append((name, f"dtypes differ: {diff}"))
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
    # oracle-exempt queries: the driver STILL sorts their output, so an
    # array/map column there crashes it — replicate that too.
    spark_dirs = {d.rstrip('/').split('/')[-1] for d in glob.glob(f"{out}/*/")}
    no_oracle = sorted(spark_dirs - set(oracle))
    for name in no_oracle:
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            continue
        got = read_spark(files)
        driver_sort(got, name, fails)
    for name, why in warns:
        print(f"  WARN {name}: {why}")
    for name, why in fails:
        print(f"  FAIL {name}: {why}")
    if no_oracle:
        print(f"  (no oracle, rows-only): {no_oracle}")
    print(f"== {n_ok}/{len(oracle)} oracle-matched, {len(fails)} failed, {len(warns)} dtype-warned ==")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
