#!/usr/bin/env python3
"""Local pre-flight mimic of the driver's correctness gate (dev tool only —
the shipped Scala library has no Python dependency).

Usage:  python3 tools/check.py [sf_dir] [verify_out]
Assumes `sbt "runMain graft.Verify <sf_dir> <verify_out>"` already ran.
Compares each <verify_out>/<name> parquet against DuckDB running
<verify_out>/oracle_sql.json's SQL over the same tables: columns sorted by
name, rows sorted by all columns, exact value equality.
"""
import duckdb, glob, json, math, sys
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = canon(pd.concat([pd.read_parquet(p) for p in files]))
            duck_df = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        problems = []
        if list(spark_df.columns) != list(duck_df.columns):
            problems.append(f"columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
        elif len(spark_df) != len(duck_df):
            problems.append(f"rows {len(spark_df)} vs {len(duck_df)}")
        else:
            for c in spark_df.columns:
                sa, da = spark_df[c].tolist(), duck_df[c].tolist()
                bad = [i for i in range(len(sa)) if not cells_equal(sa[i], da[i])]
                if bad:
                    i = bad[0]
                    problems.append(
                        f"col {c}: {len(bad)} diffs, first@{i}: spark={sa[i]!r} duck={da[i]!r}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems)[:400])
            n_fail += 1
        else:
            print(f"ok   {name} ({len(spark_df)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_fail} fail / {len(oracle)} total")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
