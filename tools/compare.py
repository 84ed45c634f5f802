#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet dumps
against DuckDB executing oracle_sql.json on the same testdata tables, and
compare values column-sorted / row-sorted. Usage:
  python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps -> int ns, floats -> rounded repr
    import datetime
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].dt.strftime("%Y-%m-%d %H:%M:%S")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            def _n(v):
                if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
                    return v.strftime("%Y-%m-%d %H:%M:%S").replace(" 00:00:00", " 00:00:00")
                if isinstance(v, datetime.datetime):
                    return v.strftime("%Y-%m-%d %H:%M:%S")
                if isinstance(v, (list, tuple)) or (hasattr(v, "tolist") and not isinstance(v, (str, bytes))):
                    return tuple(v)
                return v
            df[c] = df[c].apply(_n)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table dir (e.g. ScaleGen output)
            p = f"{p}/*.parquet"
        if glob.glob(p) or os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    sql_cache = {}
    # a query that FAILED in Verify has no dump directory — enumerate the
    # oracle keys (and Verify's _failed.json) too, so a failing query turns
    # red here instead of silently vanishing from the report
    failed_path = f"{out_dir}/_failed.json"
    if os.path.exists(failed_path):
        for name in json.load(open(failed_path)):
            if not only or name in only:
                results[name] = "VERIFY_FAILED (no dump written)"
    for name in sorted(oracle):
        if only and name not in only:
            continue
        if name not in results and not os.path.isdir(os.path.join(out_dir, name)):
            results[name] = "MISSING_DUMP (query failed or was not run)"
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if only and name not in only:
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracle:
            results[name] = f"rows_only({len(spark_df)})" + ("" if len(spark_df) else " EMPTY!")
            continue
        try:
            # identical oracle SQL shared by two rows (e.g. the cluster
            # closure checked against both CC formulations) runs ONCE —
            # at sf1 the recursive CTE is ~20 min per execution
            if oracle[name] not in sql_cache:
                sql_cache[oracle[name]] = con.execute(oracle[name]).fetchdf()
            duck_df = sql_cache[oracle[name]]
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
        elif len(a) != len(b):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(a)} duck={len(b)}"
        else:
            try:
                eq = a.equals(b)
                if not eq:
                    # find first differing cell
                    diff = (a != b) & ~(a.isna() & b.isna())
                    loc = diff.stack()
                    loc = loc[loc]
                    if len(loc) == 0:
                        results[name] = "OK(na-equal)"
                        continue
                    i, c = loc.index[0]
                    results[name] = f"VALUE_MISMATCH at row {i} col {c}: spark={a.at[i,c]!r} duck={b.at[i,c]!r} ({len(loc)} cells)"
                else:
                    results[name] = "OK"
            except Exception as e:
                results[name] = f"COMPARE_ERROR: {e}"
    width = max(len(k) for k in results)
    n_ok = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("rows_only"))
    for k, v in sorted(results.items()):
        print(f"{k:<{width}}  {v}")
    print(f"-- {n_ok}/{len(results)} passing")

if __name__ == "__main__":
    main()
