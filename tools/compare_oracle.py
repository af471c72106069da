#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and compare against the Verify dump.
Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def load_spark(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    return pq.read_table(files[0]).to_pandas()

def norm(df):
    df = df[sorted(df.columns)]
    return df

def cmp_frames(name, spark_df, duck_df):
    if spark_df is None:
        return f"{name}: MISSING spark output"
    s, d = norm(spark_df), norm(duck_df)
    if list(s.columns) != list(d.columns):
        return f"{name}: COLS differ spark={list(s.columns)} duck={list(d.columns)}"
    if len(s) != len(d):
        return f"{name}: ROWS differ spark={len(s)} duck={len(d)}"
    # order-sensitive exact compare, with diagnostics
    mism = []
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            eq = (a == b) or (a is None and b is None)
            if not eq:
                try:
                    if a is not None and b is not None and \
                       isinstance(a, float) and math.isnan(a) and math.isnan(b):
                        eq = True
                except Exception:
                    pass
            if not eq:
                # pandas NaT/None handling
                if str(a) == str(b):
                    eq = True
            if not eq:
                mism.append((c, i, a, b))
                if len(mism) >= 3:
                    break
        if len(mism) >= 3:
            break
    if mism:
        det = "; ".join(f"col={c} row={i} spark={a!r} duck={b!r}"
                        for c, i, a, b in mism)
        return f"{name}: VALUES differ: {det}"
    return f"{name}: OK ({len(s)} rows)"

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = bad = 0
    for name in sorted(oracle):
        try:
            duck = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
            bad += 1
            continue
        res = cmp_frames(name, load_spark(outdir, name), duck)
        print(res)
        if ": OK" in res: ok += 1
        else: bad += 1
    # rows-only queries
    import os
    for name in sorted(os.listdir(outdir)):
        p = os.path.join(outdir, name)
        if os.path.isdir(p) and name not in oracle:
            df = load_spark(outdir, name)
            n = 0 if df is None else len(df)
            print(f"{name}: rows-only, {n} rows" + (" (EMPTY!)" if n == 0 else ""))
    print(f"== {ok} ok / {bad} bad ==")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
