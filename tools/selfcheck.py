#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and compare (sort columns by name,
sort rows, hash values). Usage:
    python3 tools/selfcheck.py <outDir> <sfDir> [query ...]
"""
import sys, glob, os, json
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # multi-file dataset (tools/reshard_sf.py)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    # a query that threw in Verify must not silently vanish from the gate
    err_path = f"{out_dir}/_verify_errors.json"
    verrs = json.load(open(err_path)) if os.path.exists(err_path) else {}
    for k, v in sorted(verrs.items()):
        if not only or k in only:
            print(f"FAIL {k}: verify error {v}"); n_fail += 1
    dumped = {d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d))}
    for k in sorted(oracle):
        # keys already reported as verify errors are counted once, above
        if (not only or k in only) and k not in dumped and k not in verrs:
            print(f"FAIL {k}: oracle present but no dump directory"); n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        if only and name not in only:
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            print(f"SKIP {name}: rows-only ({len(spark_df)} rows)")
            n_skip += 1
            if len(spark_df) == 0:
                print(f"  WARN {name}: zero rows")
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}"); n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_fail += 1; continue
        # value compare (exact; mimics hash compare)
        mismatch = None
        for c in a.columns:
            av, bv = a[c], b[c]
            try:
                eq = (av.astype(object).where(pd.notna(av), None) ==
                      bv.astype(object).where(pd.notna(bv), None)) | (pd.isna(av) & pd.isna(bv))
            except Exception as e:
                mismatch = (c, f"compare error {e}"); break
            if not eq.all():
                i = eq.idxmin()
                mismatch = (c, f"row {i}: {av[i]!r} vs {bv[i]!r}"); break
        if mismatch:
            print(f"FAIL {name}: col {mismatch[0]} {mismatch[1]}"); n_fail += 1
        else:
            # dtype check (schema-match half of the gate)
            dt = [(c, str(a[c].dtype), str(b[c].dtype)) for c in a.columns
                  if str(a[c].dtype) != str(b[c].dtype)]
            tag = f" [dtype diff: {dt}]" if dt else ""
            print(f"PASS {name} ({len(a)} rows){tag}"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
