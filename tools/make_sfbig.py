#!/usr/bin/env python3
"""Build a ~10x replicated dataset in /tmp/sfbig from /root/testdata/sf0.1
for scale testing (ids shifted per replica; events users offset so dedup
and join semantics stay meaningful). Replication is exact-duplicate-heavy
by construction — interpret near-dup benchmarks accordingly (SURVEY §8).

Usage: python3 tools/make_sfbig.py [reps] [outdir=/tmp/sfbig]
"""
import sys, os, glob
import duckdb

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
specs = {
    "documents": ("SELECT doc_id + {off} AS doc_id, text, lang, source, n_chars FROM src", 50000),
    "embeddings": ("SELECT vec_id + {off} AS vec_id, embedding, label FROM src", 20000),
    "events": ("SELECT event_id + {off} AS event_id, ts, user_id + {r}*1000 AS user_id, "
               "event_type, value, props FROM src", 1000000),
}
passthrough = ["lineitem", "orders", "customer", "nation", "region", "part", "supplier"]
# MULTI-FILE layout: each table is a DIRECTORY of parquet files (one per
# replica), so a distributed reader actually splits the scan across tasks
# -- the single-file form produced the <=2-input-split artifact behind the
# q67/q74/q78 probe tails (SURVEY sect. 8).
import shutil
for t in passthrough:
    d = f"{out}/{t}.parquet"
    shutil.rmtree(d, ignore_errors=True); os.makedirs(d)
    src = f"/root/testdata/sf0.1/{t}.parquet"
    src_glob = f"{src}/*.parquet" if os.path.isdir(src) else src
    con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{src_glob}'")
    con.execute(f"COPY (SELECT * FROM src) TO '{d}/part-0.parquet' (FORMAT PARQUET)")
for t, (sql, stride) in specs.items():
    d = f"{out}/{t}.parquet"
    shutil.rmtree(d, ignore_errors=True); os.makedirs(d)
    src = f"/root/testdata/sf0.1/{t}.parquet"
    src_glob = f"{src}/*.parquet" if os.path.isdir(src) else src
    con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{src_glob}'")
    for r in range(reps):
        con.execute(f"COPY ({sql.format(off=r * stride, r=r)}) TO '{d}/part-{r}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
    print(t, n)
print("done:", out)
