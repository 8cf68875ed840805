#!/usr/bin/env python3
"""Build a ~10x replicated dataset in /tmp/sfbig from /root/testdata/sf0.1
for scale testing (ids shifted per replica; events users offset so dedup
and join semantics stay meaningful). Replication is exact-duplicate-heavy
by construction — interpret near-dup benchmarks accordingly (SURVEY §8).

Usage: python3 tools/make_sfbig.py [reps] [outdir=/tmp/sfbig]
"""
import sys, os
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
for t in passthrough:
    con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '/root/testdata/sf0.1/{t}.parquet'")
    con.execute(f"COPY (SELECT * FROM src) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
for t, (sql, stride) in specs.items():
    con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '/root/testdata/sf0.1/{t}.parquet'")
    parts = " UNION ALL ".join(sql.format(off=r * stride, r=r) for r in range(reps))
    con.execute(f"COPY ({parts}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(t, n)
print("done:", out)
