#!/usr/bin/env python3
"""Diff arrow-level physical types AND typed values between Spark verify
output and DuckDB oracle results. Stricter than check_parity.py."""
import json, os, sys
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or name not in oracle:
            continue
        st = pq.read_table(d)
        dt = con.execute(oracle[name]).arrow()
        s_types = {f.name: str(f.type) for f in st.schema}
        d_types = {f.name: str(f.type) for f in dt.schema}
        diffs = {c: (s_types.get(c), d_types.get(c))
                 for c in set(s_types) | set(d_types)
                 if s_types.get(c) != d_types.get(c)}
        if diffs:
            print(f"TYPE-DIFF {name}: {diffs}")
        else:
            print(f"types-ok  {name}: {s_types}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
