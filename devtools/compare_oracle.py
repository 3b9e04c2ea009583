#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 devtools/compare_oracle.py <verifyOutDir> <sfDir> [query ...]

Mirrors the driver: for each query dir under <verifyOutDir>, load the
Spark parquet result, run the matching oracle SQL from oracle_sql.json in
DuckDB over the sf parquet tables, then compare row count, column names,
and a hash of the values with columns sorted by name.
"""
import sys, json, os, hashlib
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_df(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df


def df_hash(df: pd.DataFrame) -> str:
    # stringify everything the same way for both engines
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, bytes):
            return v.hex()
        if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    rows = ["\x1f".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode("utf-8", "surrogatepass"))
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
                        if os.path.isdir(p) else
                        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        if only and not any(name.startswith(o) for o in only):
            continue
        spark_df = pq.read_table(os.path.join(out_dir, name)).to_pandas()
        if name not in oracle:
            print(f"{name}: NO_ORACLE rows={len(spark_df)}")
            continue
        try:
            odf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE_SQL_ERROR {e}")
            failures += 1
            continue
        s, o = canon_df(spark_df), canon_df(odf)
        rows = len(s) == len(o)
        schema = list(s.columns) == list(o.columns)
        h = df_hash(s) == df_hash(o) if rows and schema else False
        status = "PASS" if (rows and schema and h) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"{name}: FAIL rows={len(s)}/{len(o)} schema_match={schema} hash={h}")
            if not schema:
                print(f"  spark cols: {list(s.columns)}")
                print(f"  oracle cols: {list(o.columns)}")
            elif rows and len(s) > 0:
                # show first differing row after sorting
                sv = sorted(["\x1f".join(map(str, r)) for r in s.itertuples(index=False, name=None)])
                ov = sorted(["\x1f".join(map(str, r)) for r in o.itertuples(index=False, name=None)])
                for a, b in zip(sv, ov):
                    if a != b:
                        print(f"  spark : {a[:300]}")
                        print(f"  oracle: {b[:300]}")
                        break
        else:
            print(f"{name}: PASS rows={len(s)}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
