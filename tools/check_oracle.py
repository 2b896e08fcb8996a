#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (see BASELINE.md t2).

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Registers each /root/testdata table as a DuckDB view, runs every oracle SQL
from oracle_sql.json, and compares row-by-row (columns sorted by name)
against the Spark result parquet the Verify main dumped.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return repr(v)

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"[MISS] {name}: no spark result parquet")
            n_bad += 1
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}")
            n_bad += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet({spark_files!r})").fetchdf()
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"[SCHEMA] {name}: oracle {ocols} vs spark {scols}")
            n_bad += 1
            continue
        o = [tuple(norm(v) for v in row) for row in odf[ocols].itertuples(index=False)]
        s = [tuple(norm(v) for v in row) for row in sdf[ocols].itertuples(index=False)]
        if len(o) != len(s):
            print(f"[ROWS] {name}: oracle {len(o)} vs spark {len(s)}")
            n_bad += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(o, s)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"[VALUES] {name}: {len(bad)}/{len(o)} rows differ; first at {i}:")
            print(f"   oracle: {a}")
            print(f"   spark : {b}")
            n_bad += 1
        else:
            print(f"[OK] {name}: {len(o)} rows")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
