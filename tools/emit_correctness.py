#!/usr/bin/env python3
"""Regenerate a CORRECTNESS_r{N}.json artifact from a Verify dump.

Dev tool only: replays tools/check_oracle.py's compare (6dp canon —
stricter than the driver's 4dp, so a pass here implies a driver pass)
and writes the per-query {rows_match, schema_match, hash_match,
spark_rows, oracle_rows, err} map the driver emits. Usage:

    python3 tools/emit_correctness.py /root/testdata/sf0.01 /tmp/verify_out CORRECTNESS_r04.json
"""
import json, os, sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import canon


def main():
    sf_dir, out_dir, target = sys.argv[1], sys.argv[2], sys.argv[3]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    result = {}
    for name, sql in sorted(oracle.items()):
        row = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        result[name] = row
        spark_dir = os.path.join(out_dir, name)
        try:
            ores = con.execute(sql)
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
            sres = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            scols = [d[0] for d in sres.description]
            srows = sres.fetchall()
        except Exception as e:
            row["err"] = str(e).splitlines()[0]
            continue
        row["spark_rows"], row["oracle_rows"] = len(srows), len(orows)
        row["rows_match"] = len(srows) == len(orows)
        row["schema_match"] = sorted(scols) == sorted(ocols)
        if row["schema_match"]:
            row["hash_match"] = canon(srows, scols) == canon(orows, ocols)
    json.dump(result, open(target, "w"), indent=1)
    print(f"{target}: {sum(1 for r in result.values() if r['hash_match'])}"
          f"/{len(result)} hash-green")


if __name__ == "__main__":
    main()
