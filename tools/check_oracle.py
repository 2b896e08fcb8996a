#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Dev tool only (not part of the Scala library): compares each
Verify-dumped parquet result against its oracleSql run by DuckDB over
the same testdata parquet tables. Usage:

    python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out [query ...]

Pass --strict-types to fail on ANY DuckDB-level column-type diff between
the oracle result and the Spark parquet (not just the HUGEINT class).

Pass --bitwise to ALSO compare without the -0.0 normalization, at both
the driver's 4dp round and this tool's stricter 6dp round. The driver
hashes the rounded doubles bitwise, so a DuckDB -0.0 (e.g. ABS/ROUND of
a tiny negative — DuckDB preserves the sign bit where Spark clears it)
against a Spark +0.0 is a driver failure the default normalizing
compare structurally cannot see (this exact class produced the only two
round-12 red rows). Run --bitwise full-surface before closing a round.
"""
import json, os, sys

import duckdb

# The driver's comparator rejects DuckDB HUGEINT (int128 — what SUM over
# an integer column returns when uncast) against Spark's BIGINT even when
# the values are identical, while tolerating INTEGER<->BIGINT and
# DOUBLE<->DECIMAL widenings. Python fetchall() coerces all of these to
# int/float, so the value compare below can never see the difference —
# the type compare has to happen at the DuckDB type level.
ALWAYS_FATAL_TYPES = {"HUGEINT", "UHUGEINT"}


def type_diffs(con, oracle_sql, spark_glob):
    """[(col, oracle_type, spark_type)] for every column whose DuckDB type
    differs between the oracle result and the Spark-written parquet."""
    orel = con.sql(oracle_sql)
    srel = con.sql(f"SELECT * FROM read_parquet('{spark_glob}')")
    omap = dict(zip(orel.columns, [str(t) for t in orel.types]))
    smap = dict(zip(srel.columns, [str(t) for t in srel.types]))
    return [(c, omap[c], smap[c])
            for c in sorted(set(omap) & set(smap)) if omap[c] != smap[c]]


def canon(rows, cols, dp=6, normalize=True):
    # like the driver's compare (sort columns by name, round floats,
    # sort rows) but STRICTER on floats: 6dp instead of 4dp, since many
    # queries intentionally round to 6dp and a 4dp re-round would mask
    # errors well above their tolerance. +0.0 normalizes -0.0 (default
    # mode only — repr() preserves the sign of zero, so normalize=False
    # makes the string compare bitwise on the sign of zero, matching
    # the driver's hash).
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if type(v).__name__ == "Decimal":
                v = float(v)
            if isinstance(v, float):
                v = round(v, dp)
                if normalize:
                    v += 0.0
            vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    return out


def main():
    argv = [a for a in sys.argv[1:]
            if a not in ("--strict-types", "--bitwise")]
    strict_types = "--strict-types" in sys.argv
    bitwise = "--bitwise" in sys.argv
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # The driver runs its own DuckDB build; engine-level rounding (libm
    # ROUND tie behavior shifted across DuckDB releases) can make a
    # query pass this local gate and fail the driver (r14's only red
    # row, q_quant_error) — so the gate discloses which engine it ran.
    print(f"check_oracle: duckdb {duckdb.__version__} "
          f"(the driver's build may differ — any hashed column that "
          f"flows through engine round()/ROUND() on a derived double "
          f"is version-sensitive; use floor(v*1eN + 0.5) lattices)")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"{name}: MISSING spark output")
            fails += 1
            continue
        try:
            ores = con.execute(sql)
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            fails += 1
            continue
        try:
            sres = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            scols = [d[0] for d in sres.description]
            srows = sres.fetchall()
        except Exception as e:
            # a failed Verify write can leave an empty result dir; keep
            # checking the other queries rather than aborting the run
            print(f"{name}: SPARK OUTPUT UNREADABLE {e}")
            fails += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"{name}: SCHEMA MISMATCH spark={sorted(scols)} oracle={sorted(ocols)}")
            fails += 1
            continue
        tdiffs = type_diffs(con, sql, f"{spark_dir}/*.parquet")
        fatal = [d for d in tdiffs if d[1] in ALWAYS_FATAL_TYPES
                 or d[2] in ALWAYS_FATAL_TYPES]
        if fatal or (strict_types and tdiffs):
            kind = "FATAL" if fatal else "STRICT"
            print(f"{name}: TYPE MISMATCH ({kind}) " + "; ".join(
                f"{c}: oracle={ot} spark={st}" for c, ot, st in tdiffs))
            fails += 1
            continue
        elif tdiffs:
            print(f"{name}: type warn " + "; ".join(
                f"{c}: oracle={ot} spark={st}" for c, ot, st in tdiffs))
        sc, oc = canon(srows, scols), canon(orows, ocols)
        if len(sc) != len(oc):
            print(f"{name}: ROWS MISMATCH spark={len(sc)} oracle={len(oc)}")
            fails += 1
            continue
        if sc != oc:
            bad = next(i for i in range(len(sc)) if sc[i] != oc[i])
            print(f"{name}: HASH MISMATCH first diff row {bad}:\n  spark : {sc[bad]}\n  oracle: {oc[bad]}")
            fails += 1
            continue
        if bitwise:
            # driver-faithful pass: the driver rounds to 4dp then hashes
            # the bits, so the sign of zero counts. Check the driver's
            # exact 4dp AND the stricter 6dp, both unnormalized.
            bit_bad = False
            for dp in (4, 6):
                sb = canon(srows, scols, dp=dp, normalize=False)
                ob = canon(orows, ocols, dp=dp, normalize=False)
                if sb != ob:
                    bad = next(i for i in range(len(sb)) if sb[i] != ob[i])
                    print(f"{name}: BITWISE MISMATCH ({dp}dp, likely -0.0)"
                          f" first diff row {bad}:\n  spark : {sb[bad]}"
                          f"\n  oracle: {ob[bad]}")
                    fails += 1
                    bit_bad = True
                    break
            if bit_bad:
                continue
        print(f"{name}: OK ({len(sc)} rows)")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
