#!/usr/bin/env python3
"""Build the round's composite bench artifact from N full-run
bench_summary dumps, with the key-set gate the round-11 verdict asked
for: the composite REFUSES to build unless every run covers the same
query keys AND those keys exactly match the verify dump's oracle
registry (so a query that lands after the bench, or a bench that
silently dropped a key, fails loudly instead of shipping a composite
with holes).

Usage:
    python3 tools/composite.py out.json verify_out/oracle_sql.json run1.json [run2.json ...]
"""
import json, sys


def main() -> int:
    out_path, oracle_path, *run_paths = sys.argv[1:]
    runs = [json.load(open(p)) for p in run_paths]
    keys = set(runs[0]["queries"])
    for p, r in zip(run_paths, runs):
        if set(r["queries"]) != keys:
            diff = set(r["queries"]) ^ keys
            print(f"FATAL: {p} key set differs: {sorted(diff)}")
            return 1
    oracle_keys = set(json.load(open(oracle_path)))
    if keys != oracle_keys:
        print(f"FATAL: bench keys != oracle registry keys: "
              f"only-bench={sorted(keys - oracle_keys)} "
              f"only-registry={sorted(oracle_keys - keys)}")
        return 1
    comp = {k: min(r["queries"][k] for r in runs) for k in sorted(keys)}
    bad = [k for k, v in comp.items() if v < 0]
    if bad:
        print(f"FATAL: queries with no successful round: {bad}")
        return 1
    total = sum(comp.values())
    json.dump({
        "method": ("per-query MIN across %d full bench runs "
                   "(SPARK_GRAFT_REPEAT=2 each: round 1 warmup, round 2 "
                   "reported); key set gated against the verify oracle "
                   "registry" % len(runs)),
        "raw_run_totals_sec": [round(r["value"], 3) for r in runs],
        "n_queries": len(comp),
        "composite_total_sec": round(total, 3),
        "sec_per_query": round(total / len(comp), 4),
        "per_query_min_sec": comp,
    }, open(out_path, "w"), indent=1)
    print(f"OK: {round(total, 2)} s / {len(comp)} queries "
          f"= {round(total / len(comp), 4)} s/q -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
