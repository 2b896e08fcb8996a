#!/usr/bin/env python3
"""Lint: engine round()/ROUND() feeding an integer lattice.

r14's only red row (q_quant_error) came from quantizing derived doubles
onto an integer lattice with ENGINE rounding: Spark's round() goes
through BigDecimal (shortest-repr, HALF_UP) while DuckDB's ROUND is a
libm-level rounding whose tie behavior has shifted across releases — a
one-element flip in any hashed BIGINT sum fails the driver even when
the local DuckDB agrees. The repo doctrine is the engine-round-free
form floor(v * 1eN + 0.5) (identical IEEE ops in both engines;
sign-decompose when v can be negative).

This lint flags CAST(round(...) AS BIGINT) / round(...).cast("long")
patterns — engine round() whose result is consumed as an exact
integer. ROUND(x, k) kept as a DOUBLE output column is a different
(already-adjudicated) contract: the driver re-rounds doubles at 4dp
before hashing, so those only fail when the k-dp value itself sits on
a tie, which the lattice doctrine already avoids at the source.

Exit 1 if any site is found outside the allowlist below.
"""
import re
import subprocess
import sys

# Baseline of audited sites (r15): the two standing classes that are
# NOT the q_quant_error failure mode —
#   (a) round(v*100) where v is a 2-dp money value: v*100 sits within
#       1e-11 of an integer, nowhere near a .5 tie, so both engines
#       agree regardless of tie semantics;
#   (b) round(v*1eN) on ln()/exp()-derived micro-nat lattices: a tie
#       requires the double to be exactly k+0.5, which transcendental
#       operands cannot hit; driver-green for 4+ rounds.
# New sites (not in the baseline) FAIL — quantize with
# floor(v * 1eN + 0.5) instead (sign-decomposed when v can be < 0).
BASELINE_FILE = "tools/round_lattice_baseline.txt"

PATTERNS = [
    # Spark/DuckDB SQL string: CAST(ROUND(...) AS <integer type>)
    re.compile(r"CAST\(\s*ROUND\(.*AS\s+(BIGINT|INTEGER|INT|HUGEINT)\s*\)",
               re.IGNORECASE),
    # Scala DSL: round(...).cast("long"/"int"/"bigint")
    re.compile(r"round\(.*\)\s*\.cast\(\"(long|int|bigint)\"\)",
               re.IGNORECASE),
]


def site_key(line):
    """path + matched text, line numbers stripped (stable across edits
    elsewhere in the file)."""
    path, _, rest = line.partition(":")
    _, _, text = rest.partition(":")
    return f"{path}:{text.strip()}"


def main():
    out = subprocess.run(
        ["git", "grep", "-n", "-i", r"round("],
        capture_output=True, text=True, cwd=".").stdout
    hits = []
    for line in out.splitlines():
        path = line.split(":", 1)[0]
        if not path.startswith("src/main/scala"):
            continue
        if not any(p.search(line) for p in PATTERNS):
            continue
        hits.append(line)
    if "--rebaseline" in sys.argv:
        with open(BASELINE_FILE, "w") as f:
            for h in sorted(set(site_key(h) for h in hits)):
                f.write(h + "\n")
        print(f"wrote {len(set(site_key(h) for h in hits))} sites to "
              f"{BASELINE_FILE}")
        return
    try:
        baseline = set(open(BASELINE_FILE).read().splitlines())
    except FileNotFoundError:
        baseline = set()
    bad = [h for h in hits if site_key(h) not in baseline]
    known = len(hits) - len(bad)
    if known:
        print(f"# {known} baselined engine-round lattice sites "
              "(audited classes a/b above); pass -v to list them")
        if "-v" in sys.argv:
            for h in hits:
                if site_key(h) in baseline:
                    print(f"  warn: {h}")
    if bad:
        print(f"{len(bad)} NEW engine-round integer-lattice sites — use "
              "floor(v * 1eN + 0.5) instead (sign-decomposed if v < 0):")
        for h in bad:
            print(f"  FAIL: {h}")
        sys.exit(1)
    print("lint_round_lattice: no new sites")


if __name__ == "__main__":
    main()
