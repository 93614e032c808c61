#!/usr/bin/env bash
# Cross-scale oracle sweep (SURVEY §5.6): run the full Verify + DuckDB
# compare at scales the driver's gate never checks. The gate verifies at
# sf0.01 only, so an oracle that bakes in a verify-SF-specific data-shape
# assumption passes every round until the data moves. Round-16's first
# sweep caught exactly that twice in 199 queries:
#   - q182's k-core oracle asserted the sf0.01 "already a 3-core,
#     witness 0" precondition as a literal (sf0.001 runs one peel round);
#   - q01's round(x, 2) on a raw double product hit a .xx5 cent boundary
#     at sf0.1 that Spark (decimal shortest-string) and DuckDB (binary
#     value) round differently.
# Run after adding any oracle with a fixpoint witness, ntile/rank
# boundary, planted-row id, or scale-2 rounding of raw doubles.
#
# Usage: tools/sweep.sh [sf ...]     (default: 0.001 0.1)
set -uo pipefail
cd "$(dirname "$0")/.."
rc=0
sfs=("$@"); [ ${#sfs[@]} -eq 0 ] && sfs=(0.001 0.1)
for s in "${sfs[@]}"; do
  dir=/root/testdata/sf$s
  out=/tmp/sweep_sf$s
  echo "== sweep: Verify @ $dir =="
  SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify $dir $out" \
    >/dev/null 2>&1 || { echo "sweep: Verify failed at $dir"; rc=1; continue; }
  if res=$(python3 tools/check.py "$dir" "$out" 2>&1); then
    echo "$res" | tail -1
  else
    echo "$res" | grep -v "^ok" | head -20
    rc=1
  fi
done
[ $rc -eq 0 ] && echo "sweep: PASS" || echo "sweep: FAIL — fix the oracle(s) above"
exit $rc
