#!/usr/bin/env bash
# Same-code witness for bench_diff's --witness path (the round-12 drift
# incident, automated): when the gate flags regressions that survive the
# warm re-measure, the remaining question is whether the OLD SNAPSHOT was
# taken on a faster box window. This script re-measures the UNCHANGED
# prior-snapshot code — checked out into a throwaway worktree — under
# CURRENT box conditions, producing a witness file bench_diff can use to
# adjudicate: a flag within 1.3x of the same-code re-measure is snapshot
# drift, not a code regression.
#
# Usage: tools/witness.sh <commit> <q1,q2,...> [out.json]
#   commit   the commit the previous bench snapshot was built from
#   queries  comma-separated flagged query names
#   out      default bench/witness_same_code.json
#
# Then: python3 tools/bench_diff.py <prev> bench_out.json --witness <out>
set -euo pipefail
cd "$(dirname "$0")/.."
COMMIT=${1:?usage: tools/witness.sh <commit> <q1,q2,...> [out.json]}
QUERIES=${2:?need a comma-separated query list}
OUT=${3:-bench/witness_same_code.json}
WT=$(mktemp -d /tmp/graft-witness-XXXX)
trap 'cd /; git -C "$OLDPWD" worktree remove --force "$WT" 2>/dev/null || true' EXIT
OLDPWD=$PWD
git worktree add "$WT" "$COMMIT"
(cd "$WT" && \
  SPARK_GRAFT_SF_DIR=${SF_BENCH:-/root/testdata/sf0.1} SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_REPS=${WITNESS_REPS:-5} \
  SPARK_GRAFT_BENCH_QUERIES="$QUERIES" \
  SPARK_GRAFT_BENCH_OUT=/tmp/witness_bench.json \
  sbt -batch "runMain graft.Bench")
mkdir -p "$(dirname "$OUT")"
cp /tmp/witness_bench.json "$OUT"
echo "witness: $COMMIT best-of-${WITNESS_REPS:-5} for [$QUERIES] -> $OUT"
