#!/usr/bin/env bash
# Demo for the plan-fingerprint STRUCTURAL hard-fail (VERDICT r14 #4
# "done =" criterion): force the session-wide broadcast pins off
# (PLAN_HASH_NO_BROADCAST=1 -> autoBroadcastJoinThreshold=-1, the
# deliberately-broken plan: every broadcast-pinned join that relied on
# size estimation flips to SortMergeJoin), re-fingerprint, and show
# plan_diff exiting 2 — i.e. the gate would FAIL — then show PLAN_ACK
# downgrading the same diff to informational.
#
# Usage: tools/plan_guard_demo.sh [out_transcript]
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/plan_guard_demo.txt}
exec > >(tee "$OUT") 2>&1

echo "== plan-guard demo: baseline fingerprints =="
sbt -batch "runMain graft.PlanHash /tmp/plans_demo_base.json" || exit 1
echo "== plan-guard demo: broken fingerprints (broadcast joins forced off) =="
PLAN_HASH_NO_BROADCAST=1 \
  sbt -batch "runMain graft.PlanHash /tmp/plans_demo_broken.json" || exit 1

echo "== plan-guard demo: plan_diff base vs broken (expect hard-fail) =="
python3 tools/plan_diff.py /tmp/plans_demo_base.json /tmp/plans_demo_broken.json
rc=$?
if [ $rc -ne 2 ]; then
  echo "plan-guard demo: FAIL — structural flip NOT caught (rc=$rc)"
  exit 1
fi
echo "plan-guard demo: structural flip caught (rc=2, gate would FAIL) ✓"

# the escape hatch: acknowledge every structurally-changed query and the
# same diff becomes informational (rc=0)
acked=$(python3 tools/plan_diff.py /tmp/plans_demo_base.json \
  /tmp/plans_demo_broken.json | sed -n 's/^PLAN STRUCTURAL: //p' | tr '\n' ' ')
echo "== plan-guard demo: same diff with PLAN_ACK (expect pass) =="
PLAN_ACK="$acked" python3 tools/plan_diff.py /tmp/plans_demo_base.json \
  /tmp/plans_demo_broken.json
rc=$?
if [ $rc -ne 0 ]; then
  echo "plan-guard demo: FAIL — PLAN_ACK did not downgrade (rc=$rc)"
  exit 1
fi
echo "plan-guard demo: PASS — guard fails the flip, PLAN_ACK accepts it"
