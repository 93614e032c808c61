#!/usr/bin/env python3
"""Plan-fingerprint diff with the round-15 STRUCTURAL hard-fail policy.

Two tiers (VERDICT r14 #4 decided):

 - TEXT-HASH changes stay INFORMATIONAL: a canonical-text change can be a
   renamed alias or a reordered projection — adjudicate in the round notes.
 - STRUCTURAL changes HARD-FAIL (exit 2): for a query present in both
   snapshots, a change in the join-strategy census or the exchange counts
   (the `f` feature string: joins=[...] shuffles=N broadcasts=N) is
   exactly the silent scale regression class — a broadcast pin silently
   flipping to SortMergeJoin, a new shuffle appearing. Intentional changes
   are acknowledged per-query via PLAN_ACK="q1 q2" (env or --ack), which
   downgrades those queries to informational for THIS run; the updated
   snapshot archived on PASS then becomes the new baseline.

Snapshots are {"query": {"h": hash, "f": features}}; pre-r15 snapshots
held bare hash strings — read compatibly (no feature baseline -> the
structural check is skipped for that query, informational note only).

Usage: python3 tools/plan_diff.py <old.json> <new.json> [--ack "q1 q2"]
Exit 0 = clean/informational only; exit 2 = unacknowledged structural change.
"""
import json
import os
import sys


def norm(v):
    if isinstance(v, str):
        return {"h": v, "f": None}
    return {"h": v.get("h"), "f": v.get("f")}


old = {k: norm(v) for k, v in json.load(open(sys.argv[1])).items()}
new = {k: norm(v) for k, v in json.load(open(sys.argv[2])).items()}
ack = set()
if "--ack" in sys.argv:
    ack |= set(sys.argv[sys.argv.index("--ack") + 1].split())
ack |= set(os.environ.get("PLAN_ACK", "").split())

common = old.keys() & new.keys()
changed = sorted(q for q in common if old[q]["h"] != new[q]["h"])


def stable(f):
    # "unstable" = PlanHash couldn't canonicalize this plan's features in
    # that snapshot; comparing it against a concrete feature string would
    # hard-fail without any real join/exchange change (ADVICE r15). Treat
    # like a missing baseline: skip the structural check, note it below.
    return f is not None and f != "unstable"


structural = sorted(
    q for q in common
    if stable(old[q]["f"]) and stable(new[q]["f"])
    and old[q]["f"] != new[q]["f"])
unstable_skipped = sorted(
    q for q in common
    if (old[q]["f"] == "unstable") != (new[q]["f"] == "unstable"))
added = sorted(new.keys() - old.keys())
removed = sorted(old.keys() - new.keys())

hard = [q for q in structural if q not in ack]
for q in unstable_skipped:
    print(f"plan unstable on one side (structural check skipped): {q}")
for q in structural:
    tag = "PLAN STRUCTURAL" if q not in ack else "plan structural (acked)"
    print(f"{tag}: {q}\n  old: {old[q]['f']}\n  new: {new[q]['f']}")
for q in changed:
    if q in structural:
        continue
    print(f"PLAN CHANGED: {q} ({old[q]['h']} -> {new[q]['h']})")
for q in added:
    print(f"plan added:   {q}")
for q in removed:
    print(f"plan removed: {q}")
if not (changed or structural or added or removed):
    print("plans unchanged")
else:
    print(f"\n{len(changed)} hash-changed ({len(structural)} structural, "
          f"{len(hard)} unacked) / {len(added)} added / {len(removed)} "
          f"removed of {len(new)} plans")
if hard:
    print("plan_diff: FAIL — join-strategy/exchange-count change without "
          "PLAN_ACK: " + " ".join(hard))
    sys.exit(2)
