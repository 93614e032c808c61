#!/usr/bin/env python3
"""Plan-fingerprint diff: report every query whose canonicalized optimized
plan changed since the previous round's committed snapshot (plus added /
removed queries). INFORMATIONAL — plans legitimately change when code does;
the point is that a silent plan change (a dropped broadcast, a new
exchange) now surfaces in the gate transcript for adjudication instead of
passing unnoticed. Exit 0 always.

Usage: python3 tools/plan_diff.py <old.json> <new.json>
"""
import json
import sys

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
changed = sorted(q for q in old.keys() & new.keys() if old[q] != new[q])
added = sorted(new.keys() - old.keys())
removed = sorted(old.keys() - new.keys())
for q in changed:
    print(f"PLAN CHANGED: {q} ({old[q]} -> {new[q]})")
for q in added:
    print(f"plan added:   {q}")
for q in removed:
    print(f"plan removed: {q}")
if not (changed or added or removed):
    print("plans unchanged")
else:
    print(f"\n{len(changed)} changed / {len(added)} added / "
          f"{len(removed)} removed of {len(new)} plans — adjudicate "
          f"changed entries in the round notes")
