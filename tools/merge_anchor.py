#!/usr/bin/env python3
"""Dev-only: merge fresh idle bench runs into BENCH_ANCHOR.json.

Usage: tools/merge_anchor.py run1.json [run2.json ...] --new q142,q143 \
         [--rebase q129,q130] [--note "..."]

Per the anchor protocol (_comment): entries named in --new enter with
their first per-query minima across the given runs; entries in --rebase
are REPLACED by the fresh minima (plan shape changed); all other
existing entries min-merge against the fresh runs. total_sec re-sums
over every entry. The runs' (total_sec, loadavg) tuples append to the
runs history, and --note appends to the protocol _comment.
"""
import json, sys, argparse

ap = argparse.ArgumentParser()
ap.add_argument("runs", nargs="+")
ap.add_argument("--new", default="")
ap.add_argument("--rebase", default="")
ap.add_argument("--note", default="")
ap.add_argument("--anchor", default="BENCH_ANCHOR.json")
a = ap.parse_args()

anchor = json.load(open(a.anchor))
aq = anchor["queries"]
runs = [json.load(open(p)) for p in a.runs]
newq = set(filter(None, a.new.split(",")))
rebase = set(filter(None, a.rebase.split(",")))

def qmin(name):
    vals = [r["queries"][name] for r in runs
            if name in r.get("queries", {}) and r["queries"][name] >= 0]
    return min(vals) if vals else None

changed = {"new": [], "rebased": [], "merged": 0}
allq = set(aq)
for r in runs:
    allq |= set(r.get("queries", {}))

for name in sorted(allq):
    fresh = qmin(name)
    short = name.split("_")[0]
    if name in newq or short in newq:
        assert fresh is not None, f"--new {name} missing from runs"
        aq[name] = fresh
        changed["new"].append(f"{name}={fresh:.3f}")
    elif name in rebase or short in rebase:
        assert fresh is not None, f"--rebase {name} missing from runs"
        changed["rebased"].append(f"{name}:{aq.get(name)}->{fresh:.3f}")
        aq[name] = fresh
    elif name in aq and fresh is not None:
        if fresh < aq[name]:
            changed["merged"] += 1
        aq[name] = min(aq[name], fresh)
    elif name not in aq:
        print(f"WARNING: {name} in runs but not anchored and not in --new; skipping")

anchor["total_sec"] = round(sum(aq.values()), 3)
for r in runs:
    anchor.setdefault("runs", []).append({
        "total_sec": sum(v for v in r["queries"].values() if v >= 0),
        "loadavg_start": r.get("loadavg_start", -1),
        "loadavg_end": r.get("loadavg_end", -1)})
if a.note:
    anchor["_comment"] = anchor["_comment"].rstrip() + " | " + a.note

json.dump(anchor, open(a.anchor, "w"), indent=0)
nq = len(aq)
print(f"anchored {nq} queries, total {anchor['total_sec']}s; "
      f"new: {changed['new']}; rebased: {changed['rebased']}; "
      f"min-merged improvements: {changed['merged']}")
