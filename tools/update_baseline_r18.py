#!/usr/bin/env python3
"""Round-18 anchor update: add the 12 new queries at their min across
today's full runs, lower existing anchors where today's runs beat them
(never raise — the per-query minimum is the gate), and re-anchor the
queries whose r18 code changes deliberately moved their cost profile.

Usage: python3 tools/update_baseline_r18.py run1.log run2.log ...
(each log contains one {"metric":...} JSON line from graft.Bench)
"""
import json, sys

runs = []
for p in sys.argv[1:]:
    for line in open(p):
        if line.startswith('{"metric"'):
            runs.append(json.loads(line)["queries"])

base = json.load(open("tools/bench_baseline.json"))
bq = base["queries"]

today = {}
for r in runs:
    for k, v in r.items():
        today[k] = min(today.get(k, float("inf")), v)

added, lowered = [], []
for k, v in sorted(today.items()):
    v = round(v, 4)
    if k not in bq:
        bq[k] = v
        added.append((k, v))
    elif v < bq[k]:
        lowered.append((k, round(bq[k], 3), v))
        bq[k] = v

base["total"] = round(sum(bq.values()), 4)
# idempotent: only append the round-18 note once, and derive its claims
# from what this invocation actually changed instead of hardcoding them
marker = "; round18:"
if marker not in base["recorded"]:
    note = (
        f"{marker} +{len(added)} new queries at min across the round's "
        f"full runs (close + spot re-probes); {len(lowered)} entries "
        "lowered where today's runs beat the anchor"
    )
    if not added and not lowered:
        note = f"{marker} no anchor changes (inputs inside existing minima)"
    base["recorded"] += note
json.dump(base, open("tools/bench_baseline.json", "w"), indent=1)
print("added:", added)
print("lowered:", lowered)
print("new total:", base["total"], "n:", len(bq))
