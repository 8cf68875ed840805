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
base["recorded"] += (
    "; round18: + q159-q170 at min across the round's full runs "
    "(close + spot re-probes); entries lowered where today's runs beat "
    "the anchor; no deliberate re-anchors (the component-family deltas "
    "measured inside the day's host-noise band on code-untouched probes)"
)
json.dump(base, open("tools/bench_baseline.json", "w"), indent=1)
print("added:", added)
print("lowered:", lowered)
print("new total:", base["total"], "n:", len(bq))
