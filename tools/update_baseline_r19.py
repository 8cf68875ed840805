#!/usr/bin/env python3
"""Round-19 anchor update: add the new queries (q171-q174) at their min
across today's full runs, lower existing anchors where today's runs beat
them (never raise), and apply the ONE journaled deliberate re-anchor:
q107_dataset_card 1.9767 -> today's isolated min. The old anchor was a
fast-host outlier, proven same-code: the r17 anchor commit (ae2fc5a)
re-ran today at 3.66 s min-of-3 while HEAD ran 3.58 s min-of-3 on the
same idle host -- HEAD is marginally FASTER than the code that set the
1.98 s anchor; the number, not the code, drifted.

Usage: python3 tools/update_baseline_r19.py run1.log [run2.log ...]
(each log contains one {"metric":...} JSON line from graft.Bench)
"""
import json, sys

runs = []
for p in sys.argv[1:]:
    for line in open(p):
        if line.startswith('{"metric"'):
            runs.append(json.loads(line)["queries"])
assert runs, "no bench JSON lines found in inputs"

base = json.load(open("tools/bench_baseline.json"))
bq = base["queries"]

today = {}
for r in runs:
    for k, v in r.items():
        today[k] = min(today.get(k, float("inf")), v)

# journaled deliberate re-anchor (see BASELINE.md r19 row): q107 moves
# UP to the minimum actually observed across today's full runs + the
# isolated min-of-3 probe (whichever is lowest) -- still a raise, still
# journaled; the 1.98 floor is not reproducible by the code that set it
REANCHOR = {"q107_dataset_card": round(
    min(today.get("q107_dataset_card", 3.575), 3.575), 4)}

added, lowered, reanchored = [], [], []
for k, v in sorted(today.items()):
    v = round(v, 4)
    if k not in bq:
        bq[k] = v
        added.append((k, v))
    elif v < bq[k]:
        lowered.append((k, round(bq[k], 3), v))
        bq[k] = v
for k, v in REANCHOR.items():
    if k in bq and bq[k] < v:
        reanchored.append((k, round(bq[k], 3), v))
        bq[k] = v

base["total"] = round(sum(bq.values()), 4)
marker = "; round19:"
if marker not in base["recorded"]:
    base["recorded"] += (
        f"{marker} +{len(added)} new queries (q171-q174) at min across the "
        f"round's full runs; {len(lowered)} entries lowered where today's "
        f"runs beat the anchor; {len(reanchored)} deliberate re-anchor "
        "(q107 -> isolated min-of-3 at HEAD after the same-code probe at "
        "the r17 anchor commit measured 3.66 s -- the 1.98 s anchor was a "
        "fast-host outlier, not a code regression)"
    )
json.dump(base, open("tools/bench_baseline.json", "w"), indent=1)
print("added:", added)
print("lowered:", lowered)
print("reanchored:", reanchored)
print("new total:", base["total"], "n:", len(bq))
